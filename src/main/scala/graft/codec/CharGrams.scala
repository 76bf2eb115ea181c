package graft.codec

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.unsafe.types.UTF8String

/** Hashed char-n-gram feature buckets — the fused form of
  * `Classifier.hashBucket ∘ Classifier.charNgrams`, byte-for-byte the
  * same law:
  *
  *   - grams over lower(text) at every 1-based CODEPOINT position
  *     i ∈ [1, len−n+1] (UTF8String.toLowerCase / substringSQL — exactly
  *     what the `lower` / `substr` column functions evaluate);
  *   - bucket = (first 4 bytes of sha256(utf8(gram)) as an unsigned
  *     big-endian int) mod dims — identical to
  *     `conv(substring(sha2(g, 256), 1, 8), 16, 10) % dims` (the value is
  *     in [0, 2³²) so `pmod` and `%` agree);
  *   - text shorter than n codepoints yields NO grams.
  *
  * The HOF formulation allocates a hex string + a substring + a conv per
  * gram and (uncached) re-lowers the document per element; this is one
  * compiled pass with a reused digest — the language-ID feature extractor
  * at corpus scale. */
object CharGrams {

  def buckets(text: UTF8String, n: Int, dims: Int): ArrayData = {
    val lt = text.toLowerCase
    val len = lt.numChars()
    if (len < n) return UnsafeArrayData.fromPrimitiveArray(Array.empty[Long])
    val md = MessageDigest.getInstance("SHA-256")
    val out = new Array[Long](len - n + 1)
    var i = 0
    while (i <= len - n) {
      val gram = lt.substringSQL(i + 1, n)
      md.reset()
      val d = md.digest(gram.getBytes)
      val v = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
        ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
      out(i) = v % dims
      i += 1
    }
    // primitive-array form: no per-gram Long boxing on the hot path
    UnsafeArrayData.fromPrimitiveArray(out)
  }
}
