package graft.codec

import org.apache.spark.unsafe.types.UTF8String

/** SimHash-64 fingerprint, fused: normalize (lowercase, collapse
  * whitespace, trim) → split → per-token sha-256 → 64 bit votes → sign
  * fold, in one compiled pass per document.
  *
  * Replaces the higher-order column formulation in
  * [[graft.operators.Dedup.simHash64]]'s original form (a `transform` over
  * 64 bit indices each `aggregate`-folding the whole token-hash array —
  * O(64·T) interpreted boxed lambdas per document; measured ~25 s for a
  * 5 000-doc cold pass that this loop does in well under a second).
  * Semantics are bit-identical to the column version and to the DuckDB
  * oracle of `x_simhash`/`x_simhash_pairs`: same normalization law as
  * [[Shingles]] (`UTF8String.toLowerCase` is Spark's `lower`, the `\s+`
  * pattern is the one `regexp_replace` compiles, `trim` matches the
  * collapsed-whitespace edges), token hash = the first 16 hex chars of
  * sha-256 (i.e. the first 8 digest bytes, big-endian) as a signed long,
  * vote +1/−1 per bit, fingerprint bit set iff the vote sum is > 0. */
object SimHashCodec {

  private val ws = java.util.regex.Pattern.compile("\\s+")

  def fingerprint(text: UTF8String): Long = {
    val norm = ws.matcher(text.toLowerCase.toString).replaceAll(" ").trim
    // limit -1 matches Spark split's trailing-empty behavior; a normalized
    // empty doc keeps its single "" token exactly like the column law
    val words = norm.split(" ", -1)
    val votes = new Array[Int](64)
    val md = java.security.MessageDigest.getInstance("SHA-256")
    var wi = 0
    while (wi < words.length) {
      val d = md.digest(words(wi).getBytes(java.nio.charset.StandardCharsets.UTF_8))
      md.reset()
      var h = 0L
      var i = 0
      while (i < 8) { h = (h << 8) | (d(i) & 0xffL); i += 1 }
      var b = 0
      while (b < 64) {
        votes(b) += (if (((h >>> b) & 1L) == 1L) 1 else -1)
        b += 1
      }
      wi += 1
    }
    var fp = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) fp |= 1L << b
      b += 1
    }
    fp
  }

  /** Winnowing fingerprint selection, fused ([[graft.operators.TextAnalysis
    * .winnowFingerprints]]'s law in one compiled pass): positional n-gram
    * windows (the [[Shingles.ngramWindows]] normalization), per-gram
    * sha63(gram, seed 0) — sha-256("gram:0"), first 8 bytes big-endian with
    * the top bit masked — then the minimum of every w-hash sliding window,
    * distinct in first-occurrence order. Docs with fewer than w windows
    * keep their global minimum. Replaces the transform/sequence/slice/
    * array_min HOF chain, whose per-window `slice` copied w-element arrays
    * interpreted (measured ~29 s for a 5 000-doc cold pass). */
  def winnowFingerprints(text: UTF8String, n: Int, w: Int): org.apache.spark.sql.catalyst.util.ArrayData = {
    val grams = Shingles.ngramWindows(text, n)
    val len = grams.numElements()
    val hs = new Array[Long](len)
    val md = java.security.MessageDigest.getInstance("SHA-256")
    var i = 0
    while (i < len) {
      val d = md.digest((grams.getUTF8String(i).toString + ":0")
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
      md.reset()
      var h = 0L
      var k = 0
      while (k < 8) { h = (h << 8) | (d(k) & 0xffL); k += 1 }
      hs(i) = h & 0x7fffffffffffffffL
      i += 1
    }
    val out = new java.util.LinkedHashSet[java.lang.Long]()
    if (len < w) {
      var m = Long.MaxValue
      i = 0
      while (i < len) { if (hs(i) < m) m = hs(i); i += 1 }
      out.add(m)
    } else {
      var j = 0
      while (j + w <= len) {
        var m = Long.MaxValue
        var k = j
        while (k < j + w) { if (hs(k) < m) m = hs(k); k += 1 }
        out.add(m)
        j += 1
      }
    }
    val arr = new Array[Any](out.size)
    val it = out.iterator()
    i = 0
    while (it.hasNext) { arr(i) = it.next().longValue(); i += 1 }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(arr)
  }
}
