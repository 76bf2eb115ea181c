package graft.codec

import java.text.Normalizer
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC (canonical composition) — the text-cleaning step that makes
  * byte-level laws honest on real-world text: 'é' arrives both precomposed
  * (U+00E9) and decomposed ('e' + U+0301) in web corpora, and every
  * byte-grain operator downstream (sha-256 content hashes, MinHash
  * shingles, SimHash tokens, sort keys) treats the two as DIFFERENT
  * documents unless the corpus is normalized first. NFC is the W3C-
  * recommended form for exactly this reason.
  *
  * The hot loop fast-paths via `Normalizer.isNormalized` — for the ASCII/
  * already-composed bulk of a corpus that is one linear scan with no
  * allocation; only strings that actually change pay the String round-trip.
  * NFC is standard-defined (the same code-point mapping in the JDK's ICU
  * lineage and DuckDB's utf8proc), which is what makes the law
  * cross-engine hash-checkable. */
object UnicodeNorm {
  def nfc(s: UTF8String): UTF8String = {
    // byte-level ASCII pre-check: all bytes < 0x80 means the string is
    // trivially NFC — return the input without ever decoding it, so the
    // ASCII bulk of a corpus really is one scan, zero allocation (calling
    // toString first would allocate a String per row just to ask
    // isNormalized)
    val n = s.numBytes
    var i = 0
    while (i < n && (s.getByte(i) & 0x80) == 0) i += 1
    if (i == n) return s
    val str = s.toString
    if (Normalizer.isNormalized(str, Normalizer.Form.NFC)) s
    else UTF8String.fromString(Normalizer.normalize(str, Normalizer.Form.NFC))
  }
}
