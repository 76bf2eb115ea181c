package graft.codec

import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.unsafe.types.UTF8String

/** Word-shingle extraction, fused: normalize (lowercase, collapse
  * whitespace, trim) → split → n-gram windows → order-preserving distinct,
  * in one compiled pass per document.
  *
  * Replaces the chained higher-order `zip_with`/`filter`/`array_distinct`
  * column formulation, which ran interpreted per element and was
  * re-evaluated in every plan branch that consumed the gram array (explode
  * for the join, size for |A|, array_except for the df-cut). Semantics are
  * bit-identical to the column version — `UTF8String.toLowerCase` is
  * Spark's own `lower`, the regex is the same `\s+` Java pattern
  * `regexp_replace` compiles, and first-occurrence order matches
  * `array_distinct` — so the DuckDB shingle oracles keep hash-matching. */
object Shingles {

  private val ws = java.util.regex.Pattern.compile("\\s+")

  /** Distinct word n-grams of `text`; docs shorter than n words keep their
    * single whole-doc shingle (the windowed definition's i=0 window). */
  def ngrams(text: UTF8String, n: Int): ArrayData = {
    val norm = ws.matcher(text.toLowerCase.toString).replaceAll(" ").trim
    val words = norm.split(" ", -1)
    val out = new java.util.LinkedHashSet[UTF8String]()
    if (words.length < n) {
      out.add(UTF8String.fromString(norm))
    } else if (n == 1) {
      var i = 0
      while (i < words.length) {
        out.add(UTF8String.fromString(words(i)))
        i += 1
      }
    } else {
      val sb = new java.lang.StringBuilder()
      var i = 0
      while (i + n <= words.length) {
        sb.setLength(0)
        var k = 0
        while (k < n) {
          if (k > 0) sb.append(' ')
          sb.append(words(i + k))
          k += 1
        }
        out.add(UTF8String.fromString(sb.toString))
        i += 1
      }
    }
    val arr = new Array[AnyRef](out.size)
    val it = out.iterator()
    var i = 0
    while (it.hasNext) { arr(i) = it.next(); i += 1 }
    new GenericArrayData(arr)
  }

  /** POSITIONAL word n-gram windows: element `i` (0-based) is the n-gram
    * starting at word offset `i` — NO dedup, so `posexplode` over the
    * result yields true word offsets. Same normalization and same
    * shorter-than-n fallback (one whole-doc window at offset 0) as
    * [[ngrams]]; used by the substring-duplication span finder, where the
    * offset of every window matters. */
  def ngramWindows(text: UTF8String, n: Int): ArrayData = {
    val norm = ws.matcher(text.toLowerCase.toString).replaceAll(" ").trim
    val words = norm.split(" ", -1)
    if (words.length < n) {
      new GenericArrayData(Array[AnyRef](UTF8String.fromString(norm)))
    } else {
      val m = words.length - n + 1
      val arr = new Array[AnyRef](m)
      val sb = new java.lang.StringBuilder()
      var i = 0
      while (i < m) {
        sb.setLength(0)
        var k = 0
        while (k < n) {
          if (k > 0) sb.append(' ')
          sb.append(words(i + k))
          k += 1
        }
        arr(i) = UTF8String.fromString(sb.toString)
        i += 1
      }
      new GenericArrayData(arr)
    }
  }
}
