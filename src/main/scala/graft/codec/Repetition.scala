package graft.codec

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.unsafe.types.UTF8String

/** The Gopher REPETITION rule family (Rae et al., "Scaling Language
  * Models: … Gopher", 2021, Table A1 — the half of §A1.1 the word/line
  * grain rules in [[graft.operators.TextAnalysis.gopherRules]] don't
  * cover), as ONE compiled pass per document returning 13 exact-integer
  * millifractions:
  *
  *   [0] dup_line_frac        – line occurrences whose value occurs ≥ 2,
  *                              over all lines
  *   [1] dup_line_char_frac   – their characters, over all line characters
  *   [2] dup_para_frac        – same at paragraph grain
  *   [3] dup_para_char_frac
  *   [4..6]  top{2,3,4}_char_frac – characters of the MOST COMMON word
  *                              k-gram (count × Σ word chars; ties break
  *                              to the UTF-8-byte-smallest gram, the
  *                              order any SQL engine's string min gives),
  *                              over all word characters
  *   [7..12] dup{5..10}_char_frac – characters of word positions COVERED
  *                              by at least one k-gram occurring ≥ 2
  *                              (a position union, so overlapping
  *                              duplicate grams never double-count),
  *                              over all word characters
  *
  * Shared exact laws (any engine replays them relationally):
  *   - words   = `\s+`-split non-empty tokens of the RAW text (repetition
  *               is case-sensitive — no folding);
  *   - lines   = `\n`-split, trimmed of [ \t\r\n], non-empty;
  *   - paragraphs = `\n\n`-split (literal), trimmed the same way;
  *   - character counts are CODEPOINTS (UTF8String.numChars ≡ SQL
  *     length()), word-gram characters exclude the joining spaces;
  *   - every fraction is `1000·num div max(den, 1)` in integers.
  *
  * Single pass, O(Σk · words) with small hash maps — the fused-native
  * shape the r16/r17 lessons mandate for per-row loops this wide. */
object Repetition {

  private val TopKs = Array(2, 3, 4)
  private val DupKs = Array(5, 6, 7, 8, 9, 10)

  /** millifraction helper: 1000·num div max(den,1) in Long space. */
  private def mill(num: Long, den: Long): Long =
    num * 1000L / math.max(den, 1L)

  private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\r' || c == '\n'

  private def trimWs(s: String): String = {
    var a = 0; var b = s.length
    while (a < b && isWs(s.charAt(a))) a += 1
    while (b > a && isWs(s.charAt(b - 1))) b -= 1
    s.substring(a, b)
  }

  private def codepoints(s: String): Long =
    s.codePointCount(0, s.length).toLong

  /** UTF-8 byte-order comparison — the collation SQL engines use for
    * string min/max, which Java's UTF-16 compareTo diverges from on
    * supplementary planes. */
  private def utf8Less(a: String, b: String): Boolean = {
    val x = a.getBytes(StandardCharsets.UTF_8)
    val y = b.getBytes(StandardCharsets.UTF_8)
    val n = math.min(x.length, y.length)
    var i = 0
    while (i < n) {
      val d = (x(i) & 0xff) - (y(i) & 0xff)
      if (d != 0) return d < 0
      i += 1
    }
    x.length < y.length
  }

  /** Duplicated-value occurrence and char mass of a segment list:
    * (occurrences with count ≥ 2, their codepoints, total, total chars). */
  private def dupMass(segs: Array[String]): (Long, Long, Long, Long) = {
    val counts = new java.util.HashMap[String, Int]()
    var total = 0L; var totalChars = 0L
    segs.foreach { s =>
      counts.merge(s, 1, Integer.sum)
      total += 1; totalChars += codepoints(s)
    }
    var dupOcc = 0L; var dupChars = 0L
    segs.foreach { s =>
      if (counts.get(s) >= 2) { dupOcc += 1; dupChars += codepoints(s) }
    }
    (dupOcc, dupChars, total, totalChars)
  }

  /** The 13-slot millifraction profile (see object doc for the layout). */
  def profile(text: UTF8String): ArrayData = {
    val raw = text.toString
    val out = new Array[Long](4 + TopKs.length + DupKs.length)

    val lines = raw.split("\n", -1).map(trimWs).filter(_.nonEmpty)
    val (lDup, lDupC, lTot, lTotC) = dupMass(lines)
    out(0) = mill(lDup, lTot)
    out(1) = mill(lDupC, lTotC)

    val paras = raw.split("\n\n", -1).map(trimWs).filter(_.nonEmpty)
    val (pDup, pDupC, pTot, pTotC) = dupMass(paras)
    out(2) = mill(pDup, pTot)
    out(3) = mill(pDupC, pTotC)

    val words = raw.split("\\s+", -1).filter(_.nonEmpty)
    val wChars = words.map(codepoints)
    val totalWordChars = wChars.sum

    TopKs.zipWithIndex.foreach { case (k, slot) =>
      if (words.length >= k) {
        // count + char mass per k-gram; top by (count, utf8-min gram)
        val counts = new java.util.HashMap[String, Array[Long]]()
        var p = 0
        while (p + k <= words.length) {
          val gram = words.slice(p, p + k).mkString(" ")
          var mass = 0L
          var i = p; while (i < p + k) { mass += wChars(i); i += 1 }
          val e = counts.computeIfAbsent(gram, _ => Array(0L, mass))
          e(0) += 1
          p += 1
        }
        var bestGram: String = null; var bestCnt = 0L; var bestMass = 0L
        counts.forEach { (g, e) =>
          if (e(0) > bestCnt || (e(0) == bestCnt && utf8Less(g, bestGram))) {
            bestGram = g; bestCnt = e(0); bestMass = e(1)
          }
        }
        out(4 + slot) = mill(bestCnt * bestMass, totalWordChars)
      } // else 0 — fewer words than the gram needs
    }

    DupKs.zipWithIndex.foreach { case (k, slot) =>
      if (words.length >= k) {
        val counts = new java.util.HashMap[String, Int]()
        val grams = new Array[String](words.length - k + 1)
        var p = 0
        while (p + k <= words.length) {
          val g = words.slice(p, p + k).mkString(" ")
          grams(p) = g
          counts.merge(g, 1, Integer.sum)
          p += 1
        }
        val covered = new Array[Boolean](words.length)
        p = 0
        while (p < grams.length) {
          if (counts.get(grams(p)) >= 2) {
            var i = p; while (i < p + k) { covered(i) = true; i += 1 }
          }
          p += 1
        }
        var covChars = 0L
        var i = 0
        while (i < words.length) {
          if (covered(i)) covChars += wChars(i); i += 1
        }
        out(4 + TopKs.length + slot) = mill(covChars, totalWordChars)
      }
    }

    new GenericArrayData(out)
  }
}
