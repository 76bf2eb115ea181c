package graft.codec

import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.unsafe.types.UTF8String

/** Fused BPE apply — the ordered-merge-list law of
  * [[graft.operators.Bpe]] in ONE compiled pass per word.
  *
  * The DataFrame formulation chains one projection per merge rule, which
  * at a realistic 32k-rule vocabulary is a 32k-deep expression tree —
  * the Catalyst plan-latency blowup class this repo has measured four
  * times (pq_encode / simhash / winnow / the r16 PQ LUT). Here the rule
  * list rides the expression as one reference object and the whole sweep
  * is a per-row loop.
  *
  * LAW EQUIVALENCE with [[graft.operators.Bpe.mergeSyms]]: rules apply in
  * rank order, each as one greedy left-to-right non-overlapping pass. A
  * merged symbol can never be the LEFT side of a later match in the same
  * pass (the string-replace law resumes scanning after the replacement,
  * and `ab` ≠ `a` since `b` is non-empty), so the array scan that merges
  * at j and resumes at j+2 is exactly the render→replace→split law —
  * including the self-overlap case ("aaa" under (a,a) → [aa, a]). */
object BpeCodec {

  /** Segment one word: per-CODEPOINT symbols (surrogate pairs whole — the
    * twin of `regexp_extract_all(word, '.')`), then the ordered merges.
    * `rules` is the flattened pair list [a0, b0, a1, b1, …] in rank order.
    *
    * A conservative presence set skips rules whose symbols cannot occur
    * in the current sequence (merges only ADD symbols, so a stale entry
    * costs a no-op scan, never a wrong merge): effective work is
    * O(chars + firing rules · length), not O(K · length). */
  def segmentWord(word: UTF8String, rules: Array[String]): ArrayData = {
    val s = word.toString
    var cur = new java.util.ArrayList[String](math.max(s.length, 1))
    var i = 0
    while (i < s.length) {
      val n = Character.charCount(s.codePointAt(i))
      cur.add(s.substring(i, i + n))
      i += n
    }
    val present = new java.util.HashSet[String](cur)
    var r = 0
    while (r < rules.length && cur.size > 1) {
      val a = rules(r)
      val b = rules(r + 1)
      if (present.contains(a) && present.contains(b)) {
        var j = 0
        var out: java.util.ArrayList[String] = null
        while (j < cur.size) {
          if (j + 1 < cur.size && cur.get(j) == a && cur.get(j + 1) == b) {
            if (out == null) {
              out = new java.util.ArrayList[String](cur.size)
              var p = 0
              while (p < j) { out.add(cur.get(p)); p += 1 }
            }
            out.add(a + b)
            present.add(a + b)
            j += 2
          } else {
            if (out != null) out.add(cur.get(j))
            j += 1
          }
        }
        if (out != null) cur = out
      }
      r += 2
    }
    val arr = new Array[Any](cur.size)
    var t = 0
    while (t < cur.size) { arr(t) = UTF8String.fromString(cur.get(t)); t += 1 }
    new GenericArrayData(arr)
  }
}
