package graft.codec

import org.apache.spark.sql.catalyst.util.ArrayData

/** Primitive-long vector kernels for the quantized-embedding operators.
  *
  * The dedup/ANN family scores candidates with an exact integer dot product
  * over ×10⁴-quantized vectors (see [[graft.operators.Dedup.cosineDupPairs]]).
  * The higher-order `aggregate(zip_with(...))` formulation of that product
  * runs INTERPRETED — lambda functions break whole-stage codegen — and at
  * ~130 k candidates × 64 dims it dominated the embedding-LSH wall-clock.
  * These static loops back the native codegen'd
  * [[graft.plans.LongDotExpression]] instead: one fused multiply-add pass
  * over primitive longs, no per-element boxing, no array allocation.
  *
  * Semantics match the HOF/oracle formulation on equal-length vectors (the
  * only shape the operators produce); ragged inputs score the common prefix
  * rather than null-poisoning the row. */
object LongVec {

  /** Σ a[i]·b[i] over the common prefix of two long arrays. */
  def dot(a: ArrayData, b: ArrayData): Long = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0L
    var i = 0
    while (i < n) {
      acc += a.getLong(i) * b.getLong(i)
      i += 1
    }
    acc
  }

  /** Asymmetric-distance sweep of one PQ-coded neighbor against a query's
    * per-subspace lookup table: Σ_s lut[s][codes[s]] — m int-indexed long
    * lookups + adds, the inner loop of the ADC search
    * ([[graft.operators.Similarity.searchPqIndexExact]]). Same law as the
    * `zip_with(codes, lut, (c, l) => element_at(l, c+1)) → aggregate` HOF
    * tree it replaces, fused into one compiled pass. */
  def adcDist(codes: ArrayData, lut: ArrayData): Long = {
    val m = math.min(codes.numElements(), lut.numElements())
    var acc = 0L
    var i = 0
    while (i < m) {
      acc += lut.getArray(i).getLong(codes.getInt(i))
      i += 1
    }
    acc
  }

  /** Strict-< earliest-wins argmin of the exact integer L2 distance from
    * `v` to each of `nCells` centroids (flattened row-major into
    * `centFlat`, dim = centFlat.length / nCells) — the IVF cell-assignment
    * law ([[graft.operators.Similarity.buildIvfIndexExact]]). The
    * `aggregate(array(struct(dist, cell)...))` HOF fold it replaces ran
    * interpreted per corpus row (nCells × dim lambda evaluations). */
  def l2Argmin(v: ArrayData, centFlat: Array[Long], nCells: Int): Long = {
    val dim = centFlat.length / nCells
    val n = math.min(v.numElements(), dim)
    var best = Long.MaxValue
    var bestCell = 0
    var c = 0
    while (c < nCells) {
      val off = c * dim
      var d = 0L
      var i = 0
      while (i < n) {
        val diff = v.getLong(i) - centFlat(off + i)
        d += diff * diff
        i += 1
      }
      if (d < best) { best = d; bestCell = c }
      c += 1
    }
    bestCell.toLong
  }

  /** PQ encode: per subspace s, the strict-< earliest-wins argmin of the
    * exact integer L2 distance from the subvector v[s·dsub, (s+1)·dsub) to
    * codeword j (codebooks flattened row-major: entry ((s·codewords+j)·dsub
    * + i)). Returns the m-length int code array — the whole per-row encode
    * in one compiled pass instead of m × codewords interpreted HOF folds
    * ([[graft.operators.Similarity.buildPqIndexExact]]). */
  def pqEncode(v: ArrayData, cbFlat: Array[Long], m: Int,
      codewords: Int): ArrayData = {
    val dsub = cbFlat.length / (m * codewords)
    val codes = new Array[Int](m)
    var s = 0
    while (s < m) {
      var best = Long.MaxValue
      var bestJ = 0
      var j = 0
      while (j < codewords) {
        val off = (s * codewords + j) * dsub
        var d = 0L
        var i = 0
        while (i < dsub) {
          val diff = v.getLong(s * dsub + i) - cbFlat(off + i)
          d += diff * diff
          i += 1
        }
        if (d < best) { best = d; bestJ = j }
        j += 1
      }
      codes(s) = bestJ
      s += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(codes)
  }

  /** A query's full PQ ADC lookup table in one pass: lut[s][j] = exact
    * integer L2 distance from subvector v[s·dsub, (s+1)·dsub) to codeword
    * (s, j) (codebooks flattened as in [[pqEncode]]). One expression node
    * instead of an m × codewords fan of interpreted HOF folds — the fan's
    * dominant cost was not row throughput (queries are few) but CATALYST
    * plan latency: analysis/optimization/codegen of the giant tree. */
  def pqLut(v: ArrayData, cbFlat: Array[Long], m: Int,
      codewords: Int): ArrayData = {
    val dsub = cbFlat.length / (m * codewords)
    val rows = new Array[Any](m)
    var s = 0
    while (s < m) {
      val lut = new Array[Long](codewords)
      var j = 0
      while (j < codewords) {
        val off = (s * codewords + j) * dsub
        var d = 0L
        var i = 0
        while (i < dsub) {
          val diff = v.getLong(s * dsub + i) - cbFlat(off + i)
          d += diff * diff
          i += 1
        }
        lut(j) = d
        j += 1
      }
      rows(s) = new org.apache.spark.sql.catalyst.util.GenericArrayData(lut)
      s += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(rows)
  }

  /** The `nprobe` nearest centroid cells of a query vector, ordered by
    * (exact integer L2 distance, cell id) ascending — the same law as
    * sorting the (dist, cell) structs and slicing, without the nCells-wide
    * interpreted expression fan. */
  def l2ProbeCells(v: ArrayData, centFlat: Array[Long], nCells: Int,
      nprobe: Int): ArrayData = {
    val dim = centFlat.length / nCells
    val n = math.min(v.numElements(), dim)
    val dists = new Array[Long](nCells)
    var c = 0
    while (c < nCells) {
      val off = c * dim
      var d = 0L
      var i = 0
      while (i < n) {
        val diff = v.getLong(i) - centFlat(off + i)
        d += diff * diff
        i += 1
      }
      dists(c) = d
      c += 1
    }
    val order = Array.range(0, nCells)
      .sortBy(c => (dists(c), c)).take(math.min(nprobe, nCells))
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      order.map(_.toLong))
  }

  /** Σ a[i]² — the squared L2 norm of a quantized vector. */
  def norm2(a: ArrayData): Long = {
    val n = a.numElements()
    var acc = 0L
    var i = 0
    while (i < n) {
      val x = a.getLong(i)
      acc += x * x
      i += 1
    }
    acc
  }
}
