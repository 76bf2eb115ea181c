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
