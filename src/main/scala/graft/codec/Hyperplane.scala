package graft.codec

import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}

/** Deterministic Rademacher hyperplane tables for LSH bucketing.
  *
  * Component (table t, plane p, dim d) is ±1 from the parity of the first
  * hex char of sha-256("t:p:d") — bit-identical on any engine (JVM, DuckDB),
  * which is what makes the LSH candidate sets hash-oracle-checkable. The
  * reference point for the analytics semantics is the MinHash/SimHash band
  * family in `/root/reference/internal/transform` — this is the
  * embedding-space analog used by the training-data dedup path.
  *
  * [[buckets]] is the per-row hot loop: all `tables` bucket ids of one
  * quantized vector in a single pass (tables×bits×dim fused multiply-adds
  * over primitive longs). Exposed as a static call so the native Catalyst
  * expression ([[graft.plans.HyperplaneBucketsExpression]]) stays inside
  * whole-stage codegen — the higher-order-function formulation this
  * replaces ran interpreted, one plane per expression tree. */
object Hyperplane {

  /** ±1 from sha-256 parity; the cross-engine plane-sign contract. */
  def planeSign(t: Int, p: Int, d: Int): Long = {
    val md = java.security.MessageDigest.getInstance("SHA-256")
    val h = md.digest(s"$t:$p:$d".getBytes(java.nio.charset.StandardCharsets.UTF_8))
    if (((h(0) >> 4) & 1) == 0) 1L else -1L
  }

  private val cache = new java.util.concurrent.ConcurrentHashMap[
    (Int, Int, Int), Array[Array[Long]]]()

  /** Sign rows for all (t, p) planes, flattened as row t*bits+p, keyed and
    * memoized per (dim, bits, tables) — one sha-256 sweep per JVM, then
    * pure array reads. */
  def signTable(dim: Int, bits: Int, tables: Int): Array[Array[Long]] =
    cache.computeIfAbsent((dim, bits, tables), _ =>
      Array.tabulate(tables * bits) { i =>
        val t = i / bits
        val p = i % bits
        Array.tabulate(dim)(d => planeSign(t, p, d))
      })

  /** All `tables` LSH bucket ids of one quantized vector: bit p of bucket t
    * is sign(<v, plane(t,p)>). Dimension is taken from the vector itself, so
    * ragged inputs can't silently zero a bit (the old `zip_with` literal
    * formulation null-padded instead). */
  def buckets(v: ArrayData, bits: Int, tables: Int): ArrayData = {
    val dim = v.numElements()
    val st = signTable(dim, bits, tables)
    val out = new Array[Long](tables)
    var t = 0
    while (t < tables) {
      var b = 0L
      var p = 0
      while (p < bits) {
        val s = st(t * bits + p)
        var acc = 0L
        var d = 0
        while (d < dim) {
          acc += v.getLong(d) * s(d)
          d += 1
        }
        if (acc > 0) b |= 1L << p
        p += 1
      }
      out(t) = b
      t += 1
    }
    new GenericArrayData(out)
  }
}
