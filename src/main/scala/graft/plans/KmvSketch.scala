package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** KMV (k-minimum-values) distinct-count sketch as a native Catalyst
  * aggregate (Bar-Yossef et al., "Counting distinct elements in a data
  * stream", RANDOM 2002; Beyer et al., SIGMOD 2007 for the unbiased
  * estimator): keep the k smallest DISTINCT hash values seen; since the
  * hashes are uniform on [0, 2⁶³), the k-th minimum h_k estimates the
  * distinct count as (k−1)·2⁶³/h_k.
  *
  * Why a `TypedImperativeAggregate` and not `collect_set` + `slice`:
  * collect_set moves EVERY distinct value through the shuffle (the thing a
  * sketch exists to avoid); this buffer is bounded at k longs per group
  * per partition, map-side combines (partial → merge like any native agg),
  * and the shuffle moves ≤ k·8 bytes per (partition, group). Unlike
  * HyperLogLog (`approx_count_distinct`), the k-minima OUTPUT is a pure
  * function of the input SET — deterministic, engine-independent, and
  * therefore hash-oracle-checkable: DuckDB re-derives the exact same k
  * smallest sha-derived hashes in SQL. Returns the ascending minima array
  * (`array<bigint>`, ≤ k values); the estimator law lives in SQL on top
  * ([[graft.operators.Stats.kmvEstimate]]).
  *
  * Input contract: a LongType hash column, uniform on [0, 2⁶³) — e.g.
  * [[graft.operators.Dedup.sha63]]. Nulls are skipped. */
case class KmvMinHashesAggregate(
    child: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]] {

  require(k >= 1, "KMV sketch needs k >= 1")

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  private def insert(b: java.util.TreeSet[java.lang.Long], v: Long): Unit =
    if (b.size < k) { b.add(v); () }
    else if (v < b.last()) { if (b.add(v)) { b.pollLast(); () } }

  override def update(b: java.util.TreeSet[java.lang.Long],
      input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) insert(b, v.asInstanceOf[Long])
    b
  }

  override def merge(b: java.util.TreeSet[java.lang.Long],
      o: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] = {
    o.forEach(v => insert(b, v))
    b
  }

  override def eval(b: java.util.TreeSet[java.lang.Long]): Any = {
    val out = new Array[Long](b.size)
    var i = 0
    val it = b.iterator() // TreeSet iterates ascending
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    new GenericArrayData(out)
  }

  override def serialize(b: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + 8 * b.size)
    bb.putInt(b.size)
    b.forEach(v => { bb.putLong(v); () })
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val b = new java.util.TreeSet[java.lang.Long]()
    var i = 0
    while (i < n) { b.add(bb.getLong); i += 1 }
    b
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a bigint hash column, got " + other)
  }
  override def children: Seq[Expression] = Seq(child)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): KmvMinHashesAggregate =
    copy(child = newChildren.head)
  override def withNewMutableAggBufferOffset(offset: Int): KmvMinHashesAggregate =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): KmvMinHashesAggregate =
    copy(inputAggBufferOffset = offset)
  override def prettyName: String = "kmv_min_hashes"
}
