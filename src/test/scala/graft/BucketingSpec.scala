package graft

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import graft.operators.Bucketing

/** Bucketed-layout proof: the same equi-join that shuffles both sides as
  * plain frames runs exchange-free over tables bucketed on the join key —
  * the write-time layout IS the optimization. */
class BucketingSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val warehouse = Files.createTempDirectory("graft-warehouse").toString

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-bucketing-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.warehouse.dir", warehouse)
    .config("spark.sql.autoBroadcastJoinThreshold", "-1") // force the shuffle shape
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("bucketed fact-fact join runs with zero exchange") {
    import spark.implicits._
    val tx = (0 until 1000).map(i => (i.toLong, s"tx$i")).toDF("txid", "tx_payload")
    val ops = (0 until 3000).map(i => ((i % 1000).toLong, s"op$i")).toDF("txid", "op_payload")

    // plain join: both sides exchange
    val plain = ops.join(tx, Seq("txid"))
    assert(plain.queryExecution.executedPlan.toString.contains("Exchange"))

    Bucketing.writeBucketed(tx, "tx_bucketed", buckets = 8, keys = Seq("txid"))
    Bucketing.writeBucketed(ops, "ops_bucketed", buckets = 8, keys = Seq("txid"))

    val joined = Bucketing.colocatedJoin(spark, "ops_bucketed", "tx_bucketed", Seq("txid"))
    val plan = joined.queryExecution.executedPlan.toString
    // the exchange is gone on BOTH sides (the write-time layout paid for
    // it); the per-bucket Sort remains — local, over presorted files
    assert(!plan.contains("Exchange"), plan.take(800))
    assert(plan.contains("Bucketed: true"), plan.take(800))
    assert(plan.contains("SelectedBucketsCount: 8 out of 8"), plan.take(800))
    assert(joined.count() == 3000)
    // row parity with the plain join
    assert(joined.groupBy("txid").count().orderBy("txid").collect().toSeq ==
      plain.groupBy("txid").count().orderBy("txid").collect().toSeq)

    // bucketed aggregation on the key: no exchange either
    val agg = spark.table("ops_bucketed").groupBy("txid").count()
    assert(!agg.queryExecution.executedPlan.toString.contains("Exchange"))

    // oneFilePerBucket pre-shuffles on the SAME Murmur3-pmod law the
    // bucket layout uses, so the 8 write tasks each own exactly one
    // bucket: exactly 8 part files, never a repartition(1) funnel
    val dir = new java.io.File(s"$warehouse/ops_bucketed")
    val parts = dir.listFiles().count(_.getName.startsWith("part-"))
    assert(parts == 8, s"expected one file per bucket, got $parts")
  }
}
