package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import graft.sources.LcmWriter

class LcmSourceSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .appName("graft-lcm-test")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private lazy val dir: String = {
    val d = java.nio.file.Files.createTempDirectory("lcm-test").toString
    LcmWriter.writeFixture(d, 1000, 1511, batchSize = 64) // 8 batch files
    d
  }

  test("history archive: checkpoint math and category paths match the layout") {
    import graft.sources.HistoryArchive._
    // checkpoints close at seq ≡ 63 (mod 64) (`utils/main.go:808-827`)
    assert(checkpointOf(63) == 63 && checkpointOf(64) == 127)
    assert(checkpointOf(100) == 127 && checkpointOf(127) == 127)
    assert(checkpointOf(128) == 191)
    assert(categoryPath("ledger", 0x001e84ffL) ==
      "ledger/00/1e/84/ledger-001e84ff.xdr.gz")
    assert(checkpointsFor(100, 300) == Seq(127, 191, 255, 319))
  }

  test("history archive: distributed read over the checkpoint layout") {
    import graft.sources.HistoryArchive
    val root = java.nio.file.Files.createTempDirectory("graft-archive").toString
    HistoryArchive.writeFixture(root, 1000, 1100)
    val ds = HistoryArchive.read(spark, root, 1010, 1080)
    // one task per checkpoint file
    assert(ds.rdd.getNumPartitions == HistoryArchive.checkpointsFor(1010, 1080).size)
    val rows = ds.collect().sortBy(_.sequence)
    assert(rows.map(_.sequence).toSeq == (1010L to 1080L))
    val r = rows.find(_.sequence == 1013).get
    assert(r.transactions.size == (1013 % 5) + 1)
    assert(r.transactions.head.fee_charged == 100L)
    assert(r.closed_at.getTime == 1700000000000L + 1013 * 5000L)
  }

  test("reads frames back with the declared schema and exact row content") {
    val df = spark.read.format("graft-lcm").load(dir)
    assert(df.columns.toSeq == Seq("sequence", "closed_at", "transactions"))
    assert(df.count() == 512)
    val r = df.where(col("sequence") === 1003).collect().head
    assert(r.getAs[java.sql.Timestamp]("closed_at").getTime ==
      1700000000000L + 1003 * 5000L)
    val txs = r.getSeq[org.apache.spark.sql.Row](r.fieldIndex("transactions"))
    assert(txs.size == (1003 % 5) + 1)
    assert(txs.head.getAs[Long]("fee_charged") == 100L)
    assert(txs.head.getAs[Int]("op_type") == (1003 % 27))
  }

  test("sequence range predicates prune whole batch files before reading") {
    val df = spark.read.format("graft-lcm").load(dir)
      .where(col("sequence") >= 1100 && col("sequence") < 1150)
    // 64-ledger batches starting at 1000: range [1100,1150) overlaps the
    // 1064-1127 and 1128-1191 files only
    val parts = df.rdd.getNumPartitions
    assert(parts == 2, s"expected 2 surviving batch files, got $parts partitions")
    assert(df.count() == 50)
    assert(df.agg(min("sequence"), max("sequence")).collect().head.toSeq ==
      Seq(1100L, 1149L))
  }

  test("column pruning reaches the reader (no tx decode for scalar queries)") {
    val df = spark.read.format("graft-lcm").load(dir).select("sequence")
    val schema = df.queryExecution.executedPlan.collectLeaves().head.schema
    assert(schema.fieldNames.toSeq == Seq("sequence"))
    assert(df.distinct().count() == 512)
  }

  test("nested tx array aggregates match the fixture law") {
    val df = spark.read.format("graft-lcm").load(dir)
    val total = df.select(
      sum(aggregate(col("transactions"), lit(0L), (acc, t) => acc + t("fee_charged")))
        .as("fees")).collect().head.getLong(0)
    // per ledger: nTx = seq%5+1 txs with fees 100,200,...  => 100 * n(n+1)/2
    val expect = (1000L to 1511L).map { s => val n = (s % 5) + 1; 100L * n * (n + 1) / 2 }.sum
    assert(total == expect)
  }
}
