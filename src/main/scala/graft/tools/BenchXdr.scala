package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import com.fasterxml.jackson.databind.ObjectMapper

/** Decode-throughput benchmark for the real-XDR backfill path: replicates
  * the reference's ten-ledger mainnet golden (650 real transactions, 2085
  * operations) N× into a frame DataFrame — each copy keeps its byte-exact
  * envelopes, so the decoder does full real-world work per row — then
  * measures [[graft.operators.RealXdrSource.ledgerRows]] feeding
  * `historyTransactions` and `historyOperations` end to end (decode +
  * transform + count, executor-side, no driver decode).
  *
  * Prints one JSON line: frames, transactions, operations, seconds, and
  * transactions/second — the number a full-history backfill planner needs.
  * The reference processes the same grain row-at-a-time in a single Go
  * process; this path is partition-parallel, so cluster throughput scales
  * with executors on top of the per-core figure printed here.
  *
  * Usage: sbt "runMain graft.tools.BenchXdr [replication]" (default 100 →
  * 65 000 txs).
  */
object BenchXdr {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(100)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .appName("graft-bench-xdr")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      val om = new ObjectMapper()
      def golden(fam: String, f: String) =
        scala.io.Source.fromFile(s"/root/reference/testdata/$fam/$f")
          .getLines().filter(_.trim.nonEmpty).map(om.readTree).toSeq
      val txs = golden("transactions", "10_ledgers_txs.golden")
        .groupBy(_.get("ledger_sequence").asLong())
        .view.mapValues(_.sortBy(_.get("id").asLong())).toMap
      val frames = golden("ledgers", "10_ledgers.golden").map { l =>
        val seq = l.get("sequence").asLong()
        (l.get("ledger_header").asText(),
          txs.getOrElse(seq, Nil).map(t =>
            (t.get("tx_envelope").asText(), t.get("tx_result").asText())))
      }
      import spark.implicits._
      val base = frames.toDF("ledger_header", "raw")
      // N byte-identical copies; the decode work per row is the real work
      val replicated = base
        .crossJoin(spark.range(n.toLong).toDF("copy"))
        .select(col("ledger_header"),
          transform(col("raw"), t =>
            struct(t("_1").as("tx_envelope"), t("_2").as("tx_result")))
            .as("transactions"))
        .repartition(32)
        .cache()
      val nFrames = replicated.count() // materialize input, warm cache
      val t0 = System.nanoTime()
      val rows = graft.operators.RealXdrSource.ledgerRows(replicated)
      val nTx = graft.operators.StellarTransforms
        .historyTransactions(rows).count()
      val nOps = graft.operators.StellarTransforms
        .historyOperations(rows).count()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"""{"metric":"xdr_decode","frames":$nFrames,""" +
        f""""transactions":$nTx,"operations":$nOps,""" +
        f""""sec":$sec%.2f,"tx_per_sec":${nTx / sec}%.0f}""")
    } finally spark.stop()
  }
}
