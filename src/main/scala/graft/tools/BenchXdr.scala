package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import com.fasterxml.jackson.databind.ObjectMapper

/** Decode-throughput benchmark for the real-XDR backfill path: replicates
  * the reference's ten-ledger mainnet golden (650 real transactions, 2085
  * operations, full tx meta + fee meta) N× into a frame DataFrame — each
  * copy keeps its byte-exact blobs, so the decoder does full real-world
  * work per row — then measures [[graft.operators.RealXdrSource.ledgerRows]]
  * feeding each history transform end to end (decode + transform + count,
  * executor-side, no driver decode):
  *
  *   - `transactions` / `operations` (the map-only spine)
  *   - `effects` / `token_transfers` (the flat-map-heavy fan-outs)
  *
  * Prints one JSON line per phase with seconds and tx/s — the numbers a
  * full-history backfill planner needs. The reference processes the same
  * grain row-at-a-time in a single Go process; this path is
  * partition-parallel, so cluster throughput scales with executors on top
  * of the per-core figure printed here.
  *
  * Usage: `sbt "runMain graft.tools.BenchXdr [replication] [--scale-check]"`
  * (default 100 → 65 000 txs). With `--scale-check` the suite ALSO runs at
  * replication/10 first and REQUIRES near-linear scaling: tx/s at N must
  * hold at least half the tx/s at N/10 for every phase (a super-linear
  * blow-up — shuffle, skew, driver collect — fails the run loudly).
  */
object BenchXdr {
  def main(args: Array[String]): Unit = {
    val n = args.find(a => !a.startsWith("--")).map(_.toInt).getOrElse(100)
    val scaleCheck = args.contains("--scale-check")
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
            (t.get("tx_envelope").asText(), t.get("tx_result").asText(),
              t.get("tx_meta").asText(), t.get("tx_fee_meta").asText())))
      }
      import spark.implicits._
      val base = frames.toDF("ledger_header", "raw")

      /** One measured suite at a replication factor → tx/s per phase. */
      def run(k: Int): Map[String, Double] = {
        // N byte-identical copies; the decode work per row is the real work
        val replicated = base
          .crossJoin(spark.range(k.toLong).toDF("copy"))
          .select(col("ledger_header"),
            transform(col("raw"), t =>
              struct(t("_1").as("tx_envelope"), t("_2").as("tx_result"),
                t("_3").as("tx_meta"), t("_4").as("tx_fee_meta")))
              .as("transactions"))
          .repartition(32)
          .persist(org.apache.spark.storage.StorageLevel.DISK_ONLY)
        val nFrames = replicated.count() // materialize input
        val rows = graft.operators.RealXdrSource.ledgerRows(replicated)
        def phase(name: String, count: => Long): (String, Double) = {
          val t0 = System.nanoTime()
          val c = count
          val sec = (System.nanoTime() - t0) / 1e9
          val tps = 650L * k / sec
          println(f"""{"metric":"xdr_$name","replication":$k,""" +
            f""""frames":$nFrames,"rows":$c,"sec":$sec%.2f,""" +
            f""""tx_per_sec":$tps%.0f}""")
          name -> tps
        }
        val out = Map(
          phase("transactions",
            graft.operators.StellarTransforms.historyTransactions(rows).count()),
          phase("operations",
            graft.operators.StellarTransforms.historyOperations(rows).count()),
          phase("effects",
            graft.operators.StellarTradesEffects.historyEffects(rows).count()),
          phase("token_transfers",
            graft.operators.TokenTransfers.fromLedgers(rows).count()))
        replicated.unpersist()
        out
      }

      if (scaleCheck) {
        val small = run(math.max(1, n / 10))
        val big = run(n)
        big.foreach { case (name, tps) =>
          val ref = small(name)
          require(tps >= 0.5 * ref,
            f"$name throughput collapsed at $n×: $tps%.0f tx/s vs " +
              f"$ref%.0f tx/s at ${n / 10}× — sub-linear scaling")
          println(f"""{"metric":"xdr_scale_$name","small_tps":$ref%.0f,""" +
            f""""big_tps":$tps%.0f,"ratio":${tps / ref}%.2f}""")
        }
      } else run(n)
    } finally spark.stop()
  }
}
