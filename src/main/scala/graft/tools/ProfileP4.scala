package graft.tools

import org.apache.spark.sql.SparkSession
import graft.sources.LedgerFixtures
import graft.operators.{Effects, HistoryOps}

/** One-off timing breakdown for the slowest bench queries (dev tool). */
object ProfileP4 {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.read.parquet(s"$sfDir/lineitem.parquet").limit(1000).count()

    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[profile] $label%-30s ${(System.nanoTime() - t0) / 1e9}%8.3f s  ($n rows)")
    }

    time("ledgers (nested fixture)") {
      LedgerFixtures.ledgers(spark, sfDir).count()
    }
    time("ledgers again (no cache)") {
      LedgerFixtures.ledgers(spark, sfDir).count()
    }
    val ledgers = LedgerFixtures.ledgers(spark, sfDir)
    time("historyTransactions") {
      HistoryOps.historyTransactions(ledgers).count()
    }
    time("historyOperations") {
      HistoryOps.historyOperations(HistoryOps.historyTransactions(ledgers)).count()
    }
    time("effects (no orderBy)") {
      Effects.fromOperations(
        HistoryOps.historyOperations(HistoryOps.historyTransactions(ledgers))).count()
    }
    time("p4 catalog (with orderBy)") {
      val q = (QueryCatalogAccess.byName("p4_effects_flatmap"))
      q(spark, sfDir).count()
    }
    spark.stop()
  }
}

object QueryCatalogAccess {
  def byName(name: String): (SparkSession, String) => org.apache.spark.sql.DataFrame =
    (graft.QueryCatalog.all ++ graft.QueryCatalog.entryOps)
      .find(_.name == name).get.fn
}
