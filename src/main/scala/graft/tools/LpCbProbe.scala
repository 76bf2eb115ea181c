package graft.tools

import org.apache.spark.sql.functions._

object LpCbProbe {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[4]").appName("probe")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", false).getOrCreate()
    val dir = java.nio.file.Files.createTempDirectory("lpcb").toString
    graft.sources.RealXdrFixture.writeClassicBatchTree(dir, 3300, 3303)
    val ledgers = graft.sources.LcmBatchFiles.ledgerRows(spark, dir)
    graft.operators.StellarTradesEffects.historyEffects(ledgers)
      .select(col("operation_id"), col("index"), col("type"),
        col("type_string"), col("address"),
        to_json(col("details")).as("details"))
      .orderBy("operation_id", "index")
      .collect().foreach(r => println("ROW|" + r.mkString("|")))
    spark.stop()
  }
}
