package graft.tools

import org.apache.spark.sql.functions._

/** Dev probe: split stellar_soroban_real_ops cost into plan/codegen vs
  * execution by running the identical query twice in one session. */
object OpsLatencyProbe {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[8]").appName("probe")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", false).getOrCreate()
    val dir = java.nio.file.Files.createTempDirectory("opslat").toString
    graft.sources.RealXdrFixture.writeBatchTree(dir, 3000, 3127)
    def run(): Long = {
      val t0 = System.nanoTime()
      val df = graft.operators.StellarTransforms.historyOperations(
        graft.sources.LcmBatchFiles.ledgerRowsForRange(spark, dir, 3000, 3127))
      df.where(col("type") === 24)
        .select(col("id"), to_json(col("details")).as("dj"))
        .orderBy("id").collect()
      (System.nanoTime() - t0) / 1000000
    }
    // decode-only baseline: same source, trivial projection
    def runDecodeOnly(): Long = {
      val t0 = System.nanoTime()
      graft.sources.LcmBatchFiles.ledgerRowsForRange(spark, dir, 3000, 3127)
        .select(col("sequence")).collect()
      (System.nanoTime() - t0) / 1000000
    }
    println(s"PROBE decodeOnly1=${runDecodeOnly()}ms decodeOnly2=${runDecodeOnly()}ms")
    println(s"PROBE full1=${run()}ms full2=${run()}ms full3=${run()}ms")
    // split: analysis+optimization+physical planning vs execution
    def split(withJson: Boolean = true): Unit = {
      val t0 = System.nanoTime()
      val df = graft.operators.StellarTransforms.historyOperations(
        graft.sources.LcmBatchFiles.ledgerRowsForRange(spark, dir, 3000, 3127),
        withDetailsJson = withJson)
        .where(col("type") === 24)
        .select(col("id"), to_json(col("details")).as("dj"))
        .orderBy("id")
      val plan = df.queryExecution.executedPlan // forces analyze+optimize+plan
      val t1 = System.nanoTime()
      df.collect()
      val t2 = System.nanoTime()
      println(s"PROBE withJson=$withJson plan=${(t1 - t0) / 1000000}ms " +
        s"exec=${(t2 - t1) / 1000000}ms planNodes=${plan.toString.length}")
    }
    split(); split(); split(withJson = false); split(withJson = false)
    spark.stop()
  }
}
