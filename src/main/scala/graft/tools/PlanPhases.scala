package graft.tools

import org.apache.spark.sql.SparkSession

/** Phase-level timing breakdown for one catalog query (dev tool):
  * plan construction → analysis → optimization → physical planning →
  * first execution (codegen + run) → steady-state rerun. Separates the
  * fixed Catalyst cost of a big expression tree from the data cost. */
object PlanPhases {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("stellar_effects_real_xdr")
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val fn = (graft.QueryCatalog.all ++ graft.QueryCatalog.entryOps)
      .find(_.name == name).getOrElse(sys.error(s"no query $name")).fn

    def phase[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[phase] $label%-22s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      r
    }

    for (round <- 1 to 3) {
      println(s"--- round $round ---")
      val df = phase("build (DSL)")(fn(spark, sfDir))
      val qe = df.queryExecution
      phase("analyze")(qe.analyzed)
      phase("optimize")(qe.optimizedPlan)
      phase("physical plan")(qe.executedPlan)
      val n = phase("execute (codegen+run)")(df.count())
      phase("recount same df")(df.count())
      phase("rerun (fresh df)")(fn(spark, sfDir).count())
      println(s"rows = $n")
      if (round == 1) {
        val p = qe.executedPlan.toString
        println("plan nodes: " + p.linesIterator.map(_.trim.takeWhile(_ != ' '))
          .filter(_.nonEmpty).take(40).mkString(" | "))
        println("codegen spans: " +
          p.linesIterator.count(_.contains("WholeStageCodegen")))
      }
    }
    spark.stop()
  }
}
