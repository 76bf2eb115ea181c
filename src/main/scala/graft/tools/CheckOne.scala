package graft.tools

import org.apache.spark.sql.SparkSession

/** Single-query correctness probe: run the named catalog queries at a small
  * scale factor, dump each result (one parquet file) and its oracle SQL to
  * /tmp/checkone/, ready for a DuckDB side-by-side — the fast inner loop
  * while iterating on one query, vs. the full `tools/check.py` gate.
  *
  *   sbt "runMain graft.tools.CheckOne x_asof_join x_range_join"
  *   # then compare /tmp/checkone/<name>.parquet against <name>.sql in DuckDB
  *
  * Env overrides: SF_DIR (default /root/testdata/sf0.01),
  * OUT_DIR (default /tmp/checkone). */
object CheckOne {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", false).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("SF_DIR", "/root/testdata/sf0.01")
    val out = sys.env.getOrElse("OUT_DIR", "/tmp/checkone")
    val names = args.toSet
    val qs = (graft.QueryCatalog.all ++ graft.QueryCatalog.entryOps)
      .filter(q => names.contains(q.name))
    val missing = names -- qs.map(_.name).toSet
    if (missing.nonEmpty) println(s"[checkone] unknown queries: $missing")
    qs.foreach { q =>
      val df = q.fn(spark, dir)
      df.coalesce(1).write.mode("overwrite").parquet(s"$out/${q.name}.parquet")
      q.oracle.foreach(sql => java.nio.file.Files.write(
        java.nio.file.Paths.get(s"$out/${q.name}.sql"), sql.getBytes("UTF-8")))
      println(s"[checkone] ${q.name} rows=" + df.count())
    }
    spark.stop()
  }
}
