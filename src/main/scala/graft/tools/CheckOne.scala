package graft.tools
import org.apache.spark.sql.SparkSession
object CheckOne {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", false).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.01"
    val names = args.toSeq
    val qs = (graft.QueryCatalog.all ++ graft.QueryCatalog.entryOps).filter(q => names.contains(q.name))
    qs.foreach { q =>
      val df = q.fn(spark, dir)
      df.coalesce(1).write.mode("overwrite").parquet(s"/tmp/checkone/${q.name}.parquet")
      q.oracle.foreach(sql => java.nio.file.Files.write(
        java.nio.file.Paths.get(s"/tmp/checkone/${q.name}.sql"), sql.getBytes("UTF-8")))
      println(s"[checkone] ${q.name} rows=" + df.count())
    }
    spark.stop()
  }
}
