package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import graft.operators.Stats

class StatsSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .appName("graft-stats-test")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("observe metrics deliver attempted/successful/failed with the action") {
    import spark.implicits._
    @volatile var got: Map[String, Long] = Map.empty
    val stop = Stats.listen(spark) { m => got = m }
    try {
      val df = Seq((1L, true), (2L, true), (3L, false)).toDF("id", "ok")
      Stats.observed(df, "ok").collect()
      // listener fires asynchronously on the listener bus
      val deadline = System.currentTimeMillis() + 30000
      while (got.isEmpty && System.currentTimeMillis() < deadline) Thread.sleep(100)
      assert(got == Map("attempted" -> 3L, "successful" -> 2L, "failed" -> 1L))
    } finally stop()
  }
}
