package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import graft.operators.StellarTransforms
import graft.sources.StellarFixture

/** Golden-file e2e test, mirroring the reference's CLI golden harness
  * (`cmd/test_utils.go:22-169`): run the full pipeline over a fixed ledger
  * range, render NDJSON deterministically, compare against the checked-in
  * golden line-for-line. Regenerate with
  * `GRAFT_UPDATE_GOLDEN=1 sbt "testOnly graft.GoldenSpec"` (the reference's
  * `-update` flag). Comparison parses each line as JSON (SURVEY §7.3: float
  * formatting differs between JSON writers; parse-and-compare, don't
  * byte-compare). */
class GoldenSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .appName("graft-golden-test")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private val goldenDir = Paths.get("src/test/resources/golden")

  private def ndjsonLines(df: org.apache.spark.sql.DataFrame): Seq[String] = {
    val tmp = Files.createTempDirectory("golden-out").toString
    df.coalesce(1).write.mode("overwrite").json(tmp)
    val part = new java.io.File(tmp).listFiles()
      .filter(_.getName.endsWith(".json")).head
    scala.io.Source.fromFile(part).getLines().toSeq
  }

  private def checkGolden(name: String, df: org.apache.spark.sql.DataFrame): Unit = {
    val lines = ndjsonLines(df)
    val goldenPath = goldenDir.resolve(s"$name.golden")
    if (sys.env.contains("GRAFT_UPDATE_GOLDEN")) {
      Files.createDirectories(goldenDir)
      Files.writeString(goldenPath, lines.mkString("\n") + "\n")
      info(s"regenerated $goldenPath with ${lines.size} lines")
    } else {
      assert(Files.exists(goldenPath),
        s"missing golden $goldenPath — run with GRAFT_UPDATE_GOLDEN=1")
      val golden = scala.io.Source.fromFile(goldenPath.toFile).getLines().toSeq
      assert(lines.size == golden.size,
        s"$name: ${lines.size} lines vs golden ${golden.size}")
      // parse-and-compare (not byte-compare) per line
      val om = new com.fasterxml.jackson.databind.ObjectMapper()
      lines.zip(golden).zipWithIndex.foreach { case ((a, b), i) =>
        assert(om.readTree(a) == om.readTree(b), s"$name line $i differs")
      }
    }
  }

  test("history_transactions golden over ledgers 1000-1009") {
    checkGolden("history_transactions",
      StellarTransforms.historyTransactions(
          StellarFixture.ledgers(spark, 1000, 1009))
        .orderBy("id"))
  }

  test("history_ledgers golden over ledgers 1000-1009") {
    checkGolden("history_ledgers",
      StellarTransforms.historyLedgers(
          StellarFixture.ledgers(spark, 1000, 1009))
        .orderBy("sequence"))
  }

  test("history_operations golden over ledgers 1000-1009") {
    checkGolden("history_operations",
      StellarTransforms.historyOperations(
          StellarFixture.ledgers(spark, 1000, 1009))
        .orderBy("id"))
  }

  test("history_effects golden over ledgers 1000-1009") {
    // pins the full effect surface — addresses, 0-based ids, details JSON —
    // across every emitted family (CRUD, trades, sponsorship, LP, SAC)
    checkGolden("history_effects",
      graft.operators.StellarTradesEffects.historyEffects(
          StellarFixture.ledgers(spark, 1000, 1009))
        .orderBy("id"))
  }

  test("history_trades golden over ledgers 1000-1009") {
    checkGolden("history_trades",
      graft.operators.StellarTradesEffects.historyTrades(
          StellarFixture.ledgers(spark, 1000, 1009))
        .orderBy("history_operation_id", "order"))
  }
}
