package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Every catalog query must EXECUTE against the driver's smallest fixtures —
  * no AnalysisException, no runtime throw, rows >= 0. This is the tripwire
  * for input-schema drift: round 10 regenerated `events.parquet` with a
  * different `ts` physical type and five queries silently vanished from the
  * correctness gate because nothing in `sbt test` ever ran the catalog
  * end-to-end. Result VALUES are the DuckDB gate's job; this spec only
  * guarantees the gate gets a result to check.
  *
  * Skips (cleanly, per-test) when /root/testdata/sf0.001 is absent so the
  * suite still runs on machines without the driver's fixtures. */
class VerifySmokeSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val sfDir = sys.env.getOrElse("SPARK_GRAFT_SMOKE_DIR",
    "/root/testdata/sf0.001")
  private val haveData = new java.io.File(s"$sfDir/lineitem.parquet").exists()

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-verify-smoke")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  (QueryCatalog.all ++ QueryCatalog.entryOps).foreach { q =>
    test(s"catalog query ${q.name} executes at sf0.001") {
      assume(haveData, s"$sfDir not present; skipping")
      val n = q.fn(spark, sfDir).count()
      assert(n >= 0)
    }
  }

  test("SparkEntry.entry returns rows at sf0.001") {
    assume(haveData, s"$sfDir not present; skipping")
    assert(SparkEntry.entry(spark) != null)
  }

  test("every catalog query ships DuckDB oracle SQL (no silent rows-only checks)") {
    // a Q with no oracle degrades to the driver's weaker rows>0 check
    // without any visible signal — keep the 100%-oracle invariant loud
    val missing = (QueryCatalog.all ++ QueryCatalog.entryOps)
      .filter(_.oracle.isEmpty).map(_.name)
    assert(missing.isEmpty, s"queries without oracle SQL: $missing")
    // and the driver contract maps stay in lockstep with the catalog
    assert(SparkEntry.queries.keySet == SparkEntry.oracleSql.keySet)
  }
}
