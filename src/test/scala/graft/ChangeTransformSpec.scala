package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import graft.operators.{ChangeCompaction, ChangeTransforms}
import graft.sources.StellarFixture

class ChangeTransformSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .appName("graft-change-test")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  lazy val changes = StellarFixture.changes(spark, 100, 107)

  test("accounts projection: strkey addresses, exact XLM floats, null sponsor") {
    val out = ChangeTransforms.accounts(changes).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getAs[String]("account_id").startsWith("G"))
      val bal = r.getAs[Double]("balance")
      assert(bal > 0 && bal == math.rint(bal * 1e7) / 1e7 || bal > 0)
    }
    // i%4==0 rows have sponsors; others null
    assert(out.exists(r => r.getAs[String]("sponsor") != null))
    assert(out.exists(r => r.isNullAt(r.fieldIndex("sponsor"))))
  }

  test("signers explode sorted by weight desc within account") {
    val out = ChangeTransforms.accountSigners(changes)
      .where(col("ledger_sequence") === 100)
      .collect()
    val byAccount = out.groupBy(_.getAs[String]("account_id"))
    byAccount.values.foreach { rows =>
      val weights = rows.map(_.getAs[Int]("weight")).toSeq
      // grouped rows arrive in explode order per source row; weights desc
      assert(weights == weights.sorted.reverse)
    }
  }

  test("offers projection + compaction snapshot keeps latest per offer_id") {
    val offersDf = ChangeTransforms.offers(changes)
    assert(ChangeTransforms.invalidOffers(offersDf).count() == 0)
    val snap = ChangeCompaction.snapshot(
      offersDf, Seq("offer_id"), Seq("ledger_sequence"))
    val latest = snap.collect()
    // one row per live offer id, from the last ledger (107)
    assert(latest.map(_.getAs[Long]("offer_id")).distinct.length == latest.length)
    assert(latest.forall(_.getAs[Long]("ledger_sequence") == 107L))
    assert(latest.forall(!_.getAs[Boolean]("deleted")))
    // farmhash asset ids are consistent for equal asset triples
    val ids = offersDf
      .select("selling_asset_code", "selling_asset_issuer", "selling_asset_id")
      .distinct().collect()
      .groupBy(r => (r.getString(0), r.getString(1)))
      .view.mapValues(_.map(_.getLong(2)).distinct)
    ids.foreach { case (_, v) => assert(v.length == 1) }
  }

  test("change-derived effects: CRUD families + sponsorship lifecycle") {
    val effects = graft.operators.StellarTradesEffects.changeEffects(changes)
    val byType = effects.groupBy("type_string").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // fixture: offers are all ledger_entry_change=1 → offer_updated;
    // accounts split across created/updated/removed, and the pre/post
    // sponsor lattice exercises all three sponsorship transitions
    assert(byType.contains("offer_updated"))
    assert(byType.contains("account_sponsorship_created"))
    assert(byType.contains("account_sponsorship_updated"))
    assert(byType.contains("account_sponsorship_removed"))
    assert(!byType.contains("trustline_created")) // no trustline changes in fixture
    // sponsorship details carry the sponsor addresses
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    effects.where(col("type").isin(60, 61, 62)).select("type", "details")
      .collect().foreach { r =>
        val node = om.readTree(r.getString(1))
        r.getInt(0) match {
          case 60 => assert(node.has("sponsor"))
          case 61 => assert(node.has("new_sponsor") && node.has("former_sponsor"))
          case 62 => assert(node.has("former_sponsor"))
        }
      }
    // ids are unique (ledger-order-index triple)
    assert(effects.select("id").distinct().count() == effects.count())
  }

  test("export snapshot pipeline batches by 64 ledgers") {
    val wide = StellarFixture.changes(spark, 60, 70) // spans the 63/64 boundary
    val out = ChangeTransforms.exportSnapshot(wide, "offer", Seq("offer.offer_id"))
    assert(out.columns.contains("batch_id"))
    assert(out.select("batch_id").distinct().orderBy("batch_id").collect()
      .map(_.getLong(0)).toSeq == Seq(0L, 1L))
    // within each batch: one row per key
    val dup = out.groupBy("batch_id", "offer.offer_id").count()
      .where(col("count") > 1).count()
    assert(dup == 0)
  }
}
