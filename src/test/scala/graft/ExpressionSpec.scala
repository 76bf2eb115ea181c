package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import graft.functions.GraftFunctions
import graft.plans.GraftExtensions

/** Native codec expressions: value parity with the scalar codecs, codegen
  * path exercised, SQL registration via extensions. */
class ExpressionSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .appName("graft-expr-test")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("native expressions match scalar codecs over many rows (codegen path)") {
    import spark.implicits._
    val df = (1 to 1000).map(i => s"payload-$i").toDF("s")
      .select(col("s"),
        GraftFunctions.farmHash64(col("s")).as("fh"),
        GraftFunctions.fnv64a(col("s")).as("fnv"),
        GraftFunctions.strkeyAccount(unhex(sha2(col("s"), 256))).as("sk"))
    df.collect().foreach { r =>
      val s = r.getString(0)
      assert(r.getLong(1) == graft.codec.Hashes.farmHash64(s))
      assert(r.getLong(2) == graft.codec.Hashes.fnv64a(s))
      assert(r.getString(3) ==
        graft.codec.Strkey.encodeAccountId(
          graft.codec.Hashes.sha256(s.getBytes("UTF-8"))))
    }
  }

  test("expressions stay inside whole-stage codegen (no UDF fence)") {
    import spark.implicits._
    val df = Seq("x").toDF("s").select(GraftFunctions.farmHash64(col("s")))
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("ScalaUDF"))
    assert(!plan.contains("BatchEvalPython"))
  }

  test("nulls propagate (null-intolerant)") {
    import spark.implicits._
    val df = Seq(Some("a"), None).toDF("s")
      .select(GraftFunctions.fnv64a(col("s")).as("h"))
    val rows = df.collect()
    assert(!rows(0).isNullAt(0))
    assert(rows(1).isNullAt(0))
  }

  test("SQL users can call the functions after extension registration") {
    GraftExtensions.register(spark)
    val out = spark.sql(
      "SELECT farm_hash64('abc') AS a, fnv64a('abc') AS b").head()
    assert(out.getLong(0) == graft.codec.Hashes.farmHash64("abc"))
    assert(out.getLong(1) == graft.codec.Hashes.fnv64a("abc"))
  }

  test("SQL: stellar_tx_hash / stellar_ledger_hash on real mainnet blobs") {
    GraftExtensions.register(spark)
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    val tx = om.readTree(scala.io.Source.fromFile(
      "/root/reference/testdata/transactions/10_ledgers_txs.golden")
      .getLines().next())
    val led = om.readTree(scala.io.Source.fromFile(
      "/root/reference/testdata/ledgers/single_ledger.golden")
      .getLines().next())
    val out = spark.sql(
      s"""SELECT stellar_tx_hash('${tx.get("tx_envelope").asText}') AS th,
         |       stellar_ledger_hash('${led.get("ledger_header").asText}') AS lh,
         |       strkey_account_key('${tx.get("account").asText}') AS k
         |""".stripMargin).head()
    assert(out.getString(0) == tx.get("transaction_hash").asText)
    assert(out.getString(1) == led.get("ledger_hash").asText)
    assert(out.getAs[Array[Byte]](2).length == 32)
  }

  test("SQL users can call the shingle and LSH-bucket expressions") {
    GraftExtensions.register(spark)
    val sh = spark.sql(
      "SELECT ngram_shingles('The  quick brown FOX', 2) AS g").head().getSeq[String](0)
    assert(sh == Seq("the quick", "quick brown", "brown fox"))
    val bk = spark.sql(
      "SELECT hyperplane_buckets(array(10000L, -10000L, 0L), 6, 4) AS b")
      .head().getSeq[Long](0)
    assert(bk.size == 4 && bk.forall(b => b >= 0 && b < 64))
    // the r16 family: ADC sweep, positional windows, rolling hash
    val adc = spark.sql(
      "SELECT pq_adc_dist(array(1, 0), array(array(5L, 7L), array(9L, 11L)))")
      .head().getLong(0)
    assert(adc == 7L + 9L) // lut[0][1] + lut[1][0]
    val win = spark.sql("SELECT ngram_windows('a b a b', 2)")
      .head().getSeq[String](0)
    assert(win == Seq("a b", "b a", "a b")) // positional: dups kept
    assert(spark.sql("SELECT rolling_hash64('abc')").head().getLong(0) ==
      graft.codec.Hashes.rollingHash64("abc"))
    // shape params must be literals
    intercept[Exception] {
      spark.sql("SELECT ngram_shingles('x', cast(rand()*3 AS INT))").collect()
    }
  }

  test("PQ/IVF native family matches an independent scalar replay " +
      "(pq_encode / pq_lut / pq_adc_dist / l2_argmin / l2_probe_cells)") {
    import spark.implicits._
    val m = 4; val codewords = 8; val dsub = 4; val dim = m * dsub
    val nCells = 8; val nprobe = 3
    // deterministic pseudo-random long vectors (hash-derived, sign-mixed)
    def vec(i: Int): Seq[Long] =
      (0 until dim).map(d => ((i * 31 + d * 17) % 97) - 48L)
    val cb: Seq[Seq[Long]] = (0 until codewords).map(vec) // codebook seeds
    val cent: Seq[Seq[Long]] = (100 until 100 + nCells).map(vec)
    val cbFlat = (0 until m).flatMap(s =>
      cb.map(_.slice(s * dsub, (s + 1) * dsub))).flatten.toArray
    val centFlat = cent.flatten.toArray

    // independent scalar laws (no ArrayData, no HOFs)
    def subDist(v: Seq[Long], s: Int, j: Int): Long =
      (0 until dsub).map { i =>
        val d = v(s * dsub + i) - cb(j)(s * dsub + i); d * d
      }.sum
    def encode(v: Seq[Long]): Seq[Int] =
      (0 until m).map(s => (0 until codewords).minBy(j => (subDist(v, s, j), j)))
    def lutOf(v: Seq[Long]): Seq[Seq[Long]] =
      (0 until m).map(s => (0 until codewords).map(j => subDist(v, s, j)))
    def l2(v: Seq[Long], c: Seq[Long]): Long =
      v.zip(c).map { case (a, b) => (a - b) * (a - b) }.sum
    def argmin(v: Seq[Long]): Long =
      (0 until nCells).minBy(c => (l2(v, cent(c)), c)).toLong
    def probes(v: Seq[Long]): Seq[Long] =
      (0 until nCells).sortBy(c => (l2(v, cent(c)), c)).take(nprobe).map(_.toLong)

    val rows = (0 until 500).map(i => (i.toLong, vec(i + 7)))
    val df = rows.toDF("id", "v").select(col("id"),
      col("v"),
      GraftFunctions.pqEncode(col("v"), cbFlat, m, codewords).as("codes"),
      GraftFunctions.pqLut(col("v"), cbFlat, m, codewords).as("lut"),
      GraftFunctions.longL2Argmin(col("v"), centFlat, nCells).as("cell"),
      GraftFunctions.l2ProbeCells(col("v"), centFlat, nCells, nprobe).as("pc"))
      .withColumn("adc",
        GraftFunctions.pqAdcDist(col("codes"), col("lut")))
    df.collect().foreach { r =>
      val v = r.getSeq[Long](1)
      val codes = r.getSeq[Int](2)
      val lut = r.getSeq[Seq[Long]](3)
      assert(codes == encode(v), s"codes for $v")
      assert(lut == lutOf(v), s"lut for $v")
      assert(r.getLong(4) == argmin(v), s"cell for $v")
      assert(r.getSeq[Long](5) == probes(v), s"probes for $v")
      // adc of a row against its OWN lut = sum of its min sub-distances
      val expAdc = (0 until m).map(s => subDist(v, s, codes(s))).sum
      assert(r.getLong(6) == expAdc, s"adc for $v")
    }
    // the whole family stays inside whole-stage codegen
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("ScalaUDF"))
  }

  test("char_gram_buckets equals the hashBucket-over-charNgrams HOF law " +
      "(codepoints, case law, short/empty arms)") {
    import spark.implicits._
    import graft.operators.Classifier
    // astral chars (surrogate pairs — codepoint vs UTF-16 counting),
    // uppercase (the lower() law), multi-byte, exactly-n, short, empty
    val docs = Seq("The Quick Fox", "CAFÉ déjà vu", "a😀b😀c d",
      "ab", "abc", "", "   ", "ΣΙΓΜΑ τέλος").zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("id", "t")
    for (n <- Seq(2, 3); dims <- Seq(16, 256)) {
      val fused = docs.select(col("id"),
        GraftFunctions.charGramBuckets(col("t"), n, dims).as("b"))
      val hof = docs.select(col("id"),
        transform(Classifier.charNgrams(col("t"), n),
          g => Classifier.hashBucket(g, dims)).as("b"))
      val diff = fused.except(hof).count() + hof.except(fused).count()
      assert(diff == 0, s"fused vs HOF drift at n=$n dims=$dims")
    }
  }

  test("type mismatch is rejected at analysis time") {
    import spark.implicits._
    val df = Seq(1L).toDF("n")
    intercept[Exception] {
      df.select(GraftFunctions.farmHash64(col("n"))).collect()
    }
  }
}
