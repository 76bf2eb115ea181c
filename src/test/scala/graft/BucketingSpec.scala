package graft

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import graft.operators.Bucketing

/** Bucketed-layout proof: the same equi-join that shuffles both sides as
  * plain frames runs exchange-free over tables bucketed on the join key —
  * the write-time layout IS the optimization. */
class BucketingSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val warehouse = Files.createTempDirectory("graft-warehouse").toString

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-bucketing-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.warehouse.dir", warehouse)
    .config("spark.sql.autoBroadcastJoinThreshold", "-1") // force the shuffle shape
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("bucketed fact-fact join runs with zero exchange") {
    import spark.implicits._
    val tx = (0 until 1000).map(i => (i.toLong, s"tx$i")).toDF("txid", "tx_payload")
    val ops = (0 until 3000).map(i => ((i % 1000).toLong, s"op$i")).toDF("txid", "op_payload")

    // plain join: both sides exchange
    val plain = ops.join(tx, Seq("txid"))
    assert(plain.queryExecution.executedPlan.toString.contains("Exchange"))

    Bucketing.writeBucketed(tx, "tx_bucketed", buckets = 8, keys = Seq("txid"))
    Bucketing.writeBucketed(ops, "ops_bucketed", buckets = 8, keys = Seq("txid"))

    val joined = Bucketing.colocatedJoin(spark, "ops_bucketed", "tx_bucketed", Seq("txid"))
    val plan = joined.queryExecution.executedPlan.toString
    // the exchange is gone on BOTH sides (the write-time layout paid for
    // it); the per-bucket Sort remains — local, over presorted files
    assert(!plan.contains("Exchange"), plan.take(800))
    assert(plan.contains("Bucketed: true"), plan.take(800))
    assert(plan.contains("SelectedBucketsCount: 8 out of 8"), plan.take(800))
    assert(joined.count() == 3000)
    // row parity with the plain join
    assert(joined.groupBy("txid").count().orderBy("txid").collect().toSeq ==
      plain.groupBy("txid").count().orderBy("txid").collect().toSeq)

    // bucketed aggregation on the key: no exchange either
    val agg = spark.table("ops_bucketed").groupBy("txid").count()
    assert(!agg.queryExecution.executedPlan.toString.contains("Exchange"))

    // oneFilePerBucket pre-shuffles on the SAME Murmur3-pmod law the
    // bucket layout uses, so the 8 write tasks each own exactly one
    // bucket: exactly 8 part files, never a repartition(1) funnel
    val dir = new java.io.File(s"$warehouse/ops_bucketed")
    val parts = dir.listFiles().count(_.getName.startsWith("part-"))
    assert(parts == 8, s"expected one file per bucket, got $parts")
  }

  test("persisted IVF index: bucketed probe join is exchange-free on the index side") {
    import spark.implicits._
    import graft.operators.Similarity
    val rnd = new scala.util.Random(7)
    val corpus = (0 until 400)
      .map(i => (i.toLong, Array.fill(8)(rnd.nextFloat() * 2 - 1)))
      .toDF("vec_id", "embedding")
    val queries = (0 until 64)
      .map(i => (1000L + i, Array.fill(8)(rnd.nextFloat() * 2 - 1)))
      .toDF("vec_id", "embedding")

    val built = Similarity.buildIvfIndexExact(corpus, "vec_id", "embedding", nCells = 8)
    Similarity.writeIvfIndex(built, "ivf_docs", buckets = 8)

    // reload in "another job": only the 8-row centroid table is collected
    val idx = Similarity.readIvfIndex(spark, "ivf_docs")
    assert(idx.centroids == built.centroids)

    def exchanges(df: org.apache.spark.sql.DataFrame): Int =
      "Exchange hashpartitioning".r
        .findAllIn(df.queryExecution.executedPlan.toString).length

    // large-batch mode (no query broadcast): with the in-memory index both
    // probe-join sides shuffle on cell; with the bucketed table the index
    // side's exchange is GONE — exactly one fewer in the whole plan
    val inMem = Similarity.searchIvfIndexExact(built, queries,
      "vec_id", "embedding", k = 3, nprobe = 2, broadcastQueries = false)
    val persisted = Similarity.searchIvfIndexExact(idx, queries,
      "vec_id", "embedding", k = 3, nprobe = 2, broadcastQueries = false)
    val pPlan = persisted.queryExecution.executedPlan.toString
    assert(pPlan.contains("Bucketed: true"), pPlan.take(800))
    assert(exchanges(persisted) == exchanges(inMem) - 1,
      s"expected the index-side exchange gone: ${exchanges(inMem)} -> ${exchanges(persisted)}")

    // and the results are identical to the in-memory search
    assert(persisted.orderBy("query_id", "rank").collect().toSeq ==
      inMem.orderBy("query_id", "rank").collect().toSeq)

    // repeated per-cell maintenance aggregation: zero exchange at all
    val cellStats = spark.table("ivf_docs").groupBy("cell").count()
    assert(!cellStats.queryExecution.executedPlan.toString.contains("Exchange"))
  }

  test("persisted IVF×PQ index: roundtrip constants, exchange-free probe " +
      "join, result parity with the in-memory search") {
    import spark.implicits._
    import graft.operators.Similarity
    val rnd = new scala.util.Random(11)
    val corpus = (0 until 400)
      .map(i => (i.toLong, Array.fill(16)(rnd.nextFloat() * 2 - 1)))
      .toDF("vec_id", "embedding")
    val queries = (0 until 64)
      .map(i => (1000L + i, Array.fill(16)(rnd.nextFloat() * 2 - 1)))
      .toDF("vec_id", "embedding")

    val built = Similarity.buildIvfPqIndexExact(corpus, "vec_id", "embedding",
      nCells = 8, m = 4, codewords = 8)
    Similarity.writeIvfPqIndex(built, "ivfpq_docs", buckets = 8)

    // reload in "another job": only the bounded constants collect
    val idx = Similarity.readIvfPqIndex(spark, "ivfpq_docs")
    assert(idx.centroids == built.centroids)
    assert(idx.m == built.m && idx.dsub == built.dsub)
    assert(idx.codebooks == built.codebooks)

    def exchanges(df: org.apache.spark.sql.DataFrame): Int =
      "Exchange hashpartitioning".r
        .findAllIn(df.queryExecution.executedPlan.toString).length

    // large-batch mode: the bucketed coded file loses its probe-join
    // exchange; only the query batch shuffles — and what it sweeps is
    // 32×-compressed codes, never vectors
    val inMem = Similarity.searchIvfPqIndexExact(built, queries,
      "vec_id", "embedding", k = 3, nprobe = 2, broadcastQueries = false)
    val persisted = Similarity.searchIvfPqIndexExact(idx, queries,
      "vec_id", "embedding", k = 3, nprobe = 2, broadcastQueries = false)
    val pPlan = persisted.queryExecution.executedPlan.toString
    assert(pPlan.contains("Bucketed: true"), pPlan.take(800))
    assert(exchanges(persisted) == exchanges(inMem) - 1,
      s"expected the index-side exchange gone: ${exchanges(inMem)} -> ${exchanges(persisted)}")
    assert(persisted.orderBy("query_id", "rank").collect().toSeq ==
      inMem.orderBy("query_id", "rank").collect().toSeq)

    // the persisted search equals the one-shot composed operator too
    val oneShot = Similarity.ivfPqTopKExact(corpus, "vec_id", "embedding",
        queries, "vec_id", "embedding", k = 3, nCells = 8, nprobe = 2,
        m = 4, codewords = 8)
      .orderBy("query_id", "rank").collect().toSeq
    assert(persisted.orderBy("query_id", "rank").collect().toSeq == oneShot)
  }

  test("incremental MinHash dedup: correct refresh verdicts, index side " +
      "probed exchange-free, batch never re-fingerprints the corpus") {
    import spark.implicits._
    import graft.operators.Dedup
    def txt(i: Int): String = (0 until 30).map(t => s"c${i}_w$t").mkString(" ")
    val corpus = (0 until 40).map(i => (i.toLong, txt(i)))
      .toDF("doc_id", "text")
    // batch: 100 = exact dup of corpus 7; 101 = near-dup of corpus 8
    // (2 of 30 tokens swapped); 102 = unique; 103 = exact dup of corpus 7
    // AND of batch 100 (corpus wins: dup_of = 7, not 100)
    val near8 = (txt(8).split(" ").dropRight(2) ++ Seq("x1", "x2"))
      .mkString(" ")
    val batch = Seq((100L, txt(7)), (101L, near8), (102L, txt(999)),
      (103L, txt(7))).toDF("doc_id", "text")
    Dedup.writeMinHashIndex(corpus, "text", "doc_id", "inc_idx_test",
      buckets = 4)
    val out = Dedup.incrementalDedupMinHash("inc_idx_test", corpus, batch,
      "text", "doc_id")
    val m = out.collect().map(r => r.getLong(0) ->
      ((r.getLong(1), r.getBoolean(2),
        if (r.isNullAt(3)) -1L else r.getLong(3)))).toMap
    assert(m(100L)._2 && m(100L)._3 == 7L, m.toString)
    assert(m(101L)._2 && m(101L)._3 == 8L, m.toString)
    assert(!m(102L)._2 && m(102L)._1 == 0L, m.toString)
    assert(m(103L)._2 && m(103L)._3 == 7L, m.toString)
    // the refresh property: the probe join reads the bucketed index with
    // ZERO index-side exchange (hashpartitioning(bk) from the write-time
    // layout satisfies the join's distribution) — the one bk exchange in
    // the plan belongs to the batch's own band rows. Cost ∝ batch.
    val idx = spark.table("inc_idx_test")
      .withColumnRenamed("doc_id", "ref_id")
    val probe = Dedup.minHashBandRows(batch, "text", "doc_id", 3, 8, 2)
      .join(idx, "bk")
    val pplan = probe.queryExecution.executedPlan.toString
    assert(pplan.contains("Bucketed: true"), pplan.take(1200))
    assert(pplan.contains("SelectedBucketsCount: 4 out of 4"), pplan.take(1200))
    val bkExchanges = "Exchange hashpartitioning\\(bk".r
      .findAllIn(pplan).length
    assert(bkExchanges == 1, s"want 1 batch-side bk exchange, got " +
      s"$bkExchanges:\n${pplan.take(1500)}")
    // nothing in the verdict plan shingles the corpus table wholesale: the
    // corpus text scan is gated by the candidate-id join, so the only
    // full-corpus work is the (pruned, columnar) scan itself
    assert(!out.queryExecution.executedPlan.toString
      .contains("CartesianProduct"))
    // ID IDENTITY: a batch doc REUSING an indexed id is a re-crawl, not a
    // duplicate — even when its new text diverges (below threshold) it
    // must not be dropped for matching its indexed former self; and its
    // corpus candidates verify against the INDEXED text, so a re-crawl
    // whose new text genuinely near-dups ANOTHER corpus doc still drops
    val recrawl = Seq(
      (5L, txt(999)),            // same id as corpus 5, unrelated new text
      (6L, txt(9))               // same id as corpus 6, now a dup of corpus 9
    ).toDF("doc_id", "text")
    val r = Dedup.incrementalDedupMinHash("inc_idx_test", corpus, recrawl,
        "text", "doc_id").collect()
      .map(x => x.getLong(0) -> ((x.getBoolean(2),
        if (x.isNullAt(3)) -1L else x.getLong(3)))).toMap
    assert(r(5L) == ((false, -1L)), r.toString)
    assert(r(6L) == ((true, 9L)), r.toString)
    // REFRESH LIFECYCLE: the kept batch doc (102, unique) graduates into
    // the index via the bucket-aligned append; the NEXT batch's dup of it
    // now resolves against 102, and the grown index still probes
    // bucket-aware (the append declares the identical bucket spec)
    val kept102 = batch.where(col("doc_id") === 102L)
    Dedup.appendMinHashIndex(kept102, "text", "doc_id", "inc_idx_test",
      buckets = 4)
    val batch2 = Seq((200L, txt(999))).toDF("doc_id", "text")
    val r2 = Dedup.incrementalDedupMinHash("inc_idx_test",
        corpus.unionAll(kept102), batch2, "text", "doc_id").collect()
      .map(x => x.getLong(0) -> ((x.getBoolean(2),
        if (x.isNullAt(3)) -1L else x.getLong(3)))).toMap
    assert(r2(200L) == ((true, 102L)), r2.toString)
    val grown = Dedup.minHashBandRows(batch2, "text", "doc_id", 3, 8, 2)
      .join(spark.table("inc_idx_test").withColumnRenamed("doc_id", "ref_id"),
        "bk")
    val gplan = grown.queryExecution.executedPlan.toString
    assert(gplan.contains("Bucketed: true"), gplan.take(1200))
    assert("Exchange hashpartitioning\\(bk".r.findAllIn(gplan).length == 1,
      gplan.take(1500))
  }
}
