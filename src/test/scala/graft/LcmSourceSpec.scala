package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import graft.sources.LcmWriter

class LcmSourceSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .appName("graft-lcm-test")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private lazy val dir: String = {
    val d = java.nio.file.Files.createTempDirectory("lcm-test").toString
    LcmWriter.writeFixture(d, 1000, 1511, batchSize = 64) // 8 batch files
    d
  }

  test("wire trades price from pre-state offer changes (findTradeSellPrice law)") {
    import graft.codec.Lcm
    // hand-built frame: one tx, three ops; op 0 crosses offer 77 TWICE (the
    // reverse scan must take the LAST matching change: 5/9, not 3/8; a
    // CREATED change for 77 sits LAST in the vector but has no pre state,
    // so it must be skipped); op 1 is an LP atom (always bought/sold);
    // op 2 claims offer 88 with NO matching change — the reference ERRORS
    // that op's transform (trade.go:273-278) so ALL of op 2's atoms drop,
    // including its perfectly-matched offer-99 atom.
    def k(b: Int): Seq[Byte] = Seq.fill[Byte](32)(b.toByte)
    val ops = Seq(Lcm.Op(9, 1L), Lcm.Op(9, 1L), Lcm.Op(9, 1L))
    val changes = Seq(
      Lcm.WireChange(1, 2, 0, k(1), 10L, 0L,
        offerId = 77L, prePriceN = 3, prePriceD = 8),
      Lcm.WireChange(1, 2, 0, k(2), 10L, 0L,
        offerId = 77L, prePriceN = 5, prePriceD = 9),
      Lcm.WireChange(0, 2, 0, k(3), 10L, 0L, offerId = 77L),
      // pool k(6)'s pre-state on op 1: the findPoolFee match target
      Lcm.WireChange(1, 5, 1, k(7), 10L, 0L,
        preReserveA = 100L, preReserveB = 200L, preShares = 10L,
        postReserveA = 90L, postReserveB = 210L, postShares = 10L,
        poolFee = 25, poolId = Some(k(6))),
      // offer 99's pre-state on op 2 — matched, but op 2 still drops
      Lcm.WireChange(1, 2, 2, k(8), 10L, 0L,
        offerId = 99L, prePriceN = 2, prePriceD = 7))
    val atoms = Seq(
      Lcm.WireClaimAtom(0, isPool = false, k(4), 77L, "XLM", 100L, "USDC", 200L),
      Lcm.WireClaimAtom(1, isPool = true, k(6), 0L, "EURC", 50L, "XLM", 60L),
      Lcm.WireClaimAtom(2, isPool = false, k(5), 88L, "XLM", 300L, "USDC", 400L),
      Lcm.WireClaimAtom(2, isPool = false, k(9), 99L, "XLM", 500L, "USDC", 600L))
    val tx = Lcm.Tx(10L, Lcm.TxSuccess, ops, changes = changes,
      claimAtoms = atoms)
    val d = java.nio.file.Files.createTempDirectory("lcm-trade-pre").toString
    graft.sources.LcmWriter.writeFrames(d,
      Seq(Lcm.Frame(9000L, 1700000000000L, Seq(tx))))
    val rows = graft.operators.StellarTransforms.historyTradesFromLcm(
        spark.read.format("graft-lcm").load(d))
      .orderBy("operation_id", "order")
      .select("offer_id", "price_n", "price_d", "trade_type",
        "liquidity_pool_fee")
      .collect()
    // op 2 (offers 88 + 99) is dropped whole: only op 0 and op 1 survive
    assert(rows.length == 2)
    // offer 77: LAST pre-state change wins (5/9), not first (3/8), not the
    // CREATED one (no pre)
    assert(rows(0).getLong(0) == 77L &&
      rows(0).getLong(1) == 5L && rows(0).getLong(2) == 9L)
    // LP atom: bought/sold by definition; fee from the pool's pre-state
    // change matched by pool id (findPoolFee)
    assert(rows(1).isNullAt(0) &&
      rows(1).getLong(1) == 60L && rows(1).getLong(2) == 50L)
    assert(rows(1).getInt(4) == 25)
    assert(rows(0).isNullAt(4))
  }

  test("change pre/post arms decode against the fixture laws") {
    // one ledger, every change row: the entry-type-discriminated arms must
    // surface exactly per the affine fixture laws — offer pre-state price
    // (null on CREATED), LP constant-product pre/post + fee, and the
    // pre/post sponsor pair — with nulls everywhere an arm doesn't apply
    val seq = 1042L
    val rows = spark.read.format("graft-lcm").load(dir)
      .where(col("sequence") === seq)
      .select(posexplode(col("transactions")).as(Seq("pos", "tx")))
      .select(col("pos"), posexplode(col("tx.changes")).as(Seq("j", "c")))
      .select("pos", "j", "c.kind", "c.entry_type", "c.offer_id",
        "c.pre_price_n", "c.pre_price_d", "c.pre_reserve_a",
        "c.post_shares", "c.pool_fee", "c.post_sponsor_hex",
        "c.pre_sponsor_hex")
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (t, j) = (r.getInt(0).toLong, r.getInt(1).toLong)
      val kind = ((seq + t + j) % 3).toInt
      val et = ((seq + j) % 10).toInt
      assert(r.getInt(2) == kind && r.getInt(3) == et, s"t=$t j=$j")
      if (et == 2) {
        assert(r.getLong(4) == seq * 100 + t * 10 + j)
        if (kind != 0) assert(r.getInt(5) == seq % 9 + 1 + j &&
          r.getInt(6) == t % 7 + 1 + j)
        else assert(r.isNullAt(5) && r.isNullAt(6))
      } else assert(r.isNullAt(4) && r.isNullAt(5) && r.isNullAt(6))
      if (et == 5) {
        assert(r.getLong(7) == 10000000L + seq * 5 + t * 3 + j)
        assert(r.getLong(8) ==
          1000000L + seq * 2 + t + (seq + t * 2 + j) % 201 - 100)
        assert(r.getInt(9) == 10 + (seq + t) % 90)
      } else assert(r.isNullAt(7) && r.isNullAt(8) && r.isNullAt(9))
      if (kind != 2 && (seq + 2 * t + j) % 2 == 0)
        assert(r.getString(10).length == 64)
      else assert(r.isNullAt(10))
      if (kind != 0 && (2 * seq + t + j) % 3 <= 1)
        assert(r.getString(11).length == 64)
      else assert(r.isNullAt(11))
    }
  }

  test("nested pruning under count-over-explode keeps field offsets aligned") {
    // Catalyst prunes the transactions ELEMENT struct when no tx field is
    // consumed (count over explode); the source must restore the full
    // TxSchema or the reader's fixed field offsets misalign and a Long
    // lands where a Boolean is read
    val n = spark.read.format("graft-lcm").load(dir)
      .where(col("sequence").between(1000, 1009))
      .select(posexplode(col("transactions")))
      .count()
    // nTx per ledger = seq % 5 + 1
    assert(n == (1000L to 1009L).map(_ % 5 + 1).sum)
    // single nested field consumed: same pruning pressure, value-correct
    val fees = spark.read.format("graft-lcm").load(dir)
      .where(col("sequence") === 1001)
      .select(explode(col("transactions")).as("tx"))
      .select(col("tx.fee_charged")).collect().map(_.getLong(0)).sorted
    assert(fees.toSeq == (1 to 2).map(_ * 100L))
  }

  test("history archive: checkpoint math and category paths match the layout") {
    import graft.sources.HistoryArchive._
    // checkpoints close at seq ≡ 63 (mod 64) (`utils/main.go:808-827`)
    assert(checkpointOf(63) == 63 && checkpointOf(64) == 127)
    assert(checkpointOf(100) == 127 && checkpointOf(127) == 127)
    assert(checkpointOf(128) == 191)
    assert(categoryPath("ledger", 0x001e84ffL) ==
      "ledger/00/1e/84/ledger-001e84ff.xdr.gz")
    assert(checkpointsFor(100, 300) == Seq(127, 191, 255, 319))
  }

  test("history archive: distributed read over the checkpoint layout") {
    import graft.sources.HistoryArchive
    val root = java.nio.file.Files.createTempDirectory("graft-archive").toString
    HistoryArchive.writeFixture(root, 1000, 1100)
    val ds = HistoryArchive.read(spark, root, 1010, 1080)
    // one task per checkpoint file
    assert(ds.rdd.getNumPartitions == HistoryArchive.checkpointsFor(1010, 1080).size)
    val rows = ds.collect().sortBy(_.sequence)
    assert(rows.map(_.sequence).toSeq == (1010L to 1080L))
    val r = rows.find(_.sequence == 1013).get
    assert(r.transactions.size == (1013 % 5) + 1)
    assert(r.transactions.head.fee_charged == 100L)
    assert(r.closed_at.getTime == 1700000000000L + 1013 * 5000L)
  }

  test("history archive: live HTTP fetch — one GET per checkpoint task") {
    // the reference's real backend is a plain HTTP(S) archive walked one
    // checkpoint GET at a time (ledgers_history_archive.go:10-35); a
    // loopback server standing in for history.stellar.org proves the
    // http:// arm streams, prunes, and decodes identically to the
    // filesystem arm
    import graft.sources.HistoryArchive
    val root = java.nio.file.Files.createTempDirectory("graft-archive-http").toString
    HistoryArchive.writeFixture(root, 1000, 1100)
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/archive", { exchange =>
      val rel = exchange.getRequestURI.getPath.stripPrefix("/archive/")
      val f = new java.io.File(root, rel)
      if (f.isFile) {
        val bytes = java.nio.file.Files.readAllBytes(f.toPath)
        exchange.sendResponseHeaders(200, bytes.length)
        exchange.getResponseBody.write(bytes)
      } else exchange.sendResponseHeaders(404, -1)
      exchange.close()
    })
    server.start()
    try {
      val url = s"http://127.0.0.1:${server.getAddress.getPort}/archive"
      val viaHttp = HistoryArchive.read(spark, url, 1010, 1050)
        .collect().sortBy(_.sequence)
      val viaFile = HistoryArchive.read(spark, root, 1010, 1050)
        .collect().sortBy(_.sequence)
      assert(viaHttp.length == 41 && viaHttp.toSeq == viaFile.toSeq)
      // a missing checkpoint surfaces as a loud task failure, not empty
      val err = intercept[org.apache.spark.SparkException] {
        HistoryArchive.read(spark, url, 99000, 99001).collect()
      }
      assert(err.getMessage.contains("HTTP 404") ||
        Option(err.getCause).exists(_.getMessage.contains("HTTP 404")))
    } finally server.stop(0)
  }

  test("history archive: reads through an explicit file:-scheme Hadoop URI") {
    import graft.sources.HistoryArchive
    val root = java.nio.file.Files.createTempDirectory("graft-archive-uri").toString
    HistoryArchive.writeFixture(root, 1000, 1063)
    // the task opens via the Hadoop FileSystem API, so a scheme-qualified
    // root must resolve exactly like a bare local path (proving s3a://-class
    // roots take the same code path)
    val ds = HistoryArchive.read(spark, s"file://$root", 1000, 1063)
    assert(ds.count() == 64)
    assert(ds.collect().map(_.sequence).sorted.toSeq == (1000L to 1063L))
  }

  test("zero-op transactions scan without throwing in both sources") {
    import graft.codec.Lcm
    import graft.sources.HistoryArchive
    // hand-build a frame whose middle tx has nOps=0 (legal wire format the
    // fixture writers never emit)
    val frame = Lcm.Frame(2000L, 1700010000000L, Seq(
      Lcm.Tx(100L, successful = true, Seq(Lcm.Op(14, 1000000L,
        Lcm.OpCreateClaimableBalance("XLM",
          Seq(Seq.tabulate(32)(_.toByte)))))),
      Lcm.Tx(250L, successful = false, Seq.empty),
      Lcm.Tx(300L, successful = true, Seq(Lcm.Op(20, 2000000L,
        Lcm.OpClawbackClaimableBalance(
          Seq.tabulate(32)(i => (i + 1).toByte)))))))
    // .lcmb DSv2 source
    val d = java.nio.file.Files.createTempDirectory("lcm-zero-op").toString
    val out = new java.io.DataOutputStream(new java.io.BufferedOutputStream(
      new java.io.FileOutputStream(new java.io.File(d, "2000-2000.lcmb"))))
    val bytes = Lcm.encode(frame)
    out.writeInt(Lcm.LcmbMagic); out.writeInt(Lcm.LcmbVersion)
    out.writeInt(bytes.length); out.write(bytes); out.close()
    val row = spark.read.format("graft-lcm").load(d).collect().head
    val txs = row.getSeq[org.apache.spark.sql.Row](row.fieldIndex("transactions"))
    def ops(t: org.apache.spark.sql.Row) =
      t.getSeq[org.apache.spark.sql.Row](t.fieldIndex("operations"))
    assert(txs.size == 3)
    assert(txs(1).getAs[Long]("fee_charged") == 250L)
    assert(ops(txs(1)).isEmpty) // zero-op tx → empty op array, not nulls
    assert(ops(txs(0)).head.getAs[Int]("op_type") == 14 &&
      ops(txs(2)).head.getAs[Int]("op_type") == 20)
    // archive source: same frame inside a gzipped checkpoint file
    val root = java.nio.file.Files.createTempDirectory("graft-archive-zero").toString
    val cp = HistoryArchive.checkpointOf(2000L)
    val f = new java.io.File(root, HistoryArchive.categoryPath("ledger", cp))
    f.getParentFile.mkdirs()
    val gz = new java.io.DataOutputStream(new java.util.zip.GZIPOutputStream(
      new java.io.FileOutputStream(f)))
    gz.writeInt(bytes.length); gz.write(bytes); gz.close()
    val led = HistoryArchive.read(spark, root, 2000, 2000).collect().head
    assert(led.transactions.size == 3)
    assert(led.transactions(1).operations.isEmpty)
    assert(led.transactions(0).operations.map(_.op_type) == Seq(14))
  }

  test("reads frames back with the declared schema and exact row content") {
    val df = spark.read.format("graft-lcm").load(dir)
    assert(df.columns.toSeq == Seq("sequence", "closed_at",
      "protocol_version", "prev_ledger_hash_hex", "total_coins", "fee_pool",
      "base_fee", "base_reserve", "max_tx_set_size", "upgrade_count",
      "bucket_list_size_bytes", "soroban_fee_write1000", "transactions"))
    assert(df.count() == 512)
    val r = df.where(col("sequence") === 1003).collect().head
    assert(r.getAs[java.sql.Timestamp]("closed_at").getTime ==
      1700000000000L + 1003 * 5000L)
    val txs = r.getSeq[org.apache.spark.sql.Row](r.fieldIndex("transactions"))
    assert(txs.size == (1003 % 5) + 1)
    assert(txs.head.getAs[Long]("fee_charged") == 100L)
    val headOps = txs.head
      .getSeq[org.apache.spark.sql.Row](txs.head.fieldIndex("operations"))
    assert(headOps.size == (1003 % 3) + 1)
    assert(headOps.head.getAs[Int]("op_type") == (1003 % 27))
    // header arm: fixture laws, odd seq → no soroban ext
    assert(r.getAs[Int]("protocol_version") == (20 + 1003 % 3))
    assert(r.getAs[String]("prev_ledger_hash_hex") ==
      graft.codec.Hashes.sha256("ledger:1002".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString)
    assert(r.getAs[Long]("total_coins") == 1000000000000L + 1003 * 7)
    assert(r.getAs[Long]("bucket_list_size_bytes") == 1000000L + 1003 * 10)
    assert(r.isNullAt(r.fieldIndex("soroban_fee_write1000")))
    // checkpoint ledger carries the upgrade entries; legacy header-less
    // frames surface nulls (wire-compat arm)
    val cp = df.where(col("sequence") === 1023).collect().head
    assert(cp.getAs[Int]("upgrade_count") == 2)
    val legacyDir = java.nio.file.Files
      .createTempDirectory("lcm-legacy").toString
    LcmWriter.write(legacyDir,
      Seq((5L, 1700000005000L, LcmWriter.fixtureTxs(5L))))
    val lr = spark.read.format("graft-lcm").load(legacyDir).collect().head
    assert(lr.isNullAt(lr.fieldIndex("protocol_version")) &&
      lr.isNullAt(lr.fieldIndex("bucket_list_size_bytes")))
  }

  test("round-9 tx columns decode against the fixture laws") {
    // guards the reader's positional row-array alignment for the columns
    // appended this round: source account (plain + muxed arms), per-op
    // source, the change vector and the claim-atom vector
    def hex(tag: String): String =
      graft.codec.Hashes.sha256(tag.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    val df = spark.read.format("graft-lcm").load(dir)
    // seq 1003: 4 txs; t=1 is the muxed arm, t=2 plain
    val r = df.where(col("sequence") === 1003).collect().head
    val txs = r.getSeq[org.apache.spark.sql.Row](r.fieldIndex("transactions"))
    val t1 = txs(1)
    assert(t1.getAs[String]("source_account_hex") == hex("src-1003-1"))
    assert(t1.getAs[Long]("source_muxed_id") == 1003L * 1000 + 1)
    val t2 = txs(2)
    assert(t2.getAs[String]("source_account_hex") == hex("src-1003-2"))
    assert(t2.isNullAt(t2.fieldIndex("source_muxed_id")))
    def ops(t: org.apache.spark.sql.Row) =
      t.getSeq[org.apache.spark.sql.Row](t.fieldIndex("operations"))
    // per-op source: present iff (seq + t) % 5 == 0 → t=2 for seq 1003
    assert(ops(t2).head.getAs[String]("op_source_hex") == hex("osrc-1003-2"))
    assert(ops(t1).head.isNullAt(
      ops(t1).head.fieldIndex("op_source_hex")))
    // change vector: t=1 → (1003+1)%2 = 0 → 1 change, laws per j=0
    val ch = t1.getSeq[org.apache.spark.sql.Row](t1.fieldIndex("changes"))
    assert(ch.size == 1)
    assert(ch.head.getAs[Int]("kind") == ((1003 + 1) % 3))
    assert(ch.head.getAs[Int]("entry_type") == (1003 % 10))
    assert(ch.head.getAs[String]("key_hash_hex") ==
      hex(s"ck-${(1003L * 3 + 1 * 7) % 101}"))
    assert(ch.head.getAs[Long]("last_modified") == 1003L)
    assert(ch.head.getAs[Long]("balance") == 1000000L + 1003 * 3 + 17)
    // claim atoms ride only trade-shaped ops, grouped per op element
    val withAtoms = df.where(col("sequence") === 1029).collect().head
      .getSeq[org.apache.spark.sql.Row](r.fieldIndex("transactions"))
      .flatMap(ops)
      .filter(o => Seq(2, 3, 12, 13).contains(o.getAs[Int]("op_type")))
    assert(withAtoms.nonEmpty)
    val atoms = withAtoms.head
      .getSeq[org.apache.spark.sql.Row](
        withAtoms.head.fieldIndex("claim_atoms"))
    assert(atoms.nonEmpty)
    val a = atoms.head
    assert(Seq("XLM", "USDC", "EURC").contains(a.getAs[String]("sold_code")))
    assert(a.getAs[Boolean]("is_pool") == (a.getAs[Long]("offer_id") == 0L))
  }

  test("sequence range predicates prune whole batch files before reading") {
    val df = spark.read.format("graft-lcm").load(dir)
      .where(col("sequence") >= 1100 && col("sequence") < 1150)
    // 64-ledger batches starting at 1000: range [1100,1150) overlaps the
    // 1064-1127 and 1128-1191 files only
    val parts = df.rdd.getNumPartitions
    assert(parts == 2, s"expected 2 surviving batch files, got $parts partitions")
    assert(df.count() == 50)
    assert(df.agg(min("sequence"), max("sequence")).collect().head.toSeq ==
      Seq(1100L, 1149L))
  }

  test("column pruning reaches the reader (no tx decode for scalar queries)") {
    val df = spark.read.format("graft-lcm").load(dir).select("sequence")
    val schema = df.queryExecution.executedPlan.collectLeaves().head.schema
    assert(schema.fieldNames.toSeq == Seq("sequence"))
    assert(df.distinct().count() == 512)
  }

  test("multi-op envelopes surface the FULL op array (ops 2..N survive)") {
    // fixture law: nOps = (seq + t) % 3 + 1, op u typed (seq + t + u) % 27
    // — every (seq, t, u) triple must come back, not just u = 0 (the
    // round-9 defect flattened each envelope to ops.headOption)
    val got = spark.read.format("graft-lcm").load(dir)
      .where(col("sequence").between(1000, 1099))
      .select(col("sequence"),
        posexplode(col("transactions")).as(Seq("t", "tx")))
      .select(col("sequence"), col("t"),
        posexplode(col("tx.operations")).as(Seq("u", "op")))
      .select(col("sequence"), col("t"), col("u"), col("op.op_type"))
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3)))
      .sorted.toSeq
    val expect = (for {
      seq <- 1000L to 1099L
      t <- 0 to (seq % 5).toInt
      u <- 0 to ((seq + t) % 3).toInt
    } yield (seq, t, u, ((seq + t + u) % 27).toInt)).sorted
    assert(got == expect)
    // per-op atom grouping: in an envelope with 2+ trade-shaped ops, EACH
    // trade-shaped op carries its own (non-empty) claim-atom group
    val multiTrade = spark.read.format("graft-lcm").load(dir)
      .select(posexplode(col("transactions")).as(Seq("t", "tx")))
      .where(size(filter(col("tx.operations"),
        o => o("op_type").isin(2, 3, 12, 13))) >= 2)
    assert(multiTrade.count() > 0)
    val tradeOps = multiTrade.limit(1)
      .select(explode(col("tx.operations")).as("op"))
      .where(col("op.op_type").isin(2, 3, 12, 13))
      .select(size(col("op.claim_atoms"))).collect().map(_.getInt(0))
    assert(tradeOps.length >= 2 && tradeOps.forall(_ > 0))
  }

  test(".lcmb reader rejects unversioned files and version drift loudly") {
    import graft.codec.Lcm
    def firstMessages(t: Throwable): String = {
      val sb = new StringBuilder
      var c: Throwable = t
      while (c != null) { sb.append(c.getMessage).append('\n'); c = c.getCause }
      sb.toString
    }
    // legacy header-less file: first int is a frame length, not the magic
    val d1 = java.nio.file.Files.createTempDirectory("lcmb-legacy").toString
    val legacy = new java.io.File(d1, "100-100.lcmb")
    val o1 = new java.io.DataOutputStream(new java.io.FileOutputStream(legacy))
    val bytes = Lcm.encode(LcmWriter.fixtureFrame(100))
    o1.writeInt(bytes.length); o1.write(bytes); o1.close()
    val e1 = intercept[Throwable](
      spark.read.format("graft-lcm").load(d1).collect())
    assert(firstMessages(e1).contains("not a versioned .lcmb"))
    // right magic, wrong version
    val d2 = java.nio.file.Files.createTempDirectory("lcmb-drift").toString
    val drift = new java.io.File(d2, "100-100.lcmb")
    val o2 = new java.io.DataOutputStream(new java.io.FileOutputStream(drift))
    o2.writeInt(Lcm.LcmbMagic); o2.writeInt(Lcm.LcmbVersion + 1)
    o2.writeInt(bytes.length); o2.write(bytes); o2.close()
    val e2 = intercept[Throwable](
      spark.read.format("graft-lcm").load(d2).collect())
    assert(firstMessages(e2).contains("format version"))
    // current writer round-trips
    val d3 = java.nio.file.Files.createTempDirectory("lcmb-ok").toString
    LcmWriter.writeFrames(d3, Seq(LcmWriter.fixtureFrame(100)))
    assert(spark.read.format("graft-lcm").load(d3).count() == 1)
  }

  test("nested tx array aggregates match the fixture law") {
    val df = spark.read.format("graft-lcm").load(dir)
    val total = df.select(
      sum(aggregate(col("transactions"), lit(0L), (acc, t) => acc + t("fee_charged")))
        .as("fees")).collect().head.getLong(0)
    // per ledger: nTx = seq%5+1 txs with fees 100,200,...  => 100 * n(n+1)/2
    val expect = (1000L to 1511L).map { s => val n = (s % 5) + 1; 100L * n * (n + 1) / 2 }.sum
    assert(total == expect)
  }
}
