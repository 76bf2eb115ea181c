package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Large-scale document deduplication: exact, MinHash+LSH, SimHash, n-gram
  * Jaccard. Designed for the 100 TB training-data path:
  *
  *   - exact dedup is one hash-aggregate (map-side combinable, spillable);
  *   - MinHash signatures are computed per-row with codegen'd `xxhash64` +
  *     higher-order `transform`/`aggregate` — no explode, no shuffle, until
  *     the single band-bucket self-join that LSH exists to make tractable;
  *   - candidate verification is exact Jaccard on the candidate pairs only.
  */
object Dedup {

  /** Exact dedup on a content hash; deterministic winner = lowest `idCol`.
    * sha2-256 over the normalized text — collision-safe at any corpus size
    * (vs 64-bit hashes which collide at ~billions of docs). */
  def exact(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val payload = struct(df.columns.filterNot(_ == "__h").map(col): _*)
    df.withColumn("__h", sha2(col(textCol), 256))
      .groupBy(col("__h").as("content_hash"))
      .agg(
        min_by(payload, col(idCol)).as("__keep"),
        count(lit(1)).as("duplicate_count"))
      .select(col("content_hash"), col("__keep.*"), col("duplicate_count"))
  }

  /** Normalize → lowercase, collapse whitespace (dedup should ignore trivia). */
  def normalized(text: Column): Column =
    trim(regexp_replace(lower(text), "\\s+", " "))

  /** STREAMING exact dedup: first-seen-wins on the content hash ACROSS
    * micro-batches — the ingestion-time dedup gate of a continuously
    * crawled corpus. `dropDuplicates` on a streaming frame keeps the seen
    * hash set in the state store (checkpointed, recoverable), so a
    * document that arrived in batch 3 is still suppressed in batch 3000.
    * State is keyed by the 256-bit content hash ONLY — constant bytes per
    * distinct document, partitioned by the state store's hash
    * partitioning, no watermark needed (content dedup has no event-time
    * horizon; callers that want a bounded seen-window can watermark the
    * input and use `dropDuplicatesWithinWatermark` instead). Unlike
    * [[exact]] (batch: groupBy + min_by winner + duplicate_count) the
    * streaming law is FIRST-ARRIVAL-wins — the only deterministic choice
    * when later duplicates haven't arrived yet. */
  def streamingExact(stream: DataFrame, textCol: String): DataFrame =
    stream.withColumn("content_hash", sha2(col(textCol), 256))
      .dropDuplicates("content_hash")

  /** Word-level shingles of size n as an array column (per-row, no shuffle).
    *
    * Fused native expression ([[graft.plans.NgramShinglesExpression]]):
    * normalize → split → windows → ordered distinct in one compiled pass.
    * The earlier chained-`zip_with` column formulation ran interpreted per
    * element and was re-evaluated in every plan branch consuming the gram
    * array (explode, size, array_except); the fused loop is evaluated once
    * per branch at compiled speed and stays inside whole-stage codegen.
    * Docs shorter than n keep their single whole-doc shingle (the windowed
    * definition's i=0 window). */
  def shingles(text: Column, n: Int): Column =
    graft.functions.GraftFunctions.ngramShingles(text, n)

  /** Salted 63-bit shingle hash: sha-256("shingle:seed") prefix folded into
    * a NON-NEGATIVE long — the top bit is masked so signed-vs-unsigned min
    * ordering can't diverge between engines. Like [[sha64]] this is
    * replayable in DuckDB SQL, which makes the MinHash signatures (and the
    * LSH candidate set they induce) hash-oracle-checkable. */
  private[graft] def sha63(x: Column, seed: Column): Column = {
    val hx = sha2(concat(x, lit(":"), seed.cast("string")), 256)
    val hi = conv(substring(hx, 1, 8), 16, 10).cast("long")
      .bitwiseAND(lit(0x7fffffffL))
    val lo = conv(substring(hx, 9, 8), 16, 10).cast("long")
    call_function("shiftleft", hi, lit(32)).bitwiseOR(lo)
  }

  /** MinHash signature: for seed s in 0..numHashes-1, min over shingles of
    * sha63(shingle, s). Entirely intra-row (transform + array_min over the
    * shingle array) — codegen'd, shuffle-free. */
  def minHashSignature(text: Column, shingleSize: Int, numHashes: Int): Column = {
    val sh = shingles(text, shingleSize)
    val seeds = sequence(lit(0), lit(numHashes - 1))
    transform(seeds, s => array_min(transform(sh, x => sha63(x, s))))
  }

  /** MinHash+LSH near-duplicate pairs.
    *
    * bands × rowsPerBand = numHashes. Docs sharing any band bucket become
    * candidates (one shuffle on the band key — the only shuffle in the
    * pipeline); candidates are verified with exact shingle-set Jaccard.
    * Returns (id_a, id_b, jaccard) with id_a < id_b, jaccard >= threshold.
    */
  def minHashLsh(
      df: DataFrame,
      textCol: String,
      idCol: String,
      shingleSize: Int = 3,
      bands: Int = 8,
      rowsPerBand: Int = 2,
      threshold: Double = 0.7): DataFrame = {
    val numHashes = bands * rowsPerBand
    // two-step projection: `sh` is materialized once per row (CollapseProject
    // keeps multi-use non-trivial exprs in their own stage), then 16 cheap
    // array passes derive the signature. cache() so the band join and the
    // two verification joins don't recompute shingling three times.
    // CACHE LIVENESS: see simHashDupPairs — clearCache() between corpora
    // in long-lived sessions.
    val sigs = df
      .select(col(idCol).as("doc_id"), shingles(col(textCol), shingleSize).as("sh"))
      .select(col("doc_id"), col("sh"),
        transform(sequence(lit(0), lit(numHashes - 1)),
          s => array_min(transform(col("sh"), x => sha63(x, s)))).as("sig"))
      .cache()

    // band key = hash of the signature slice; explode to narrow (band, id)
    // rows — the shingle arrays do NOT travel through the LSH shuffle.
    val banded = sigs.select(
      col("doc_id"),
      posexplode(transform(sequence(lit(0), lit(bands - 1)),
        b => xxhash64(concat_ws(",",
          slice(col("sig"), b * lit(rowsPerBand) + 1, lit(rowsPerBand))), b)))
        .as(Seq("band_idx", "band_hash")))

    val candidates = banded.as("a")
      .join(banded.as("b"), Seq("band_idx", "band_hash"))
      .where(col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      .distinct()

    // exact-Jaccard verification on the (small) candidate set only
    candidates
      .join(sigs.select(col("doc_id").as("id_a"), col("sh").as("sh_a")), "id_a")
      .join(sigs.select(col("doc_id").as("id_b"), col("sh").as("sh_b")), "id_b")
      .withColumn("inter", size(array_intersect(col("sh_a"), col("sh_b"))))
      .withColumn("uni", size(col("sh_a")) + size(col("sh_b")) - col("inter"))
      .withColumn("jaccard",
        when(col("uni") === 0, lit(1.0)).otherwise(col("inter") / col("uni")))
      .where(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }

  /** Narrow MinHash band-key rows — the PERSISTABLE fingerprint grain of
    * the LSH law: one (bk, doc_id) row per band, where
    * `bk = sha63(bandIdx ":" slice-csv)` over the signature slice. Unlike
    * [[minHashLsh]]'s in-flight xxhash64 band keys (JVM-only seeding, fine
    * inside one job), the sha63 key is engine-replayable, so a SQL oracle
    * re-derives the exact key set — the property a PERSISTED index needs
    * (its reader may not be a JVM). Map-only; the caller owns the shuffle
    * (usually the bucketed write below). */
  /** MinHash signature column over a shingle array (numHashes sha63-seeded
    * minima) — the ONE implementation of the signature law; the batch
    * index writer and the streaming index probe both build on it, so the
    * two sides cannot drift (drifted band keys would silently stop
    * colliding rather than erroring). */
  private[graft] def minHashSigCol(sh: Column, numHashes: Int): Column =
    transform(sequence(lit(0), lit(numHashes - 1)),
      s => array_min(transform(sh, x => sha63(x, s))))

  /** Engine-replayable band keys off a signature:
    * `bk_b = sha63(b ":" slice-csv)` for each of the `bands` slices. */
  private[graft] def bandKeysCol(sig: Column, bands: Int,
      rowsPerBand: Int): Column =
    transform(sequence(lit(0), lit(bands - 1)), b =>
      sha63(concat(b.cast("string"), lit(":"), concat_ws(",",
        transform(slice(sig, b * lit(rowsPerBand) + 1,
          lit(rowsPerBand)), h => h.cast("string")))), lit(0)))

  private[graft] def minHashBandRows(df: DataFrame, textCol: String,
      idCol: String, shingleSize: Int, bands: Int,
      rowsPerBand: Int): DataFrame =
    df.select(col(idCol).cast("long").as("doc_id"),
        shingles(col(textCol), shingleSize).as("sh"))
      .select(col("doc_id"),
        minHashSigCol(col("sh"), bands * rowsPerBand).as("sig"))
      .select(col("doc_id"),
        explode(bandKeysCol(col("sig"), bands, rowsPerBand)).as("bk"))

  /** Persist the MinHash fingerprint index of a corpus, BUCKETED by band
    * key — the write-once artifact that makes batch-refresh dedup cost
    * ∝ batch instead of ∝ corpus: every later
    * [[incrementalDedupMinHash]] probe equi-joins the bucketed table with
    * ZERO exchange on the index side (hashpartitioning(bk) satisfies the
    * join's distribution), so the corpus is never re-fingerprinted and
    * never re-shuffled. The index is narrow — two longs per (doc, band) —
    * ~64 bytes/doc at the default 8 bands; at 100 TB it lives alongside
    * the corpus and appends new batches' rows after each refresh. */
  def writeMinHashIndex(corpus: DataFrame, textCol: String, idCol: String,
      table: String, buckets: Int = 16, shingleSize: Int = 3,
      bands: Int = 8, rowsPerBand: Int = 2): Unit =
    Bucketing.writeBucketed(
      minHashBandRows(corpus, textCol, idCol, shingleSize, bands, rowsPerBand),
      table, buckets, Seq("bk"))

  /** Corpus-wide LINE deduplication — the C4 law (Raffel et al., "Exploring
    * the Limits of Transfer Learning with a Unified Text-to-Text
    * Transformer", JMLR 2020, §2.2: repeated lines across the corpus are
    * boilerplate and are kept once): every distinct line survives ONLY in
    * the lowest-id document containing it; all other occurrences drop, and
    * each document rebuilds from its surviving lines in original order.
    * Within one document a repeated line keeps its FIRST position (the
    * deterministic tie). Complements [[graft.operators.Web.htmlExtract]]'s
    * within-document density law: that drops link-dense lines per page,
    * this drops the footer/disclaimer lines whole SITES repeat.
    *
    * Scale shape: line TEXT never crosses a line-keyed exchange. The
    * owner election aggregates narrow (sha63(line), doc, pos) rows (map-
    * side-combinable min-struct — a corpus-hot boilerplate line collapses
    * to O(partitions) 8-byte-keyed rows, never a full-text funnel), the
    * surviving (doc, pos) keys regroup per doc, and each document rebuilds
    * INTRA-ROW by indexing its own split-line array with the kept
    * positions — so the only exchange that carries text is the final
    * doc-keyed join of the one-row-per-doc frame. Residual of hashing the
    * key: two distinct lines colliding in the 63-bit space dedup as one —
    * ~n²/2⁶⁴ expected collisions corpus-wide, the same accepted residual
    * as every sha63 band key here. Returns (id, text, n_lines,
    * n_lines_dropped). */
  def dedupLines(df: DataFrame, idCol: String, textCol: String): DataFrame =
    dedupSegments(df, idCol, textCol, "\n")
      .withColumnRenamed("n_segments", "n_lines")
      .withColumnRenamed("n_segments_dropped", "n_lines_dropped")

  /** Separator-generic grain of [[dedupLines]] — `"\n\n"` gives the
    * RefinedWeb paragraph-dedup variant of the same corpus-wide
    * first-seen-owner law; the separator is quoted, not a regex. */
  def dedupSegments(df: DataFrame, idCol: String, textCol: String,
      sep: String): DataFrame = {
    val sepRe = java.util.regex.Pattern.quote(sep)
    val segs = df
      .select(col(idCol).cast("long").as("doc_id"),
        posexplode(split(col(textCol), sepRe)).as(Seq("pos", "seg")))
      .where(col("seg") =!= "")
      .select(col("doc_id"), col("pos"), sha63(col("seg"), lit(0)).as("lh"))
    val keptPos = segs.groupBy("lh")
      .agg(min(struct(col("doc_id"), col("pos"))).as("o"))
      .groupBy(col("o.doc_id").as("doc_id"))
      .agg(sort_array(collect_list(col("o.pos"))).as("kp"))
    df.select(col(idCol).cast("long").as("doc_id"),
        split(col(textCol), sepRe).as("__ls"))
      .join(keptPos, Seq("doc_id"), "left")
      .select(col("doc_id"),
        when(col("kp").isNull, lit(""))
          .otherwise(array_join(
            transform(col("kp"), p => element_at(col("__ls"), p + 1)), sep))
          .as("text"),
        coalesce(size(col("kp")), lit(0)).cast("long").as("n_segments"),
        (size(filter(col("__ls"), l => l =!= "")).cast("long")
          - coalesce(size(col("kp")), lit(0))).as("n_segments_dropped"))
  }

  /** Append a new batch's band rows to an existing [[writeMinHashIndex]]
    * table — the refresh lifecycle's second half: after
    * [[incrementalDedupMinHash]] verdicts, the batch's KEPT docs join the
    * index so the NEXT refresh dedups against them too. The append
    * pre-shuffles on the same bucket law and declares the identical
    * bucket spec, so the new files land bucket-aligned (several files per
    * bucket — scans stay bucket-aware and probes stay exchange-free);
    * Spark rejects a mismatched spec loudly. Cost ∝ batch, like the probe. */
  def appendMinHashIndex(batch: DataFrame, textCol: String, idCol: String,
      table: String, buckets: Int = 16, shingleSize: Int = 3,
      bands: Int = 8, rowsPerBand: Int = 2): Unit =
    minHashBandRows(batch, textCol, idCol, shingleSize, bands, rowsPerBand)
      .repartition(buckets, col("bk"))
      .write.mode("append")
      .bucketBy(buckets, "bk").sortBy("bk")
      .format("parquet").saveAsTable(table)

  /** Incremental batch dedup against a persisted [[writeMinHashIndex]]
    * index — the realistic 100 TB refresh: fingerprint ONLY the new batch,
    * probe the bucketed index for band collisions, and verify candidates
    * with the exact shingle Jaccard. The corpus is never re-fingerprinted;
    * corpus text is touched only for the candidate docs (a narrow
    * candidate-id join prunes the scan before shingling).
    *
    * VERDICT LAW (the refresh semantics, replayed verbatim by the oracle):
    * a batch doc is a duplicate iff it clears `threshold` against ANY
    * indexed corpus doc (the corpus is already kept — it always wins,
    * regardless of id order) OR against an EARLIER (lower-id) batch doc;
    * `dup_of` is the smallest such id. Batch-internal candidates come from
    * the batch's own band self-join — same law, no index round-trip.
    * ID IDENTITY: a batch doc whose id already exists in the index is a
    * RE-CRAWL of that document, not its duplicate — self-pairs are
    * excluded, and every candidate verifies against the text of its OWN
    * side (corpus candidates against corpus text, batch candidates against
    * batch text), so a revised document is never dropped for matching its
    * indexed former self.
    *
    * Scale shape: the probe is an equi-join on `bk` where the index side
    * is a bucketed scan (no exchange — the one shuffle is the batch's own
    * band rows, ∝ batch); the batch band rows are localCheckpointed (three
    * join branches read them — uncached, the 16-seed sha-256 signature
    * would be recomputed per branch, the measured minHashLsh trap); the
    * verify joins are candidate-bounded. Returns one row per batch doc:
    * (doc_id, n_cands, is_dup, dup_of). */
  def incrementalDedupMinHash(indexTable: String, corpusDocs: DataFrame,
      batch: DataFrame, textCol: String, idCol: String,
      shingleSize: Int = 3, bands: Int = 8, rowsPerBand: Int = 2,
      threshold: Double = 0.5): DataFrame = {
    val spark = batch.sparkSession
    val idx = spark.table(indexTable)
    // band rows ONCE: three join branches read this narrow frame, and the
    // 16-seed sha-256 signature behind it is the dominant probe cost —
    // checkpointed (narrow rows: the v2-lesson criterion for checkpoint
    // over cache), so no branch recomputes the fingerprints
    val bb = minHashBandRows(batch, textCol, idCol, shingleSize, bands,
      rowsPerBand).transform(Checkpoints.checkpointed)
    // self-pairs excluded: same id = same logical document (a re-crawl)
    val candCorpus = bb.as("b").join(idx.as("i"), "bk")
      .where(col("b.doc_id") =!= col("i.doc_id"))
      .select(col("b.doc_id").as("id_b"), col("i.doc_id").as("id_ref"))
      .distinct()
    val candBatch = bb.as("x").join(bb.as("y"), "bk")
      .where(col("x.doc_id") < col("y.doc_id"))
      .select(col("y.doc_id").as("id_b"), col("x.doc_id").as("id_ref"))
      .distinct()
    // exact-Jaccard verify on candidate-touched docs ONLY (the candidate
    // ids prune the text scans before any shingling), each candidate
    // against the text of its OWN side — an id present in both corpus and
    // batch (a re-crawl) verifies corpus candidates against the INDEXED
    // text, batch candidates against the new text
    val batchSh = batch
      .select(col(idCol).cast("long").as("doc_id"),
        shingles(col(textCol), shingleSize).as("sh_b"))
    def verify(cands: DataFrame, refDocs: DataFrame): DataFrame = {
      val refSh = refDocs
        .select(col(idCol).cast("long").as("doc_id"), col(textCol).as("__t"))
        .join(cands.select(col("id_ref").as("doc_id")).distinct(), "doc_id")
        .select(col("doc_id").as("id_ref"),
          shingles(col("__t"), shingleSize).as("sh_r"))
      cands.join(refSh, "id_ref")
        .join(batchSh.withColumnRenamed("doc_id", "id_b"), "id_b")
        .withColumn("inter", size(array_intersect(col("sh_b"), col("sh_r"))))
        .withColumn("uni",
          size(col("sh_b")) + size(col("sh_r")) - col("inter"))
        .withColumn("jaccard",
          when(col("uni") === 0, lit(1.0))
            .otherwise(col("inter") / col("uni")))
        .select("id_b", "id_ref", "jaccard")
    }
    val verified = verify(candCorpus, corpusDocs)
      .unionAll(verify(candBatch, batch))
    val nCands = candCorpus.unionAll(candBatch).distinct()
      .groupBy("id_b").agg(count(lit(1)).as("n_cands"))
    val dupOf = verified.where(col("jaccard") >= threshold)
      .groupBy("id_b").agg(min("id_ref").as("dup_of"))
    batch.select(col(idCol).cast("long").as("doc_id"))
      .join(nCands, col("doc_id") === nCands("id_b"), "left").drop("id_b")
      .join(dupOf, col("doc_id") === dupOf("id_b"), "left").drop("id_b")
      .select(col("doc_id"),
        coalesce(col("n_cands"), lit(0L)).as("n_cands"),
        col("dup_of").isNotNull.as("is_dup"), col("dup_of"))
  }

  /** 64-bit token hash = first 8 bytes of sha-256, assembled from two
    * 32-bit halves in exact long arithmetic (`conv` of all 16 hex chars
    * would parse past the signed-long range). sha-256 is bit-identical in
    * every engine — DuckDB replays this hash in SQL, so SimHash
    * fingerprints are hash-oracle-checkable, which 64-bit xxhash (JVM-only
    * seeding) never was. */
  private[operators] def sha64(t: Column): Column = {
    val hx = sha2(t, 256)
    val hi = conv(substring(hx, 1, 8), 16, 10).cast("long")
    val lo = conv(substring(hx, 9, 8), 16, 10).cast("long")
    call_function("shiftleft", hi, lit(32)).bitwiseOR(lo)
  }

  /** SimHash-64: per token, hash to 64 bits; per bit, +w if set else -w;
    * sign of each bit-sum forms the fingerprint. Intra-row via higher-order
    * aggregate over tokens — shuffle-free. */
  def simHash64(text: Column): Column =
    graft.functions.GraftFunctions.simHash64Native(text)

  /** Hamming distance between two 64-bit fingerprints (popcount via bit_count). */
  def hamming64(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** SimHash near-duplicate pairs (Manku, Jain & Das Sarma, "Detecting
    * Near-Duplicates for Web Crawling", WWW 2007): two 64-bit fingerprints
    * within hamming distance ≤ `maxHam` must agree on at least one of
    * `maxHam + 1` disjoint bit bands (pigeonhole), so the candidate
    * generator is an EQUI-join on (band, band-key) — never all-pairs —
    * and the exact `bit_count(xor)` verify trims the collisions. Unlike
    * the probabilistic MinHash/hyperplane bands, the pigeonhole bound is
    * DETERMINISTIC: modulo the hot-band cap below, recall at ≤ maxHam is
    * exact, not expected.
    *
    * Scale shape: one narrow (id, fp, band, key) explode (maxHam+1 rows
    * per doc), band-key equi-join, exact verify — the same three-stage
    * silhouette as the LSH pair generator. Hot bands (an exact-dup flood
    * shares EVERY band; a band whose bits happen to be constant across
    * the corpus collects everything) take the same occupancy-broadcast
    * sub-salt as the LSH buckets: keys over `bucketCap` shard by a
    * per-band id partition, pairs generate within a (band, key, shard).
    * Documented trade: a sharded band can split a pair, and PAIR-level
    * recall is exact only while some UNSHARDED shared band remains — in an
    * exact-dup flood EVERY band of the group is hot, so all maxHam+1 bands
    * shard and a specific pair whose ids separate in every band's id
    * partition can drop from the pair list. CLUSTER-level recall survives:
    * each doc still pairs with its same-shard co-members in every band
    * (shards hold ~bucketCap ≥ 2 docs), so the transitive closure
    * ([[dupClusters]]) re-merges the flood into one component — asserted
    * by OperatorSpec's flood case. Use pair COUNTS only where per-pair
    * exactness holds (no hot bands); use the closure for dedup verdicts.
    * The verify never re-admits a false positive. `maxHam + 1` must divide
    * 64 (3 → the paper's 4×16 config). */
  def simHashDupPairs(df: DataFrame, textCol: String, idCol: String,
      maxHam: Int = 3, bucketCap: Int = 64): DataFrame = {
    val bands = maxHam + 1
    require(64 % bands == 0, s"maxHam+1 = $bands must divide 64")
    val bits = 64 / bands
    val mask = (1L << bits) - 1
    // fingerprint ONCE: the (id, fp) frame is referenced by the occupancy
    // aggregate and BOTH sides of the self-join, and the simhash
    // expression (64 per-bit vote folds over the token array) is by far
    // the most expensive node in the plan — uncached it is recomputed in
    // all four branches (measured 12.6 s → 0.7 s at sf0.001).
    // CACHE LIVENESS: the entry lives in the session's CacheManager until
    // the caller unpersists — identical plans across calls REUSE it (warm
    // steady state), but a long-lived session mixing many corpora should
    // spark.catalog.clearCache() between them.
    val base = df.select(col(idCol).cast("long").as("id"),
      simHash64(col(textCol)).as("fp"))
      .cache()
    val banded = base.select(col("id"), col("fp"),
      posexplode(array((0 until bands).map(b =>
        call_function("shiftrightunsigned", col("fp"), lit(b * bits))
          .bitwiseAND(lit(mask))): _*)).as(Seq("band", "key")))
    // hot-band bound: per-(band, key) occupancy is a tiny aggregate
    // (≤ bands · distinct keys rows after partial combine) broadcast back;
    // oversize keys sub-salt into ceil(size/bucketCap) id-modulus shards
    val sizes = banded.groupBy("band", "key").agg(count(lit(1)).as("bsz"))
    val salted = banded.join(broadcast(sizes), Seq("band", "key"))
      .withColumn("nsh", greatest(lit(1L),
        ceil(col("bsz") / lit(bucketCap.toDouble)).cast("long")))
      .select(col("id"), col("fp"), col("band"), col("key"),
        pmod(expr("id div (band + 1)"), col("nsh")).as("shard"))
    salted.as("a").join(salted.as("b"), Seq("band", "key", "shard"))
      .where(col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        hamming64(col("a.fp"), col("b.fp")).as("hamming"))
      .distinct()
      .where(col("hamming") <= maxHam)
  }

  /** [[ngramJaccardPairs]] with a document-frequency cut — the 100 TB
    * variant: grams appearing in more than `maxDf` documents are dropped
    * before the self-join, removing the quadratic blowup on stopword-grade
    * tokens (a gram shared by f docs contributes f(f−1)/2 join rows). The
    * resulting Jaccard is computed over the surviving (discriminative) gram
    * sets — standard shingle-df pruning, documented cap, `log()`-able. */
  def ngramJaccardPairsWithDfCut(
      df: DataFrame, textCol: String, idCol: String,
      n: Int = 2, threshold: Double = 0.3, maxDf: Int = 1000,
      maxDfFraction: Option[Double] = None): DataFrame = {
    val base = df.select(col(idCol).as("doc_id"),
      array_distinct(shingles(col(textCol), n)).as("grams"))
    val docGrams = base.select(col("doc_id"), explode(col("grams")).as("gram"))
    // Hot-gram blacklist via hash-aggregate: partial (map-side) aggregation
    // collapses each gram to one row per input partition BEFORE the shuffle,
    // so a stopword-grade gram costs O(partitions) exchange rows — unlike a
    // `count over (partition by gram)` window, which must materialize and
    // sort every occurrence of the hottest gram in a single task before the
    // cut can drop it. Grams over the cut are few by construction (at most
    // totalGramRows / maxDf of them — stopword-grade tokens), so they fit a
    // single broadcast row; a corpus with a pathologically flat-but-hot
    // vocabulary would swap this for a shuffled anti-join.
    val gramCounts = docGrams.groupBy("gram").agg(count(lit(1)).as("df_count"))
    val hotGrams = maxDfFraction match {
      case Some(frac) =>
        // relative cut ("gram in > frac of corpus") computed in-plan: the
        // corpus size is a 1-row aggregate broadcast into the filter — no
        // driver-side action at plan-build time
        val nDocs = df.select(count(lit(1)).as("n_docs"))
        gramCounts.crossJoin(broadcast(nDocs))
          .where(col("df_count") > greatest(lit(1L),
            floor(col("n_docs") * frac)))
      case None => gramCounts.where(col("df_count") > maxDf)
    }
    // intra-row pruning: the hot set rides in as a broadcast 1-row array and
    // `array_except` drops it per document — no anti-join shuffle, and the
    // post-cut gram count (`sizes`) falls out of the array length for free
    val hotArr = hotGrams.agg(collect_list(col("gram")).as("hot"))
    val prunedBase = base.crossJoin(broadcast(hotArr))
      .select(col("doc_id"), array_except(col("grams"), col("hot")).as("grams"))
    val sizes = prunedBase.select(col("doc_id"),
      size(col("grams")).cast("long").as("n_grams"))
    val pruned = prunedBase.select(col("doc_id"), explode(col("grams")).as("gram"))
    val pairs = pruned.as("x").join(pruned.as("y"), Seq("gram"))
      .where(col("x.doc_id") < col("y.doc_id"))
      .groupBy(col("x.doc_id").as("id_a"), col("y.doc_id").as("id_b"))
      .agg(count(lit(1)).as("inter"))
    pairs
      .join(sizes.withColumnRenamed("doc_id", "id_a").withColumnRenamed("n_grams", "na"), "id_a")
      .join(sizes.withColumnRenamed("doc_id", "id_b").withColumnRenamed("n_grams", "nb"), "id_b")
      .withColumn("jaccard", col("inter") / (col("na") + col("nb") - col("inter")))
      .where(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }

  /** Benchmark decontamination: per-document overlap of word n-grams with
    * an evaluation set's gram universe — the standard pre-training
    * contamination check. Scale shape: eval sets are small by nature, so
    * their distinct grams collapse to ONE broadcast array row and the
    * corpus pass is map-only (`array_intersect` per document, no shuffle
    * of the corpus); a benchmark too large to broadcast would swap in the
    * explode + equi-join formulation the oracle uses. */
  def decontaminate(corpus: DataFrame, textCol: String, idCol: String,
      benchmark: DataFrame, benchTextCol: String, n: Int = 3): DataFrame = {
    val benchGrams = benchmark
      .select(explode(shingles(col(benchTextCol), n)).as("gram"))
      .distinct()
      .agg(collect_list(col("gram")).as("bench"))
    corpus
      .select(col(idCol).as("doc_id"), shingles(col(textCol), n).as("grams"))
      .crossJoin(broadcast(benchGrams))
      .select(
        col("doc_id"),
        size(col("grams")).cast("long").as("n_grams"),
        size(array_intersect(col("grams"), col("bench")))
          .cast("long").as("overlap_grams"))
      .withColumn("contamination_ratio",
        col("overlap_grams").cast("double") /
          greatest(col("n_grams"), lit(1L)))
  }

  /** Bloom-pruned decontamination — the 100 TB variant of [[decontaminate]]
    * for when the held-out/benchmark gram universe is itself too large to
    * broadcast as an exact set (e.g. decontaminating a crawl against an
    * entire earlier training corpus).
    *
    * Three stages: (1) fold the benchmark grams into ONE compact
    * [[org.apache.spark.util.sketch.BloomFilter]] via `treeAggregate`
    * (~1.2 bytes/gram at 1% fpp — 20-30× smaller than the strings it
    * summarizes); (2) gate the corpus grams intra-row with the codegen'd
    * `bloom_might_contain` probe — the corpus pass stays map-only and the
    * surviving candidate set is a tiny superset of the true overlap;
    * (3) verify the candidates EXACTLY with a semi-join against the real
    * benchmark grams, so bloom false positives are pruned and the output is
    * bit-identical to [[decontaminate]]. The only shuffles touch the
    * candidate grams and the per-doc count rows — never the corpus text. */
  def decontaminateBloom(corpus: DataFrame, textCol: String, idCol: String,
      benchmark: DataFrame, benchTextCol: String, n: Int = 3,
      fpp: Double = 0.01): DataFrame = {
    import org.apache.spark.util.sketch.BloomFilter
    val benchGrams = benchmark
      .select(explode(shingles(col(benchTextCol), n)).as("gram"))
      .distinct()
    val expected = math.max(benchGrams.count(), 1L)
    val bloom = benchGrams.select("gram").rdd
      .treeAggregate(BloomFilter.create(expected, fpp))(
        (bf, row) => { bf.putString(row.getString(0)); bf },
        (a, b) => { a.mergeInPlace(b); a })
    val bytes = {
      val bos = new java.io.ByteArrayOutputStream()
      bloom.writeTo(bos)
      bos.toByteArray
    }
    val base = corpus.select(col(idCol).as("doc_id"),
      shingles(col(textCol), n).as("grams"))
    val candidates = base
      .select(col("doc_id"), explode(filter(col("grams"), g =>
        graft.functions.GraftFunctions.bloomMightContain(g, bytes))).as("gram"))
    val overlap = candidates
      .join(benchGrams, Seq("gram"), "left_semi")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("overlap_grams"))
    base.select(col("doc_id"), size(col("grams")).cast("long").as("n_grams"))
      .join(overlap, Seq("doc_id"), "left")
      .select(
        col("doc_id"),
        col("n_grams"),
        coalesce(col("overlap_grams"), lit(0L)).as("overlap_grams"),
        (coalesce(col("overlap_grams"), lit(0L)).cast("double") /
          greatest(col("n_grams"), lit(1L))).as("contamination_ratio"))
  }

  /** Exact substring-duplication spans (the ExactSubstr idea of Lee et al.,
    * "Deduplicating Training Data Makes Language Models Better",
    * arXiv:2107.06499, re-expressed relationally at word-k-gram grain).
    *
    * A word offset is duplicated when its k-word window also occurs in at
    * least one OTHER document; per document, overlapping/adjacent duplicated
    * windows merge into maximal spans (gaps-and-islands). Returns one row
    * per document that contains at least one duplicated span:
    * `(doc_id, n_spans, dup_tokens, total_tokens, spans, dup_ratio)` where
    * `spans` renders the merged `[start,end)` token intervals as
    * `"s-e,s-e,…"` ordered by start.
    *
    * Scale shape — NO joins: one window over the gram key (`min(doc) ≠
    * max(doc)` detects cross-document occurrence with a map-side-combinable
    * aggregate law), then one window + two aggregates over `doc_id`, which
    * only ever see the (small) duplicated subset. The suffix array the paper
    * builds is a single-machine structure; the k-gram window relation is the
    * shuffle-native equivalent and exact for spans of length ≥ k. At 100 TB
    * the gram partition key would be swapped for a 128-bit gram hash to cut
    * shuffle width (collision-free in practice); kept as the raw gram here
    * so the result is exactly replayable by the SQL oracle. */
  def substringSpans(df: DataFrame, textCol: String, idCol: String,
      k: Int = 5): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val pos = df.select(
      col(idCol).cast("long").as("doc_id"),
      size(split(normalized(col(textCol)), " ", -1)).cast("long").as("n_tokens"),
      posexplode(graft.functions.GraftFunctions.ngramWindows(col(textCol), k))
        .as(Seq("pos", "gram")))
    val byGram = Window.partitionBy("gram")
    val dupPos = pos
      .withColumn("dup",
        min("doc_id").over(byGram) =!= max("doc_id").over(byGram))
      .where(col("dup"))
      .select("doc_id", "n_tokens", "pos")
    val byDoc = Window.partitionBy("doc_id").orderBy("pos")
    val islands = dupPos
      // a new island starts when this window no longer touches the previous
      // one; windows all have length k, so the running span end is
      // monotone and the break test reduces to a gap > k between starts
      .withColumn("brk",
        when(col("pos") - lag("pos", 1).over(byDoc) > k, 1).otherwise(0))
      .withColumn("island", sum("brk").over(
        byDoc.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val spans = islands.groupBy("doc_id", "island")
      .agg(
        max("n_tokens").as("n_tokens"),
        min("pos").cast("long").as("s"),
        // the final window may overhang a shorter-than-k doc (the
        // whole-doc fallback gram) — clamp to the token count
        least(max(col("pos")) + k, max("n_tokens")).cast("long").as("e"))
    spans.groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_spans"),
        sum(col("e") - col("s")).as("dup_tokens"),
        max("n_tokens").as("total_tokens"),
        array_join(
          transform(array_sort(collect_list(struct(col("s"), col("e")))),
            x => concat(x("s"), lit("-"), x("e"))), ",").as("spans"))
      .withColumn("dup_ratio", col("dup_tokens").cast("double") /
        greatest(col("total_tokens"), lit(1L)).cast("double"))
  }

  /** n-gram (word) Jaccard similarity between all pairs sharing a token —
    * fully relational formulation: explode distinct tokens, equi-join on
    * token, count common, derive |A∪B|. Suits medium corpora / oracle checks;
    * the LSH path above is the 100 TB variant. */
  def ngramJaccardPairs(
      df: DataFrame,
      textCol: String,
      idCol: String,
      n: Int = 2,
      threshold: Double = 0.3): DataFrame = {
    val base = df.select(col(idCol).as("doc_id"),
      array_distinct(shingles(col(textCol), n)).as("grams"))
    // |A| intra-row from the gram array — no groupBy shuffle; the sizes dim
    // stays one row per doc and AQE broadcast-joins it when small
    val sizes = base.select(col("doc_id"), size(col("grams")).cast("long").as("n_grams"))
    val docGrams = base.select(col("doc_id"), explode(col("grams")).as("gram"))

    val pairs = docGrams.as("x").join(docGrams.as("y"), Seq("gram"))
      .where(col("x.doc_id") < col("y.doc_id"))
      .groupBy(col("x.doc_id").as("id_a"), col("y.doc_id").as("id_b"))
      .agg(count(lit(1)).as("inter"))

    pairs
      .join(sizes.withColumnRenamed("doc_id", "id_a").withColumnRenamed("n_grams", "na"), "id_a")
      .join(sizes.withColumnRenamed("doc_id", "id_b").withColumnRenamed("n_grams", "nb"), "id_b")
      .withColumn("jaccard", col("inter") / (col("na") + col("nb") - col("inter")))
      .where(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }

  /** Embedding-cosine near-duplicate pairs: vectors quantized to integers
    * (×10⁴, rounded), then the threshold test runs entirely in integer
    * arithmetic — `dot > 0 && dot²·cosDen ≥ cosNum·|a|²·|b|²`, i.e.
    * cos ≥ sqrt(cosNum/cosDen) — so the pair set is bit-reproducible
    * across engines (no float sqrt at the boundary). This is the
    * documented all-pairs ORACLE variant for bounded corpora; the scale
    * path is [[cosineDupPairsLsh]], which applies the identical integer
    * threshold to hyperplane-bucket collisions only. */
  def cosineDupPairs(emb: DataFrame, idCol: String, vecCol: String,
      cosNum: Int, cosDen: Int): DataFrame = {
    val quant = transform(col(vecCol),
      x => round(x.cast("double") * 10000).cast("long"))
    val base = emb.select(col(idCol).cast("long").as("id"), quant.as("v"))
      .withColumn("n2", graft.functions.GraftFunctions.longNorm2(col("v")))
    val a = base.select(col("id").as("id_a"), col("v").as("va"),
      col("n2").as("na"))
    val b = base.select(col("id").as("id_b"), col("v").as("vb"),
      col("n2").as("nb"))
    a.join(b, col("id_a") < col("id_b"))
      .withColumn("dot",
        graft.functions.GraftFunctions.longDot(col("va"), col("vb")))
      // decimal(38,0) keeps dot² (≈10²⁰ at dim 64) exact
      .where(col("dot") > 0 &&
        col("dot").cast("decimal(38,0)") * col("dot") * cosDen >=
        col("na").cast("decimal(38,0)") * col("nb") * cosNum)
      .select("id_a", "id_b", "dot")
  }

  /** Semantic deduplication (Abbas et al., "SemDeDup: Data-efficient
    * learning at web-scale through semantic deduplication", 2023) as a
    * pure relational composition of laws this engine already oracles:
    * cluster the embedding space into `nCells` cells (the exact-integer
    * IVF routing relations — lowest-id quantized centroid seed, optional
    * [[Similarity.refineIvfCentroidsExact]] Lloyd refinement, native
    * strict-< L2 argmin assignment), generate candidate pairs only WITHIN
    * a cell, score them with [[cosineDupPairs]]' exact integer cosine test
    * (dot²·cosDen ≥ n2a·n2b·cosNum, decimal-exact), and drop the higher id
    * of every qualifying pair.
    *
    * Verdict law (greedy-by-id, fully relational): `is_dup(i)` ⇔ some
    * co-cell j < i clears the threshold; `dup_of` = the LOWEST such j.
    * Chains are resolved greedily (b may drop against a while c drops
    * against b) — the standard SemDeDup per-cluster keep-one
    * approximation, deterministic and SQL-replayable.
    *
    * Scale shape: the cells bound the quadratic pair work — one shuffle on
    * `cell`, Σ |cell|² candidate pairs instead of N² (pick nCells ∝
    * N / target cell size at 100 TB). A pathological HOT cell (a corpus
    * that is mostly one semantic neighborhood) takes the same sub-salting
    * treatment as the LSH buckets ([[cosineDupPairsLsh]]'s bucketCap):
    * cells larger than `cellCap` shard by `id mod ceil(size/cellCap)` and
    * pairs generate within a (cell, shard) only, so the join work is
    * bounded by ~cellCap per doc REGARDLESS of the corpus shape. The cap's
    * documented trade: a sharded cell keeps up to `nsh` representatives
    * (one per shard) instead of one — bounded work for bounded
    * over-retention, never a quadratic blowup. The verdict join shuffles
    * one narrow (id, min dup) frame. */
  def semanticDedup(emb: DataFrame, idCol: String, vecCol: String,
      nCells: Int = 16, cosNum: Int = 4, cosDen: Int = 25,
      lloydIters: Int = 0, cellCap: Int = 64): DataFrame = {
    val quant = transform(col(vecCol),
      x => round(x.cast("double") * 10000).cast("long"))
    val base = emb.select(col(idCol).cast("long").as("id"), quant.as("v"))
      .withColumn("n2", graft.functions.GraftFunctions.longNorm2(col("v")))
    val seed: Seq[(Long, Seq[Long])] = base.orderBy("id").limit(nCells)
      .select("v").collect().toSeq
      .zipWithIndex.map { case (r, i) => (i.toLong, r.getSeq[Long](0).toSeq) }
    require(seed.nonEmpty, "semantic dedup needs a non-empty corpus")
    val cent =
      if (lloydIters <= 0) seed
      else Similarity.refineIvfCentroidsExact(base, "v", seed, lloydIters)
    val centFlat = cent.flatMap(_._2).toArray
    val cells = base.withColumn("cell",
      graft.functions.GraftFunctions.longL2Argmin(
        col("v"), centFlat, cent.size))
    // hot-cell bound: per-cell occupancy is a tiny aggregate (≤ nCells
    // rows) broadcast back; oversize cells shard by id-modulus and the
    // pair join adds `shard` to its key
    val cellSizes = cells.groupBy("cell").agg(count(lit(1)).as("csz"))
    val salted = cells.join(broadcast(cellSizes), Seq("cell"))
      .withColumn("shard", pmod(col("id"), greatest(lit(1L),
        ceil(col("csz") / lit(cellCap.toDouble)).cast("long"))))
    val a = salted.select(col("cell"), col("shard"), col("id").as("id_a"),
      col("v").as("va"), col("n2").as("na"))
    val b = salted.select(col("cell"), col("shard"), col("id").as("id_b"),
      col("v").as("vb"), col("n2").as("nb"))
    val dupOf = a.join(b, Seq("cell", "shard"))
      .where(col("id_a") < col("id_b"))
      .withColumn("dot",
        graft.functions.GraftFunctions.longDot(col("va"), col("vb")))
      // decimal(38,0) keeps dot² (≈10²⁰ at dim 64) exact
      .where(col("dot") > 0 &&
        col("dot").cast("decimal(38,0)") * col("dot") * cosDen >=
        col("na").cast("decimal(38,0)") * col("nb") * cosNum)
      .groupBy("id_b").agg(min("id_a").as("dup_of"))
    cells.select(col("id"), col("cell"))
      .join(dupOf, col("id") === col("id_b"), "left")
      .select(col("id"), col("cell"),
        col("dup_of").isNotNull.as("is_dup"), col("dup_of"))
  }

  /** Deterministic Rademacher hyperplane component for (table t, plane p,
    * dim d): ±1 from the parity of the first hex char of sha256("t:p:d").
    * sha-256 is bit-identical everywhere (JVM, DuckDB, any engine), so the
    * bucket assignment is cross-engine reproducible — unlike xxhash64-seeded
    * planes, which only the JVM can replay. Contract and hot loop live in
    * [[graft.codec.Hyperplane]]. */
  private[operators] def planeSign(t: Int, p: Int, d: Int): Long =
    graft.codec.Hyperplane.planeSign(t, p, d)

  /** The 100 TB embedding-dedup path: [[cosineDupPairs]]' integer-quantized
    * threshold applied only to hyperplane-LSH bucket collisions.
    *
    * Each vector is mapped — intra-row, shuffle-free, inside whole-stage
    * codegen via the native [[graft.plans.HyperplaneBucketsExpression]] —
    * to one `bits`-bit bucket per table: bit p = sign of the dot product
    * with a fixed ±1 Rademacher plane ([[planeSign]], exact integer
    * arithmetic over the quantized vector). Candidates are pairs sharing a
    * (table, bucket) key — ONE equi-join shuffle on a narrow (id, table,
    * bucket) frame — and only candidates are scored with the exact integer
    * cosine test. Multiple tables OR together for recall. The vectors
    * themselves do not travel through the LSH shuffle (candidates re-join
    * the cached base by id).
    *
    * HOT-BUCKET BOUND: a degenerate bucket (near-identical corpus region,
    * or an unlucky hyperplane draw) makes the bucket self-join quadratic in
    * the largest bucket — the one way this plan dies at 100 TB, and a real
    * 3× regression when the driver regenerated the embeddings in round 10.
    * So buckets larger than `bucketCap` are deterministically sub-salted
    * into `ceil(size/bucketCap)` shards and only same-shard pairs become
    * candidates, bounding per-bucket work at O(size · bucketCap). The shard
    * key is `(id div (table+1)) mod nshards` — a DIFFERENT partition of ids
    * per table, so a pair split by table 0's shards can still collide in
    * tables 1..k (the same OR-across-tables recall argument as the planes
    * themselves); residual cross-shard misses inside a hot bucket are the
    * documented recall trade for boundedness, and the transitive label
    * closure downstream re-merges most of them. Bucket sizes are a
    * ≤ tables·2^bits row aggregate, broadcast back onto the narrow banded
    * frame — map-side, no extra shuffle of the data; at production `bits`
    * (20+) swap the broadcast for a shuffle join on the same key.
    *
    * `dim` is taken per-row from the vector itself (ragged inputs can't
    * silently zero a bit); the parameter is kept for signature stability. */
  def cosineDupPairsLsh(emb: DataFrame, idCol: String, vecCol: String,
      cosNum: Int, cosDen: Int, dim: Int = 64,
      bits: Int = 6, tables: Int = 4, bucketCap: Int = 64): DataFrame = {
    val quant = transform(col(vecCol),
      x => round(x.cast("double") * 10000).cast("long"))
    val base = emb.select(col(idCol).cast("long").as("id"), quant.as("v"))
      .withColumn("n2", graft.functions.GraftFunctions.longNorm2(col("v")))
      // quantize once: bucket explode + two verification joins reuse it.
      // CACHE LIVENESS: see simHashDupPairs — clearCache() between corpora
      // in long-lived sessions.
      .cache()
    // narrow (id, table, bucket) rows — the only frame the LSH shuffle moves
    val banded = base.select(col("id"),
      posexplode(graft.functions.GraftFunctions.hyperplaneBuckets(
        col("v"), bits, tables)).as(Seq("tbl", "bucket")))
    // hot-bucket bound (see Scaladoc): per-(tbl,bucket) occupancy is a tiny
    // aggregate (≤ tables·2^bits rows) broadcast back onto the banded frame;
    // oversize buckets sub-salt into ceil(size/bucketCap) shards keyed by a
    // per-table id partition, and the candidate join adds `shard` to its key
    val bucketSizes = banded.groupBy("tbl", "bucket")
      .agg(count(lit(1)).as("bsz"))
    val salted = banded.join(broadcast(bucketSizes), Seq("tbl", "bucket"))
      .withColumn("nsh", greatest(lit(1L),
        ceil(col("bsz") / lit(bucketCap.toDouble)).cast("long")))
      .select(col("id"), col("tbl"), col("bucket"),
        pmod(expr("id div (tbl + 1)"), col("nsh")).as("shard"))
    val candidates = salted.as("a")
      .join(salted.as("b"), Seq("tbl", "bucket", "shard"))
      .where(col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct()
    candidates
      .join(base.select(col("id").as("id_a"), col("v").as("va"),
        col("n2").as("na")), "id_a")
      .join(base.select(col("id").as("id_b"), col("v").as("vb"),
        col("n2").as("nb")), "id_b")
      .withColumn("dot",
        graft.functions.GraftFunctions.longDot(col("va"), col("vb")))
      .where(col("dot") > 0 &&
        col("dot").cast("decimal(38,0)") * col("dot") * cosDen >=
        col("na").cast("decimal(38,0)") * col("nb") * cosNum)
      .select("id_a", "id_b", "dot")
  }

  /** Near-duplicate CLUSTERS: connected components over candidate pairs
    * (from [[ngramJaccardPairs]] or the MinHash/SimHash band joins) by
    * iterative min-label propagation — each vertex converges to the
    * smallest doc id in its component, the canonical representative for
    * keep-one-per-cluster dedup.
    *
    * Scale shape: one equi-join shuffle per iteration, O(component
    * diameter) iterations — near-dup clusters are short-diameter (near-
    * cliques), so 3-5 rounds in practice, which makes this the DEFAULT;
    * `maxIter` bounds adversarial chains, for which
    * [[dupClustersAlternating]] is the O(log n)-round escape hatch (see
    * its scaladoc for the measured crossover). Each materialized round chains
    * TWO propagation hops — min-propagation is monotone, so if the second
    * hop moves nothing the fixpoint is reached regardless of the first,
    * and the convergence check on the second hop alone stays exact. That
    * halves the number of driver barriers (each a straggler-amplifier at
    * cluster scale) for the price of one possibly-wasted hop. TWO is the
    * measured optimum: each hop references its predecessor twice (the
    * union AND the join), so the uncut per-round plan doubles its base
    * evaluations per extra hop — going 2→3 hops regressed the sf0.1
    * cluster query 4.3 s → 10.4 s isolated. Labels persist per round;
    * the check is one count over the same persisted result.
    *
    * The iteration runs over EDGE-INCIDENT vertices only: in a real corpus
    * the duplicate subgraph is orders of magnitude smaller than the table
    * (most docs have no near-dup pair), so the per-round shuffle moves
    * candidate vertices, not the whole corpus. Untouched docs keep
    * `cluster_id = id` via one final join — which AQE turns into a
    * broadcast when the touched set is small. */
  def dupClusters(docs: DataFrame, idCol: String,
      pairs: DataFrame, aCol: String, bCol: String,
      maxIter: Int = 20): DataFrame = {
    val disk = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val spark = docs.sparkSession
    val edges0 = pairs.select(col(aCol).as("src"), col(bCol).as("dst"))
      .unionAll(pairs.select(col(bCol).as("src"), col(aCol).as("dst")))
      .distinct()
    // REBASE the edge set on its materialized RDD before looping: `edges`
    // appears twice per hop (join + union), so a loop over the raw frame
    // makes Catalyst re-analyze and re-optimize the ENTIRE upstream
    // pair-generator tree (LSH explode + broadcast salt + two
    // verification joins) four times per round — measured as ~3 s of pure
    // driver plan-compile latency on the sf0.1 embedding-LSH query (the
    // executors were done in ~1.5 s). The RDD leaf keeps every round's
    // plan constant-size; localCheckpoint cuts the lineage like the label
    // rounds below.
    val edges0Rdd = Checkpoints.checkpointedRdd(spark, edges0.rdd, disk)
    // ADAPTIVE ITERATION WIDTH: the per-round frames are sized by the
    // duplicate SUBGRAPH, not the corpus, and at realistic dup densities
    // that is thousands of rows — where the dominant per-round cost is
    // task-count overhead (measured: the sf0.1 cluster queries run ~30%
    // faster at 8 partitions than 32). Size the persisted-frame width by
    // the measured edge count (~100k rows/task), capped at the session's
    // parallelism so a 100 TB edge set keeps every core.
    val width = math.max(1L, math.min(
      spark.sparkContext.defaultParallelism.toLong,
      edges0Rdd.count() / 100000L + 1)).toInt
    val edges = spark.createDataFrame(
      edges0Rdd.coalesce(width), edges0.schema)
    // both endpoints of every pair appear as `src` (edges are symmetrized
    // above), so src alone enumerates the touched vertex set
    var labels = edges
      .select(col("src").cast("long").as("v"))
      .distinct()
      .select(col("v"), col("v").as("label"))
    var prevRdd: org.apache.spark.rdd.RDD[org.apache.spark.sql.Row] = null
    var changed = 1L
    var i = 0
    // one propagation hop: own labels and neighbor-propagated labels
    // aggregate together; `prev` carries the hop's OWN starting label so
    // the convergence check is a filter over the same frame (no re-join)
    def hop(ls: DataFrame): DataFrame = {
      val prop = edges.alias("e")
        .join(ls.alias("l"), col("e.src") === col("l.v"))
        .select(col("e.dst").as("v"), col("l.label").as("label"),
          lit(false).as("own"))
      ls.select(col("v"), col("label"), lit(true).as("own"))
        .unionAll(prop)
        .groupBy("v").agg(min("label").as("label"),
          min(when(col("own"), col("label"))).as("prev"))
    }
    while (changed > 0 && i < maxIter) {
      // two hops per materialized round, checked on the SECOND hop's delta
      val plan = hop(hop(labels).select("v", "label"))
      // CUT the logical plan each round: `labels` appears twice per hop
      // (join + union), so composing plans grows the tree 4× per round —
      // after ~10 rounds the driver chokes on the plan string regardless
      // of data size. Rebasing on the persisted RDD keeps the per-round
      // plan constant-size, and localCheckpoint CUTS THE RDD LINEAGE too:
      // without it each round's scan still references the previous round's
      // RDD object, so task serialization recurses a graph that grows per
      // round (intermittent StackOverflowError — the failure GraphX solves
      // the same way). The checkpoint POLICY (Checkpoints.checkpointedRdd)
      // picks RELIABLE checkpointing when a checkpoint dir is configured —
      // the executor-loss-safe cluster mode — and executor-local otherwise.
      // Coalescing to the adaptive width keeps every subsequent stage's
      // task count proportional to the subgraph.
      val rdd = Checkpoints.checkpointedRdd(spark,
        plan.rdd.coalesce(width), disk)
      val next = spark.createDataFrame(rdd, plan.schema)
      changed = next.where(col("label") < col("prev")).count()
      if (prevRdd != null) prevRdd.unpersist(false)
      prevRdd = rdd
      labels = next.select("v", "label")
      i += 1
    }
    edges0Rdd.unpersist(false)
    // exiting on the iteration cap with propagation still in flight would
    // return silently WRONG (split) components — make it loud instead; the
    // caller can raise maxIter (rounds needed ≈ component diameter). The
    // last round's working blocks are dropped BEFORE the throw so a caught
    // failure doesn't strand persisted RDDs in the session.
    if (changed > 0) {
      if (prevRdd != null) prevRdd.unpersist(false)
      throw new IllegalStateException(
        s"dupClusters did not converge after $maxIter rounds (2 hops each; " +
          s"$changed labels still moving): component diameter exceeds " +
          "2×maxIter — raise maxIter (rounds ≈ diameter/2)")
    }
    // materialize the final label table into its own (small: touched
    // vertices only) persisted RDD, then drop the last round's working
    // blocks — repeated calls in one session no longer accumulate
    // per-round caches; only one label table per live result stays cached
    val labelPlan = labels
    val labelRdd = Checkpoints.checkpointedRdd(spark,
      labelPlan.rdd.coalesce(width), disk)
    labelRdd.count()
    if (prevRdd != null) prevRdd.unpersist(false)
    labels = spark.createDataFrame(labelRdd, labelPlan.schema)
    // stitch the untouched corpus back: docs with no near-dup pair are
    // their own singleton cluster
    docs.select(col(idCol).cast("long").as("v"))
      .join(labels.withColumnRenamed("label", "cluster_id"), Seq("v"), "left")
      .select(col("v").as(idCol),
        coalesce(col("cluster_id"), col("v")).as("cluster_id"))
  }

  /** [[dupClusters]] with the large-star/small-star alternation (Kiveris
    * et al., "Connected Components in MapReduce and Beyond", 2014):
    * worst-case O(log n) rounds instead of O(diameter) — the variant for
    * ADVERSARIAL duplicate graphs (scrape chains, boilerplate ladders,
    * template families linked end-to-end) where min-label propagation's
    * rounds ≈ diameter/2 would dominate wall-clock.
    *
    * CROSSOVER — [[dupClusters]] stays the DEFAULT. Each alternating round
    * costs more shuffles (two grouped passes + joins + a terminal
    * distinct vs label-prop's two cheap hop aggregates), so on realistic
    * near-dup graphs — bushy near-cliques with single-digit diameters,
    * which is what MinHash/SimHash candidate pairs produce on real
    * corpora — label propagation wins outright: measured at sf0.1,
    * 3.23 s (label-prop) vs 4.10 s (alternating), both isolated. Reach
    * for this variant only when components are plausibly LONG CHAINS
    * (diameter ≳ 50: linked template families, pairwise-chained scrape
    * mirrors), where label-prop's round count ≈ diameter/2 explodes while
    * this converges in ≤ log₂(n)-ish rounds (spec: a 63-diameter path
    * takes ≤ 10 rounds here vs 32 for label-prop).
    *
    * Each round is two grouped passes over the current edge set, both
    * map-side-combinable aggregations + an equi-join:
    *   large-star: every node links its LARGER neighbors to its minimum;
    *   small-star: every node links its (now all smaller) neighbors and
    *   itself to its minimum.
    * Edges stay (larger, smaller)-oriented throughout; the fixpoint is a
    * star per component rooted at the component minimum. Same output
    * contract as [[dupClusters]]. */
  def dupClustersAlternating(docs: DataFrame, idCol: String,
      pairs: DataFrame, aCol: String, bCol: String,
      maxIter: Int = 25): DataFrame =
    alternatingComponents(docs, idCol, pairs, aCol, bCol, maxIter)._1

  private[graft] def alternatingComponents(docs: DataFrame, idCol: String,
      pairs: DataFrame, aCol: String, bCol: String,
      maxIter: Int): (DataFrame, Int) = {
    val disk = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val spark = docs.sparkSession
    // canonical (u > v) orientation, self-loops dropped
    val init = pairs
      .select(greatest(col(aCol), col(bCol)).cast("long").as("u"),
        least(col(aCol), col(bCol)).cast("long").as("v"))
      .where(col("u") =!= col("v")).distinct()

    def largeStar(e: DataFrame): DataFrame = {
      val sym = e.unionAll(e.select(col("v").as("u"), col("u").as("v")))
      val m = sym.groupBy("u").agg(min("v").as("mn"))
        .select(col("u"), least(col("mn"), col("u")).as("m"))
      // no distinct here: small-star's terminal distinct canonicalizes,
      // and its min-aggregate is duplicate-insensitive — one less shuffle
      // per round
      sym.where(col("v") > col("u")).join(m, "u")
        .select(col("v").as("u"), col("m").as("v"))
    }
    def smallStar(e: DataFrame): DataFrame = {
      // input is (u > v)-oriented, so every neighbor of u in `e` is smaller
      val m = e.groupBy("u").agg(min("v").as("m"))
      e.join(m, "u").select(col("v").as("w"), col("m"))
        .unionAll(m.select(col("u").as("w"), col("m")))
        .where(col("w") =!= col("m"))
        .select(col("w").as("u"), col("m").as("v")).distinct()
    }

    // adaptive iteration width (see dupClusters): task overhead, not
    // compute, dominates small edge frames; huge ones keep full width
    def widthFor(n: Long): Int = math.max(1L, math.min(
      spark.sparkContext.defaultParallelism.toLong, n / 100000L + 1)).toInt
    // rebase the initial edge set on its materialized RDD (see
    // dupClusters): the star rounds reference `edges` several times each,
    // so looping over the raw frame would re-optimize the whole upstream
    // pair-generator tree every round — driver plan latency, not compute
    val initRdd = Checkpoints.checkpointedRdd(spark, init.rdd, disk)
    var edgeCount = initRdd.count()
    var edges = spark.createDataFrame(
      initRdd.coalesce(widthFor(edgeCount)), init.schema)
    var prevRdd: org.apache.spark.rdd.RDD[org.apache.spark.sql.Row] = initRdd
    var converged = edgeCount == 0
    var rounds = 0
    while (!converged && rounds < maxIter) {
      val plan = smallStar(largeStar(edges))
      // same per-round plan + LINEAGE cut as dupClusters: rebase on the
      // persisted RDD so the logical tree stays constant-size, and
      // localCheckpoint so the RDD graph does too (see dupClusters)
      val rdd = Checkpoints.checkpointedRdd(spark,
        plan.rdd.coalesce(widthFor(edgeCount)), disk)
      val next = spark.createDataFrame(rdd, plan.schema)
      // exact two-tier fixpoint test: a changed edge COUNT (one cheap job
      // over the persisted RDD) proves non-convergence without the
      // shuffle-heavy set compare; only equal-count rounds pay ONE except
      // (both frames are distinct, so next ⊆ edges ∧ |next| = |edges| ⟺ =)
      val nextCount = next.count()
      converged = nextCount == edgeCount && next.except(edges).isEmpty
      edgeCount = nextCount
      if (prevRdd != null) prevRdd.unpersist(false)
      prevRdd = rdd
      edges = next
      rounds += 1
    }
    if (!converged) {
      // drop the last round's persisted blocks before the throw — a caught
      // non-convergence must not strand working RDDs in the session
      if (prevRdd != null) prevRdd.unpersist(false)
      throw new IllegalStateException(
        s"dupClustersAlternating did not converge after $maxIter rounds - " +
          "this exceeds the O(log n) bound; raise maxIter")
    }
    // fixpoint: stars rooted at component minima — edges ARE the labels.
    // Materialize them into their own (small) persisted RDD and drop the
    // last round's working blocks, so repeated calls in one session don't
    // accumulate per-round caches (only one label table per live result)
    val labelPlan = edges.select(col("u").as("v"), col("v").as("cluster_id"))
    val labelRdd = Checkpoints.checkpointedRdd(spark, labelPlan.rdd
      .coalesce(widthFor(math.max(edgeCount, 1L))), disk)
    labelRdd.count()
    if (prevRdd != null) prevRdd.unpersist(false)
    val labels = spark.createDataFrame(labelRdd, labelPlan.schema)
    val out = docs.select(col(idCol).cast("long").as("v"))
      .join(labels, Seq("v"), "left")
      .select(col("v").as(idCol),
        coalesce(col("cluster_id"), col("v")).as("cluster_id"))
    (out, rounds)
  }
}
