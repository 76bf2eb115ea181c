package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.{Classifier, Dedup, Similarity}

/** Scale-stress harness for the iterative/heavy operators: synthesizes an
  * N× corpus (default 10× ≈ sf1) from the sf0.1 documents/embeddings
  * tables, runs each heavy operator ISOLATED at 1× and N×, and CHECKS the
  * scale invariants in-process — a violated invariant throws, so a green
  * run is itself the assertion:
  *
  *   - connected components (large/small-star): converges within the
  *     O(log n) round bound at N× (`maxIter = ceil(log2 n) + 4`);
  *   - embedding LSH: the hot-bucket sub-salt keeps the candidate
  *     generator at O(n · cap) — measured Σ s·(s−1)/2 over the salted
  *     (table, bucket, shard) occupancies must stay ≤ tables · n · 3·cap,
  *     and the largest shard ≤ 3·cap (the shard law is a modulus over
  *     ids, so a mild skew factor is expected; quadratic blowup is not);
  *   - df-cut Jaccard: after the 10% relative cut no surviving gram has
  *     df above the cut, and the prune ratio (gram rows dropped) is
  *     recorded;
  *   - IVF: every query returns exactly k ranked neighbors off the
  *     persisted index shape.
  *
  * The N× corpus preserves duplicate structure per copy (text gets a
  * per-copy marker token, embeddings a per-copy single-dimension nudge)
  * so the dup-graph density scales linearly, not quadratically — the
  * shape a real 10× crawl has. Usage:
  *   sbt "runMain graft.tools.BenchScale [factor]"   (writes to stdout;
  *   paste the table into BENCH_scale.md)
  */
object BenchScale {
  def main(args: Array[String]): Unit = {
    val factor = args.headOption.map(_.toInt).getOrElse(10)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.warehouse.dir", java.nio.file.Files
        .createTempDirectory("graft-scale-wh").toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs1 = spark.read.parquet(s"$sfDir/documents.parquet")
    val emb1 = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val nDocs1 = docs1.count()
    val nEmb1 = emb1.count()

    // ---- N× corpus, written once and read back like a real input -------
    val tmp = java.nio.file.Files.createTempDirectory("graft-scale").toString
    val docOff = docs1.agg(max("doc_id")).head().getLong(0) + 1
    val embOff = emb1.agg(max("vec_id")).head().getLong(0) + 1
    (0 until factor).map { k =>
      docs1.select((col("doc_id") + k * docOff).as("doc_id"),
        // per-copy TOKEN salt: copy k's vocabulary is disjoint from copy
        // j's, so cross-copy similarity is zero while each copy keeps the
        // original dup structure — dup density and per-gram df scale
        // LINEARLY with the factor, the shape a real 10× crawl has (a
        // suffix marker instead would make every cross-copy pair a
        // ≈1.0-Jaccard dup and square the pair work)
        (if (k == 0) col("text")
         else regexp_replace(col("text"), "(\\S+)", s"c${k}_$$1")).as("text"),
        col("lang"), col("source"), col("n_chars"))
    }.reduce(_ unionAll _).write.mode("overwrite")
      .parquet(s"$tmp/documents.parquet")
    (0 until factor).map { k =>
      emb1.select((col("vec_id") + k * embOff).as("vec_id"),
        (if (k == 0) col("embedding")
         else transform(col("embedding"), (x, i) =>
           when(i === k % 64, x + lit(0.003f * k)).otherwise(x)))
          .as("embedding"),
        col("label"))
    }.reduce(_ unionAll _).write.mode("overwrite")
      .parquet(s"$tmp/embeddings.parquet")
    val docsN = spark.read.parquet(s"$tmp/documents.parquet")
    val embN = spark.read.parquet(s"$tmp/embeddings.parquet")
    val nDocsN = docsN.count()
    val nEmbN = embN.count()
    println(s"[scale] corpus: ${nDocs1} -> ${nDocsN} docs, " +
      s"${nEmb1} -> ${nEmbN} embeddings (factor $factor)")

    def timed(label: String)(body: => Long): Double = {
      val t0 = System.nanoTime()
      val n = body
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[scale] $label%-28s ${dt}%8.2f s  ($n rows)")
      dt
    }

    val rows = scala.collection.mutable.ArrayBuffer.empty[
      (String, Double, Double)]
    def at(label: String)(run: (DataFrame, DataFrame) => Long): Unit = {
      val t1 = timed(s"$label @1x") { run(docs1, emb1) }
      val tN = timed(s"$label @${factor}x") { run(docsN, embN) }
      rows += ((label, t1, tN))
    }

    // ---- df-cut Jaccard pairs (the 100 TB pair generator) --------------
    // ABSOLUTE cut calibrated at the 1× corpus, not the relative fraction
    // the catalog query uses: growing the corpus while per-gram df stays
    // bounded (new content, disjoint vocabulary — this harness's shape,
    // and a real crawl's) LOOSENS a relative cut proportionally, so
    // stopword-grade grams (df ≈ one shard's size) slip back under it and
    // re-quadratize the pair join. The measured lesson: at scale the df
    // cut must be calibrated per shard / absolute, not as a fraction of
    // the whole crawl.
    val absCut = math.max(1, (nDocs1 * 0.1).toInt)
    at("jaccard_dfcut") { (d, _) =>
      Dedup.ngramJaccardPairsWithDfCut(d, "text", "doc_id",
        n = 1, threshold = 0.5, maxDf = absCut).count()
    }
    // invariant: the cut bounds the pair-generator's join fan-out — the
    // per-gram candidate work Σ df·(df−1)/2 over SURVIVING grams must stay
    // ≤ totalGramRows · cut / 2 (each surviving gram has df ≤ cut), while
    // the uncut work is quadratic in the hottest gram
    locally {
      val cut = absCut.toLong
      val dfs = docsN.select(
          explode(array_distinct(Dedup.shingles(col("text"), 1))).as("gram"))
        .groupBy("gram").agg(count(lit(1)).as("df"))
        .select(col("df").cast("double").as("df")).cache()
      val Array(totalRows, workAll) = dfs
        .agg(sum("df"), sum(col("df") * (col("df") - 1) / 2))
        .head().toSeq.map(_.asInstanceOf[Double].toLong).toArray
      val workCut = dfs.where(col("df") <= cut)
        .agg(coalesce(sum(col("df") * (col("df") - 1) / 2), lit(0.0)))
        .head().getDouble(0).toLong
      println(s"[scale] dfcut: candidate work $workAll uncut -> $workCut " +
        s"cut (bound ${totalRows * cut / 2}); " +
        f"${100.0 * (workAll - workCut) / math.max(workAll, 1)}%.1f%% pruned")
      require(workCut <= totalRows * cut / 2,
        s"df-cut invariant violated: post-cut work $workCut exceeds " +
          s"rows*cut/2 = ${totalRows * cut / 2}")
      dfs.unpersist()
    }

    // ---- connected components over the df-cut pair graph ---------------
    def pairsOf(d: DataFrame): DataFrame =
      Dedup.ngramJaccardPairsWithDfCut(d, "text", "doc_id",
        n = 1, threshold = 0.5, maxDf = absCut)
    at("cc_label_prop") { (d, _) =>
      Dedup.dupClusters(d, "doc_id", pairsOf(d), "id_a", "id_b").count()
    }
    at("cc_alternating") { (d, _) =>
      // the O(log n) bound IS the invariant: maxIter = ceil(log2 n) + 4,
      // non-convergence throws; actual round count is reported
      val bound = (math.log(math.max(d.count(), 2).toDouble) /
        math.log(2.0)).ceil.toInt + 4
      val (labels, rounds) = Dedup.alternatingComponents(d, "doc_id",
        pairsOf(d), "id_a", "id_b", maxIter = bound)
      val n = labels.count()
      println(s"[scale] cc_alternating rounds: $rounds (bound $bound)")
      n
    }

    // ---- embedding LSH near-dup (hot-bucket-capped candidates) ---------
    at("embedding_lsh") { (_, e) =>
      Dedup.cosineDupPairsLsh(e, "vec_id", "embedding",
        cosNum = 4, cosDen = 25, dim = 64, bits = 6, tables = 4).count()
    }
    // invariant: candidate volume stays O(n · cap) under the sub-salt
    locally {
      val (bits, tables, cap) = (6, 4, 64)
      val quant = transform(col("embedding"),
        x => round(x.cast("double") * 10000).cast("long"))
      val banded = embN.select(col("vec_id").as("id"), quant.as("v"))
        .select(col("id"),
          posexplode(graft.functions.GraftFunctions.hyperplaneBuckets(
            col("v"), bits, tables)).as(Seq("tbl", "bucket")))
      val bucketSizes = banded.groupBy("tbl", "bucket")
        .agg(count(lit(1)).as("bsz"))
      val shardSizes = banded.join(broadcast(bucketSizes), Seq("tbl", "bucket"))
        .withColumn("nsh", greatest(lit(1L),
          ceil(col("bsz") / lit(cap.toDouble)).cast("long")))
        .select(col("tbl"), col("bucket"),
          pmod(expr("id div (tbl + 1)"), col("nsh")).as("shard"))
        .groupBy("tbl", "bucket", "shard").agg(count(lit(1)).as("s"))
      val stats = shardSizes.agg(max("s").as("max_s"),
        sum((col("s") * (col("s") - 1) / 2).cast("double")).as("cand"))
        .head()
      val maxShard = stats.getLong(0)
      val cand = stats.getDouble(1).toLong
      println(s"[scale] lsh candidates: $cand pairs " +
        s"(bound ${tables.toLong * nEmbN * 3 * cap}), max shard $maxShard " +
        s"(cap $cap)")
      require(maxShard <= 3L * cap,
        s"LSH hot-bucket invariant violated: shard of $maxShard > 3x cap")
      require(cand <= tables.toLong * nEmbN * 3 * cap,
        s"LSH candidate invariant violated: $cand pairs exceed O(n*cap)")
    }

    // ---- IVF top-k over the persisted-index shape -----------------------
    at("ivf_topk") { (_, e) =>
      val k = 5
      val queries = e.where(col("vec_id") % embOff < 8)
      val res = Similarity.ivfTopKExact(e, "vec_id", "embedding",
        queries, "vec_id", "embedding", k = k, nCells = 16, nprobe = 4)
      val n = res.count()
      val bad = res.groupBy("query_id").agg(count(lit(1)).as("c"))
        .where(col("c") =!= k).count()
      require(bad == 0, s"IVF invariant violated: $bad queries without $k " +
        "ranked neighbors")
      n
    }

    // ---- multimodal codec throughput (REAL javax.imageio work) ----------
    // corpus: formula-pattern PNGs ENCODED executor-side (itself real codec
    // work), then the two production passes — metadata decode (header
    // parse only) and the full pixel pipeline (decode → exact-NN resize →
    // PNG re-encode → grid-luminance features). Invariants: every image
    // decodes (the planted corpus has no poison), and imgs/s at N× stays
    // within 2× of 1× (per-image codec cost is constant; collapse would
    // mean the pipeline stopped being embarrassingly parallel).
    locally {
      import spark.implicits._
      import graft.operators.{Multimodal, MultimodalFixtures}
      val nBase = 2000L
      def media(k: Int) = spark.range(nBase * k)
        .repartition(cpus.toInt)
        .map(i => Multimodal.MediaRow(i, "image/png",
          MultimodalFixtures.patternPng(i % 64)))
        .persist()
      def imgsPerSec(label: String, k: Int): (Double, Double) = {
        val m = media(k)
        val n = m.count() // materialize encoded corpus
        def phase(name: String, count: => Long): Double = {
          val t0 = System.nanoTime()
          val c = count
          val sec = (System.nanoTime() - t0) / 1e9
          require(c == n, s"$name dropped images: $c of $n")
          println(f"[scale] media_$name @${k}x: $c imgs in $sec%.2f s " +
            f"(${c / sec}%.0f imgs/s)")
          c / sec
        }
        val meta = phase("decode_meta",
          Multimodal.decode(m).where(col("decode_ok")).count())
        val full = phase("pixel_pipeline",
          Multimodal.extractFeatures(
            Multimodal.resize(m, 64, 64).toDF()
              .where(col("resize_ok"))
              .select(col("media_id"), col("mime"),
                col("resized_bytes").as("bytes"))
              .as[Multimodal.MediaRow], dim = 16)
            .where(col("feature_ok")).count())
        m.unpersist()
        (meta, full)
      }
      val (meta1, full1) = imgsPerSec("media", 1)
      val (metaN, fullN) = imgsPerSec("media", factor)
      require(metaN >= 0.5 * meta1,
        f"media metadata decode collapsed at $factor×: $metaN%.0f vs $meta1%.0f imgs/s")
      require(fullN >= 0.5 * full1,
        f"media pixel pipeline collapsed at $factor×: $fullN%.0f vs $full1%.0f imgs/s")
      rows += (("media_decode_meta (imgs/s)", meta1, metaN))
      rows += (("media_pixel_pipeline (imgs/s)", full1, fullN))

      // audio: real javax.sound PCM decode → windowed energy features
      // (r16) — same embarrassingly-parallel invariant as the image passes
      def wavsPerSec(k: Int): Double = {
        val m = spark.range(nBase * k)
          .repartition(cpus.toInt)
          .map(i => Multimodal.MediaRow(i, "audio/wav",
            MultimodalFixtures.wavBytes(i % 64)))
          .persist()
        val n = m.count()
        val t0 = System.nanoTime()
        val c = Multimodal.extractFeatures(m, dim = 16)
          .where(col("feature_ok")).count()
        val sec = (System.nanoTime() - t0) / 1e9
        require(c == n, s"audio features dropped rows: $c of $n")
        println(f"[scale] media_audio_features @${k}x: $c wavs in $sec%.2f s " +
          f"(${c / sec}%.0f wavs/s)")
        m.unpersist()
        c / sec
      }
      val (wav1, wavN) = (wavsPerSec(1), wavsPerSec(factor))
      require(wavN >= 0.5 * wav1,
        f"audio feature pass collapsed at $factor×: $wavN%.0f vs $wav1%.0f wavs/s")
      rows += (("media_audio_features (wavs/s)", wav1, wavN))
    }

    // ---- SemDeDup semantic dedup: cells must bound the pair work --------
    // nCells scales WITH the corpus (∝ N / target cell size) — the scale
    // lesson mirrors the df-cut one: a fixed nCells over a growing corpus
    // re-quadratizes the within-cell joins. Invariant: measured
    // Σ|cell|·(|cell|−1)/2 stays ≤ N · maxCell expected from the planted
    // density, and verdict counts scale linearly.
    locally {
      def run(e: DataFrame, nCells: Int, label: String): Long = {
        val t0 = System.nanoTime()
        val out = Dedup.semanticDedup(e, "vec_id", "embedding",
          nCells = nCells, cosNum = 81, cosDen = 100).persist()
        val dups = out.where(col("is_dup")).count()
        val cellsz = out.groupBy("cell").count()
          .select(sum((col("count") * (col("count") - 1) / 2).cast("long")))
          .head().getLong(0)
        val n = out.count()
        out.unpersist()
        val sec = (System.nanoTime() - t0) / 1e9
        println(f"[scale] semdedup $label: $n%,d vecs, $dups%,d dups, " +
          f"pairwork $cellsz%,d, $sec%.2f s")
        require(cellsz < n * n / 4,
          s"cells failed to bound the pair work: $cellsz vs n²=${n * n}")
        cellsz
      }
      run(emb1, 16, "@1x(nCells=16)")
      run(embN, 16 * factor, s"@${factor}x(nCells=${16 * factor})")
    }

    // ---- IVF×PQ composed ANN at scale (round 17) -------------------------
    // nCells scales WITH the corpus (same lesson as SemDeDup/df-cut: fixed
    // cells re-quadratize). Invariants: (a) every query returns exactly k
    // ranked neighbors off the composed index, (b) the router PRUNES — the
    // measured sweep work Σ|probed cell| over all queries stays at least
    // 4× below the full-scan queries·N a flat ADC sweep would pay.
    locally {
      def quant(c: org.apache.spark.sql.Column) =
        transform(c, x => round(x.cast("double") * 10000).cast("long"))
      def run(e: DataFrame, nCells: Int, label: String): Unit = {
        val (k, nprobe) = (5, 4)
        val t0 = System.nanoTime()
        val idx = Similarity.buildIvfPqIndexExact(
          e, "vec_id", "embedding", nCells = nCells)
        val queries = e.where(col("vec_id") % embOff < 8)
        val res = Similarity.searchIvfPqIndexExact(
          idx, queries, "vec_id", "embedding", k, nprobe)
        val n = res.count()
        val sec = (System.nanoTime() - t0) / 1e9
        val bad = res.groupBy("query_id").agg(count(lit(1)).as("c"))
          .where(col("c") =!= k).count()
        require(bad == 0,
          s"IVF×PQ invariant violated: $bad queries without $k neighbors")
        // sweep work: each query's probed cells joined to cell occupancy
        val nq = queries.count()
        val nAll = e.count()
        val centFlat = idx.centroids.flatMap(_._2).toArray
        val cellSz = idx.coded.groupBy("cell").agg(count(lit(1)).as("csz"))
        val swept = queries
          .select(explode(graft.functions.GraftFunctions.l2ProbeCells(
            quant(col("embedding")), centFlat, idx.centroids.size, nprobe))
            .as("cell"))
          .join(cellSz, "cell")
          .agg(coalesce(sum("csz"), lit(0L))).head().getLong(0)
        println(f"[scale] ivf_pq $label: $n%,d result rows, sweep work " +
          f"$swept%,d code rows vs full-scan ${nq * nAll}%,d " +
          f"(${nq * nAll / math.max(swept, 1)}%d× pruned), $sec%.2f s")
        require(swept * 4 <= nq * nAll,
          s"IVF×PQ router stopped pruning: swept $swept of ${nq * nAll}")
      }
      run(emb1, 16, "@1x(nCells=16)")
      run(embN, 16 * factor, s"@${factor}x(nCells=${16 * factor})")
    }

    // ---- winnowing pair generator at scale (round 17) ---------------------
    // Same invariant family as the df-cut: the hot-fp blacklist bounds the
    // equi-join fan-out — post-cut candidate work Σ df·(df−1)/2 over the
    // SURVIVING fingerprints stays ≤ totalFpRows · maxDf / 2, while the
    // uncut work is quadratic in the hottest stopword-run minimum.
    locally {
      import graft.operators.TextAnalysis
      val maxDf = math.max(1, (nDocs1 * 0.1).toInt)
      at("winnow_pairs") { (d, _) =>
        TextAnalysis.winnowPairs(d, "text", "doc_id",
          minShared = 1, maxDf = maxDf).count()
      }
      val dfs = TextAnalysis.winnowFingerprints(docsN, "text", "doc_id")
        .groupBy("fp").agg(count(lit(1)).as("df"))
        .select(col("df").cast("double").as("df")).cache()
      val Array(totalRows, workAll) = dfs
        .agg(sum("df"), sum(col("df") * (col("df") - 1) / 2))
        .head().toSeq.map(_.asInstanceOf[Double].toLong).toArray
      val workCut = dfs.where(col("df") <= maxDf)
        .agg(coalesce(sum(col("df") * (col("df") - 1) / 2), lit(0.0)))
        .head().getDouble(0).toLong
      println(s"[scale] winnow: candidate work $workAll uncut -> $workCut " +
        s"cut (bound ${totalRows * maxDf / 2}); " +
        f"${100.0 * (workAll - workCut) / math.max(workAll, 1)}%.1f%% pruned")
      require(workCut <= totalRows * maxDf / 2,
        s"winnow hot-fp invariant violated: $workCut > rows*cut/2")
      dfs.unpersist()
    }

    // ---- simhash pigeonhole pair generator at scale (round 17) ------------
    // The hot-band sub-salt must bound the per-key join width exactly like
    // the LSH buckets: max (band, key, shard) occupancy ≤ 3× cap, total
    // candidate work O(n · cap) — an exact-dup flood (every copy shares
    // every band) is the adversarial shape the N× corpus plants.
    locally {
      val (cap, bands) = (64, 4)
      at("simhash_pairs") { (d, _) =>
        Dedup.simHashDupPairs(d, "text", "doc_id",
          maxHam = 3, bucketCap = cap).count()
      }
      val base = docsN.select(col("doc_id").cast("long").as("id"),
        Dedup.simHash64(col("text")).as("fp")).cache()
      val banded = base.select(col("id"),
        posexplode(array((0 until bands).map(b =>
          call_function("shiftrightunsigned", col("fp"), lit(b * 16))
            .bitwiseAND(lit(65535L))): _*)).as(Seq("band", "key")))
      val sizes = banded.groupBy("band", "key").agg(count(lit(1)).as("bsz"))
      val shardSizes = banded.join(broadcast(sizes), Seq("band", "key"))
        .withColumn("nsh", greatest(lit(1L),
          ceil(col("bsz") / lit(cap.toDouble)).cast("long")))
        .select(col("band"), col("key"),
          pmod(expr("id div (band + 1)"), col("nsh")).as("shard"))
        .groupBy("band", "key", "shard").agg(count(lit(1)).as("s"))
      val stats = shardSizes.agg(max("s").as("max_s"),
        sum((col("s") * (col("s") - 1) / 2).cast("double")).as("cand"))
        .head()
      val maxShard = stats.getLong(0)
      val cand = stats.getDouble(1).toLong
      println(s"[scale] simhash candidates: $cand pairs " +
        s"(bound ${bands.toLong * nDocsN * 3 * cap}), max shard $maxShard " +
        s"(cap $cap)")
      require(maxShard <= 3L * cap,
        s"simhash hot-band invariant violated: shard of $maxShard > 3x cap")
      require(cand <= bands.toLong * nDocsN * 3 * cap,
        s"simhash candidate invariant violated: $cand pairs exceed O(n*cap)")
      base.unpersist()
    }

    // ---- curation pipeline v2 at scale (round 17) -------------------------
    // The composed surprisal-gate → SemDeDup → packing catalog query run
    // verbatim against the N× corpus directory. The N× corpus copies have
    // disjoint vocabularies but near-identical embeddings (dim-k nudge), so
    // the gate's verdicts replicate per copy while the semantic dedup
    // collapses cross-copy near-dups. Invariants: (a) the self-calibrating
    // gate neither empties nor passes everything at N× (the fixed-cut
    // failure modes), (b) kept rows stay within [0.5·n₁, factor·n₁] — the
    // dedup can only shrink the per-copy survivors, never lose the
    // distinct content or multiply it.
    locally {
      val fn = graft.QueryCatalog.all
        .find(_.name == "x_curation_pipeline_v2").get.fn
      def run(dir: String, label: String): Long = {
        val t0 = System.nanoTime()
        val n = fn(spark, dir).count()
        val sec = (System.nanoTime() - t0) / 1e9
        println(f"[scale] curation_v2 $label: $n%,d packed rows, $sec%.2f s")
        n
      }
      val n1 = run(sfDir, "@1x")
      val nN = run(tmp, s"@${factor}x")
      require(nN > 0 && nN < nDocsN,
        s"curation gate degenerated at ${factor}x: $nN of $nDocsN")
      require(nN >= n1 / 2 && nN <= factor * n1,
        s"curation kept-rows invariant violated: $nN not in " +
          s"[${n1 / 2}, ${factor * n1}] (1x kept $n1)")
      rows += (("curation_v2", n1.toDouble, nN.toDouble))
    }

    // ---- curation pipeline v3 at scale (round 18) -------------------------
    // The winnow-gate → KMV-mixture composition run verbatim at N×. Its
    // occupancy-dependent branches are what the standalone stresses miss:
    // the df cut (per-fingerprint df scales linearly with the disjoint-
    // vocabulary copies), the KMV estimator arm (per-lang distinct bigrams
    // grow ~linearly, so the k-th-minimum estimator path — not the exact
    // small-set arm — is exercised), and the mixture thresholds. Invariants:
    // (a) the pipeline neither empties nor passes everything, (b) kept rows
    // stay within [n₁/2, factor·n₁], (c) no language stratum vanishes (the
    // min-estimate stratum keeps threshold 'g' by construction).
    locally {
      val fn = graft.QueryCatalog.all
        .find(_.name == "x_curation_pipeline_v3").get.fn
      def run(dir: String, label: String): (Long, Long) = {
        val t0 = System.nanoTime()
        val out = fn(spark, dir)
        val n = out.count()
        val langs = out.select("lang").distinct().count()
        val sec = (System.nanoTime() - t0) / 1e9
        println(f"[scale] curation_v3 $label: $n%,d kept rows, " +
          f"$langs langs, $sec%.2f s")
        (n, langs)
      }
      val (n1, l1) = run(sfDir, "@1x")
      val (nN, lN) = run(tmp, s"@${factor}x")
      require(nN > 0 && nN < nDocsN,
        s"curation v3 degenerated at ${factor}x: $nN of $nDocsN")
      require(nN >= n1 / 2 && nN <= factor * n1,
        s"curation v3 kept-rows invariant violated: $nN not in " +
          s"[${n1 / 2}, ${factor * n1}] (1x kept $n1)")
      require(lN == l1,
        s"a language stratum vanished from the v3 mixture at ${factor}x: " +
          s"$lN of $l1")
      rows += (("curation_v3 (kept rows)", n1.toDouble, nN.toDouble))
    }

    // ---- curation pipeline v4 (web front door) at scale (round 18) ------
    // HTML extraction + linear quality gate + per-source cap at N×. The
    // N× copies keep the ORIGINAL source column, so the cap bounds the
    // output by cap × |sources| REGARDLESS of the factor — the mega-corpus
    // property the WindowGroupLimit cap exists for. Invariants: (a) output
    // is non-empty and never exceeds cap × |sources| at any factor,
    // (b) no source exceeds the cap, (c) extraction stays map-only cheap
    // (reported, not required — wall-clock requires flake on busy boxes).
    locally {
      val fn = graft.QueryCatalog.all
        .find(_.name == "x_curation_pipeline_v4").get.fn
      def run(dir: String, label: String): (Long, DataFrame) = {
        val t0 = System.nanoTime()
        val out = fn(spark, dir)
        val n = out.count()
        val sec = (System.nanoTime() - t0) / 1e9
        println(f"[scale] curation_v4 $label: $n%,d kept rows, $sec%.2f s")
        (n, out)
      }
      val (n1, _) = run(sfDir, "@1x")
      val (nN, outN) = run(tmp, s"@${factor}x")
      val nSources = docsN.select("source").distinct().count()
      require(nN > 0 && nN <= 15L * nSources,
        s"curation v4 cap invariant violated at ${factor}x: $nN rows " +
          s"exceed 15 x $nSources sources")
      val maxPerSource = outN.groupBy("source").count()
        .agg(max("count")).head().getLong(0)
      require(maxPerSource <= 15,
        s"per-source cap violated at ${factor}x: $maxPerSource > 15")
      rows += (("curation_v4 (kept rows)", n1.toDouble, nN.toDouble))
    }

    // ---- incremental dedup: probe cost ∝ batch, not corpus (round 18) ---
    // Index a 1× and an N× corpus, then refresh-dedup the SAME 300-doc
    // batch (copy-0 texts under fresh ids — every batch doc is an exact
    // dup of an indexed doc) against each. The per-copy vocabulary is
    // disjoint, so the batch collides only with copy-0 rows: candidates,
    // verdicts and verify work are IDENTICAL at N× — the only
    // corpus-proportional cost is the write-once index build. A full
    // re-dedup would re-fingerprint the whole corpus every refresh; the
    // probe never does (require'd via verdict equality; seconds reported).
    locally {
      val batch = docs1.where(col("doc_id") < 300)
        .select((col("doc_id") + 10000000L).as("doc_id"), col("text"))
      def probe(corpus: DataFrame, table: String,
          label: String): (Long, Double, Double) = {
        val t0 = System.nanoTime()
        Dedup.writeMinHashIndex(corpus.select("doc_id", "text"),
          "text", "doc_id", table, buckets = 16)
        val wSec = (System.nanoTime() - t0) / 1e9
        val t1 = System.nanoTime()
        val out = Dedup.incrementalDedupMinHash(table,
          corpus.select("doc_id", "text"), batch, "text", "doc_id")
        val dups = out.where(col("is_dup")).count()
        val pSec = (System.nanoTime() - t1) / 1e9
        println(f"[scale] inc_dedup $label: index write $wSec%.2f s, " +
          f"probe $pSec%.2f s, $dups%,d dup verdicts")
        (dups, wSec, pSec)
      }
      val c1 = docs1.where(col("doc_id") < 2000)
      val cN = docsN.where(pmod(col("doc_id"), lit(docOff)) < 2000)
      val (d1, _, p1) = probe(c1, "scale_inc_1x", "@1x")
      val (dN, _, pN) = probe(cN, "scale_inc_Nx", s"@${factor}x")
      require(d1 == 300 && dN == 300,
        s"incremental verdicts drifted with corpus size: $d1 @1x, " +
          s"$dN @${factor}x (all 300 batch docs are planted dups)")
      rows += (("inc_dedup probe (sec)", p1, pN))
    }

    // ---- perceptron training: driver data bounded by dims (round 19) ----
    // Train the batch perceptron at 1× and N×. The structural claim: the
    // ONLY driver-side data is the weight vector, whose row count is
    // ≤ dims at ANY corpus size (each round's update aggregates to bucket
    // grain before anything leaves the executors) — the corpus-
    // proportional work is the checkpointed feature pass plus per-round
    // narrow aggs. require'd: weight rows ≤ dims at both factors; wall
    // clock reported (≈linear in corpus tokens).
    locally {
      val dims = 64
      def run(d: DataFrame, label: String): (Long, Double) = {
        val labeled = d.withColumn("__y",
          when(col("lang") === "en", 1L).otherwise(-1L))
        val t0 = System.nanoTime()
        val (w, _) = Classifier.trainPerceptron(labeled, "doc_id", "text",
          "__y", dims = dims, rounds = 3)
        val nW = w.count()
        val sec = (System.nanoTime() - t0) / 1e9
        println(f"[scale] perceptron $label: $nW weight rows, $sec%.2f s")
        (nW, sec)
      }
      val (w1, s1) = run(docs1, "@1x")
      val (wN, sN) = run(docsN, s"@${factor}x")
      require(w1 <= dims && wN <= dims,
        s"weight vector exceeded dims=$dims: $w1 @1x, $wN @${factor}x — " +
          "the driver-bounded-fetch license is broken")
      rows += (("perceptron train (sec)", s1, sN))
    }

    // ---- DSIR selection at scale (round 19) -----------------------------
    // The hashed-ngram importance law at 1× and N×. Invariants: (a) the
    // wbits weight table stays ≤ dims rows at both factors (bucket-grain
    // aggregation before anything is broadcast), (b) the self-calibrating
    // mean cut keeps a non-degenerate fraction at N× (neither empties nor
    // passes everything — the fixed-threshold failure modes).
    locally {
      val dims = 256
      def run(d: DataFrame, label: String): (Long, Long, Long) = {
        val t0 = System.nanoTime()
        val out = Classifier.dsirImportance(d, "doc_id", "text",
          col("lang") === "en", dims)
        val total = out.count()
        val kept = out.where(col("keep")).count()
        val sec = (System.nanoTime() - t0) / 1e9
        println(f"[scale] dsir $label: $kept%,d of $total%,d kept, " +
          f"$sec%.2f s")
        (kept, total, sec.toLong)
      }
      val (k1, t1, _) = run(docs1, "@1x")
      val (kN, tN, _) = run(docsN, s"@${factor}x")
      require(k1 > 0 && k1 < t1 && kN > 0 && kN < tN,
        s"DSIR mean cut degenerated: $k1/$t1 @1x, $kN/$tN @${factor}x")
      rows += (("dsir kept rows", k1.toDouble, kN.toDouble))
    }

    // ---- curation pipeline v7 (CCNet chain) at scale (round 19) ---------
    // Perceptron gate at the corpus-mean margin -> trigram LM over the
    // survivors -> histogram perplexity terciles -> stratified mixture.
    // Invariants: (a) the self-calibrating margin gate neither empties
    // nor passes the whole corpus at N× (the failure modes an absolute
    // margin>0 cut has under class imbalance), (b) all three perplexity
    // buckets are populated at N× (the histogram cuts stay inside the
    // score domain), (c) kept rows stay within [n₁/2, N·n₁].
    locally {
      val fn = graft.QueryCatalog.all
        .find(_.name == "x_curation_pipeline_v7").get.fn
      def run(dir: String, label: String): (Long, Long) = {
        val t0 = System.nanoTime()
        val out = fn(spark, dir)
        val n = out.count()
        val nBuckets = out.select("ppl_bucket").distinct().count()
        val sec = (System.nanoTime() - t0) / 1e9
        println(f"[scale] curation_v7 $label: $n%,d kept rows, " +
          f"$nBuckets buckets, $sec%.2f s")
        (n, nBuckets)
      }
      val (n1, _) = run(sfDir, "@1x")
      val (nN, bN) = run(tmp, s"@${factor}x")
      require(nN > 0 && nN < nDocsN,
        s"curation v7 degenerated at ${factor}x: $nN of $nDocsN")
      require(bN == 3,
        s"a perplexity bucket vanished from v7 at ${factor}x: $bN of 3")
      require(nN >= n1 / 2 && nN <= factor * n1,
        s"curation v7 kept-rows invariant violated: $nN not in " +
          s"[${n1 / 2}, ${factor * n1}] (1x kept $n1)")
      rows += (("curation_v7 (kept rows)", n1.toDouble, nN.toDouble))
    }

    // ---- curation pipeline v8 (full modern recipe) at scale (round 20) --
    // WARC walk -> robots gate -> canonical dedup -> PSL domain cap ->
    // HTML extraction -> gopher + repetition gates -> trained-langid
    // perceptron gate -> LM terciles -> paragraph dedup -> chunk -> pack,
    // run verbatim at N×. Invariants: (a) the chain neither empties nor
    // degenerates at N×, (b) chunk rows stay within [n₁/2, N·n₁] (copy-0
    // survivors are identical at both scales; later copies can only add
    // rows or be gated), (c) the PACKING BUDGET LAW holds at N×: no
    // pack's token sum exceeds budget + its largest chunk (the
    // straddling-doc bound of the start-offset binning), (d) the head
    // perplexity tercile is populated (the histogram cut stays inside
    // the score domain).
    locally {
      val fn = graft.QueryCatalog.all
        .find(_.name == "x_curation_pipeline_v8").get.fn
      def run(dir: String, label: String): (Long, DataFrame) = {
        val t0 = System.nanoTime()
        val out = fn(spark, dir).cache()
        val n = out.count()
        val sec = (System.nanoTime() - t0) / 1e9
        println(f"[scale] curation_v8 $label: $n%,d chunk rows, $sec%.2f s")
        (n, out)
      }
      val (n1, out1) = run(sfDir, "@1x")
      val (nN, outN) = run(tmp, s"@${factor}x")
      require(nN > 0, s"curation v8 emptied at ${factor}x")
      require(nN >= n1 / 2 && nN <= factor * n1,
        s"curation v8 chunk-rows invariant violated: $nN not in " +
          s"[${n1 / 2}, ${factor * n1}] (1x kept $n1)")
      val overBudget = outN.groupBy("pack_id")
        .agg(sum("n_chunk_tokens").as("s"), max("n_chunk_tokens").as("m"))
        .where(col("s") > lit(64L) + col("m")).count()
      require(overBudget == 0,
        s"pack budget law violated at ${factor}x: $overBudget packs " +
          "exceed budget + straddler")
      require(outN.where(col("ppl_bucket") === "head").count() > 0,
        s"head perplexity tercile vanished from v8 at ${factor}x")
      out1.unpersist(); outN.unpersist()
      rows += (("curation_v8 (chunk rows)", n1.toDouble, nN.toDouble))
    }

    // ---- streaming near-dup: state bounded by rate × horizon × bands ----
    // Feeds a MemoryStream at a fixed rate (perBatch docs every 5 event-
    // minutes, horizon 10 min) with hot dup groups of 10 (> ownerCap, so
    // the cap is exercised), and reads the state-store row count from the
    // query progress after every trigger. Invariants:
    //   - peak state rows ≤ bands × (docs inside horizon + 2 batches slack)
    //     — state tracks the WINDOW, not the corpus;
    //   - per-trigger output ≤ docs × bands × ownerCap (the documented
    //     emission bound);
    //   - after the watermark jumps far ahead, eviction collapses state to
    //     the tail batches — the rate × horizon bound is real, not a
    //     monotone leak.
    locally {
      import spark.implicits._
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      val bands = 8; val cap = 4
      val perBatch = 300 * factor
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
      val ms = MemoryStream[(Long, String, java.sql.Timestamp)]
      val ckpt = java.nio.file.Files
        .createTempDirectory("graft-scale-stream").toString
      val cands = graft.streaming.DedupStream.nearDupCandidates(
        ms.toDF().toDF("doc_id", "text", "event_ts"),
        "text", "doc_id", "event_ts", horizon = "10 minutes",
        bands = bands, rowsPerBand = 2, ownerCap = cap)
      val outCount = new java.util.concurrent.atomic.AtomicLong(0L)
      val q = cands.writeStream
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
          // ADD, don't set: processAllAvailable also runs a trailing
          // no-data batch (timeout processing) whose frame is empty
          outCount.addAndGet(df.count()); ()
        }
        .option("checkpointLocation", ckpt).start()
      def ts(min: Int) = new java.sql.Timestamp(1700000000000L + min * 60000L)
      def batch(i: Int, n: Int, atMin: Int): (Long, Long, Double) = {
        // groups of 10 near-identical docs (30 shared + 3 distinct tokens,
        // Jaccard ≈ 0.87), vocabulary disjoint per batch
        val docs = (0 until n).map { j =>
          val core = (0 until 30).map(t => s"b${i}_g${j / 10}_w$t")
          val tail = (0 until 3).map(t => s"b${i}_d${j}_t$t")
          ((i.toLong << 32) + j, (core ++ tail).mkString(" "), ts(atMin))
        }
        ms.addData(docs)
        outCount.set(0L)
        val t0 = System.nanoTime()
        q.processAllAvailable()
        val sec = (System.nanoTime() - t0) / 1e9
        val p = q.lastProgress
        (p.stateOperators.apply(0).numRowsTotal, outCount.get(), sec)
      }
      var peak = 0L
      for (i <- 0 until 6) {
        val (stateRows, outRows, sec) = batch(i, perBatch, i * 5)
        peak = math.max(peak, stateRows)
        println(f"[scale] stream batch $i: state=$stateRows%,d rows, " +
          f"out=$outRows%,d, $sec%.2f s")
        require(outRows <= perBatch.toLong * bands * cap,
          s"emission bound violated: $outRows > docs*bands*cap")
      }
      // horizon/step = 2 batches in-window; watermark lags one batch and
      // timeouts fire the batch after — allow 2 batches of slack
      val peakBound = bands.toLong * perBatch * 4
      println(f"[scale] stream peak state $peak%,d rows (bound $peakBound%,d)")
      require(peak <= peakBound,
        s"state bound violated: peak $peak > bands*docsInWindow = $peakBound")
      // jump the clock 3 h ahead: first batch advances the watermark, the
      // second lets timeout processing evict everything aged out
      val small = 50
      batch(98, small, 180)
      val (finalState, _, _) = batch(99, small, 181)
      println(f"[scale] stream state after far-future jump: $finalState%,d " +
        f"rows (tail bound ${bands.toLong * small * 2 * 2}%,d)")
      require(finalState <= bands.toLong * small * 2 * 2,
        s"eviction failed: $finalState rows remain after the horizon passed")
      q.stop()
      rows += (("stream_neardup_state (peak rows)", peak.toDouble,
        finalState.toDouble))
    }

    // ---- streaming SEMANTIC dedup: state rows bounded by CELLS ----------
    // The semantic stream keeps ONE state row per touched centroid cell
    // (each holding ≤ ownerCap quantized 64-long vectors — the heavy
    // per-owner variant), so state rows are bounded by nCells REGARDLESS
    // of rate; eviction still collapses aged cells. Invariants `require`d.
    locally {
      import spark.implicits._
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      val nCells = 64
      val centroids = Similarity.buildIvfIndexExact(
        emb1, "vec_id", "embedding", nCells = nCells).centroids
      val vecs = emb1.select("embedding").collect()
        .map(_.getSeq[Float](0).toArray)
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
      val ms = MemoryStream[(Long, Array[Float], java.sql.Timestamp)]
      val ckpt = java.nio.file.Files
        .createTempDirectory("graft-scale-semstream").toString
      val outCount = new java.util.concurrent.atomic.AtomicLong(0L)
      val q = graft.streaming.DedupStream.semanticDupCandidates(
          ms.toDF().toDF("vec_id", "embedding", "event_ts"),
          "embedding", "vec_id", "event_ts", centroids,
          cosNum = 81, cosDen = 100, horizon = "10 minutes")
        .writeStream
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
          outCount.addAndGet(df.count()); ()
        }
        .option("checkpointLocation", ckpt).start()
      def ts(min: Int) = new java.sql.Timestamp(1700000000000L + min * 60000L)
      val perBatch = 500 * factor
      def batch(i: Int, n: Int, atMin: Int): (Long, Long) = {
        ms.addData((0 until n).map(j =>
          ((i.toLong << 32) + j, vecs((i * 31 + j) % vecs.length), ts(atMin))))
        outCount.set(0L)
        q.processAllAvailable()
        val p = q.lastProgress
        (p.stateOperators.apply(0).numRowsTotal, outCount.get())
      }
      for (i <- 0 until 5) {
        val (st, out) = batch(i, perBatch, i * 5)
        println(f"[scale] semstream batch $i: state=$st%,d rows " +
          f"(cell bound $nCells), out=$out%,d")
        require(st <= nCells,
          s"semantic stream state exceeded the cell bound: $st > $nCells")
        require(out == perBatch, s"one verdict per doc: $out != $perBatch")
      }
      batch(98, 50, 180)
      val (finalState, _) = batch(99, 50, 181)
      println(f"[scale] semstream state after far-future jump: $finalState%,d rows")
      require(finalState <= nCells)
      q.stop()
    }

    println("\n| operator | 1x sec | " + factor + "x sec | ratio |")
    println("|---|---|---|---|")
    rows.foreach { case (l, a, b) =>
      println(f"| $l | $a%.2f | $b%.2f | ${b / a}%.1f |")
    }
    spark.stop()
  }
}
