package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column
  * (`array<float>`).
  *
  * Baseline: brute-force cosine top-k — broadcast the (small) query set,
  * score per-row with codegen'd higher-order functions (`zip_with` +
  * `aggregate`), take top-k per query via `row_number` (Spark ≥3.5 rewrites
  * `rank <= k` filters into WindowGroupLimit: partial per-partition top-k
  * before the shuffle, so the full score matrix never moves).
  *
  * Scale path: hyperplane-LSH bucketing — deterministic pseudo-random
  * hyperplanes derived from a seed, each vector mapped to a b-bit bucket
  * intra-row; candidates = bucket collisions (equi-join), scored exactly.
  * At 100 TB this turns the O(N·Q) scan into a bucket-pruned join.
  */
object Similarity {

  /** Dot product of two float-array columns — intra-row, codegen'd. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0d), (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Brute-force top-k: for each query vector, the k nearest corpus vectors
    * by cosine. `queries` should be small (broadcast). Deterministic
    * tie-break on corpus id. */
  def bruteForceTopK(
      corpus: DataFrame, corpusId: String, corpusVec: String,
      queries: DataFrame, queryId: String, queryVec: String,
      k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val scored = corpus.crossJoin(broadcast(queries))
      .select(
        col(queryId).as("query_id"),
        col(corpusId).as("neighbor_id"),
        cosine(col(queryVec), col(corpusVec)).as("cosine"))
      .where(col("query_id") =!= col("neighbor_id"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("query_id", "neighbor_id", "cosine", "rank")
  }

  /** [[bruteForceTopK]] with the float boundary removed: vectors quantize
    * to integers (×10⁴), the rank key sign(dot)·dot²/n2 is one IEEE
    * multiply+divide over EXACT integer inputs — bit-identical in any
    * engine — and the output carries only the exact integers (dot, n2), so
    * the whole top-k is hash-oracle-checkable. For a fixed query the key is
    * order-equivalent to cosine (the query norm is a positive common
    * factor; squaring keeps sign via the explicit flip). */
  def bruteForceTopKExact(
      corpus: DataFrame, corpusId: String, corpusVec: String,
      queries: DataFrame, queryId: String, queryVec: String,
      k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    def quant(c: Column): Column =
      transform(c, x => round(x.cast("double") * 10000).cast("long"))
    val c = corpus
      .select(col(corpusId).as("neighbor_id"), quant(col(corpusVec)).as("cv"))
      .withColumn("n2", graft.functions.GraftFunctions.longNorm2(col("cv")))
    val q = queries
      .select(col(queryId).as("query_id"), quant(col(queryVec)).as("qv"))
    val scored = c.crossJoin(broadcast(q))
      .where(col("query_id") =!= col("neighbor_id"))
      .withColumn("dot",
        graft.functions.GraftFunctions.longDot(col("cv"), col("qv")))
      .withColumn("key", when(col("n2") === 0, lit(Double.MinValue))
        .otherwise(col("dot").cast("double") * col("dot").cast("double")
          / col("n2").cast("double")
          * when(col("dot") < 0, lit(-1.0)).otherwise(lit(1.0))))
    val w = Window.partitionBy("query_id")
      .orderBy(col("key").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("query_id", "neighbor_id", "rank", "dot", "n2")
  }

  /** [[lshTopK]] with both float boundaries removed, making the LSH path
    * hash-oracle-checkable end-to-end: buckets come from the same sha-parity
    * ±1 Rademacher planes the embedding-dedup scale path uses
    * ([[Dedup.planeSign]] — constant-folded literal arrays, exact integer
    * projections over the ×10⁴-quantized vectors), and candidate ranking
    * uses [[bruteForceTopKExact]]'s sign(dot)·dot²/n2 IEEE key. Output
    * carries the exact integers (dot, n2). */
  def lshTopKExact(
      corpus: DataFrame, corpusId: String, corpusVec: String,
      queries: DataFrame, queryId: String, queryVec: String,
      k: Int, bits: Int = 6, dim: Int = 64): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    def quant(c: Column): Column =
      transform(c, x => round(x.cast("double") * 10000).cast("long"))
    def bucketOf(v: Column): Column =
      element_at(graft.functions.GraftFunctions.hyperplaneBuckets(v, bits, 1), 1)
    val c = corpus
      .select(col(corpusId).as("neighbor_id"), quant(col(corpusVec)).as("cv"))
      .withColumn("n2", graft.functions.GraftFunctions.longNorm2(col("cv")))
      .withColumn("bucket", bucketOf(col("cv")))
    val q = queries
      .select(col(queryId).as("query_id"), quant(col(queryVec)).as("qv"))
      .withColumn("bucket", bucketOf(col("qv")))
    val scored = c.join(broadcast(q), Seq("bucket"))
      .where(col("query_id") =!= col("neighbor_id"))
      .withColumn("dot",
        graft.functions.GraftFunctions.longDot(col("cv"), col("qv")))
      .withColumn("key", when(col("n2") === 0, lit(Double.MinValue))
        .otherwise(col("dot").cast("double") * col("dot").cast("double")
          / col("n2").cast("double")
          * when(col("dot") < 0, lit(-1.0)).otherwise(lit(1.0))))
    val w = Window.partitionBy("query_id")
      .orderBy(col("key").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("query_id", "neighbor_id", "rank", "dot", "n2")
  }

  /** [[ivfTopK]] with every float boundary removed: centroids are the
    * nCells lowest-id corpus vectors quantized to integers (the documented
    * deterministic seed — a bounded nCells-row driver collect, same as the
    * k-means path's centroid table), cell assignment is an exact integer-L2
    * argmin (ties → lowest cell id), each query probes its nprobe nearest
    * cells by the same exact distances, and candidate ranking reuses the
    * sign(dot)·dot²/n2 IEEE key — all of it replayable in SQL, so the
    * oracle checks assignment, probe pruning AND ranking. */
  /** Persistable exact-integer IVF index: the quantized corpus assigned to
    * its nearest centroid cell. `assigned` (cell, neighbor_id, cv, n2) is
    * the inverted file — a plain DataFrame, so a deployment writes it once
    * (bucketed by `cell` via [[Bucketing.writeBucketed]] to make repeated
    * probe joins exchange-free) and every search skips the assignment
    * pass; `centroids` is the bounded nCells-row driver-side table every
    * query batch needs to plan its probes. */
  final case class IvfIndexExact(
      centroids: Seq[(Long, Seq[Long])],
      assigned: DataFrame)

  private def quantLong(c: Column): Column =
    transform(c, x => round(x.cast("double") * 10000).cast("long"))

  /** Build the exact-integer IVF index: centroids are the nCells lowest-id
    * quantized corpus vectors (the documented deterministic seed); every
    * corpus vector is assigned by the strict-< earliest-wins integer-L2
    * argmin — the native codegen'd [[graft.plans.LongL2ArgminExpression]]
    * over the reference-object centroid table (the interpreted HOF fold it
    * replaces ran nCells × dim lambdas per corpus row), map-only, no
    * shuffle. */
  def buildIvfIndexExact(corpus: DataFrame, corpusId: String,
      corpusVec: String, nCells: Int = 16,
      lloydIters: Int = 0): IvfIndexExact = {
    val e = corpus
      .select(col(corpusId).cast("long").as("neighbor_id"),
        quantLong(col(corpusVec)).as("cv"))
      .withColumn("n2", graft.functions.GraftFunctions.longNorm2(col("cv")))
    val seed: Seq[(Long, Seq[Long])] = e.orderBy("neighbor_id").limit(nCells)
      .select("neighbor_id", "cv").collect()
      .zipWithIndex.map { case (r, i) => (i.toLong, r.getSeq[Long](1)) }
    val cent =
      if (lloydIters <= 0) seed
      else refineIvfCentroidsExact(e, "cv", seed, lloydIters)
    val centFlat = cent.flatMap(_._2).toArray
    IvfIndexExact(cent, e.withColumn("cell",
      graft.functions.GraftFunctions.longL2Argmin(
        col("cv"), centFlat, cent.size)))
  }

  /** Lloyd-refine the exact-integer IVF centroids (the integer analog of
    * [[kMeansCentroids]], same shape as [[refinePqCodebooksExact]]): each
    * iteration assigns the corpus with the current centroids (the native
    * [[graft.plans.LongL2ArgminExpression]] — one map-only pass),
    * posexplodes dimensions and reduces to per-(cell, dim) exact Long sums
    * + counts — ONE shuffle per iteration, output ≤ nCells × dim rows, so
    * the per-iter driver collect is bounded by the centroid table, never
    * the corpus. New component = `Math.round(sum/count)`; empty cells keep
    * their previous centroid. The search relations are unchanged — only
    * the centroid constants move, so the exact oracle laws stay
    * replayable. */
  def refineIvfCentroidsExact(e: DataFrame, vecCol: String,
      seed: Seq[(Long, Seq[Long])], iters: Int): Seq[(Long, Seq[Long])] = {
    var cent = seed
    for (_ <- 1 to iters) {
      val centFlat = cent.flatMap(_._2).toArray
      val stats = e
        .select(graft.functions.GraftFunctions.longL2Argmin(
            col(vecCol), centFlat, cent.size).as("cell"),
          posexplode(col(vecCol)).as(Seq("d", "x")))
        .groupBy("cell", "d")
        .agg(sum("x").as("sx"), count(lit(1)).as("c"))
        .collect()
        .map(r => (r.getLong(0), r.getInt(1)) ->
          (r.getLong(2), r.getLong(3))).toMap
      cent = cent.map { case (cid, old) =>
        (cid, old.indices.map { d =>
          stats.get((cid, d)) match {
            case Some((sx, c)) => Math.round(sx.toDouble / c)
            case None => old(d) // empty cell keeps its centroid
          }
        })
      }
    }
    cent
  }

  /** Persist a built index for reuse across jobs: the inverted file goes
    * down as a parquet table BUCKETED by `cell` ([[Bucketing.writeBucketed]])
    * so every future probe join reads co-located buckets with ZERO exchange
    * on the index side — the write-time layout pays the index-side shuffle
    * once, which is the whole point of an IVF at 100 TB. The bounded
    * centroid table (nCells rows) persists alongside as `<table>_centroids`. */
  def writeIvfIndex(index: IvfIndexExact, table: String, buckets: Int = 16): Unit = {
    Bucketing.writeBucketed(index.assigned, table, buckets, Seq("cell"))
    val spark = index.assigned.sparkSession
    import spark.implicits._
    index.centroids.toDF("cell", "cvec").write.mode("overwrite")
      .format("parquet").saveAsTable(s"${table}_centroids")
  }

  /** Reload a persisted index: the inverted file stays a (bucketed) table
    * scan; only the nCells-row centroid table is collected to the driver. */
  def readIvfIndex(spark: org.apache.spark.sql.SparkSession,
      table: String): IvfIndexExact = {
    val cent = spark.table(s"${table}_centroids").orderBy("cell")
      .collect().map(r => (r.getLong(0), r.getSeq[Long](1))).toSeq
    IvfIndexExact(cent, spark.table(table))
  }

  /** Search a built index: per query, probe the `nprobe` nearest cells and
    * rank only their members with the exact sign(dot)·dot²/n2 key.
    * `broadcastQueries = false` is the large-batch mode: the probe join
    * plans as a sort-merge join whose index side is exchange-free when the
    * inverted file was persisted bucketed by cell ([[writeIvfIndex]]) —
    * only the (smaller) query batch shuffles. */
  def searchIvfIndexExact(index: IvfIndexExact, queries: DataFrame,
      queryId: String, queryVec: String, k: Int, nprobe: Int = 4,
      broadcastQueries: Boolean = true): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val centFlat = index.centroids.flatMap(_._2).toArray
    val q0 = queries
      .select(col(queryId).cast("long").as("query_id"),
        quantLong(col(queryVec)).as("qv"))
      .withColumn("cell", explode(graft.functions.GraftFunctions.l2ProbeCells(
        col("qv"), centFlat, index.centroids.size, nprobe)))
    val q = if (broadcastQueries) broadcast(q0) else q0
    val scored = index.assigned.join(q, Seq("cell"))
      .where(col("query_id") =!= col("neighbor_id"))
      .withColumn("dot",
        graft.functions.GraftFunctions.longDot(col("cv"), col("qv")))
      .withColumn("key", when(col("n2") === 0, lit(Double.MinValue))
        .otherwise(col("dot").cast("double") * col("dot").cast("double")
          / col("n2").cast("double")
          * when(col("dot") < 0, lit(-1.0)).otherwise(lit(1.0))))
    val w = Window.partitionBy("query_id")
      .orderBy(col("key").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("query_id", "neighbor_id", "rank", "dot", "n2")
  }

  def ivfTopKExact(
      corpus: DataFrame, corpusId: String, corpusVec: String,
      queries: DataFrame, queryId: String, queryVec: String,
      k: Int, nCells: Int = 16, nprobe: Int = 4): DataFrame =
    searchIvfIndexExact(
      buildIvfIndexExact(corpus, corpusId, corpusVec, nCells),
      queries, queryId, queryVec, k, nprobe)

  /** Exact-integer product-quantization index (Jégou/Douze/Schmid, "Product
    * Quantization for Nearest Neighbor Search", TPAMI 2011): the vector
    * splits into `m` subspaces, each subvector coarse-coded against a
    * per-subspace codebook, so a d-dim float vector compresses to `m` small
    * codes (64 floats → 8 nibbles here, a 32× memory cut) and search scans
    * codes instead of vectors. `codebooks(s)(j)` is codeword j of subspace
    * s; `codes` is the compressed corpus `(neighbor_id, codes array<int>)`. */
  case class PqIndexExact(m: Int, dsub: Int,
      codebooks: Seq[Seq[Seq[Long]]], codes: DataFrame)

  /** Build the PQ index. Codebook law mirrors the IVF one: per subspace,
    * the codewords SEED from the subvectors of the `codewords` lowest-id
    * quantized corpus vectors (documented deterministic), optionally
    * Lloyd-refined per subspace (`lloydIters` > 0 —
    * [[refinePqCodebooksExact]]; the assignment/search relations are
    * unchanged by better codebooks, only the codeword constants move).
    * Encoding is intra-row: per subspace a strict-< earliest-wins
    * integer-L2 argmin over the reference-object codebooks
    * ([[graft.plans.PqEncodeExpression]]) — map-only, no shuffle,
    * codegen'd. */
  def buildPqIndexExact(corpus: DataFrame, corpusId: String,
      corpusVec: String, m: Int = 8, codewords: Int = 16,
      lloydIters: Int = 0): PqIndexExact = {
    val e = corpus.select(col(corpusId).cast("long").as("neighbor_id"),
      quantLong(col(corpusVec)).as("v"))
    // bounded driver table: `codewords` rows (the codebook seed), like the
    // IVF centroid table
    val cbRows: Seq[Seq[Long]] = e.orderBy("neighbor_id").limit(codewords)
      .select("v").collect().toSeq.map(_.getSeq[Long](0).toSeq)
    require(cbRows.nonEmpty, "PQ index needs a non-empty corpus")
    if (cbRows.size < codewords)
      org.apache.log4j.Logger.getLogger(getClass).warn(
        s"PQ codebook seeded from only ${cbRows.size} vectors " +
          s"(requested $codewords codewords)")
    val dim = cbRows.head.length
    require(dim % m == 0, s"embedding dim $dim not divisible by m=$m")
    val dsub = dim / m
    val seed = (0 until m).map(s => cbRows.map(_.slice(s * dsub, (s + 1) * dsub)))
    val codebooks =
      if (lloydIters <= 0) seed
      else refinePqCodebooksExact(e, seed, m, dsub, lloydIters)
    val cbFlat = codebooks.flatMap(_.flatten).toArray
    PqIndexExact(m, dsub, codebooks,
      e.select(col("neighbor_id"),
        graft.functions.GraftFunctions.pqEncode(
          col("v"), cbFlat, m, codebooks.head.size).as("codes")))
  }

  /** Lloyd-refine PQ codebooks, DataFrame-only (the per-subspace analog of
    * [[kMeansCentroids]]): each iteration encodes the corpus with the
    * current books (the native [[graft.plans.PqEncodeExpression]] — one
    * map-only pass), posexplodes the assigned subvectors and reduces to
    * per-(subspace, codeword, dim) exact Long sums + counts — ONE shuffle
    * per iteration whose output is at most m × codewords × dsub rows, so
    * the per-iter driver collect is bounded by the codebook, never the
    * corpus. New codeword component = `Math.round(sum/count)` (floor(x+½)
    * over an exact-integer ratio — deterministic across runs);
    * codewords that attracted no vectors keep their previous value, like
    * the IVF k-means' empty cells. */
  def refinePqCodebooksExact(e: DataFrame, seed: Seq[Seq[Seq[Long]]],
      m: Int, dsub: Int, iters: Int): Seq[Seq[Seq[Long]]] = {
    var cbs = seed
    for (_ <- 1 to iters) {
      val cbFlat = cbs.flatMap(_.flatten).toArray
      val stats = e
        .select(col("v"),
          posexplode(graft.functions.GraftFunctions.pqEncode(
            col("v"), cbFlat, m, cbs.head.size)).as(Seq("s", "j")))
        .select(col("s"), col("j"),
          posexplode(slice(col("v"), col("s") * dsub + 1, lit(dsub)))
            .as(Seq("d", "x")))
        .groupBy("s", "j", "d")
        .agg(sum("x").as("sx"), count(lit(1)).as("c"))
        .collect()
        .map(r => (r.getInt(0), r.getInt(1), r.getInt(2)) ->
          (r.getLong(3), r.getLong(4))).toMap
      cbs = cbs.zipWithIndex.map { case (book, s) =>
        book.zipWithIndex.map { case (cw, j) =>
          (0 until dsub).map { d =>
            stats.get((s, j, d)) match {
              case Some((sx, c)) => Math.round(sx.toDouble / c)
              case None => cw(d) // empty codeword keeps its value
            }
          }
        }
      }
    }
    cbs
  }

  /** Asymmetric-distance (ADC) search over a PQ index: each query builds
    * its m×codewords lookup table of exact integer sub-distances intra-row,
    * the (broadcast) query LUTs sweep the compressed code table once, and
    * the per-neighbor distance is m table lookups + adds — the classic PQ
    * trade: O(N·m) byte-width work instead of O(N·d) float work. The
    * per-pair sweep is the native codegen'd
    * [[graft.plans.PqAdcDistExpression]] (the `zip_with → aggregate` HOF
    * tree it replaces ran interpreted and dominated the sweep). Top-k by
    * (adc_dist asc, neighbor_id asc); WindowGroupLimit keeps ≤ k rows per
    * query on both sides of the single small shuffle. At 100 TB compose
    * with the IVF router ([[ivfPqTopKExact]]) so the sweep touches only
    * probed cells. */
  def searchPqIndexExact(index: PqIndexExact, queries: DataFrame,
      queryId: String, queryVec: String, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cbFlat = index.codebooks.flatMap(_.flatten).toArray
    val lut = graft.functions.GraftFunctions.pqLut(
      quantLong(col(queryVec)), cbFlat, index.m, index.codebooks.head.size)
    val q = broadcast(queries.select(
      col(queryId).cast("long").as("query_id"), lut.as("lut")))
    val scored = index.codes.crossJoin(q)
      .where(col("query_id") =!= col("neighbor_id"))
      .withColumn("adc_dist",
        graft.functions.GraftFunctions.pqAdcDist(col("codes"), col("lut")))
    val w = Window.partitionBy("query_id")
      .orderBy(col("adc_dist").asc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("query_id", "neighbor_id", "rank", "adc_dist")
  }

  def pqTopKExact(
      corpus: DataFrame, corpusId: String, corpusVec: String,
      queries: DataFrame, queryId: String, queryVec: String,
      k: Int, m: Int = 8, codewords: Int = 16,
      lloydIters: Int = 0): DataFrame =
    searchPqIndexExact(
      buildPqIndexExact(corpus, corpusId, corpusVec, m, codewords, lloydIters),
      queries, queryId, queryVec, k)

  /** IVF×PQ — the composed scale path the PQ scaladoc promises: the IVF
    * router prunes the ADC sweep to each query's `nprobe` probed cells, and
    * within a cell neighbors rank by the PQ ADC distance over the
    * 32×-compressed codes. Laws are EXACTLY the two parts' laws composed
    * ([[buildIvfIndexExact]]: lowest-id integer centroids, strict-<
    * earliest-wins cell argmin, probe = nprobe nearest cells by exact
    * integer L2; [[buildPqIndexExact]]: lowest-id subvector codebooks, ADC
    * LUT sum via the native [[graft.plans.PqAdcDistExpression]]) — so the
    * whole route→sweep→rank relation replays in SQL and a wrong cell,
    * probe set, code or rank hash-mismatches.
    *
    * Scale shape: ONE map-only pass codes the corpus (cell argmin + m code
    * argmins, intra-row over broadcast literals, no shuffle); the probe
    * join is an equi-join on `cell` against the broadcast exploded query
    * probes — never a cross join against the full code table — so the
    * sweep touches nprobe/nCells of the codes, each costing m lookups.
    * At 100 TB persist the coded corpus bucketed by `cell`
    * ([[writeIvfPqIndex]] / [[readIvfPqIndex]] — index once, query many,
    * index-side exchange-free) and both build collects stay bounded
    * (max(nCells, codewords) rows). */
  /** Persistable IVF×PQ index: the bounded routing/codebook constants plus
    * `coded` (cell, neighbor_id, codes) — the 32×-compressed inverted file.
    * A deployment writes it once ([[writeIvfPqIndex]], bucketed by `cell`)
    * and every search skips both the assignment and the encode pass. */
  final case class IvfPqIndexExact(
      centroids: Seq[(Long, Seq[Long])],
      m: Int, dsub: Int,
      codebooks: Seq[Seq[Seq[Long]]],
      coded: DataFrame)

  def buildIvfPqIndexExact(corpus: DataFrame, corpusId: String,
      corpusVec: String, nCells: Int = 16, m: Int = 8,
      codewords: Int = 16, lloydIters: Int = 0): IvfPqIndexExact = {
    val e = corpus.select(col(corpusId).cast("long").as("neighbor_id"),
      quantLong(col(corpusVec)).as("v"))
    // bounded driver table: the max(nCells, codewords) lowest-id quantized
    // rows seed BOTH the centroids and the codebooks (the documented shared
    // deterministic-seed law) in one collect
    val seedRows: Seq[Seq[Long]] = e.orderBy("neighbor_id")
      .limit(math.max(nCells, codewords))
      .select("v").collect().toSeq.map(_.getSeq[Long](0).toSeq)
    require(seedRows.nonEmpty, "IVF-PQ index needs a non-empty corpus")
    val dim = seedRows.head.length
    require(dim % m == 0, s"embedding dim $dim not divisible by m=$m")
    val dsub = dim / m
    val centSeed: Seq[(Long, Seq[Long])] =
      seedRows.take(nCells).zipWithIndex.map { case (v, i) => (i.toLong, v) }
    val bookSeed = (0 until m).map(s =>
      seedRows.take(codewords).map(_.slice(s * dsub, (s + 1) * dsub)))
    // optional Lloyd refinement of BOTH constants (bounded driver tables;
    // the route/encode/sweep relations themselves never change)
    val cent =
      if (lloydIters <= 0) centSeed
      else refineIvfCentroidsExact(e, "v", centSeed, lloydIters)
    val codebooks =
      if (lloydIters <= 0) bookSeed
      else refinePqCodebooksExact(e, bookSeed, m, dsub, lloydIters)
    val centFlat = cent.flatMap(_._2).toArray
    val cbFlat = codebooks.flatMap(_.flatten).toArray
    // one map-only pass over the corpus: cell + codes via the two native
    // codegen'd argmins, no shuffle
    IvfPqIndexExact(cent, m, dsub, codebooks,
      e.select(col("neighbor_id"),
        graft.functions.GraftFunctions.longL2Argmin(
          col("v"), centFlat, cent.size).as("cell"),
        graft.functions.GraftFunctions.pqEncode(
          col("v"), cbFlat, m, codebooks.head.size).as("codes")))
  }

  /** Search a built IVF×PQ index: each query probes its nprobe nearest
    * cells ([[graft.plans.L2ProbeCellsExpression]]) and sweeps only those
    * cells' codes with its ADC LUT. `broadcastQueries = false` is the
    * large-batch mode: the probe join plans as a sort-merge join whose
    * index side is exchange-free when the coded file was persisted
    * bucketed by cell ([[writeIvfPqIndex]]) — only the (smaller) query
    * batch shuffles, and the moved bytes are codes, not vectors. */
  def searchIvfPqIndexExact(index: IvfPqIndexExact, queries: DataFrame,
      queryId: String, queryVec: String, k: Int, nprobe: Int = 4,
      broadcastQueries: Boolean = true): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val centFlat = index.centroids.flatMap(_._2).toArray
    val cbFlat = index.codebooks.flatMap(_.flatten).toArray
    val qv = quantLong(col(queryVec))
    val q0 = queries
      .select(col(queryId).cast("long").as("query_id"),
        graft.functions.GraftFunctions.pqLut(
          qv, cbFlat, index.m, index.codebooks.head.size).as("lut"),
        graft.functions.GraftFunctions.l2ProbeCells(
          qv, centFlat, index.centroids.size, nprobe).as("probes"))
      .withColumn("cell", explode(col("probes")))
      .drop("probes")
    val q = if (broadcastQueries) broadcast(q0) else q0
    val scored = index.coded.join(q, Seq("cell"))
      .where(col("query_id") =!= col("neighbor_id"))
      .withColumn("adc_dist",
        graft.functions.GraftFunctions.pqAdcDist(col("codes"), col("lut")))
    val w = Window.partitionBy("query_id")
      .orderBy(col("adc_dist").asc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("query_id", "neighbor_id", "rank", "adc_dist")
  }

  /** Persist an IVF×PQ index for reuse across jobs: the coded inverted file
    * goes down BUCKETED by `cell` (repeated probe joins read co-located
    * buckets with zero index-side exchange — and at 32× compression the
    * write itself is cheap); the bounded constants persist alongside as
    * `<table>_centroids` and `<table>_codebooks`. */
  def writeIvfPqIndex(index: IvfPqIndexExact, table: String,
      buckets: Int = 16): Unit = {
    Bucketing.writeBucketed(index.coded, table, buckets, Seq("cell"))
    val spark = index.coded.sparkSession
    import spark.implicits._
    index.centroids.toDF("cell", "cvec").write.mode("overwrite")
      .format("parquet").saveAsTable(s"${table}_centroids")
    index.codebooks.zipWithIndex
      .flatMap { case (book, s) => book.zipWithIndex.map { case (cw, j) =>
        (s, j, cw) } }
      .toDF("s", "j", "cw").write.mode("overwrite")
      .format("parquet").saveAsTable(s"${table}_codebooks")
  }

  /** Reload a persisted IVF×PQ index: the coded file stays a (bucketed)
    * table scan; only the bounded centroid/codebook tables collect. */
  def readIvfPqIndex(spark: org.apache.spark.sql.SparkSession,
      table: String): IvfPqIndexExact = {
    val cent = spark.table(s"${table}_centroids").orderBy("cell")
      .collect().map(r => (r.getLong(0), r.getSeq[Long](1))).toSeq
    val cbRows = spark.table(s"${table}_codebooks").orderBy("s", "j")
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getSeq[Long](2)))
    val m = cbRows.map(_._1).max + 1
    val codebooks = (0 until m).map(s =>
      cbRows.filter(_._1 == s).sortBy(_._2).map(_._3.toSeq).toSeq)
    IvfPqIndexExact(cent, m, codebooks.head.head.size, codebooks,
      spark.table(table))
  }

  def ivfPqTopKExact(
      corpus: DataFrame, corpusId: String, corpusVec: String,
      queries: DataFrame, queryId: String, queryVec: String,
      k: Int, nCells: Int = 16, nprobe: Int = 4,
      m: Int = 8, codewords: Int = 16, lloydIters: Int = 0): DataFrame =
    searchIvfPqIndexExact(
      buildIvfPqIndexExact(corpus, corpusId, corpusVec, nCells, m,
        codewords, lloydIters),
      queries, queryId, queryVec, k, nprobe)

  /** Deterministic pseudo-random hyperplane component for (plane p, dim d):
    * a fixed hash mapped to [-1, 1]. Same formula is reproducible anywhere. */
  private def planeComponent(p: Column, d: Column): Column =
    (pmod(xxhash64(p, d), lit(2000001L)) - 1000000L).cast("double") / 1000000.0d

  /** b-bit hyperplane LSH bucket of a vector — intra-row, no shuffle.
    * Bit p = sign of <v, plane_p>. */
  def lshBucket(vec: Column, bits: Int): Column = {
    val planes = sequence(lit(0), lit(bits - 1))
    aggregate(
      transform(planes, p => {
        val proj = aggregate(
          zip_with(vec, transform(sequence(lit(0), size(vec) - 1), d => planeComponent(p, d)),
            (x, w) => x * w),
          lit(0.0d), (acc, v) => acc + v)
        when(proj > 0, call_function("shiftleft", lit(1L), p)).otherwise(lit(0L))
      }),
      lit(0L), (acc, x) => acc.bitwiseOR(x))
  }

  /** IVF (inverted-file) ANN: coarse-quantize the corpus against a small
    * deterministic centroid set, search only the `nprobe` nearest cells.
    *
    * Centroids here are a deterministic corpus sample (lowest ids) — on a
    * real deployment swap in k-means centroids; the plan shape is identical:
    * assignment is an intra-row argmin over the broadcast centroid array
    * (no shuffle), the probe filter turns the O(N·Q) scan into a cell-pruned
    * scan, and the final exact top-k reuses WindowGroupLimit. */
  def ivfAssign(vec: Column, centroids: Seq[(Long, Seq[Float])]): Column = {
    // argmin over centroid distances, computed intra-row
    val scored = centroids.map { case (cid, cvec) =>
      val carr = array(cvec.map(v => lit(v)): _*)
      struct(
        aggregate(zip_with(vec, carr, (x, c) => (x - c) * (x - c)),
          lit(0.0d), (acc, v) => acc + v).as("dist"),
        lit(cid).as("cell"))
    }
    aggregate(array(scored: _*), scored.head,
      (best, s) => when(s("dist") < best("dist"), s).otherwise(best))("cell")
  }

  /** Lloyd's k-means over the corpus, DataFrame-only: assignment is the
    * intra-row [[ivfAssign]] argmin against the broadcast current centroids;
    * the update step is a positional explode + (cell, dim) average — one
    * shuffle per iteration whose output is nCells×dim rows, so the per-iter
    * driver collect is bounded by the centroid table, never the corpus.
    * Seeded from the deterministic distributed sample ([[seedCentroids]]);
    * empty cells keep their previous centroid. */
  def kMeansCentroids(corpus: DataFrame, vecCol: String,
      seed: Seq[(Long, Seq[Float])], iters: Int): Seq[(Long, Seq[Float])] = {
    var centroids = seed
    for (_ <- 1 to iters) {
      val means = corpus
        .select(col(vecCol).as("v"),
          ivfAssign(col(vecCol), centroids).as("cell"))
        .select(col("cell"), posexplode(col("v")).as(Seq("pos", "x")))
        .groupBy("cell", "pos").agg(avg("x").as("m"))
        .groupBy("cell")
        .agg(sort_array(collect_list(struct(col("pos"), col("m")))).as("ps"))
        .collect()
        .map(r => r.getLong(0) ->
          r.getSeq[org.apache.spark.sql.Row](1).map(_.getDouble(1).toFloat).toSeq)
        .toMap
      centroids = centroids.map { case (cid, old) =>
        (cid, means.getOrElse(cid, old))
      }
    }
    centroids
  }

  /** Deterministic k-means‖-style distributed seeding: oversample 4×nCells
    * candidates uniformly by taking the distributed top-k on a hash of the
    * id (TakeOrderedAndProject — one corpus scan, no global sort, no rank
    * of the corpus by id), then reduce to nCells on the driver with greedy
    * farthest-point selection over the BOUNDED candidate set (4·nCells
    * rows, never the corpus). Hash-ordering makes the sample uniform in
    * content (lowest-id seeding picked whatever happened to sort first,
    * which clusters when ids correlate with content) while staying
    * deterministic across runs. */
  /** The distributed-sample candidate frame: compiles to
    * TakeOrderedAndProject (per-partition top-k + driver merge), never a
    * range-partitioned global sort. Exposed for plan assertions. */
  def seedCandidates(corpus: DataFrame, idCol: String, vecCol: String,
      nCells: Int): DataFrame =
    corpus
      .select(col(idCol).cast("long").as("sid"), col(vecCol).as("v"))
      .orderBy(xxhash64(col("sid")), col("sid"))
      .limit(nCells * 4)

  private[operators] def seedCentroids(corpus: DataFrame, idCol: String,
      vecCol: String, nCells: Int): Seq[(Long, Seq[Float])] = {
    val candidates = seedCandidates(corpus, idCol, vecCol, nCells)
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toSeq)).toSeq
    if (candidates.isEmpty) Seq.empty
    else {
      def d2(a: Seq[Float], b: Seq[Float]): Double =
        a.lazyZip(b).map((x, y) => (x - y).toDouble * (x - y)).sum
      val chosen = scala.collection.mutable.ArrayBuffer(candidates.head)
      while (chosen.size < nCells && chosen.size < candidates.size) {
        // farthest-point: the unchosen candidate maximizing the distance to
        // its nearest chosen seed (maxBy keeps the first max → deterministic
        // given the hash-sorted candidate order)
        val next = candidates
          .filterNot(c => chosen.exists(_._1 == c._1))
          .maxBy(c => chosen.map(s => d2(s._2, c._2)).min)
        chosen += next
      }
      chosen.toSeq
    }
  }

  def ivfTopK(
      corpus: DataFrame, corpusId: String, corpusVec: String,
      queries: DataFrame, queryId: String, queryVec: String,
      k: Int, nCells: Int = 16, nprobe: Int = 4,
      kMeansIters: Int = 0): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // deterministic distributed-sample seed centroids;
    // kMeansIters > 0 refines them with Lloyd iterations
    val seed = seedCentroids(corpus, corpusId, corpusVec, nCells)
    val centroids =
      if (kMeansIters <= 0) seed
      else kMeansCentroids(corpus, corpusVec, seed, kMeansIters)

    val assigned = corpus.select(col(corpusId).as("neighbor_id"),
      col(corpusVec).as("cvec"),
      ivfAssign(col(corpusVec), centroids).as("cell"))

    // each query probes its nprobe nearest cells
    val qCells = queries.select(col(queryId).as("query_id"), col(queryVec).as("qvec"))
      .withColumn("cells", ivfProbeCells(col(queryVec), centroids, nprobe))
      .select(col("query_id"), col("qvec"), explode(col("cells")).as("cell"))

    val scored = assigned.join(broadcast(qCells), Seq("cell"))
      .where(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        cosine(col("qvec"), col("cvec")).as("cosine"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("query_id", "neighbor_id", "cosine", "rank")
  }

  /** The nprobe nearest centroid cells for a query vector, intra-row:
    * sort the (dist, cell) structs and slice. */
  def ivfProbeCells(vec: Column, centroids: Seq[(Long, Seq[Float])],
      nprobe: Int): Column = {
    val scored = centroids.map { case (cid, cvec) =>
      val carr = array(cvec.map(v => lit(v)): _*)
      struct(
        aggregate(zip_with(vec, carr, (x, c) => (x - c) * (x - c)),
          lit(0.0d), (acc, v) => acc + v).as("dist"),
        lit(cid).as("cell"))
    }
    transform(slice(sort_array(array(scored: _*)), 1, nprobe), s => s("cell"))
  }

  /** LSH-bucketed ANN: score only bucket-colliding (query, corpus) pairs.
    * Recall/cost traded via `bits`. */
  def lshTopK(
      corpus: DataFrame, corpusId: String, corpusVec: String,
      queries: DataFrame, queryId: String, queryVec: String,
      k: Int, bits: Int = 8): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val c = corpus.select(col(corpusId).as("neighbor_id"),
      col(corpusVec).as("cvec"), lshBucket(col(corpusVec), bits).as("bucket"))
    val q = queries.select(col(queryId).as("query_id"),
      col(queryVec).as("qvec"), lshBucket(col(queryVec), bits).as("bucket"))
    val scored = c.join(broadcast(q), Seq("bucket"))
      .where(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        cosine(col("qvec"), col("cvec")).as("cosine"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("query_id", "neighbor_id", "cosine", "rank")
  }
}
