package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-corpus analysis for training-data pipelines: token counting, quality
  * scoring, language ID, fingerprinting. All intra-row column expressions
  * (codegen'd, shuffle-free) so they compose with any scan at any scale. */
object TextAnalysis {

  /** Whitespace tokens. */
  def tokens(text: Column): Column =
    filter(split(text, "\\s+"), t => t =!= "")

  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish subword count estimate: word-boundary pieces + digits + punct
    * split out, ~4 chars per piece cap. */
  def subwordCountEstimate(text: Column): Column =
    size(filter(split(text, "(?=[A-Z])|[\\s]+|(?<=[a-z])(?=[0-9])|(?=[^A-Za-z0-9\\s])"),
      t => t =!= ""))

  /** Quality features: length, token stats, punctuation/digit/upper ratios,
    * stopword ratio — the usual heuristic pre-filters. */
  def qualityFeatures(df: DataFrame, textCol: String): DataFrame = {
    val t = col(textCol)
    val toks = tokens(t)
    val nChars = length(t).cast("double")
    df
      .withColumn("n_chars", length(t).cast("long"))
      .withColumn("n_tokens", size(toks).cast("long"))
      .withColumn("mean_token_len",
        when(size(toks) > 0, nChars / size(toks)).otherwise(lit(0.0)))
      .withColumn("punct_ratio",
        when(nChars > 0,
          (nChars - length(regexp_replace(t, "[\\p{Punct}]", ""))) / nChars)
          .otherwise(lit(0.0)))
      .withColumn("digit_ratio",
        when(nChars > 0,
          (nChars - length(regexp_replace(t, "[0-9]", ""))) / nChars)
          .otherwise(lit(0.0)))
      .withColumn("stopword_ratio",
        when(size(toks) > 0,
          size(filter(toks, w => lower(w).isin(Stopwords.en.map(lit(_)): _*)))
            .cast("double") / size(toks))
          .otherwise(lit(0.0)))
  }

  /** Composite quality score in [0,1]: penalize extreme length, high punct /
    * digit density, low stopword incidence. Deterministic, documented weights. */
  def qualityScore(df: DataFrame, textCol: String): DataFrame =
    qualityFeatures(df, textCol).withColumn("quality_score",
      greatest(lit(0.0), least(lit(1.0),
        lit(1.0)
          - when(col("n_tokens") < 5, 0.5).otherwise(0.0)
          - col("punct_ratio") * 0.5
          - col("digit_ratio") * 0.5
          + col("stopword_ratio") * 0.2)))

  /** Fixed public weights for [[qualityScoreLinear]] — the
    * fastText/CCNet-family linear-classifier shape without a model
    * dependency: a scaled-integer weight per feature plus a bias and a
    * decision threshold, shipped as DATA (one broadcast row), not code, so
    * a production deployment swaps trained weights in without a plan
    * change. Tuned on the planted good/bad docs in the spec. */
  val DefaultQualityWeights: Map[String, Long] = Map(
    "w_bias" -> 200L,      // prior
    "w_stop" -> 3L,        // per stopword millifraction (English prose signal)
    "w_punct" -> -2L,      // per punctuation millifraction (markup/junk)
    "w_digit" -> -2L,      // per digit millifraction (tables/serial junk)
    "w_len" -> 25L,        // per floor-log2(chars) (length prior, saturating)
    "threshold" -> 400L)   // keep iff score_scaled >= threshold

  /** Trained-classifier-shaped quality score: an EXACT-INTEGER linear model
    * over the heuristic features — the shape of the fastText/CCNet quality
    * classifiers (featurize → linear → threshold) with every boundary
    * integer so any engine replays keep/drop bit-identically:
    *
    *   stop_mill  = 1000·n_stopword_tokens div max(n_tokens, 1)
    *   punct_mill = 1000·n_punct_chars     div max(n_chars, 1)
    *   digit_mill = 1000·n_digit_chars     div max(n_chars, 1)
    *   len_bits   = ⌊log2(max(n_chars, 1))⌋   (length(bin(x)) − 1)
    *   score_scaled = w_bias + w_stop·stop_mill + w_punct·punct_mill
    *                + w_digit·digit_mill + w_len·len_bits
    *   keep = score_scaled ≥ threshold
    *
    * Unlike [[qualityScore]]'s hand-rules (which hard-code how features
    * combine), the combination here is LEARNED-SHAPED: weights arrive as a
    * one-row broadcast frame, so the same plan serves any trained
    * parameter set. The two disagree by design on stopword-free gibberish
    * (heuristic: no penalty fires, passes; linear: the stopword feature's
    * weight is decisive, rejects) — spec'd on planted docs.
    *
    * Scale shape: map-only featurization + a broadcast 1-row weights
    * cross-join; composes before any shuffle. */
  def qualityScoreLinear(df: DataFrame, idCol: String, textCol: String,
      weights: Map[String, Long] = DefaultQualityWeights): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val need = DefaultQualityWeights.keySet
    require(weights.keySet == need, s"weights must define exactly $need")
    val w = Seq((weights("w_bias"), weights("w_stop"), weights("w_punct"),
      weights("w_digit"), weights("w_len"), weights("threshold")))
      .toDF("w_bias", "w_stop", "w_punct", "w_digit", "w_len", "threshold")
    val t = col(textCol)
    val toks = tokens(t)
    val nChars = length(t).cast("long")
    val nTokens = size(toks).cast("long")
    val nStop = size(filter(toks,
      x => lower(x).isin(Stopwords.en.map(lit(_)): _*))).cast("long")
    val nPunct = (length(t) - length(regexp_replace(t, "[\\p{Punct}]", "")))
      .cast("long")
    val nDigit = (length(t) - length(regexp_replace(t, "[0-9]", "")))
      .cast("long")
    df.select(col(idCol), nChars.as("n_chars"), nTokens.as("n_tokens"),
        nStop.as("__stop"), nPunct.as("__punct"), nDigit.as("__digit"))
      .crossJoin(broadcast(w))
      .withColumn("stop_mill", expr("__stop * 1000 div greatest(n_tokens, 1)"))
      .withColumn("punct_mill", expr("__punct * 1000 div greatest(n_chars, 1)"))
      .withColumn("digit_mill", expr("__digit * 1000 div greatest(n_chars, 1)"))
      .withColumn("len_bits",
        (length(bin(greatest(col("n_chars"), lit(1L)))) - 1).cast("long"))
      .withColumn("score_scaled",
        col("w_bias") + col("w_stop") * col("stop_mill")
          + col("w_punct") * col("punct_mill")
          + col("w_digit") * col("digit_mill")
          + col("w_len") * col("len_bits"))
      .withColumn("keep", col("score_scaled") >= col("threshold"))
      .select(col(idCol), col("n_chars"), col("n_tokens"), col("stop_mill"),
        col("punct_mill"), col("digit_mill"), col("len_bits"),
        col("score_scaled"), col("keep"))
  }

  /** The 8 required stopwords of the Gopher stopword rule (Rae et al.,
    * "Scaling Language Models: … Gopher", 2021, §A1.1): a document must
    * contain at least 2 of them. */
  val GopherStopwords: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /** Gopher-rule quality filter (Rae et al. 2021 §A1.1, the Dolma/RefinedWeb
    * reimplementation family) — the line-grain and word-grain rules the
    * linear classifier shape doesn't cover, every boundary an EXACT-INTEGER
    * millifraction so any engine replays keep/drop bit-identically:
    *
    *   r_words    : minWords ≤ n_words ≤ maxWords
    *   r_mean_len : 3000 ≤ 1000·Σ|word| div n_words ≤ 10000   (mean ∈ [3,10])
    *   r_symbol   : 1000·(#'#' + #'…' + #'...') div n_words ≤ 100
    *                ('…' per codepoint; '...' as non-overlapping ASCII
    *                triples — disjoint char sets, so the counts compose)
    *   r_bullet   : 1000·lines starting '•'/'-'/'*' div n_lines ≤ 900
    *   r_ellipsis : 1000·lines ending '…' or '...' div n_lines ≤ 300
    *   r_alpha    : 1000·words containing a \\p{L} letter div n_words ≥ 800
    *   r_stop     : ≥ 2 distinct [[GopherStopwords]] present (lowercased)
    *   gopher_keep = all of the above
    *
    * Empty-denominator corners: a wordless doc fails r_words/r_alpha/r_stop
    * (ratios divide by max(n,1)); a lineless doc passes the line rules
    * vacuously (0 ≤ threshold). Scale shape: map-only column algebra —
    * composes with the scan at any corpus size, no shuffle, no UDF. */
  def gopherRules(df: DataFrame, idCol: String, textCol: String,
      minWords: Long = 50L, maxWords: Long = 100000L): DataFrame = {
    val t = col(textCol)
    val toks = tokens(t)
    val lines = filter(split(t, "\n"), l => l =!= "")
    val nWords = size(toks).cast("long")
    val nLines = size(lines).cast("long")
    val wordChars = aggregate(toks, lit(0L), (acc, w) => acc + length(w))
    val nHash = (length(t) - length(replace(t, lit("#"), lit("")))).cast("long")
    val nEllip = (length(t) - length(replace(t, lit("…"), lit("")))).cast("long")
    val nDots = ((length(t) - length(replace(t, lit("..."), lit("")))) / 3)
      .cast("long")
    val bulletLines = size(filter(lines,
      l => substring(l, 1, 1).isin("•", "-", "*"))).cast("long")
    val ellipsisLines = size(filter(lines,
      l => l.endsWith("…") || l.endsWith("..."))).cast("long")
    val alphaWords = size(filter(toks, w => w.rlike("\\p{L}"))).cast("long")
    val stopHits = size(filter(
      array(GopherStopwords.map(lit(_)): _*),
      sw => array_contains(transform(toks, w => lower(w)), sw))).cast("long")
    df.select(col(idCol), nWords.as("n_words"), nLines.as("n_lines"),
        wordChars.as("__wc"), (nHash + nEllip + nDots).as("__sym"),
        bulletLines.as("__bl"), ellipsisLines.as("__el"),
        alphaWords.as("__aw"), stopHits.as("n_stop_hits"))
      .withColumn("mean_len_mill", expr("__wc * 1000 div greatest(n_words, 1)"))
      .withColumn("symbol_mill", expr("__sym * 1000 div greatest(n_words, 1)"))
      .withColumn("bullet_mill", expr("__bl * 1000 div greatest(n_lines, 1)"))
      .withColumn("ellipsis_mill", expr("__el * 1000 div greatest(n_lines, 1)"))
      .withColumn("alpha_mill", expr("__aw * 1000 div greatest(n_words, 1)"))
      .withColumn("r_words",
        col("n_words") >= minWords && col("n_words") <= maxWords)
      .withColumn("r_mean_len",
        col("mean_len_mill") >= 3000L && col("mean_len_mill") <= 10000L)
      .withColumn("r_symbol", col("symbol_mill") <= 100L)
      .withColumn("r_bullet", col("bullet_mill") <= 900L)
      .withColumn("r_ellipsis", col("ellipsis_mill") <= 300L)
      .withColumn("r_alpha", col("alpha_mill") >= 800L)
      .withColumn("r_stop", col("n_stop_hits") >= 2L)
      .withColumn("gopher_keep",
        col("r_words") && col("r_mean_len") && col("r_symbol") &&
          col("r_bullet") && col("r_ellipsis") && col("r_alpha") &&
          col("r_stop"))
      .drop("__wc", "__sym", "__bl", "__el", "__aw")
  }

  /** The [[gopherRules]] verdict as ONE composable boolean Column — the
    * ARRIVAL-TIME face: a stream gate must keep the surrounding columns,
    * while the batch operator projects to its feature schema. Exactly the
    * same integer millifraction laws (truncating integral division via
    * the Catalyst IntegralDivide node, like the batch `div`);
    * StreamingSpec pins bit-parity against the batch `gopher_keep`. */
  def gopherKeepCol(t: Column, minWords: Long = 50L,
      maxWords: Long = 100000L): Column = {
    def intDiv(a: Column, b: Column): Column =
      org.apache.spark.sql.graftbridge.ColumnBridge.column(
        org.apache.spark.sql.catalyst.expressions.IntegralDivide(
          org.apache.spark.sql.graftbridge.ColumnBridge.expression(a),
          org.apache.spark.sql.graftbridge.ColumnBridge.expression(b)))
    val toks = tokens(t)
    val lines = filter(split(t, "\n"), l => l =!= "")
    val nWords = size(toks).cast("long")
    val nLines = size(lines).cast("long")
    val wordChars = aggregate(toks, lit(0L), (acc, w) => acc + length(w))
    val nHash = (length(t) - length(replace(t, lit("#"), lit(""))))
      .cast("long")
    val nEllip = (length(t) - length(replace(t, lit("…"), lit(""))))
      .cast("long")
    val nDots = ((length(t) - length(replace(t, lit("..."), lit("")))) / 3)
      .cast("long")
    val bulletLines = size(filter(lines,
      l => substring(l, 1, 1).isin("•", "-", "*"))).cast("long")
    val ellipsisLines = size(filter(lines,
      l => l.endsWith("…") || l.endsWith("..."))).cast("long")
    val alphaWords = size(filter(toks, w => w.rlike("\\p{L}"))).cast("long")
    val stopHits = size(filter(
      array(GopherStopwords.map(lit(_)): _*),
      sw => array_contains(transform(toks, w => lower(w)), sw))).cast("long")
    val denW = greatest(nWords, lit(1L))
    val denL = greatest(nLines, lit(1L))
    nWords >= minWords && nWords <= maxWords &&
      intDiv(wordChars * 1000L, denW).between(3000L, 10000L) &&
      intDiv((nHash + nEllip + nDots) * 1000L, denW) <= 100L &&
      intDiv(bulletLines * 1000L, denL) <= 900L &&
      intDiv(ellipsisLines * 1000L, denL) <= 300L &&
      intDiv(alphaWords * 1000L, denW) >= 800L &&
      stopHits >= 2L
  }

  /** The [[gopherRepetition]] verdict as ONE composable boolean Column
    * (same fused native profile expression, thresholds applied per slot —
    * duplicate profile references collapse under codegen subexpression
    * elimination). StreamingSpec pins bit-parity against the batch
    * `rep_keep`. */
  def repKeepCol(t: Column): Column = {
    val prof = graft.functions.GraftFunctions.gopherRepetition(t)
    GopherRepThresholds.zipWithIndex.map { case ((_, thr), i) =>
      prof.getItem(i) <= thr
    }.reduce(_ && _)
  }

  /** Overlapping-window document chunking — the RAG / long-context
    * training primitive: split each document into windows of `window`
    * tokens advancing by `stride` (stride < window ⇒ overlap, the usual
    * retrieval shape). Exact laws so any engine replays chunk boundaries
    * bit-identically:
    *
    *   - tokens = whitespace tokens (the corpus token law);
    *   - chunk c (0-based) covers token positions [c·stride+1,
    *     c·stride+window] (1-based, clamped at the doc end);
    *   - n_chunks = 1 + max(0, ⌈(n_tokens − window) / stride⌉) — one
    *     chunk always exists (empty docs produce one empty chunk), and
    *     the last chunk starts at most at n_tokens − 1;
    *   - chunk_id = doc_id·10⁶ + c (stable across runs; a doc with ≥10⁶
    *     chunks or |doc_id| > ~9.22·10¹² RAISES at runtime — callers at
    *     that scale pick a wider base).
    *
    * Intra-row transform + posexplode: the only cost is the explode fan
    * (n_chunks rows per doc), no shuffle, no UDF. */
  def chunkDocuments(df: DataFrame, idCol: String, textCol: String,
      window: Int, stride: Int): DataFrame = {
    require(window >= 1 && stride >= 1 && stride <= window,
      s"need 1 <= stride <= window, got window=$window stride=$stride")
    val toks = tokens(col(textCol))
    df.select(col(idCol).as("doc_id"), toks.as("__toks"))
      // pure integer arithmetic with an explicit short-doc arm: a
      // double-cast ceil would hit the round-vs-truncate cast split
      // between engines
      .withColumn("__n_chunks",
        when(size(col("__toks")) <= window, lit(1))
          .otherwise(lit(1) + expr(
            s"(size(__toks) - $window + $stride - 1) div $stride")))
      .select(col("doc_id"),
        posexplode(expr(
          s"transform(sequence(0, __n_chunks - 1), c -> " +
            s"array_join(slice(__toks, c * $stride + 1, $window), ' '))"))
          .as(Seq("chunk_idx", "chunk_text")))
      // LOUD overflow arm (the repo's law-guard idiom, cf. inverseMixture's
      // 2³¹ guard): a doc with ≥10⁶ chunks would silently collide into the
      // next doc_id's id space, and |doc_id| > ~9.22·10¹² overflows the
      // packed long — both now raise instead of corrupting ids
      .withColumn("chunk_id",
        when(col("chunk_idx") < 1000000L &&
          col("doc_id").between(-9223372036853L, 9223372036853L),
          col("doc_id") * 1000000L + col("chunk_idx"))
          .otherwise(raise_error(concat(
            lit("chunkDocuments: chunk_id = doc_id*1e6 + idx overflows "),
            lit("(doc_id="), col("doc_id").cast("string"),
            lit(", chunk_idx="), col("chunk_idx").cast("string"),
            lit(") — use a wider id base")))))
      .withColumn("n_chunk_tokens",
        size(tokens(col("chunk_text"))).cast("long"))
      .select("doc_id", "chunk_id", "chunk_idx", "chunk_text",
        "n_chunk_tokens")
  }

  /** Gopher Table-A1 repetition thresholds (Rae et al. 2021), as
    * millifraction caps in slot order of [[graft.codec.Repetition]]. */
  val GopherRepThresholds: Seq[(String, Long)] = Seq(
    "dup_line_frac" -> 300L, "dup_line_char_frac" -> 200L,
    "dup_para_frac" -> 300L, "dup_para_char_frac" -> 200L,
    "top2_char_frac" -> 200L, "top3_char_frac" -> 180L,
    "top4_char_frac" -> 160L,
    "dup5_char_frac" -> 150L, "dup6_char_frac" -> 140L,
    "dup7_char_frac" -> 130L, "dup8_char_frac" -> 120L,
    "dup9_char_frac" -> 110L, "dup10_char_frac" -> 100L)

  /** The Gopher REPETITION rule family (Rae et al. 2021 Table A1 — the
    * duplicate-line/paragraph and n-gram half that [[gopherRules]]'s
    * word/line-grain rules don't cover): 13 exact-integer millifractions
    * from ONE fused native expression pass per document
    * ([[graft.codec.Repetition]] holds the shared laws; the dup-n-gram
    * slots are a POSITION UNION, so overlapping duplicated grams never
    * double-count), each capped at the published threshold, plus the
    * composite `rep_keep`. Map-only column algebra over the scan — no
    * shuffle, no UDF fence, 13 rules for one text traversal. */
  def gopherRepetition(df: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val prof = graft.functions.GraftFunctions.gopherRepetition(col(textCol))
    val withSlots = GopherRepThresholds.zipWithIndex.foldLeft(
      df.select(col(idCol), prof.as("__rep"))) {
      case (d, ((name, _), i)) => d.withColumn(name, col("__rep").getItem(i))
    }
    GopherRepThresholds.foldLeft(withSlots) { case (d, (name, thr)) =>
      d.withColumn(s"r_$name", col(name) <= thr)
    }
      .withColumn("rep_keep",
        GopherRepThresholds.map { case (n, _) => col(s"r_$n") }
          .reduce(_ && _))
      .drop("__rep")
  }

  /** Corpus-LM quality signal — the CCNet/Gopher perplexity-filter family,
    * INTEGERIZED so the whole law replays in a SQL oracle: train a bigram
    * count model on the corpus itself (two map-side-combinable count
    * aggregations), then score each document by the total floor-log2
    * surprisal of its word bigrams:
    *
    *   surprisal(w1 w2) = flog2(c(w1·)) − flog2(c(w1 w2))      (≥ 0)
    *
    * where c(w1·) counts w1 as a bigram PREFIX and flog2(x) =
    * length(bin(x)) − 1 — the exact integer floor of log2, bit-identical
    * in any engine, replacing the float log that would make the score
    * hash-fragile. High mean surprisal = the document's word transitions
    * are rare for the corpus — the tail a perplexity filter prunes; near-
    * zero = boilerplate the corpus repeats.
    *
    * Output per doc: `n_bigrams`, `surprisal_bits` (Σ, exact Long) and
    * `mean_millibits` (⌊1000·Σ/n⌋ — integer division, 0 for docs with no
    * bigram).
    *
    * Scale shape: bigram explode → two count aggs → ONE equi-join of the
    * per-doc bigram rows against the bigram table (Catalyst/AQE picks the
    * join; the prefix counts derive from the same table) → per-doc sum.
    * At 100 TB train the model on a sample or a fixed reference corpus,
    * prune rare entries, and broadcast it. */
  def bigramSurprisal(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    def flog2(c: Column): Column = (length(bin(c)) - 1).cast("long")
    val toks = transform(tokens(col(textCol)), w => lower(w))
    val base = df.select(col(idCol).as("doc_id"), toks.as("toks"))
    val n1 = greatest(size(col("toks")) - 1, lit(0))
    val bg = base.select(col("doc_id"),
      explode(zip_with(
        slice(col("toks"), lit(1), n1), slice(col("toks"), lit(2), n1),
        (a, b) => concat(a, lit(" "), b))).as("bigram"))
    val bgCounts = bg.groupBy("bigram").agg(count(lit(1)).as("c_bg"))
      .withColumn("prefix", substring_index(col("bigram"), " ", 1))
    val prefCounts = bgCounts.groupBy("prefix").agg(sum("c_bg").as("c_pref"))
    val scored = bg
      .join(bgCounts.select("bigram", "c_bg", "prefix"), "bigram")
      .join(prefCounts, "prefix")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"),
        sum(flog2(col("c_pref")) - flog2(col("c_bg"))).as("surprisal_bits"))
    base.select("doc_id").join(scored, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("surprisal_bits"), lit(0L)).as("surprisal_bits"))
      .withColumn("mean_millibits",
        when(col("n_bigrams") > 0,
          expr("surprisal_bits * 1000 div n_bigrams")).otherwise(0L)
          .cast("long"))
  }

  /** Trigram LM surprisal with integerized back-off — the CCNet-grade
    * upgrade of [[bigramSurprisal]]: a reliable trigram scores against the
    * trigram model, a singleton trigram BACKS OFF to the bigram law plus a
    * fixed integer discount (the Katz back-off shape with every quantity
    * exact so any engine replays it):
    *
    *   c_tg ≥ minCount : bits = flog2(c(w1 w2 ·)) − flog2(c(w1 w2 w3))
    *   c_tg < minCount : bits = flog2(c(w2 ·)) − flog2(c(w2 w3)) + backoffBits
    *
    * where flog2(x) = length(bin(x)) − 1. The back-off arm is what lets
    * the law score NOVEL trigram structure built from common bigrams —
    * the document class the bigram law cannot separate (its bigrams are
    * all corpus-frequent, so bigram surprisal is low; its trigrams are
    * unseen, so this law charges the bigram cost PLUS the discount).
    * Output per doc: n_trigrams, n_backoff, surprisal3_bits (Σ, exact
    * Long), mean_millibits (⌊1000·Σ/n⌋; 0 for docs with <3 tokens).
    *
    * Scale shape: trigram/bigram explodes → four map-side-combinable
    * count aggregates (prefix tables derive from the count tables) → the
    * per-doc trigram rows equi-join the four narrow count tables → one
    * per-doc sum. Same 100 TB note as the bigram law: train on a sample
    * or fixed reference corpus, prune rare entries, broadcast. */
  def trigramSurprisal(df: DataFrame, idCol: String, textCol: String,
      minCount: Long = 2L, backoffBits: Long = 1L): DataFrame = {
    def flog2(c: Column): Column = (length(bin(c)) - 1).cast("long")
    val toks = transform(tokens(col(textCol)), w => lower(w))
    val base = df.select(col(idCol).as("doc_id"), toks.as("toks"))
    def grams(n: Int): Column = {
      val sz = greatest(size(col("toks")) - (n - 1), lit(0))
      (2 to n).foldLeft(slice(col("toks"), lit(1), sz)) { (acc, i) =>
        zip_with(acc, slice(col("toks"), lit(i), sz),
          (p, w) => concat(p, lit(" "), w))
      }
    }
    val tg = base.select(col("doc_id"), explode(grams(3)).as("trigram"))
    val tgCounts = tg.groupBy("trigram").agg(count(lit(1)).as("c_tg"))
      .withColumn("prefix2", substring_index(col("trigram"), " ", 2))
      .withColumn("bigram23", substring_index(col("trigram"), " ", -2))
    val p2Counts = tgCounts.groupBy("prefix2").agg(sum("c_tg").as("c_p2"))
    val bgCounts = base.select(explode(grams(2)).as("bigram23"))
      .groupBy("bigram23").agg(count(lit(1)).as("c_bg"))
      .withColumn("prefix1", substring_index(col("bigram23"), " ", 1))
    val p1Counts = bgCounts.groupBy("prefix1").agg(sum("c_bg").as("c_p1"))
    val scored = tg
      .join(tgCounts, "trigram")
      .join(p2Counts, "prefix2")
      .join(bgCounts, "bigram23")
      .join(p1Counts, "prefix1")
      .withColumn("bits",
        when(col("c_tg") >= minCount, flog2(col("c_p2")) - flog2(col("c_tg")))
          .otherwise(flog2(col("c_p1")) - flog2(col("c_bg"))
            + lit(backoffBits)))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_trigrams"),
        sum(when(col("c_tg") < minCount, 1L).otherwise(0L)).as("n_backoff"),
        sum(col("bits")).as("surprisal3_bits"))
    base.select("doc_id").join(scored, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_trigrams"), lit(0L)).as("n_trigrams"),
        coalesce(col("n_backoff"), lit(0L)).as("n_backoff"),
        coalesce(col("surprisal3_bits"), lit(0L)).as("surprisal3_bits"))
      .withColumn("mean_millibits",
        when(col("n_trigrams") > 0,
          expr("surprisal3_bits * 1000 div n_trigrams")).otherwise(0L)
          .cast("long"))
  }

  /** CCNet-style perplexity bucketing (Wenzek et al. 2020 §4.3): split the
    * corpus into head / middle / tail terciles of the LM score, the standard
    * quality-stratification step before mixture sampling (head = most
    * fluent under the corpus LM).
    *
    * CCNet computes the cut points by globally SORTING all document
    * perplexities — a full-corpus sort. This law exploits that the repo's
    * LM scores are bounded INTEGERS (mean millibits, domain ≤ ~64k distinct
    * values regardless of corpus size): the exact tercile thresholds fall
    * out of a map-combinable histogram aggregate over the score domain plus
    * a cumulative sum over the (bounded, broadcast-sized) histogram —
    * t_head = min{s : 3·cum(s) ≥ n}, t_mid = min{s : 3·cum(s) ≥ 2n} —
    * then one broadcast threshold join. No global sort, no per-doc window;
    * ties at a boundary land in the SAME bucket by construction (the
    * threshold is a score cut, not a row-rank cut), so the split is
    * engine-replayable where ntile()'s tie-breaking is not.
    *
    * Input: a scored frame (idCol, scoreCol ascending-is-better, i.e. low
    * surprisal = head). Output adds `ppl_bucket` ∈ head|middle|tail.
    * The single-partition window runs over ≤ |score domain| rows — the
    * same bounded-driver-data license as the IVF centroid collect. */
  def surprisalBuckets(scored: DataFrame, idCol: String,
      scoreCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val hist = scored.groupBy(col(scoreCol).as("__s"))
      .agg(count(lit(1)).as("__c"))
    val cum = hist.withColumn("__cum",
      sum("__c").over(Window.orderBy("__s")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val tot = cum.agg(max("__cum").as("__n"))
    val thr = cum.join(broadcast(tot))
      .agg(
        min(when(col("__cum") * 3 >= col("__n"), col("__s"))).as("__t_head"),
        min(when(col("__cum") * 3 >= col("__n") * 2, col("__s")))
          .as("__t_mid"))
    scored.join(broadcast(thr))
      .withColumn("ppl_bucket",
        when(col(scoreCol) <= col("__t_head"), "head")
          .when(col(scoreCol) <= col("__t_mid"), "middle")
          .otherwise("tail"))
      .drop("__t_head", "__t_mid")
  }

  /** Stopword-lexicon language ID: score = share of tokens in each language's
    * stopword list; argmax with deterministic tie-break by language code.
    * N-gram-free heuristic that is pure column algebra (no UDF, no shuffle). */
  def langId(df: DataFrame, textCol: String): DataFrame = {
    val toks = transform(tokens(col(textCol)), w => lower(w))
    val scores = Stopwords.all.map { case (lang, words) =>
      struct(
        (size(filter(toks, w => w.isin(words.map(lit(_)): _*))).cast("double") /
          greatest(size(toks), lit(1))).as("score"),
        lit(lang).as("lang"))
    }
    // max over (score, lang-desc) with deterministic tie-break: highest score,
    // then lexicographically smallest lang
    val best = array(scores.toSeq: _*)
    df.withColumn("lang_scores", best)
      .withColumn("predicted_lang",
        aggregate(best, best.getItem(0),
          (acc, s) => when(
            s("score") > acc("score") ||
              (s("score") === acc("score") && s("lang") < acc("lang")), s)
            .otherwise(acc))("lang"))
      .drop("lang_scores")
  }

  /** Unicode NFC normalization — canonical composition so BYTE-level laws
    * are honest on real-world text: 'é' arrives both precomposed (U+00E9)
    * and decomposed ('e'+U+0301) in web corpora, and content hashes,
    * shingles and sort keys treat the two as different documents unless
    * the corpus normalizes first (W3C recommends NFC for exactly this).
    * Native codegen'd expression with an isNormalized fast-path — the
    * ASCII bulk of a corpus pays one linear scan, no allocation. Map-only;
    * compose it FIRST, upstream of every dedup/hash law. */
  def nfcNormalize(text: Column): Column =
    graft.functions.GraftFunctions.nfcNormalize(text)

  /** Content fingerprint: first 16 hex chars of md5 over the normalized text
    * (stable, partition-friendly surrogate key). */
  def fingerprint(text: Column): Column =
    substring(md5(Dedup.normalized(text)), 1, 16)

  /** Rolling polynomial hash (base 31, wrapping mod 2^64) over normalized
    * chars — the primitive under rolling-window near-dup detection. Native
    * codegen'd expression ([[graft.plans.RollingHash64Expression]]): one
    * compiled pass with Java wrapping arithmetic; the earlier
    * split + `aggregate` HOF formulation ran interpreted per character and
    * threw under ANSI mode once the polynomial exceeded 2^63. */
  def rollingHash(text: Column): Column =
    graft.functions.GraftFunctions.rollingHash64(text)

  /** PII patterns for training-data scrubbing, ordered most- to
    * least-specific so the email pass can't eat the bytes an IP or phone
    * pass would match. Java-regex and RE2 compatible (no lookaround), so a
    * SQL oracle can replay them verbatim. */
  val PiiPatterns: Seq[(String, String)] = Seq(
    ("email", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"),
    ("ip", "\\b\\d{1,3}(\\.\\d{1,3}){3}\\b"),
    ("phone", "\\+\\d{1,3}[- ]\\d{3}[- ]\\d{4}"))

  /** Redact PII spans to `<TAG>` placeholders — one chained
    * `regexp_replace` per pattern, map-only and codegen'd: the standard
    * pre-training scrub pass, shuffle-free at any corpus size. */
  def redactPii(text: Column): Column =
    PiiPatterns.foldLeft(text) { case (acc, (tag, re)) =>
      regexp_replace(acc, re, s"<${tag.toUpperCase}>")
    }

  /** Per-pattern match counts (audit trail for the scrub pass). */
  def piiCounts(df: DataFrame, textCol: String): DataFrame =
    PiiPatterns.foldLeft(df) { case (acc, (tag, re)) =>
      acc.withColumn(s"n_$tag", regexp_count(col(textCol), lit(re)))
    }

  /** Global vocabulary top-k: term → document frequency over the corpus,
    * highest-df first with the term as deterministic tie-break. Scale
    * shape: one hash aggregate with map-side partial counts (a stopword-
    * grade term costs O(partitions) exchange rows) followed by
    * TakeOrderedAndProject — per-partition top-k heaps, never a full
    * sort. The corpus-stats pass under tokenizer/BPE vocabulary builds. */
  def topTerms(df: DataFrame, textCol: String, k: Int, n: Int = 1): DataFrame =
    df.select(explode(Dedup.shingles(col(textCol), n)).as("term"))
      .groupBy("term")
      .agg(count(lit(1)).as("doc_freq"))
      .orderBy(col("doc_freq").desc, col("term"))
      .limit(k)

  /** BM25-shaped relevance ranking with INTEGER-EXACT laws — the corpus
    * retrieval primitive of a curation pipeline (rank documents against a
    * query term set), with every float boundary removed so the result is
    * bit-reproducible across engines:
    *
    *   - linear scaled inverse document frequency
    *     `idf = (N · 100) div df` (the log-free idf family; exactness
    *     beats textbook constants here — the SHAPE is what must scale),
    *   - the BM25 saturation/length-normalization denominator with
    *     k1 = 1.2, b = 0.75 cleared to one integer expression:
    *     `D = 10·Σdl·tf + 3·Σdl + 9·dl·N` (= 10·Σdl · (tf + 0.3 +
    *     0.9·dl/avgdl) with avgdl = Σdl/N kept rational),
    *   - per-term part `(idf · tf · 22 · Σdl) div D` — numerator widened
    *     to decimal(38,0) so the law survives corpus sizes where
    *     idf·tf·Σdl overflows a long; the QUOTIENT is small and exact —
    *   - summed per document as exact longs (order-independent, unlike a
    *     float sum) and ranked (score desc, doc_id asc).
    *
    * Scale shape: tokens filtered to the query terms BEFORE the shuffle
    * (literal IN — map-side), ONE partial-agg hash aggregate to (doc,
    * term) tf, document frequencies from that same frame (≤ |terms| rows,
    * broadcast back), corpus stats one broadcast row, and
    * TakeOrderedAndProject for the top-k — never a global sort. */
  def bm25TopK(df: DataFrame, idCol: String, textCol: String,
      queryTerms: Seq[String], k: Int): DataFrame = {
    require(queryTerms.nonEmpty, "bm25TopK needs at least one query term")
    val base = df.select(col(idCol).cast("long").as("doc_id"),
        transform(tokens(col(textCol)), w => lower(w)).as("toks"))
      .withColumn("dl", size(col("toks")).cast("long"))
    val stats = base.agg(count(lit(1)).as("n_docs"),
      sum(col("dl")).as("sum_dl"))
    val tf = base
      .select(col("doc_id"), col("dl"), explode(col("toks")).as("term"))
      .where(col("term").isin(queryTerms: _*))
      .groupBy("doc_id", "dl", "term").agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df_docs"))
    tf.join(broadcast(dfreq), "term")
      .crossJoin(broadcast(stats))
      .withColumn("idf_scaled", expr("(n_docs * 100) div df_docs"))
      .withColumn("part", expr(
        "(CAST(idf_scaled AS DECIMAL(38,0)) * tf * 22 * sum_dl) div " +
          "(10 * CAST(sum_dl AS DECIMAL(38,0)) * tf + 3 * sum_dl " +
          "+ 9 * dl * n_docs)"))
      .groupBy("doc_id").agg(sum(col("part")).as("score_scaled"))
      .orderBy(col("score_scaled").desc, col("doc_id"))
      .limit(k)
  }

  /** Distributed sequence packing: assign documents to fixed-token-budget
    * packs for training batches. Docs are sharded (id mod `shards` — each
    * shard packs independently, so parallelism = shards), deterministically
    * ordered inside the shard by their sha-256 sampling key (engine-
    * replayable shuffle), and binned by the pack their cumulative START
    * offset lands in: `pack = shard · stride + (cum − tokens) div budget`.
    * A pack's token sum is ≤ budget + the one straddling doc — the
    * standard streaming-packing law, here as ONE shuffle + per-shard
    * window sum instead of a sequential greedy loop.
    *
    * The pack index uses exact integer division (`div`), never floating
    * point, so the law stays bit-identical past 2⁵³ cumulative tokens.
    * `stride` must exceed the max packs any shard can produce
    * (≈ shard token sum / budget) or pack ids collide across shards;
    * at the default 10⁶ that is 512 M tokens per shard at budget 512 —
    * size `shards`/`stride` so stride · shards stays below 2⁶³. */
  def packSequences(df: DataFrame, idCol: String, tokenCol: String,
      budget: Long, shards: Int, stride: Long = 1000000L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(budget > 0 && shards > 0 && stride > 0,
      s"packSequences: budget/shards/stride must be positive")
    require(stride <= Long.MaxValue / shards,
      s"packSequences: stride $stride x shards $shards overflows Long")
    val shard = pmod(col(idCol), lit(shards.toLong))
    val w = Window.partitionBy("shard")
      .orderBy(Sampling.hashKey(col(idCol)), col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.select(col(idCol), shard.as("shard"), col(tokenCol).as("n_tokens"))
      .withColumn("__cum", sum(col("n_tokens")).over(w))
      .select(col(idCol), col("shard"), col("n_tokens"),
        (col("shard") * stride +
          expr(s"(__cum - n_tokens) div ${budget}L")).as("pack_id"))
  }

  /** Intra-document repetition: 1 − distinct/total word n-gram windows —
    * the boilerplate/loop filter of web-scale pipelines. Intra-row (the
    * fused shingle expression supplies the distinct count); docs shorter
    * than n words have one whole-doc window, ratio 0. */
  def repetitionRatio(text: Column, n: Int): Column = {
    val words = size(split(Dedup.normalized(text), " "))
    val total = greatest(words - lit(n - 1), lit(1))
    (lit(1.0) - size(Dedup.shingles(text, n)).cast("double") / total)
  }

  /** Winnowing fingerprints (Schleimer, Wilkerson & Aiken, "Winnowing:
    * Local Algorithms for Document Fingerprinting", SIGMOD 2003 — the MOSS
    * algorithm): hash every positional n-token shingle (the engine's
    * replayable sha63 law), slide a w-hash window over the sequence and
    * keep each window's MINIMUM. The selected set is a deterministic,
    * position-independent local fingerprint with the paper's guarantee:
    * any token run of length ≥ w + n − 1 shared by two documents places w
    * consecutive shared hashes in both, so some window of each selects the
    * SAME minimum — at least one shared fingerprint, always (no
    * probabilistic recall). Docs shorter than w windows keep their global
    * minimum (one fingerprint per non-empty doc).
    *
    * Entirely intra-row (positional-window expression + slice/array_min
    * HOFs), map-only — the per-doc cost is O(len · w) and nothing
    * shuffles until the caller joins on `fp`. */
  def winnowFingerprints(df: DataFrame, textCol: String, idCol: String,
      n: Int = 3, w: Int = 4): DataFrame = {
    require(n >= 1 && w >= 1, "n and w must be positive")
    // fused native expression (graft.plans.WinnowFingerprintsExpression):
    // one compiled normalize→gram→sha63→window-minima→distinct pass. The
    // HOF formulation (transform over window starts, each slice+array_min)
    // ran interpreted and COPIED a w-element array per window — ~29 s for
    // a 5 000-doc cold pass that the fused loop does in under a second.
    df.select(col(idCol).cast("long").as("doc_id"),
      explode(graft.functions.GraftFunctions.winnowFingerprintsNative(
        col(textCol), n, w)).as("fp"))
  }

  /** Document-overlap candidate pairs off the winnowing fingerprints: an
    * equi-join on `fp` (never all-pairs), counting the shared fingerprints
    * per pair. Fingerprints selected by more than `maxDf` documents are
    * stopword-run minima — the same hot-key blacklist as the df-cut
    * Jaccard path (few by construction, one broadcast) — so the join
    * fan-out is bounded by maxDf per fingerprint REGARDLESS of corpus
    * shape. `minShared` trims incidental single-window collisions; the
    * w + n − 1 guarantee applies to pairs whose shared runs survive the
    * df cut. */
  def winnowPairs(df: DataFrame, textCol: String, idCol: String,
      n: Int = 3, w: Int = 4, minShared: Int = 2,
      maxDf: Int = 100): DataFrame = {
    // fingerprint ONCE: the narrow (doc_id, fp) frame feeds the hot-fp
    // aggregate and BOTH self-join sides — uncached, the O(len·w)
    // window-min expression tree is recomputed in every branch (the same
    // measured trap as the simhash pair join: ~4× the query's real cost).
    // CACHE LIVENESS: the entry persists in the session CacheManager so
    // identical calls stay warm; long-lived sessions mixing corpora should
    // spark.catalog.clearCache() between them (see Dedup.simHashDupPairs).
    val fps = winnowFingerprints(df, textCol, idCol, n, w).cache()
    val hot = fps.groupBy("fp").agg(count(lit(1)).as("dfc"))
      .where(col("dfc") > maxDf)
      .select(col("fp"), lit(true).as("hot"))
    val cold = fps.join(broadcast(hot), Seq("fp"), "left")
      .where(col("hot").isNull)
      .select("fp", "doc_id")
    val a = cold.select(col("fp"), col("doc_id").as("id_a"))
    val b = cold.select(col("fp"), col("doc_id").as("id_b"))
    a.join(b, "fp")
      .where(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b")
      .agg(count(lit(1)).as("shared_fps"))
      .where(col("shared_fps") >= minShared)
  }
}

/** Minimal public stopword lexicons (top function words per language). */
object Stopwords {
  val en: Seq[String] = Seq("the", "of", "and", "to", "a", "in", "is", "it",
    "you", "that", "he", "was", "for", "on", "are", "with", "as", "his",
    "they", "at", "be", "this", "have", "from")
  val es: Seq[String] = Seq("el", "la", "de", "que", "y", "a", "en", "un",
    "ser", "se", "no", "haber", "por", "con", "su", "para", "como", "estar")
  val fr: Seq[String] = Seq("le", "la", "de", "et", "les", "des", "est", "un",
    "une", "du", "que", "pas", "pour", "sur", "avec", "au", "ce", "il")
  val de: Seq[String] = Seq("der", "die", "und", "das", "ist", "von", "mit",
    "den", "im", "für", "auf", "des", "ein", "eine", "nicht", "auch", "es")
  val all: Map[String, Seq[String]] =
    Map("en" -> en, "es" -> es, "fr" -> fr, "de" -> de)
}
