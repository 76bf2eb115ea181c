package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed BPE (byte-pair-encoding) vocabulary training — the
  * tokenizer-building pass of a training-data pipeline (Sennrich et al.,
  * "Neural Machine Translation of Rare Words with Subword Units", ACL
  * 2016), re-expressed as an iterative DataFrame loop:
  *
  *   1. the corpus collapses ONCE to a word-frequency table (one hash
  *      aggregate — BPE statistics are over the word VOCABULARY, which is
  *      orders of magnitude smaller than the corpus, so every later round
  *      is vocabulary-sized regardless of corpus size);
  *   2. each merge round is: adjacent-symbol-pair counts weighted by word
  *      frequency (map-side-combinable hash aggregate), the arg-max pair
  *      (count desc, pair asc — the deterministic tie-break every engine
  *      can replay) as a ONE-row driver fetch, and a map-only merge
  *      applied to every word's symbol sequence.
  *
  * The law is ALPHABET-COMPLETE: symbols are the word's codepoints — any
  * script, punctuation, digits, emoji — with NO character gate (real
  * corpora are mostly outside `[a-z0-9]`; compose [[wordVocab]] downstream
  * of [[graft.codec.UnicodeNorm]]'s NFC pass so `é` trains as one
  * precomposed symbol regardless of source encoding). Case folding is the
  * CALLER's composition choice: pre-project `lower(text)` for a folded
  * vocabulary, pass raw text for the case-preserving one.
  *
  * The MERGE LAW is exact and engine-replayable: a symbol sequence renders
  * as "<s1><s2>…<sn>" where each symbol is ESCAPED (`~`→`~0`, `<`→`~1`,
  * `>`→`~2`) so the angle-bracket separators can never collide with symbol
  * content; the chosen pair replaces "<a><b>" → "<ab>" (escaped forms)
  * with plain left-to-right non-overlapping string replace — exactly
  * greedy BPE, including the self-overlap case ("aaa" merging (a,a) →
  * [aa, a]) — splits back on "><" and unescapes. Escaping is per-char, so
  * esc(a)·esc(b) = esc(ab) and the law composes over merged symbols. A SQL
  * oracle replays K unrolled rounds of the identical law, so a drifted
  * tie-break, a wrong overlap rule or a miscounted pair all hash-fail.
  *
  * ITERATION MACHINERY (the CC-loop lessons): the evolving words frame is
  * localCheckpointed every round — without the cut, round k's plan would
  * compose k merge projections over the full pair-count tree and Catalyst
  * re-optimizes it all each round; with it every round's plan is
  * constant-size. The per-round driver fetch is ONE row (the arg-max
  * pair), bounded by `merges` total — the same bounded-driver-table class
  * as the Lloyd centroid fetches. */
object Bpe {

  final case class MergeRule(merge_idx: Int, pair: String, pair_count: Long)

  final case class Trained(rules: Seq[MergeRule], vocab: DataFrame)

  /** Escape a symbol for the render law: `~`→`~0`, `<`→`~1`, `>`→`~2`.
    * Injective and per-char, so separators never collide and escaping
    * distributes over concatenation. */
  private[graft] def escSym(c: Column): Column =
    replace(replace(replace(c, lit("~"), lit("~0")),
      lit("<"), lit("~1")), lit(">"), lit("~2"))

  /** Inverse of [[escSym]] — `~1`/`~2` first (restoring `~0`→`~` first
    * would fabricate `~1` sequences from escaped-tilde + digit runs). */
  private[graft] def unescSym(c: Column): Column =
    replace(replace(replace(c, lit("~2"), lit(">")),
      lit("~1"), lit("<")), lit("~0"), lit("~"))

  private[graft] def escStr(s: String): String =
    s.replace("~", "~0").replace("<", "~1").replace(">", "~2")

  /** Per-CODEPOINT symbol array — `regexp_extract_all(word, '.')`, which
    * keeps surrogate pairs whole (Java regex matches codepoints) and so
    * agrees element-for-element with a SQL engine's character indexing;
    * `split(word, "")` would shear emoji into unpaired surrogates and its
    * trailing-empty behavior is version-dependent (SPARK-40194). */
  private[graft] def codepoints(word: Column): Column =
    regexp_extract_all(word, lit("(?s)."), lit(0))

  /** Word-frequency base table with per-codepoint symbol sequences over
    * the FULL alphabet (no character gate — see object doc). */
  def wordVocab(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(TextAnalysis.tokens(col(textCol))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("freq"))
      .select(col("word"), col("freq"), codepoints(col("word")).as("syms"))

  /** One greedy merge of adjacent pair (a, b) in a symbol array — the
    * escaped render → replace → split-back → unescape law (object doc). */
  def mergeSyms(syms: Column, a: String, b: String): Column = {
    val (ea, eb) = (escStr(a), escStr(b))
    transform(
      split(
        trim(
          replace(
            concat(lit("<"),
              array_join(transform(syms, s => escSym(s)), "><"), lit(">")),
            lit(s"<$ea><$eb>"), lit(s"<$ea$eb>")),
          "<>"),
        "><"),
      s => unescSym(s))
  }

  /** Adjacent-pair candidates of a symbol array as "s1 s2" strings
    * (symbols come from whitespace-split tokens, so they never contain
    * whitespace and the separator is unambiguous). */
  private def pairCol(syms: Column): Column = {
    val n1 = greatest(size(syms) - 1, lit(0))
    zip_with(slice(syms, lit(1), n1), slice(syms, lit(2), n1),
      (x, y) => concat(x, lit(" "), y))
  }

  /** Learn `merges` BPE merge rules from the corpus and return them with
    * the final segmented vocabulary. Fails loudly if the vocabulary runs
    * out of adjacent pairs before `merges` rounds (a corpus of
    * single-char words) — a silent early stop would desynchronize any
    * fixed-K replay. */
  def train(df: DataFrame, textCol: String, merges: Int): Trained = {
    require(merges >= 1, "merges must be positive")
    val spark = df.sparkSession
    var words = wordVocab(df, textCol).transform(Checkpoints.checkpointed)
    // ADAPTIVE ITERATION WIDTH (the CC-loop lesson): the per-round frames
    // are VOCABULARY-sized — usually thousands of rows — where per-round
    // cost is task-count overhead, not compute; width rides the measured
    // vocab size (~100k rows/task), capped at the session's parallelism
    // so a web-scale vocabulary still keeps every core
    val width = math.max(1L, math.min(
      spark.sparkContext.defaultParallelism.toLong,
      words.count() / 100000L + 1)).toInt
    words = spark.createDataFrame(
      words.rdd.coalesce(width), words.schema).transform(Checkpoints.checkpointed)
    val rules = scala.collection.mutable.ArrayBuffer.empty[MergeRule]
    var i = 0
    while (i < merges) {
      val best = words
        .select(col("freq"), explode(pairCol(col("syms"))).as("pair"))
        .groupBy("pair").agg(sum("freq").as("c"))
        .orderBy(col("c").desc, col("pair"))
        .limit(1).collect()
      require(best.nonEmpty,
        s"BPE vocabulary exhausted after $i merges (no adjacent pairs " +
          s"remain) - lower `merges` below $merges")
      val pair = best.head.getString(0)
      val cnt = best.head.getLong(1)
      val Array(a, b) = pair.split(" ", 2)
      rules += MergeRule(i, pair, cnt)
      // rebase every round: constant-size plan + truncated lineage (the
      // CC-loop machinery); superseded checkpoint blocks are reclaimed by
      // the ContextCleaner once the previous frame is unreferenced
      words = words.select(col("word"), col("freq"),
        mergeSyms(col("syms"), a, b).as("syms")).transform(Checkpoints.checkpointed)
      i += 1
    }
    Trained(rules.toSeq, words)
  }

  /** Segment NEW text with already-learned rules — the apply face: the
    * FULL ordered rule list applies in ONE fused native expression per
    * word (map-only, no shuffle), so a realistic 32k-merge vocabulary is
    * one plan node instead of a 32k-deep projection chain (the measured
    * Catalyst plan-latency blowup class — see [[segmentChained]], kept as
    * the law's reference formulation for differential tests). */
  def segment(df: DataFrame, textCol: String,
      rules: Seq[MergeRule]): DataFrame = {
    val packed = rules.sortBy(_.merge_idx)
      .flatMap(r => r.pair.split(" ", 2)).toArray
    df.withColumn("__w", explode(TextAnalysis.tokens(col(textCol))))
      .withColumn("syms",
        graft.functions.GraftFunctions.bpeSegment(col("__w"), packed))
      .drop("__w")
  }

  /** The chained-projection formulation of [[segment]] — one
    * [[mergeSyms]] pass per rule. Bit-identical to the fused expression
    * by the law-equivalence argument in [[graft.codec.BpeCodec]]; K-deep
    * plans make it a differential-test reference, not a production path. */
  private[graft] def segmentChained(df: DataFrame, textCol: String,
      rules: Seq[MergeRule]): DataFrame = {
    val base = df.withColumn("__w",
      explode(TextAnalysis.tokens(col(textCol))))
      .withColumn("syms", codepoints(col("__w")))
    rules.sortBy(_.merge_idx).foldLeft(base) { (acc, r) =>
      val Array(a, b) = r.pair.split(" ", 2)
      acc.withColumn("syms", mergeSyms(col("syms"), a, b))
    }.drop("__w")
  }
}
