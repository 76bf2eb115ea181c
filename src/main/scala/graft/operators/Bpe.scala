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
  * The MERGE LAW is exact and engine-replayable: a symbol sequence renders
  * as "<s1><s2>…<sn>" (symbols are gated to `^[a-z0-9]+$`, so the angle
  * brackets cannot collide), the chosen pair replaces
  * "<a><b>" → "<ab>" with plain left-to-right non-overlapping string
  * replace — exactly greedy BPE, including the self-overlap case
  * ("aaa" merging (a,a) → [aa, a]) — and splits back on "><". A SQL
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

  /** Word-frequency base table with per-char symbol sequences. The
    * alphabet gate (`^[a-z0-9]+$`) is part of the law: it guarantees the
    * render separators can never appear inside a symbol. */
  def wordVocab(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(TextAnalysis.tokens(lower(col(textCol)))).as("word"))
      .where(col("word").rlike("^[a-z0-9]+$"))
      .groupBy("word").agg(count(lit(1)).as("freq"))
      .select(col("word"), col("freq"), split(col("word"), "").as("syms"))

  /** One greedy merge of adjacent pair (a, b) in a symbol array — the
    * render → replace → split-back law (see object doc). */
  def mergeSyms(syms: Column, a: String, b: String): Column =
    split(
      trim(
        replace(
          concat(lit("<"), array_join(syms, "><"), lit(">")),
          lit(s"<$a><$b>"), lit(s"<$a$b>")),
        "<>"),
      "><")

  /** Adjacent-pair candidates of a symbol array as "s1 s2" strings
    * (symbols never contain spaces, so the separator is unambiguous). */
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
    var words = wordVocab(df, textCol).localCheckpoint(true)
    // ADAPTIVE ITERATION WIDTH (the CC-loop lesson): the per-round frames
    // are VOCABULARY-sized — usually thousands of rows — where per-round
    // cost is task-count overhead, not compute; width rides the measured
    // vocab size (~100k rows/task), capped at the session's parallelism
    // so a web-scale vocabulary still keeps every core
    val width = math.max(1L, math.min(
      spark.sparkContext.defaultParallelism.toLong,
      words.count() / 100000L + 1)).toInt
    words = spark.createDataFrame(
      words.rdd.coalesce(width), words.schema).localCheckpoint(true)
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
        mergeSyms(col("syms"), a, b).as("syms")).localCheckpoint(true)
      i += 1
    }
    Trained(rules.toSeq, words)
  }

  /** Segment NEW text with already-learned rules — the apply face: each
    * rule is one map-only merge pass in rank order, so tokenizing a
    * corpus is `merges` chained projections with no shuffle at all. */
  def segment(df: DataFrame, textCol: String,
      rules: Seq[MergeRule]): DataFrame = {
    val base = df.withColumn("__w",
      explode(TextAnalysis.tokens(lower(col(textCol)))))
      .where(col("__w").rlike("^[a-z0-9]+$"))
      .withColumn("syms", split(col("__w"), ""))
    rules.sortBy(_.merge_idx).foldLeft(base) { (acc, r) =>
      val Array(a, b) = r.pair.split(" ", 2)
      acc.withColumn("syms", mergeSyms(col("syms"), a, b))
    }.drop("__w")
  }
}
