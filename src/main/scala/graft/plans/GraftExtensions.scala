package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Session-extension wiring: `spark.sql.extensions=graft.plans.GraftExtensions`
  * (or `withExtensions` on the builder) makes the native expressions
  * available to pure-SQL users as `farm_hash64(...)`, `fnv64a(...)`,
  * `strkey_account(...)`, `strkey_account_key(...)`,
  * `stellar_tx_hash(envelope_b64)`, `stellar_ledger_hash(header_b64)`,
  * `scval_json(...)`, `claim_predicate_json(...)`,
  * `ngram_shingles(text, n)`, `ngram_windows(text, n)`,
  * `rolling_hash64(text)`, `hyperplane_buckets(vec, bits, tables)`,
  * `long_dot(a, b)`, `long_norm2(v)`, `pq_adc_dist(codes, lut)`. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.functions.foreach { case (name, info, builder) =>
      ext.injectFunction((FunctionIdentifier(name), info, builder))
    }
  }
}

object GraftExtensions {
  import org.apache.spark.sql.catalyst.expressions.Literal

  /** Shape parameters (shingle size, plane counts) arrive from SQL as
    * literal arguments; anything non-literal can't parameterize codegen. */
  private def intArg(e: Expression, what: String): Int = e match {
    case Literal(v: Int, _) => v
    case Literal(v: Long, _) => v.toInt
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  val functions: Seq[(String, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    ("farm_hash64",
      new ExpressionInfo(classOf[FarmHash64Expression].getName, "farm_hash64"),
      (es: Seq[Expression]) => FarmHash64Expression(es.head)),
    ("fnv64a",
      new ExpressionInfo(classOf[Fnv64aExpression].getName, "fnv64a"),
      (es: Seq[Expression]) => Fnv64aExpression(es.head)),
    ("strkey_account",
      new ExpressionInfo(classOf[StrkeyAccountExpression].getName, "strkey_account"),
      (es: Seq[Expression]) => StrkeyAccountExpression(es.head)),
    ("strkey_account_key",
      new ExpressionInfo(classOf[StrkeyAccountKeyExpression].getName,
        "strkey_account_key"),
      (es: Seq[Expression]) => StrkeyAccountKeyExpression(es.head)),
    ("stellar_tx_hash",
      new ExpressionInfo(classOf[StellarTxHashExpression].getName,
        "stellar_tx_hash"),
      (es: Seq[Expression]) => StellarTxHashExpression(es.head)),
    ("stellar_ledger_hash",
      new ExpressionInfo(classOf[StellarLedgerHashExpression].getName,
        "stellar_ledger_hash"),
      (es: Seq[Expression]) => StellarLedgerHashExpression(es.head)),
    ("scval_json",
      new ExpressionInfo(classOf[ScValJsonExpression].getName, "scval_json"),
      (es: Seq[Expression]) => ScValJsonExpression(es.head)),
    ("claim_predicate_json",
      new ExpressionInfo(classOf[ClaimPredicateJsonExpression].getName,
        "claim_predicate_json"),
      (es: Seq[Expression]) => ClaimPredicateJsonExpression(es.head)),
    ("ngram_shingles",
      new ExpressionInfo(classOf[NgramShinglesExpression].getName, "ngram_shingles"),
      (es: Seq[Expression]) =>
        NgramShinglesExpression(es.head, intArg(es(1), "shingle size n"))),
    ("hyperplane_buckets",
      new ExpressionInfo(classOf[HyperplaneBucketsExpression].getName,
        "hyperplane_buckets"),
      (es: Seq[Expression]) => HyperplaneBucketsExpression(es.head,
        intArg(es(1), "bits"), intArg(es(2), "tables"))),
    ("long_dot",
      new ExpressionInfo(classOf[LongDotExpression].getName, "long_dot"),
      (es: Seq[Expression]) => LongDotExpression(es.head, es(1))),
    ("long_norm2",
      new ExpressionInfo(classOf[LongNorm2Expression].getName, "long_norm2"),
      (es: Seq[Expression]) => LongNorm2Expression(es.head)),
    ("pq_adc_dist",
      new ExpressionInfo(classOf[PqAdcDistExpression].getName, "pq_adc_dist"),
      (es: Seq[Expression]) => PqAdcDistExpression(es.head, es(1))),
    ("ngram_windows",
      new ExpressionInfo(classOf[NgramWindowsExpression].getName, "ngram_windows"),
      (es: Seq[Expression]) =>
        NgramWindowsExpression(es.head, intArg(es(1), "window size n"))),
    ("rolling_hash64",
      new ExpressionInfo(classOf[RollingHash64Expression].getName,
        "rolling_hash64"),
      (es: Seq[Expression]) => RollingHash64Expression(es.head)))

  /** Imperative registration for an existing session (same effect as the
    * extensions path, usable after session creation). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    functions.foreach { case (name, _, builder) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(name, builder, "built-in")
    }
}
