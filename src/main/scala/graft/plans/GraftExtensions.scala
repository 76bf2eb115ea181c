package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Session-extension wiring: `spark.sql.extensions=graft.plans.GraftExtensions`
  * (or `withExtensions` on the builder) makes the native codec expressions
  * available to pure-SQL users as `farm_hash64(...)`, `fnv64a(...)`,
  * `strkey_account(...)`. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.functions.foreach { case (name, info, builder) =>
      ext.injectFunction((FunctionIdentifier(name), info, builder))
    }
  }
}

object GraftExtensions {
  val functions: Seq[(String, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    ("farm_hash64",
      new ExpressionInfo(classOf[FarmHash64Expression].getName, "farm_hash64"),
      (es: Seq[Expression]) => FarmHash64Expression(es.head)),
    ("fnv64a",
      new ExpressionInfo(classOf[Fnv64aExpression].getName, "fnv64a"),
      (es: Seq[Expression]) => Fnv64aExpression(es.head)),
    ("strkey_account",
      new ExpressionInfo(classOf[StrkeyAccountExpression].getName, "strkey_account"),
      (es: Seq[Expression]) => StrkeyAccountExpression(es.head)))

  /** Imperative registration for an existing session (same effect as the
    * extensions path, usable after session creation). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    functions.foreach { case (name, _, builder) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(name, builder, "built-in")
    }
}
