package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Expression bridge. Spark 4 made the converters `private[sql]`
  * (`org.apache.spark.sql.classic.ExpressionUtils`), so libraries adding
  * custom Catalyst expressions expose them through a small shim in an
  * `org.apache.spark.sql` subpackage — the standard extension pattern.
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Imperative registration of graft's SQL functions into an EXISTING
    * session (the extension route, `graft.GraftExtensions`, only applies
    * at session build time). Uses the session's own function registry, so
    * it composes with `newSession()` isolation.
    */
  def registerFunctions(spark: org.apache.spark.sql.SparkSession): Unit = {
    import org.apache.spark.sql.catalyst.FunctionIdentifier
    import org.apache.spark.sql.catalyst.expressions.ExpressionInfo
    spark.sessionState.functionRegistry.registerFunction(
      new FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[graft.expressions.DotProduct].getName, "graft_dot"),
      (children: Seq[Expression]) => {
        require(children.length == 2, s"graft_dot takes 2 arguments, got ${children.length}")
        graft.expressions.DotProduct(children.head, children(1))
      })
    spark.sessionState.functionRegistry.registerFunction(
      new FunctionIdentifier("graft_tdigest_quantile"),
      new ExpressionInfo(classOf[graft.expressions.TDigestQuantile].getName,
        "graft_tdigest_quantile"),
      (children: Seq[Expression]) => children.length match {
        case 2 => new graft.expressions.TDigestQuantile(children.head, children(1))
        case 3 => graft.expressions.TDigestQuantile(children.head, children(1), children(2))
        case other => throw new IllegalArgumentException(
          s"graft_tdigest_quantile takes 2 or 3 arguments, got $other")
      })
    spark.sessionState.functionRegistry.registerFunction(
      new FunctionIdentifier("graft_heavy_hitters"),
      new ExpressionInfo(classOf[graft.expressions.HeavyHitters].getName,
        "graft_heavy_hitters"),
      (children: Seq[Expression]) => {
        require(children.length == 2,
          s"graft_heavy_hitters takes 2 arguments, got ${children.length}")
        graft.expressions.HeavyHitters(children.head, children(1))
      })
  }
}
