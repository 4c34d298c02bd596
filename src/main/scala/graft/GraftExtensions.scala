package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.expressions.DotProduct

/** Session extension registering graft's native expressions with the SQL
  * function registry, so `spark.sql("SELECT graft_dot(a, b) ...")` works:
  *
  * {{{
  * SparkSession.builder()
  *   .withExtensions(new GraftExtensions)            // programmatic
  *   // or .config("spark.sql.extensions", "graft.GraftExtensions")
  * }}}
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
      (children: Seq[Expression]) => {
        require(children.length == 2, s"graft_dot takes 2 arguments, got ${children.length}")
        DotProduct(children.head, children(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_tdigest_quantile"),
      new ExpressionInfo(classOf[graft.expressions.TDigestQuantile].getName,
        "graft_tdigest_quantile"),
      (children: Seq[Expression]) => children.length match {
        case 2 => new graft.expressions.TDigestQuantile(children.head, children(1))
        case 3 => graft.expressions.TDigestQuantile(children.head, children(1), children(2))
        case other => throw new IllegalArgumentException(
          s"graft_tdigest_quantile takes 2 or 3 arguments, got $other")
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_heavy_hitters"),
      new ExpressionInfo(classOf[graft.expressions.HeavyHitters].getName,
        "graft_heavy_hitters"),
      (children: Seq[Expression]) => {
        require(children.length == 2,
          s"graft_heavy_hitters takes 2 arguments, got ${children.length}")
        graft.expressions.HeavyHitters(children.head, children(1))
      }))
  }
}
