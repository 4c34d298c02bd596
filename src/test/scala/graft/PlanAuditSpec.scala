package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.FormattedMode

/** §4 physical-plan invariants: pushdown, pruning, broadcast. */
class PlanAuditSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def planOf(name: String): String =
    SparkEntry.queries(name)(spark, dir).queryExecution.explainString(FormattedMode)

  test("proj_tags prunes the parquet read schema to the selected columns") {
    val plan = planOf("proj_tags")
    val read = plan.linesIterator.find(_.contains("ReadSchema")).get
    assert(read.contains("l_orderkey") && read.contains("l_quantity"))
    assert(!read.contains("l_returnflag") && !read.contains("l_shipdate"), read)
  }

  test("filter_rowexpr predicates reach PushedFilters") {
    val plan = planOf("filter_rowexpr")
    val pushed = plan.linesIterator.find(_.contains("PushedFilters")).get
    assert(pushed.contains("l_quantity") && pushed.contains("l_discount"), pushed)
  }

  test("filter_timerange pushes the time bounds to the events scan") {
    val plan = planOf("filter_timerange")
    val pushed = plan.linesIterator.filter(_.contains("PushedFilters")).mkString("\n")
    assert(pushed.contains("GreaterThanOrEqual(ts") || pushed.contains("ts,"),
      s"time range not pushed:\n$plan")
  }

  test("join_dim_broadcast and join_multiway broadcast their dimension sides") {
    assert(planOf("join_dim_broadcast").contains("BroadcastHashJoin"))
    val multi = planOf("join_multiway")
    assert(multi.contains("BroadcastHashJoin"))
  }
}
