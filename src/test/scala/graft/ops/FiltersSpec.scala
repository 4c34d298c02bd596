package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class FiltersSpec extends SparkSpec {
  import spark.implicits._

  test("translatePandasExpr maps pandas boolean operators to SQL") {
    val sql = Filters.translatePandasExpr("`a` > 0 & `b` < 1 | ~(`c` == 2)")
    assert(sql.contains(" AND "))
    assert(sql.contains(" OR "))
    assert(sql.contains(" NOT "))
    assert(!sql.contains("&") && !sql.contains("|") && !sql.contains("~"))
  }

  test("translatePandasExpr leaves operators inside string literals intact") {
    val sql = Filters.translatePandasExpr("`name` == 'a&b|c~d' & `v` > 1")
    assert(sql.contains("'a&b|c~d'"), sql)
    assert(sql.contains(" AND "), sql)
    // && / || collapse to a single AND / OR
    assert(Filters.translatePandasExpr("`a` > 0 && `b` < 1 || `c` == 2")
      == "`a` > 0  AND  `b` < 1  OR  `c` == 2")
    // end-to-end: the literal survives and matches
    val df = Seq(("a&b|c~d", 2.0), ("x", 5.0)).toDF("name", "v")
    val out = Filters.rowFilter(df, "`name` == 'a&b|c~d' & `v` > 1")
    assert(out.count() == 1)
  }

  test("rowFilter applies a pandas-style expression") {
    val df = Seq((1, 10.0), (2, 20.0), (3, 30.0)).toDF("k", "v")
    val out = Filters.rowFilter(df, "`v` > 10 & `k` < 3").select("k").as[Int].collect()
    assert(out.toSeq == Seq(2))
  }

  test("imputeInf replaces +inf/-inf with max/min finite per column") {
    val df = Seq(1.0, Double.PositiveInfinity, 5.0, Double.NegativeInfinity, 3.0).toDF("v")
    val out = Filters.imputeInf(df, Seq("v")).select("v").as[Double].collect().sorted
    assert(out.toSeq == Seq(1.0, 1.0, 3.0, 5.0, 5.0))
  }

  test("imputeInf broadcasts bounds — no window over the whole table") {
    val df = Seq(1.0, Double.PositiveInfinity).toDF("v")
    val plan = Filters.imputeInf(df, Seq("v")).queryExecution.executedPlan
    val windows = plan.collect { case w: org.apache.spark.sql.execution.window.WindowExec => w }
    assert(windows.isEmpty)
  }

  test("excludePeriods drops configured ranges") {
    val df = Seq(
      (java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), 1),
      (java.sql.Timestamp.valueOf("2024-01-05 00:00:00"), 2),
      (java.sql.Timestamp.valueOf("2024-01-09 00:00:00"), 3)
    ).toDF("ts", "k")
    val out = Filters
      .excludePeriods(df, "ts", Seq(("2024-01-04", "2024-01-06")))
      .select("k").as[Int].collect().sorted
    assert(out.toSeq == Seq(1, 3))
  }

  test("timeRange is inclusive of from, exclusive of to") {
    val df = Seq(
      (java.sql.Timestamp.valueOf("2024-01-04 00:00:00"), 1),
      (java.sql.Timestamp.valueOf("2024-01-05 00:00:00"), 2),
      (java.sql.Timestamp.valueOf("2024-01-06 00:00:00"), 3)
    ).toDF("ts", "k")
    val out = Filters.timeRange(df, "ts", "2024-01-04", "2024-01-06")
      .select("k").as[Int].collect().sorted
    assert(out.toSeq == Seq(1, 2))
  }
}
