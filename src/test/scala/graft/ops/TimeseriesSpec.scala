package graft.ops

import java.sql.Timestamp

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TimeseriesSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private lazy val long = Seq(
    // (ts, tag, value) — two tags, 10-minute buckets 00:00 / 00:10
    (ts("2024-01-01 00:01:00"), "a", 1.0),
    (ts("2024-01-01 00:04:00"), "a", 3.0),
    (ts("2024-01-01 00:02:00"), "b", 10.0),
    (ts("2024-01-01 00:11:00"), "a", 5.0),
    (ts("2024-01-01 00:12:00"), "b", 20.0),
    (ts("2024-01-01 00:21:00"), "b", 30.0) // bucket 00:20 has no 'a'
  ).toDF("ts", "tag", "value")

  test("bucket truncates to left-closed, left-labeled tumbling windows") {
    val out = long
      .select(Timeseries.bucket(col("ts"), "10 minutes").as("b"))
      .distinct()
      .orderBy("b")
      .as[Timestamp]
      .collect()
    assert(out.toSeq == Seq(
      ts("2024-01-01 00:00:00"), ts("2024-01-01 00:10:00"), ts("2024-01-01 00:20:00")))
  }

  test("align pivots to the wide matrix with inner-join (dropIncomplete) semantics") {
    val wide = Timeseries
      .align(long, "ts", "tag", "value", Seq("a", "b"), "10 minutes")
      .orderBy("bucket")
      .collect()
    assert(wide.length == 2) // 00:20 dropped: no 'a'
    assert(wide(0).getAs[Double]("a") == 2.0) // mean(1,3)
    assert(wide(0).getAs[Double]("b") == 10.0)
    assert(wide(1).getAs[Double]("a") == 5.0)
    assert(wide(1).getAs[Double]("b") == 20.0)
  }

  test("align keeps incomplete buckets when dropIncomplete=false") {
    val wide = Timeseries
      .align(long, "ts", "tag", "value", Seq("a", "b"), "10 minutes", dropIncomplete = false)
      .orderBy("bucket")
      .collect()
    assert(wide.length == 3)
    assert(wide(2).isNullAt(wide(2).fieldIndex("a")))
    assert(wide(2).getAs[Double]("b") == 30.0)
  }

  test("align ignores tags outside the explicit tag list") {
    val extra = long.union(Seq((ts("2024-01-01 00:01:00"), "zzz", 99.0)).toDF)
    val wide = Timeseries.align(extra, "ts", "tag", "value", Seq("a", "b"), "10 minutes")
    assert(wide.columns.toSeq == Seq("bucket", "a", "b"))
    assert(wide.count() == 2)
  }

  test("align executes in exactly one shuffle (plan invariant)") {
    val wide = Timeseries.align(long, "ts", "tag", "value", Seq("a", "b"), "10 minutes")
    // AQE wraps the physical plan, so count Exchange nodes in the formatted
    // explain rather than collecting over the (adaptive) executedPlan.
    val formatted = wide.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    val exchanges = "(?m)^\\(\\d+\\) Exchange".r.findAllIn(formatted).size
    assert(exchanges == 1, s"expected 1 Exchange, plan:\n$formatted")
  }

  test("resample computes multiple aggregation methods in one pass") {
    val out = Timeseries
      .resample(long, "ts", "value", "10 minutes", Seq("tag"),
        Map("avg" -> avg, "max" -> max, "min" -> min))
      .filter(col("tag") === "a" && col("bucket") === ts("2024-01-01 00:00:00"))
      .collect()
    assert(out.length == 1)
    assert(out(0).getAs[Double]("avg_value") == 2.0)
    assert(out(0).getAs[Double]("max_value") == 3.0)
    assert(out(0).getAs[Double]("min_value") == 1.0)
  }

  test("interpolate fills interior gaps linearly, leaves edges null") {
    val df = Seq(
      ("2024-01-01 00:00:00", Option.empty[Double]),
      ("2024-01-01 00:10:00", Some(10.0)),
      ("2024-01-01 00:20:00", Option.empty[Double]),
      ("2024-01-01 00:40:00", Some(40.0)),
      ("2024-01-01 00:50:00", Option.empty[Double])
    ).toDF("s", "v").withColumn("t", to_timestamp(col("s"))).drop("s")
    val out = Timeseries.interpolate(df, Seq("v"), Seq.empty, "t")
      .orderBy("t").select("v").as[Option[Double]].collect()
    assert(out(0).isEmpty) // leading
    assert(out(1).contains(10.0))
    assert(out(2).contains(20.0)) // 10 + (40-10)*(10/30)
    assert(out(3).contains(40.0))
    assert(out(4).isEmpty) // trailing
  }

  test("ffill forward-fills gaps without touching leading nulls") {
    val df = Seq(
      (1L, Option.empty[Double]),
      (2L, Some(1.0)),
      (3L, Option.empty[Double]),
      (4L, Option.empty[Double]),
      (5L, Some(2.0))
    ).toDF("k", "v")
    val out = Timeseries.ffill(df, Seq("v"), Seq.empty, "k")
      .orderBy("k").select("v").as[Option[Double]].collect()
    assert(out.toSeq == Seq(None, Some(1.0), Some(1.0), Some(1.0), Some(2.0)))
  }

  test("melt is the exact inverse of align (wide -> long round trip)") {
    val wide = Seq((1L, 10.0, 100.0), (2L, 20.0, 200.0))
      .toDF("bucket", "click", "view")
    val long = Timeseries.melt(wide, Seq("bucket"), Seq("click", "view"))
    assert(long.columns.toSeq == Seq("bucket", "tag", "value"))
    val rows = long.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
    assert(rows == Set((1L, "click", 10.0), (1L, "view", 100.0),
      (2L, "click", 20.0), (2L, "view", 200.0)))
    // nulls melt to null-valued rows (kept — dropna is the caller's call)
    val withNull = Seq((1L, Option.empty[Double], Some(5.0)))
      .toDF("bucket", "click", "view")
    assert(Timeseries.melt(withNull, Seq("bucket"), Seq("click", "view"))
      .count() == 2)
    // and the plan stays narrow: a generator projection, no Exchange
    val plan = long.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"melt must not shuffle:\n$plan")
    // tag-derived wide columns routinely contain dots — they must melt as
    // literal names, not parse as struct-field paths
    val dotted = Seq((1L, 2.0, 3.0)).toDF("bucket", "1000.temp", "1000.press")
    val dottedRows = Timeseries.melt(dotted, Seq("bucket"),
        Seq("1000.temp", "1000.press"))
      .collect().map(r => (r.getString(1), r.getDouble(2))).toSet
    assert(dottedRows == Set(("1000.temp", 2.0), ("1000.press", 3.0)))
    // embedded backticks: quoting must double them, not truncate the name
    val ticked = Seq((1L, 5.0)).toDF("bucket", "t`1")
    val tickedRows = Timeseries.melt(ticked, Seq("bucket"), Seq("t`1"))
      .collect().map(r => (r.getString(1), r.getDouble(2))).toSet
    assert(tickedRows == Set(("t`1", 5.0)))
  }

  test("seasonalDecompose splits trend + seasonal + resid additively and " +
      "recovers a constructed signal") {
    // signal = linear trend (0.5/step) + period-4 cycle; 80 buckets
    val cycle = Array(8.0, 0.0, -8.0, 0.0)
    val rows = (0 until 80).map(t =>
      ("k", t.toLong, 100.0 + 0.5 * t + cycle(t % 4)))
    val df = rows.toDF("key", "bucket", "v")
    val out = Timeseries.seasonalDecompose(df, Seq("key"), "bucket", "v",
        periodCol = col("bucket") % 4, halfWindow = 4)
      .orderBy("bucket").collect()
    // identity: v == trend + seasonal + resid for every row, exactly
    out.foreach { r =>
      val (v, tr, se, re) =
        (r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))
      assert(math.abs(v - (tr + se + re)) < 1e-9)
    }
    // away from the edges the 9-row centered MA (halfWindow=4) over a
    // period-4 cycle plus a line tracks the line: trend ≈ 100 + 0.5t
    // (cycle mean over 9 rows is not exactly 0, so allow the slack the
    // extra cycle sample contributes: 8/9)
    out.drop(4).dropRight(4).foreach { r =>
      val t = r.getLong(1)
      assert(math.abs(r.getDouble(3) - (100.0 + 0.5 * t)) <= 8.0 / 9 + 1e-9,
        s"trend at $t: ${r.getDouble(3)}")
    }
    // seasonal contrast: position-0 mean minus position-2 mean ≈ 16
    val sByPos = out.drop(4).dropRight(4)
      .groupBy(r => (r.getLong(1) % 4).toInt)
      .view.mapValues(rs => rs.map(_.getDouble(4)).sum / rs.size).toMap
    assert(math.abs((sByPos(0) - sByPos(2)) - 16.0) < 2.0, s"$sByPos")
  }
}
