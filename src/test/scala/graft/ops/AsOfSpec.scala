package graft.ops

import java.sql.Timestamp

import graft.SparkSpec
import org.apache.spark.sql.functions._

class AsOfSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private lazy val left = Seq(
    (1L, 10L, ts("2024-01-01 00:05:00")),
    (2L, 10L, ts("2024-01-01 00:10:00")), // exactly simultaneous right row
    (3L, 10L, ts("2024-01-01 00:30:00")),
    (4L, 20L, ts("2024-01-01 00:01:00")) // key with no preceding right row
  ).toDF("id", "k", "ts")

  private lazy val right = Seq(
    (10L, ts("2024-01-01 00:00:00"), 1.0),
    (10L, ts("2024-01-01 00:10:00"), 2.0),
    (10L, ts("2024-01-01 00:20:00"), 3.0),
    (20L, ts("2024-01-01 00:05:00"), 9.0)
  ).toDF("k", "ts", "state")

  test("asof join picks the latest right row at-or-before each left ts, per key") {
    val out = AsOf.join(left, right, "ts", Seq("k"), Seq("state"))
      .orderBy("id").collect()
    assert(out.map(_.getAs[Long]("id")).toSeq == Seq(1L, 2L, 3L)) // id 4 dropped (inner)
    assert(out.map(_.getAs[Double]("asof_state")).toSeq == Seq(1.0, 2.0, 3.0))
  }

  test("forward direction picks the earliest right row at-or-after each left ts") {
    // id 1 (00:05) -> next right 00:10 (2.0); id 2 (00:10) -> the
    // simultaneous 00:10 row (>= semantics); id 3 (00:30) -> nothing
    // follows, dropped under inner; id 4 (00:01, k=20) -> 00:05 (9.0)
    val out = AsOf.join(left, right, "ts", Seq("k"), Seq("state"),
      direction = "forward").orderBy("id").collect()
    assert(out.map(_.getAs[Long]("id")).toSeq == Seq(1L, 2L, 4L))
    assert(out.map(_.getAs[Double]("asof_state")).toSeq == Seq(2.0, 2.0, 9.0))
    // forward tolerance: a match further AHEAD than the interval is stale
    val tol = AsOf.join(left, right, "ts", Seq("k"), Seq("state"),
      direction = "forward", tolerance = Some("4 MINUTES")).orderBy("id").collect()
    assert(tol.map(_.getAs[Long]("id")).toSeq == Seq(2L, 4L)) // id 1's +5min match is too far
  }

  test("nearest direction picks the closer side; distance ties go backward") {
    // id 1 (00:05): backward 00:00 vs forward 00:10, both 5 min -> tie ->
    // backward (1.0). id 2 (00:10): equal-ts row, distance 0 -> 2.0.
    // id 3 (00:30): only backward exists -> 3.0. id 4 (00:01, k=20):
    // only forward exists -> 9.0 (kept — nearest matches either side).
    val out = AsOf.join(left, right, "ts", Seq("k"), Seq("state"),
      direction = "nearest").orderBy("id").collect()
    assert(out.map(_.getAs[Long]("id")).toSeq == Seq(1L, 2L, 3L, 4L))
    assert(out.map(_.getAs[Double]("asof_state")).toSeq == Seq(1.0, 2.0, 3.0, 9.0))
    // tolerance bands the ABSOLUTE distance: 4 minutes keeps only the
    // distance-0 match (id 2) and id 4's 4-minute forward match
    val tol = AsOf.join(left, right, "ts", Seq("k"), Seq("state"),
      direction = "nearest", tolerance = Some("4 MINUTES")).orderBy("id").collect()
    assert(tol.map(_.getAs[Long]("id")).toSeq == Seq(2L, 4L))
  }

  test("outer form keeps unmatched left rows with null state") {
    val out = AsOf.join(left, right, "ts", Seq("k"), Seq("state"), inner = false)
      .orderBy("id").collect()
    assert(out.length == 4)
    assert(out(3).isNullAt(out(3).fieldIndex("asof_state")))
  }

  test("tolerance rejects matches older than the interval (merge_asof parity)") {
    // id 3 at 00:30 would match the 00:20 right row; 5-minute tolerance
    // makes that match stale. ids 1 and 2 match within 5 minutes.
    val out = AsOf.join(left, right, "ts", Seq("k"), Seq("state"),
      tolerance = Some("5 MINUTES")).orderBy("id").collect()
    assert(out.map(_.getAs[Long]("id")).toSeq == Seq(1L, 2L))
    val outer = AsOf.join(left, right, "ts", Seq("k"), Seq("state"),
      inner = false, tolerance = Some("5 MINUTES")).orderBy("id").collect()
    assert(outer.length == 4)
    assert(outer(2).isNullAt(outer(2).fieldIndex("asof_state"))) // stale -> null
  }

  test("row-level semantics: a newer null-valued right row REPLACES an older match") {
    // merge_asof / DuckDB ASOF JOIN parity: the latest right ROW wins;
    // its null value rides through instead of an older non-null value
    // being carried (which would be ffill, not an as-of join)
    val l2 = Seq((1L, 10L, ts("2024-01-01 00:10:00"))).toDF("id", "k", "ts")
    val r2 = Seq(
      (10L, ts("2024-01-01 00:00:00"), Some(1.0)),
      (10L, ts("2024-01-01 00:09:00"), Option.empty[Double])).toDF("k", "ts", "state")
    val loose = AsOf.join(l2, r2, "ts", Seq("k"), Seq("state"), inner = false).collect()
    assert(loose.length == 1 && loose.head.isNullAt(loose.head.fieldIndex("asof_state")))
    // a matched row with a null VALUE is still a match — inner keeps it
    val inner = AsOf.join(l2, r2, "ts", Seq("k"), Seq("state")).collect()
    assert(inner.length == 1 && inner.head.isNullAt(inner.head.fieldIndex("asof_state")))
    // and tolerance gates on that matched ROW's timestamp (00:09 — fresh)
    val tol = AsOf.join(l2, r2, "ts", Seq("k"), Seq("state"),
      tolerance = Some("5 MINUTES")).collect()
    assert(tol.length == 1 && tol.head.isNullAt(tol.head.fieldIndex("asof_state")))
  }

  test("all value columns come from the SAME matched row, nulls included") {
    val l2 = Seq((1L, 10L, ts("2024-01-01 00:10:00"))).toDF("id", "k", "ts")
    val r2 = Seq(
      (10L, ts("2024-01-01 00:00:00"), Some(1.0), Some(50.0)),
      (10L, ts("2024-01-01 00:09:00"), Some(2.0), Option.empty[Double]))
      .toDF("k", "ts", "state", "temp")
    val out = AsOf.join(l2, r2, "ts", Seq("k"), Seq("state", "temp"),
      inner = false, tolerance = Some("5 MINUTES")).collect().head
    assert(out.getAs[Double]("asof_state") == 2.0)   // from the 00:09 row
    assert(out.isNullAt(out.fieldIndex("asof_temp"))) // 00:09's temp IS null
  }

  test("asof join is a single shuffle (plan invariant)") {
    val out = AsOf.join(left, right, "ts", Seq("k"), Seq("state"))
    val plan = out.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    val exchanges = "(?m)^\\(\\d+\\) Exchange".r.findAllIn(plan).size
    assert(exchanges == 1, s"expected 1 Exchange:\n$plan")
    assert(!plan.contains("NestedLoop"), "must not fall back to a nested-loop range join")
  }
}
