package graft.ml

import graft.SparkSpec
import org.apache.spark.sql.functions._

class HoltWintersSpec extends SparkSpec {
  import spark.implicits._

  private val p = HoltWinters.HwParams(alpha = 0.3, beta = 0.05,
    gamma = 0.2, period = 4)

  test("constant series forecasts the constant with zero trend/seasonal") {
    val y = Array.fill(40)(7.5)
    val (level, trend, s, resid) = HoltWinters.smooth(y, p)
    assert(math.abs(level - 7.5) < 1e-9)
    assert(math.abs(trend) < 1e-9)
    assert(s.forall(v => math.abs(v) < 1e-9))
    assert(resid.forall(v => math.abs(v) < 1e-9))
  }

  test("pure linear trend is tracked: forecast continues the line") {
    // y_t = 2t: level/trend converge to the true slope; after 200 points
    // the one-step residuals vanish and ŷ_{n+k} extends the line.
    val y = Array.tabulate(200)(t => 2.0 * t)
    val (level, trend, s, resid) = HoltWinters.smooth(y, p)
    assert(math.abs(trend - 2.0) < 1e-3, s"trend $trend")
    assert(math.abs(level - 2.0 * 199) < 1e-2, s"level $level")
    assert(math.abs(resid.last) < 1e-3)
    assert(s.forall(v => math.abs(v) < 1e-2))
  }

  test("pure seasonal pattern is learned: forecast repeats the cycle") {
    val cycle = Array(10.0, -5.0, 0.0, -5.0)
    val y = Array.tabulate(400)(t => 20.0 + cycle(t % 4))
    val (level, trend, s, resid) = HoltWinters.smooth(y, p)
    assert(math.abs(level - 20.0) < 1e-6)
    assert(math.abs(trend) < 1e-6)
    for (i <- 0 until 4)
      assert(math.abs(s(i) - cycle(i)) < 1e-6, s"seasonal $i: ${s(i)}")
    assert(math.abs(resid.last) < 1e-6)
  }

  test("forecast() is per-key parallel and matches the scalar smoother") {
    val cycle = Array(4.0, 0.0, -4.0, 0.0)
    val rows = (0 until 100).flatMap { t =>
      Seq(("a", t, 20.0 + cycle(t % 4)), ("b", t, 50.0 + 0.5 * t))
    }
    val df = rows.toDF("k", "bucket", "v")
    val out = HoltWinters.forecast(df, "k", "bucket", "v", horizon = 4, p)
      .collect().map(r => (r.getString(0), r.getInt(1)) -> r.getDouble(2)).toMap
    // key a: constant + seasonal → forecast repeats the cycle at 20
    val (la, ta, sa, _) = HoltWinters.smooth(
      Array.tabulate(100)(t => 20.0 + cycle(t % 4)), p)
    for (k <- 1 to 4)
      assert(math.abs(out(("a", k)) - (la + k * ta + sa((100 + k - 1) % 4))) < 1e-12)
    // step 1 lands on cycle position 100 % 4 == 0 → 20 + cycle(0) = 24
    assert(math.abs(out(("a", 1)) - 24.0) < 0.1)
    // key b: linear trend → step increments ≈ slope (the seeded seasonal
    // ring decays toward 0 but retains a small residue after 100 points)
    assert(math.abs((out(("b", 2)) - out(("b", 1))) - 0.5) < 0.05)
  }

  test("forecast is deterministic under repartition (sort_array ordering)") {
    val rows = (0 until 64).map(t => ("x", t, math.sin(t / 3.0) * 10 + t * 0.2))
    val df = rows.toDF("k", "bucket", "v")
    val a = HoltWinters.forecast(df, "k", "bucket", "v", 8, p).collect()
    val b = HoltWinters.forecast(df.repartition(7), "k", "bucket", "v", 8, p)
      .collect()
    assert(a.sortBy(_.getInt(1)).map(_.getDouble(2)).toSeq ==
      b.sortBy(_.getInt(1)).map(_.getDouble(2)).toSeq)
  }

  test("too-short series (< 2 seasons) is an explicit error") {
    intercept[IllegalArgumentException] {
      HoltWinters.smooth(Array.fill(7)(1.0), p)
    }
  }

  test("forecast() SKIPS under-length keys instead of failing the fleet") {
    val rows = (0 until 40).map(t => ("long", t, 5.0)) ++
      (0 until 5).map(t => ("short", t, 9.0)) // < 2*4 points
    val out = HoltWinters.forecast(rows.toDF("k", "bucket", "v"),
        "k", "bucket", "v", horizon = 2, p)
      .collect().map(_.getString(0)).toSet
    assert(out == Set("long"), s"$out") // healthy key forecast survives
  }
}
