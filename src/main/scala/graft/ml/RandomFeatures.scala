package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Shared machinery for random-feature ridge models ([[AutoEncoder]],
  * `Forecast.fitNonlinear`): deterministic Gaussian weights and the
  * one-pass distributed ridge solve over hidden-feature sufficient
  * statistics.
  */
private[ml] object RandomFeatures {

  /** Deterministic Gaussian-ish weights from a seed (Box-Muller over a
    * SplittableRandom — stable across JVMs, unlike util.Random's shuffle
    * internals).
    */
  def randn(seed: Long, n: Int): Array[Double] = {
    val r = new java.util.SplittableRandom(seed)
    Array.fill(n) {
      val u1 = math.max(r.nextDouble(), 1e-12); val u2 = r.nextDouble()
      math.sqrt(-2.0 * math.log(u1)) * math.cos(2 * math.Pi * u2)
    }
  }

  /** Per-column mean / population-std in one aggregation, with a floor
    * against constant columns (std < 1e-12 → 1.0 so standardization is a
    * no-op instead of a divide-by-zero).
    */
  def standardStats(df: DataFrame, cols: Seq[String]): (Array[Double], Array[Double]) = {
    val aggCols = cols.flatMap(t => Seq(avg(col(t)).as(s"m_$t"),
      stddev_pop(col(t)).as(s"s_$t")))
    val statRow = df.agg(aggCols.head, aggCols.tail: _*).head()
    val means = cols.map(t => statRow.getAs[Double](s"m_$t")).toArray
    val stds = cols.map { t =>
      val s = statRow.getAs[Double](s"s_$t"); if (s < 1e-12) 1.0 else s
    }.toArray
    (means, stds)
  }

  /** Ridge solution B of `[z; 1] B ≈ targets` from ONE shuffle-free
    * aggregation. `hidCols` must already carry materialized `__z0 ..
    * __z{hidden-1}` columns plus the target columns. Sufficient
    * statistics are plain sums (map-side partial agg; the final exchange
    * moves one partial row per partition), so the fit cost at any scale
    * is a single scan. Returns B as (hidden+1)×targets (last row =
    * intercept, which the ridge term deliberately skips).
    */
  def ridgeBeta(hidCols: DataFrame, hidden: Int, targetCols: Seq[String],
      ridge: Double): Array[Array[Double]] = {
    def hCol(i: Int): Column = if (i < hidden) col(s"__z$i") else lit(1.0)
    val hh = for (i <- 0 to hidden; j <- i to hidden)
      yield sum(hCol(i) * hCol(j)).as(s"hh_${i}_$j")
    val hx = for (i <- 0 to hidden; j <- targetCols.indices)
      yield sum(hCol(i) * col(targetCols(j))).as(s"hx_${i}_$j")
    val allAggs = hh ++ hx
    val stats = hidCols.agg(allAggs.head, allAggs.tail: _*).head()

    val m = Array.ofDim[Double](hidden + 1, hidden + 1)
    for (i <- 0 to hidden; j <- i to hidden) {
      val v = stats.getAs[Double](s"hh_${i}_$j"); m(i)(j) = v; m(j)(i) = v
    }
    for (i <- 0 until hidden) m(i)(i) += ridge // no ridge on the intercept
    val beta = Array.ofDim[Double](hidden + 1, targetCols.length)
    for (j <- targetCols.indices) {
      val rhs = Array.tabulate(hidden + 1)(i => stats.getAs[Double](s"hx_${i}_$j"))
      // solve mutates in place — copy per output column
      val sol = Forecast.solve(m.map(_.clone()), rhs)
      for (i <- 0 to hidden) beta(i)(j) = sol(i)
    }
    beta
  }
}
