package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Univariate Gaussian-mixture fit by expectation-maximization
  * (Dempster, Laird & Rubin 1977) per stream key — the model-based
  * generalization of the per-tag scaler fits: where agg_scaler_fit
  * assumes one Gaussian, the mixture separates regimes (idle vs load,
  * weekday vs burst) and scores each point by mixture likelihood.
  *
  * Distribution is the sufficient-statistics shape every EM on Spark
  * should take (and the one MLlib's GaussianMixture takes): the E-step
  * is pure column math — k responsibility expressions per row, no
  * explode, no per-row UDF — and the M-step is ONE map-side-combined
  * groupBy(key) producing k·3 aggregates (Σr, Σr·x, Σr·x²); the driver
  * updates the k·3 parameters per key and broadcasts them back into
  * the next iteration's literals. Per iteration: one job, one shuffle
  * of (keys × k · 3) doubles — model-sized regardless of corpus size.
  * Iterations are bounded (`iters`), init is quantile-based and
  * deterministic (no RNG), and EM's monotone-likelihood guarantee is
  * spec-checked, so same input → bit-identical fit.
  */
object GmmEm {

  /** Fitted per-key mixture: key → (weight, mean, std) per component. */
  final case class Fit(params: Map[String, Array[(Double, Double, Double)]],
      logLik: Array[Double])

  private val Floor = 1e-6 // variance floor — degenerate-component guard

  /** Fit a k-component univariate GMM per value of `keyCol`. Returns the
    * fit plus the per-iteration total log-likelihood (monotone up to the
    * variance floor — the EM contract the spec pins).
    */
  def fit(df: DataFrame, keyCol: String, valCol: String, k: Int,
      iters: Int): Fit = {
    require(k >= 1 && iters >= 1)
    val data = df.select(col(keyCol).cast("string").as("k"),
        col(valCol).cast("double").as("x"))
      .filter(col("x").isNotNull && !isnan(col("x")))
    data.cache()

    // deterministic quantile init: means at the (2j+1)/(2k) percentiles,
    // shared std, uniform weights. The init std comes from DECIMAL-exact
    // moment sums, NOT stddev_pop — the float merge-order jitter of a
    // Welford merge would break bit-reproducibility across partitionings
    val pcts = (0 until k).map(j => (2.0 * j + 1) / (2 * k))
    val initRows = data.groupBy("k").agg(
      percentile(col("x"), typedLit(pcts)).as("mus"),
      sum(col("x").cast("decimal(28,12)")).cast("double").as("sx"),
      sum((col("x") * col("x")).cast("decimal(28,12)")).cast("double").as("sxx"),
      count(lit(1)).as("n")).collect()
    var params: Map[String, Array[(Double, Double, Double)]] =
      initRows.map { r =>
        val mus = r.getSeq[Double](1)
        val n = r.getLong(4).toDouble
        val mu = r.getDouble(2) / n
        val sd = math.max(math.sqrt(math.max(r.getDouble(3) / n - mu * mu,
          Floor)), Floor)
        r.getString(0) -> Array.tabulate(k)(j => (1.0 / k, mus(j), sd))
      }.toMap

    val logLik = new Array[Double](iters)
    var it = 0
    while (it < iters) {
      // E-step as column expressions: per-key parameters enter the plan
      // as a broadcast-joined literal table (keys × k·3 values)
      val spark = df.sparkSession
      import spark.implicits._
      val pTable = params.toSeq.flatMap { case (key, comps) =>
        comps.zipWithIndex.map { case ((w, mu, sd), j) => (key, j, w, mu, sd) }
      }.toDF("k", "j", "w", "mu", "sd")
        .groupBy("k")
        .pivot("j", (0 until k).map(_.toString))
        .agg(first(struct("w", "mu", "sd")))
      val joined = data.join(broadcast(pTable), "k")
      def dens(j: Int): Column = {
        val p = col(j.toString)
        val z = (col("x") - p.getField("mu")) / p.getField("sd")
        p.getField("w") * exp(lit(-0.5) * z * z) /
          (p.getField("sd") * math.sqrt(2 * math.Pi))
      }
      // floor the mixture density: for an extreme outlier (|z| ≳ 38 in
      // every component) all densities underflow to 0 and 0/0 = NaN,
      // which the decimal cast would silently null — the row would drop
      // out of the M-step sums and quietly bias the fit. Floored, the
      // row contributes zero responsibility and a finite log-likelihood.
      val total = greatest(
        (0 until k).map(dens).reduce(_ + _), lit(Double.MinPositiveValue))
      val resp = (0 until k).map(j => (dens(j) / total).as(s"r$j"))
      val scored = joined.select(
        col("k") +: col("x") +: log(total).as("ll") +: resp: _*)
      // DECIMAL(28,12) sums: exact, hence merge-order independent — the
      // dsum discipline, so the fit is bit-identical under any
      // partitioning (double sums would carry combine-order jitter)
      def xsum(c: Column): Column = sum(c.cast("decimal(28,12)")).cast("double")
      val aggs = (0 until k).flatMap { j =>
        Seq(xsum(col(s"r$j")).as(s"n$j"),
          xsum(col(s"r$j") * col("x")).as(s"sx$j"),
          xsum(col(s"r$j") * col("x") * col("x")).as(s"sxx$j"))
      } :+ xsum(col("ll")).as("ll") :+ count(lit(1)).as("n")
      val stats = scored.groupBy("k").agg(aggs.head, aggs.tail: _*).collect()
      logLik(it) = stats.map(_.getAs[Double]("ll")).sum
      params = stats.map { r =>
        val n = r.getAs[Long]("n").toDouble
        r.getAs[String]("k") -> Array.tabulate(k) { j =>
          val nj = math.max(r.getAs[Double](s"n$j"), Floor)
          val mu = r.getAs[Double](s"sx$j") / nj
          val v = math.max(r.getAs[Double](s"sxx$j") / nj - mu * mu, Floor)
          (nj / n, mu, math.sqrt(v))
        }
      }.toMap
      it += 1
    }
    data.unpersist(blocking = false)
    Fit(params, logLik)
  }

  /** Render a fit as a DataFrame: key, component, weight, mu, sigma
    * (round 6), components ordered by mean within key.
    */
  def toDF(df: DataFrame, fit: Fit): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    fit.params.toSeq.flatMap { case (key, comps) =>
      comps.sortBy(_._2).zipWithIndex.map { case ((w, mu, sd), j) =>
        (key, j, math.rint(w * 1e6) / 1e6, math.rint(mu * 1e6) / 1e6,
          math.rint(sd * 1e6) / 1e6)
      }
    }.toDF("k", "component", "weight", "mu", "sigma")
  }
}
