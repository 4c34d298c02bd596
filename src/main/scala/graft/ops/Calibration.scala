package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Isotonic (PAVA) probability calibration — turn a ranking score into a
  * monotone P(label | score) estimate (Zadrozny & Elkan 2002; the
  * pool-adjacent-violators algorithm of Ayer et al. 1955). The
  * large-pipeline use: a cheap heuristic score (stopword ratio, quality
  * gate, classifier margin) becomes an actual probability that a
  * downstream sampler can threshold at a target precision.
  *
  * Scale shape: the corpus pass is ONE map-side-combined groupBy into
  * `nBins` equal-width score bins — bin stats (n, positives) are the
  * sufficient statistics for isotonic regression on binned data. PAVA
  * then runs on the driver over the nBins-row table (model-sized by
  * construction; the corpus never sorts). Calibrated probabilities are
  * exact weighted-mean pools, deterministic, no RNG.
  */
object Calibration {

  /** Weighted pool-adjacent-violators: smallest-squared-error monotone
    * non-decreasing fit to `y` with weights `w`. Stack-based single
    * pass; returns the fitted value per input position.
    */
  def pava(y: Array[Double], w: Array[Double]): Array[Double] = {
    require(y.length == w.length)
    val n = y.length
    // blocks as (weighted mean, weight, count), merged while decreasing
    val mean = new Array[Double](n); val wt = new Array[Double](n)
    val cnt = new Array[Int](n)
    var top = -1
    var i = 0
    while (i < n) {
      top += 1; mean(top) = y(i); wt(top) = w(i); cnt(top) = 1
      while (top > 0 && mean(top - 1) > mean(top)) {
        val wSum = wt(top - 1) + wt(top)
        mean(top - 1) = (mean(top - 1) * wt(top - 1) + mean(top) * wt(top)) / wSum
        wt(top - 1) = wSum; cnt(top - 1) += cnt(top)
        top -= 1
      }
      i += 1
    }
    val out = new Array[Double](n)
    var k = 0; var b = 0
    while (b <= top) {
      var c = 0
      while (c < cnt(b)) { out(k) = mean(b); k += 1; c += 1 }
      b += 1
    }
    out
  }

  /** Integer-exact weighted PAVA over binned sufficient statistics
    * (positives, counts): blocks merge on the EXACT rational comparison
    * pos₁·n₂ > pos₂·n₁ (long cross-multiplication — no float drift can
    * ever mis-order a merge), and each fitted value is ONE double
    * division of exact integer block sums. This makes the fit the
    * correctly-rounded double of the true rational block mean — the
    * property the minimax SQL oracle (`fit(i) = max_{j≤i} min_{k≥i}
    * avg(j..k)`, each candidate likewise one division of exact integer
    * sums) reproduces bit-identically: IEEE division is correctly
    * rounded and rounding is monotone, so equal rationals give equal
    * doubles and comparisons never invert across engines.
    */
  def pavaCounts(pos: Array[Long], n: Array[Long]): Array[Double] = {
    require(pos.length == n.length)
    val len = n.length
    val bp = new Array[Long](len); val bn = new Array[Long](len)
    val cnt = new Array[Int](len)
    var top = -1
    var i = 0
    while (i < len) {
      top += 1; bp(top) = pos(i); bn(top) = n(i); cnt(top) = 1
      while (top > 0 && bp(top - 1) * bn(top) > bp(top) * bn(top - 1)) {
        bp(top - 1) += bp(top); bn(top - 1) += bn(top); cnt(top - 1) += cnt(top)
        top -= 1
      }
      i += 1
    }
    val out = new Array[Double](len)
    var k = 0; var b = 0
    while (b <= top) {
      var c = 0
      while (c < cnt(b)) { out(k) = bp(b).toDouble / bn(b); k += 1; c += 1 }
      b += 1
    }
    out
  }

  /** Equal-width-binned isotonic calibration table: `bin`, `score_lo`
    * (inclusive lower edge), `n`, `n_pos`, `rate` (raw positive rate),
    * `calibrated` (PAVA-monotone estimate, round 6). `scoreCol` must be
    * a double in [lo, hi); values at hi clamp into the last bin. Rows
    * with NULL labels are excluded (they carry no label evidence —
    * counting them in `n` but not `n_pos` would bias every bin rate
    * down, and an all-NULL bin would make `sum(pos)` NULL).
    */
  def isotonicBins(df: DataFrame, scoreCol: String, labelCol: String,
      nBins: Int, lo: Double, hi: Double): DataFrame = {
    val spark = df.sparkSession
    val width = (hi - lo) / nBins
    val binned = df.filter(col(labelCol).isNotNull).select(
      least(greatest(floor((col(scoreCol) - lit(lo)) / lit(width)), lit(0)),
        lit(nBins - 1)).cast("int").as("bin"),
      col(labelCol).cast("long").as("pos"))
    val stats = binned.groupBy("bin")
      .agg(count(lit(1)).as("n"), sum("pos").as("n_pos"))
      .orderBy("bin")
      .collect() // ≤ nBins rows — the sufficient statistics, model-sized
    val fit = pavaCounts(stats.map(_.getLong(2)), stats.map(_.getLong(1)))
    import spark.implicits._
    stats.zipWithIndex.map { case (r, i) =>
      (r.getInt(0), lo + r.getInt(0) * width, r.getLong(1), r.getLong(2),
        r.getLong(2).toDouble / r.getLong(1), fit(i))
    }.toSeq.toDF("bin", "score_lo", "n", "n_pos", "rate", "calibrated")
      // round() (HALF_UP), not math.rint (HALF_EVEN): the SQL oracle's
      // round() rounds the same doubles the same way
      .select(col("bin"), round(col("score_lo"), 6).as("score_lo"),
        col("n"), col("n_pos"), round(col("rate"), 6).as("rate"),
        round(col("calibrated"), 6).as("calibrated"))
  }
}
