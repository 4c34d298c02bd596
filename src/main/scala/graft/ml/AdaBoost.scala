package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** AdaBoost over decision stumps (Freund & Schapire 1997) — the classic
  * boosting ensemble, added beside Naive Bayes as the second trained
  * classifier family: T rounds each fit the best single-threshold
  * axis-aligned stump under the current example weights, combined by
  * confidence-weighted vote.
  *
  * Spark-first shape (the histogram trick of modern GBM systems): stump
  * search never sorts — each feature is binned into `bins` equi-width
  * buckets (extrema from one tiny agg) and ONE hash-aggregation collects
  * the weighted ±label mass per (feature, bin); the driver then scans the
  * d×bins table's prefix sums for the best (feature, threshold, polarity)
  * — model-sized work (the vocab/centroid-collect precedent). Example
  * weights are STATELESS: w_i = exp(−y_i·F_{t−1}(x_i)) is recomputed as a
  * column from the accumulated stump literals, so no weight table is
  * ever materialized or joined — every round is one scan + one tiny agg.
  *
  * Deterministic by construction: no RNG anywhere; stump ties break on
  * (feature, bin); a refit is bit-identical (spec'd).
  */
case class Stump(feature: Int, threshold: Double, polarity: Int, alpha: Double)

case class AdaBoostModel(stumps: Seq[Stump], features: Seq[String],
    lo: Array[Double], hi: Array[Double]) {

  /** Additive margin F(x) as a column expression over stump literals. */
  def marginCol: Column =
    stumps.map { st =>
      val f = col(features(st.feature)).cast("double")
      when(f > st.threshold, lit(st.polarity.toDouble))
        .otherwise(lit(-st.polarity.toDouble)) * lit(st.alpha)
    }.reduce(_ + _)

  /** Score: margin + sign prediction (+1/−1; margin 0 → +1). */
  def score(df: DataFrame): DataFrame =
    df.withColumn("margin", marginCol)
      .withColumn("prediction",
        when(col("margin") >= 0, lit(1)).otherwise(lit(-1)))
}

object AdaBoost {

  /** Fit over `features` (numeric) with labels in {+1, −1}. */
  def fit(df: DataFrame, features: Seq[String], labelCol: String,
      rounds: Int = 10, bins: Int = 32): AdaBoostModel = {
    require(features.nonEmpty && rounds > 0 && bins > 1)
    val data = df.na.drop("any", features :+ labelCol)
      .select((features.map(f => col(f).cast("double")) :+
        col(labelCol).cast("int").as("__y")): _*)
      .localCheckpoint()
    val extrema = data.agg(
      features.flatMap(f => Seq(min(col(f)), max(col(f)))).head,
      features.flatMap(f => Seq(min(col(f)), max(col(f)))).tail: _*).head()
    val lo = features.indices.map(i => extrema.getDouble(2 * i)).toArray
    val hi = features.indices.map(i => extrema.getDouble(2 * i + 1)).toArray

    var stumps = Vector.empty[Stump]
    for (_ <- 1 to rounds) {
      val partial = AdaBoostModel(stumps, features, lo, hi)
      val w =
        if (stumps.isEmpty) lit(1.0)
        else exp(-col("__y").cast("double") * partial.marginCol)
      // bin index per feature: equi-width over [lo, hi], clamped
      val binCols = features.zipWithIndex.map { case (f, i) =>
        val width = (hi(i) - lo(i)) / bins
        val b =
          if (width == 0) lit(0)
          else least(lit(bins - 1), greatest(lit(0),
            floor((col(f) - lit(lo(i))) / lit(width)).cast("int")))
        b.as(s"__b$i")
      }
      val binned = data.select((col("__y") +: w.as("__w") +: binCols): _*)
      // one hash-agg: weighted ± mass per (feature, bin)
      val aggs = features.indices.flatMap { i =>
        (0 until bins).flatMap { b =>
          Seq(
            sum(when(col(s"__b$i") === b && col("__y") === 1, col("__w"))
              .otherwise(0.0)).as(s"p_${i}_$b"),
            sum(when(col(s"__b$i") === b && col("__y") === -1, col("__w"))
              .otherwise(0.0)).as(s"n_${i}_$b"))
        }
      }
      val row = binned.agg(aggs.head, aggs.tail: _*).head()
      val pos = Array.tabulate(features.length, bins)((i, b) =>
        row.getDouble(2 * (i * bins + b)))
      val neg = Array.tabulate(features.length, bins)((i, b) =>
        row.getDouble(2 * (i * bins + b) + 1))
      val totalW = pos.map(_.sum).sum + neg.map(_.sum).sum
      // best threshold via prefix sums: predicting +1 ABOVE bin b
      // (polarity +1) errs on pos-above? no: errs on neg above + pos at-or-below
      var best = (Double.MaxValue, 0, 0, 1) // (err, feature, bin, polarity)
      for (i <- features.indices) {
        var posBelow = 0.0
        var negBelow = 0.0
        val posTot = pos(i).sum
        val negTot = neg(i).sum
        for (b <- 0 until bins - 1) {
          posBelow += pos(i)(b); negBelow += neg(i)(b)
          // polarity +1: predict +1 when x > thr → errors: pos below + neg above
          val e1 = posBelow + (negTot - negBelow)
          // polarity −1: predict −1 when x > thr → errors: neg below + pos above
          val e2 = negBelow + (posTot - posBelow)
          if (e1 < best._1) best = (e1, i, b, 1)
          if (e2 < best._1) best = (e2, i, b, -1)
        }
      }
      val (errW, fi, bi, pol) = best
      val err = math.max(1e-10, math.min(1.0 - 1e-10, errW / totalW))
      val width = (hi(fi) - lo(fi)) / bins
      val thr = lo(fi) + width * (bi + 1)
      val alpha = 0.5 * math.log((1.0 - err) / err)
      stumps = stumps :+ Stump(fi, thr, pol, alpha)
    }
    AdaBoostModel(stumps, features, lo, hi)
  }
}
