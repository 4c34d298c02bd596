package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** PAVA + binned isotonic calibration: hand-computed pooling, the
  * monotone and weighted-mean-preservation invariants, and the
  * DataFrame path end to end.
  */
class CalibrationSpec extends SparkSpec {
  import spark.implicits._

  test("pava: already-monotone input is unchanged") {
    val y = Array(0.1, 0.2, 0.2, 0.9)
    val w = Array(1.0, 1.0, 1.0, 1.0)
    assert(Calibration.pava(y, w).toSeq == y.toSeq)
  }

  test("pava: hand-computed violator pooling with weights") {
    // y = [0.6, 0.2], w = [1, 3] → pooled mean (0.6 + 0.2·3)/4 = 0.3
    Calibration.pava(Array(0.6, 0.2), Array(1.0, 3.0)).foreach(v =>
      assert(math.abs(v - 0.3) < 1e-12))
    // cascade: [0.5, 0.4, 0.3] equal weights pools all three to 0.4
    val r = Calibration.pava(Array(0.5, 0.4, 0.3), Array(1.0, 1.0, 1.0))
    assert(r.forall(v => math.abs(v - 0.4) < 1e-12))
  }

  test("pava invariants: monotone output, weighted mean preserved") {
    val rnd = new scala.util.Random(42)
    val y = Array.fill(50)(rnd.nextDouble())
    val w = Array.fill(50)(1.0 + rnd.nextInt(5))
    val f = Calibration.pava(y, w)
    f.sliding(2).foreach(p => assert(p(0) <= p(1) + 1e-12))
    val my = y.zip(w).map { case (a, b) => a * b }.sum / w.sum
    val mf = f.zip(w).map { case (a, b) => a * b }.sum / w.sum
    assert(math.abs(my - mf) < 1e-9) // pooling preserves the weighted mean
  }

  test("isotonicBins: calibrated column is monotone and counts add up") {
    // score correlates with the label, with one noisy dip
    val rows = (0 until 400).map { i =>
      val score = (i % 100) / 100.0
      val p = if (score < 0.3) 0.1 else if (score < 0.6) 0.5 else 0.9
      val dip = if (score >= 0.4 && score < 0.45) -0.3 else 0.0
      (score, (((i * 2654435761L) % 100) / 100.0) < p + dip)
    }.toDF("score", "label")
    val out = Calibration.isotonicBins(rows, "score", "label",
      nBins = 10, lo = 0.0, hi = 1.0).orderBy("bin").collect()
    assert(out.map(_.getLong(2)).sum == 400)
    out.map(_.getDouble(5)).sliding(2).foreach {
      case Array(a, b) => assert(a <= b + 1e-9)
      case _ =>
    }
    // deterministic: second run bit-identical
    val again = Calibration.isotonicBins(rows, "score", "label",
      nBins = 10, lo = 0.0, hi = 1.0).orderBy("bin").collect()
    assert(out.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq)
  }
}
