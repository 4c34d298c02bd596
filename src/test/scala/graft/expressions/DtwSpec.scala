package graft.expressions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** DTW: identity, symmetry, a hand-computed DP table, band
  * reachability under length mismatch, and the phase-shift property
  * (the reason DTW exists: a shifted copy scores near zero where
  * pointwise distance scores large).
  */
class DtwSpec extends SparkSpec {
  import spark.implicits._

  private def d(a: Seq[Double], b: Seq[Double]): Double =
    DtwDistance.dtwArrays(a.toArray, b.toArray)

  test("identity is zero; symmetry holds") {
    val xs = Seq(Seq(1.0, 2.0, 3.0, 2.0), Seq(0.0), Seq(5.0, 5.0, 5.0))
    xs.foreach(x => assert(d(x, x) == 0.0))
    val a = Seq(1.0, 3.0, 2.0); val b = Seq(2.0, 1.0, 3.0)
    assert(d(a, b) == d(b, a))
  }

  test("hand-computed DP: dtw([1,3], [1,2,3]) = 1") {
    // full table: d11=0 d12=1 d13=3 / d21=2 d22=1 d23=1 → 1
    assert(d(Seq(1.0, 3.0), Seq(1.0, 2.0, 3.0)) == 1.0)
  }

  test("elastic alignment: repeated samples cost nothing") {
    // [0,1,2] vs [0,0,1,1,2] aligns perfectly under warping
    assert(d(Seq(0.0, 1.0, 2.0), Seq(0.0, 0.0, 1.0, 1.0, 2.0)) == 0.0)
  }

  test("band widens with length difference so corners stay reachable") {
    val a = Seq(1.0, 2.0)
    val b = (1 to 12).map(_.toDouble) // |n-m| = 10 > Band = 3
    val r = d(a, b)
    assert(!r.isInfinite && r > 0.0)
  }

  test("phase shift: dtw of a shifted sine is far below pointwise L1") {
    val n = 24
    val base = (0 until n).map(i => math.sin(2 * math.Pi * i / n))
    val shifted = (0 until n).map(i => math.sin(2 * math.Pi * (i + 2) / n))
    val pointwise = base.zip(shifted).map { case (x, y) => math.abs(x - y) }.sum
    val dtw = d(base, shifted)
    assert(dtw < pointwise / 3,
      s"dtw $dtw should be well under pointwise $pointwise")
  }

  test("empty inputs: equal-empty is 0, mismatch is +inf (no silent 0)") {
    assert(d(Seq.empty, Seq.empty) == 0.0)
    assert(d(Seq.empty, Seq(1.0)).isPosInfinity)
  }

  test("DataFrame path (codegen) agrees with the static helper") {
    val df = Seq((Seq(1.0, 3.0), Seq(1.0, 2.0, 3.0)),
      (Seq(0.0, 1.0, 2.0), Seq(0.0, 0.0, 1.0, 1.0, 2.0))).toDF("a", "b")
    val B = org.apache.spark.sql.graft.Bridge
    val got = df.select(B.column(DtwDistance(
      B.expression(col("a")), B.expression(col("b"))))).collect()
      .map(_.getDouble(0))
    assert(got.toSeq == Seq(1.0, 0.0))
  }
}
