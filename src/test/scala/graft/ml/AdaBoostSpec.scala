package graft.ml

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Boosting must beat its own weak learner: a single axis-aligned stump
  * cannot represent an INTERVAL class (+1 inside [0.25, 0.75], a BALANCED split —
  * with imbalanced classes the degenerate near-constant stump is a valid
  * weak learner and legitimately wins round 1), while a
  * few boosted stumps carve it out. Plus bit-determinism (no RNG
  * anywhere) and sane alphas.
  */
class AdaBoostSpec extends SparkSpec {
  import spark.implicits._

  // interval task: +1 iff x1 ∈ [0.25, 0.75]; x2 is an irrelevant feature
  private lazy val frame = {
    val rnd = new java.util.SplittableRandom(5)
    (0 until 2000).map { i =>
      val x1 = rnd.nextDouble()
      val x2 = rnd.nextDouble()
      val y = if (x1 >= 0.25 && x1 <= 0.75) 1 else -1
      (i.toLong, x1, x2, y)
    }.toDF("id", "x1", "x2", "y")
  }

  private def accuracy(m: AdaBoostModel): Double = {
    val scored = m.score(frame)
    scored.filter(col("prediction") === col("y")).count().toDouble /
      scored.count()
  }

  test("boosted stumps learn an interval a single stump cannot") {
    val weak = AdaBoost.fit(frame, Seq("x1", "x2"), "y", rounds = 1, bins = 64)
    val strong = AdaBoost.fit(frame, Seq("x1", "x2"), "y", rounds = 12, bins = 64)
    val accWeak = accuracy(weak)
    val accStrong = accuracy(strong)
    // one threshold can capture at most one side of the interval
    assert(accWeak < 0.90, s"single stump suspiciously strong: $accWeak")
    assert(accStrong > 0.97, s"boosted accuracy $accStrong")
    assert(accStrong > accWeak + 0.05)
    // the first stump must split on the informative feature
    assert(strong.stumps.head.feature == 0)
    assert(strong.stumps.forall(s => s.alpha > 0))
  }

  test("refit is bit-identical (no RNG anywhere)") {
    val a = AdaBoost.fit(frame, Seq("x1", "x2"), "y", rounds = 8)
    val b = AdaBoost.fit(frame, Seq("x1", "x2"), "y", rounds = 8)
    assert(a.stumps == b.stumps)
  }
}
