package graft.ml

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The forest must SEPARATE (isolated points score visibly above a dense
  * cluster), be DETERMINISTIC (md5-derived splits ⇒ a refit is
  * bit-identical), and respect the paper's score normalization (scores
  * in (0,1); a constant frame isolates nothing).
  */
class IsolationForestSpec extends SparkSpec {
  import spark.implicits._

  // dense unit-square cluster + two far outliers, keys are row ids
  private lazy val frame = {
    val rnd = new java.util.SplittableRandom(11)
    val inliers = (0 until 300).map(i =>
      (i.toLong, rnd.nextDouble(), rnd.nextDouble()))
    val outliers = Seq((1000L, 9.0, 9.0), (1001L, -8.0, 7.5))
    (inliers ++ outliers).toDF("id", "x", "y")
  }

  test("outliers score above the cluster and are flagged") {
    val m = IsolationForest.fit(frame, Seq("x", "y"), "id",
      nTrees = 64, psi = 128, thresholdPctl = 0.98)
    val scored = m.score(frame, "id").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val inMean = scored.filter(_._1 < 1000).values.sum / 300.0
    assert(scored(1000L) > 0.6, s"far outlier scored ${scored(1000L)}")
    assert(scored(1001L) > 0.6)
    assert(inMean < 0.55, s"inlier mean $inMean")
    assert(scored(1000L) > inMean + 0.1)
    val flagged = m.anomaly(frame, "id")
      .filter(col("anomalous")).select("id").as[Long].collect().toSet
    assert(flagged.contains(1000L) && flagged.contains(1001L))
    assert(scored.values.forall(s => s > 0.0 && s < 1.0))
  }

  test("refit is bit-identical (md5-derived randomness)") {
    val a = IsolationForest.fit(frame, Seq("x", "y"), "id", nTrees = 16, psi = 64)
    val b = IsolationForest.fit(frame, Seq("x", "y"), "id", nTrees = 16, psi = 64)
    assert(a.threshold == b.threshold)
    a.trees.zip(b.trees).foreach { case (ta, tb) =>
      assert(ta.feature.sameElements(tb.feature))
      assert(ta.split.sameElements(tb.split))
      assert(ta.left.sameElements(tb.left))
      assert(ta.size.sameElements(tb.size))
    }
  }

  test("constant frame yields the trivial score 0.5 everywhere") {
    val const = (0 until 50).map(i => (i.toLong, 3.0, 3.0)).toDF("id", "x", "y")
    val m0 = IsolationForest.fit(const, Seq("x", "y"), "id", nTrees = 8, psi = 32)
    // every tree is a single root leaf of size psi → path = c(n) = c(psi)
    // → score = 2^(−1) exactly
    val scores = m0.score(const, "id").select("anomaly_score")
      .as[Double].collect()
    assert(scores.forall(_ == 0.5))
  }

  test("c(n) normalizer: zero below 2, monotone increasing after") {
    assert(IsolationForest.c(0) == 0.0 && IsolationForest.c(1) == 0.0)
    val cs = (2 to 1000).map(IsolationForest.c)
    assert(cs.zip(cs.tail).forall { case (a, b) => b > a })
  }
}
