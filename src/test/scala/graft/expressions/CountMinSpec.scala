package graft.expressions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

/** Count-Min sketch: the one-sided guarantee (est ≥ true, est ≤ true +
  * ε·N for width = e/ε), merge-order independence (the property that
  * makes the distributed aggregate deterministic under ANY
  * partitioning), and serialization round-trip.
  */
class CountMinSpec extends SparkSpec {
  import spark.implicits._

  private def u(s: String) = UTF8String.fromString(s)

  test("estimates are one-sided and within the epsilon-N bound") {
    // Zipf-ish corpus: key k appears 1000/k times, k = 1..50
    val keys = (1 to 50).flatMap(k => Seq.fill(1000 / k)(k.toString))
    val sk = new CMSketch(depth = 4, width = 256)
    keys.foreach(k => sk.add(u(k)))
    val n = keys.size.toDouble
    val eps = math.E / 256
    (1 to 50).foreach { k =>
      val truth = 1000 / k
      val est = sk.estimate(u(k.toString))
      assert(est >= truth, s"key $k: est $est < true $truth")
      assert(est <= truth + eps * n * 4, // 4x slack over the w.h.p. bound
        s"key $k: est $est way over true $truth (bound ${truth + eps * n})")
    }
    // an absent key can only collide, never go negative
    assert(sk.estimate(u("absent-key")) >= 0)
  }

  test("merge is elementwise add: split-merge equals single-pass exactly") {
    val keys = (1 to 200).map(i => s"k${i % 17}")
    val whole = new CMSketch(4, 64)
    keys.foreach(k => whole.add(u(k)))
    // three different split points, merged in different orders
    for (cut <- Seq(10, 67, 150)) {
      val a = new CMSketch(4, 64); val b = new CMSketch(4, 64)
      keys.take(cut).foreach(k => a.add(u(k)))
      keys.drop(cut).foreach(k => b.add(u(k)))
      b.merge(a) // reversed merge order on purpose
      assert(b.counts.sameElements(whole.counts) && b.total == whole.total)
    }
  }

  test("serialization round-trips exactly") {
    val sk = new CMSketch(3, 32)
    (1 to 100).foreach(i => sk.add(u(s"v${i % 7}")))
    val back = CMSketch.deserialize(CMSketch.serialize(sk))
    assert(back.depth == 3 && back.width == 32 && back.total == sk.total)
    assert(back.counts.sameElements(sk.counts))
    assert(back.estimate(u("v3")) == sk.estimate(u("v3")))
  }

  test("DataFrame aggregate is partition-count invariant and one-sided") {
    val B = org.apache.spark.sql.graft.Bridge
    val probes = (0 until 10).map(_.toString)
    val data = (1 to 2000).map(i => (i % 10).toString).toDF("k")
    def run(parts: Int): Seq[Long] = {
      val agg = B.column(CountMinEstimates(
        B.expression(col("k")), probes, depth = 4, width = 128)
        .toAggregateExpression())
      data.repartition(parts).agg(agg.as("est"))
        .head().getSeq[Long](0)
    }
    val one = run(1); val eight = run(8)
    assert(one == eight) // merge-order independent
    probes.zipWithIndex.foreach { case (_, i) =>
      assert(one(i) >= 200L) // exact count per key is 200; one-sided
    }
  }
}
