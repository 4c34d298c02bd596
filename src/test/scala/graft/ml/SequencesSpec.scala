package graft.ml

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SequencesSpec extends SparkSpec {
  import spark.implicits._

  private lazy val wide = Seq(
    (1L, 1.0, 10.0), (2L, 2.0, 20.0), (3L, 3.0, 30.0), (4L, 4.0, 40.0)
  ).toDF("t", "a", "b")

  test("lookback builds (lb, features) arrays and drops short prefixes") {
    val out = Sequences.lookback(wide, Seq("a", "b"), lb = 3, orderCol = "t")
      .orderBy("t").collect()
    assert(out.length == 2) // t=3 and t=4 have full windows
    val seq3 = out(0).getSeq[Seq[Double]](out(0).fieldIndex("sequence"))
    assert(seq3 == Seq(Seq(1.0, 10.0), Seq(2.0, 20.0), Seq(3.0, 30.0)))
  }

  test("forecastTarget: X is strictly before y") {
    val out = Sequences.forecastTarget(wide, Seq("a", "b"), lb = 2, orderCol = "t")
      .orderBy("t").collect()
    assert(out.length == 2) // t=3, t=4
    val x = out(0).getSeq[Seq[Double]](out(0).fieldIndex("x_sequence"))
    val y = out(0).getSeq[Double](out(0).fieldIndex("y"))
    assert(x == Seq(Seq(1.0, 10.0), Seq(2.0, 20.0)))
    assert(y == Seq(3.0, 30.0))
  }

  test("partitioned lookback never crosses partition keys") {
    val two = Seq((1L, 1L, 1.0), (1L, 2L, 2.0), (2L, 1L, 5.0), (2L, 2L, 6.0))
      .toDF("m", "t", "a")
    val out = Sequences.lookback(two, Seq("a"), lb = 2, orderCol = "t",
        partitionBy = Seq("m"))
      .select("m", "sequence").collect()
    assert(out.length == 2) // one full window per machine
    out.foreach { r =>
      val s = r.getSeq[scala.collection.Seq[Double]](1).map(_.head).toList
      assert(s == List(1.0, 2.0) || s == List(5.0, 6.0)) // no mixing
    }
  }

  test("perTagScores: on-manifold rows have near-zero per-tag error, outlier localizes") {
    val base = (1 to 50).map(i => (i.toDouble, 2.0 * i + (i % 3) * 0.01, 100.0))
    val train = base.toDF("t1", "t2", "t3")
    // k=1: the single component spans the t1~t2 line, so the off-line
    // outlier must show up in the per-tag reconstruction error
    val model = PcaAnomaly.fit(train, Seq("t1", "t2", "t3"), k = 1, pctl = 0.95)
    val test = (base :+ ((25.0, -50.0, 100.0))).toDF("t1", "t2", "t3")
    val scored = PcaAnomaly.perTagScores(model, test, Seq("t1", "t2", "t3"))
    val outlier = scored.filter(col("t2") === -50.0).collect().head
    val normal = scored.filter(col("t2") =!= -50.0)
      .agg(avg(col("tag_anomaly_t2"))).head().getDouble(0)
    assert(outlier.getAs[Double]("tag_anomaly_t2") > 10 * normal)
  }
}
