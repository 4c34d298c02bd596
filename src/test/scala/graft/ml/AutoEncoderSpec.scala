package graft.ml

import graft.SparkSpec
import org.apache.spark.sql.functions._

class AutoEncoderSpec extends SparkSpec {
  import spark.implicits._

  // curved manifold: t2 = sin(t1), t3 = t1·t2 — no linear subspace holds it
  private lazy val train = (1 to 400).map { i =>
    val a = (i % 100) / 100.0 * 6 - 3
    (a, math.sin(a), a * math.sin(a))
  }.toDF("t1", "t2", "t3")

  private lazy val model = AutoEncoder.fit(train, Seq("t1", "t2", "t3"),
    hidden = 24, pctl = 0.99)

  test("on-manifold points score below threshold, off-manifold far above") {
    val test = Seq(
      (1.0, math.sin(1.0), math.sin(1.0)),       // on manifold
      (-2.0, math.sin(-2.0), -2 * math.sin(-2.0)), // on manifold
      (1.0, 5.0, -7.0)                            // nowhere near it
    ).toDF("t1", "t2", "t3")
    val rows = model.anomaly(test).select("anomaly_score", "anomalous").collect()
    assert(!rows(0).getBoolean(1) && !rows(1).getBoolean(1))
    assert(rows(2).getBoolean(1))
    assert(rows(2).getDouble(0) > 5 * rows(0).getDouble(0))
  }

  test("captures the curved manifold better than a linear PCA of same rank") {
    // rank-2 linear model on a curved 1-D manifold embedded in 3-D:
    // PCA's residual on HELD-OUT on-manifold points stays large relative
    // to its own training spread; the nonlinear encoder's does not
    val heldOut = Seq.tabulate(50) { i =>
      val a = (i / 50.0) * 6 - 3 + 0.031 // offset off the train grid
      (a, math.sin(a), a * math.sin(a))
    }.toDF("t1", "t2", "t3")
    val rfaeErr = model.score(heldOut).agg(avg("anomaly_score")).head().getDouble(0)
    val pca = PcaAnomaly.fit(train, Seq("t1", "t2", "t3"), k = 1, pctl = 0.99)
    val pcaRel = pca.score(heldOut).agg(avg("anomaly_score")).head().getDouble(0) /
      math.max(pca.threshold, 1e-9)
    val rfaeRel = rfaeErr / math.max(model.threshold, 1e-9)
    assert(rfaeRel < pcaRel,
      s"nonlinear autoencoder should generalize on-manifold: rfae=$rfaeRel pca=$pcaRel")
  }

  test("distributed sufficient statistics match a driver-side solve") {
    val tags = Seq("t1", "t2", "t3")
    val m = AutoEncoder.fit(train, tags, hidden = 8, ridge = 1e-3, seed = 7L)
    // recompute H and the ridge solution locally from collected rows
    val rows = train.collect().map(r => Array(r.getDouble(0), r.getDouble(1), r.getDouble(2)))
    val d = 3; val h = 8
    val xs = rows.map(x => Array.tabulate(d)(j => (x(j) - m.means(j)) / m.stds(j)))
    val hrows = xs.map { x =>
      Array.tabulate(h + 1)(i =>
        if (i == h) 1.0
        else math.tanh((0 until d).map(j => x(j) * m.w(i)(j)).sum + m.b(i)))
    }
    val hh = Array.ofDim[Double](h + 1, h + 1)
    val hx = Array.ofDim[Double](h + 1, d)
    for (r <- hrows.indices; i <- 0 to h) {
      for (j <- 0 to h) hh(i)(j) += hrows(r)(i) * hrows(r)(j)
      for (j <- 0 until d) hx(i)(j) += hrows(r)(i) * xs(r)(j)
    }
    for (i <- 0 until h) hh(i)(i) += 1e-3
    for (j <- 0 until d) {
      val sol = Forecast.solve(hh.map(_.clone()), Array.tabulate(h + 1)(i => hx(i)(j)))
      for (i <- 0 to h)
        assert(math.abs(sol(i) - m.beta(i)(j)) < 1e-6,
          s"beta($i)($j): local=${sol(i)} dist=${m.beta(i)(j)}")
    }
  }

  test("same seed reproduces the same model; different seed does not") {
    val a = AutoEncoder.fit(train, Seq("t1", "t2", "t3"), hidden = 8, seed = 1L)
    val b = AutoEncoder.fit(train, Seq("t1", "t2", "t3"), hidden = 8, seed = 1L)
    val c = AutoEncoder.fit(train, Seq("t1", "t2", "t3"), hidden = 8, seed = 2L)
    assert(a.beta.flatten.toSeq == b.beta.flatten.toSeq)
    assert(a.threshold == b.threshold)
    assert(a.beta.flatten.toSeq != c.beta.flatten.toSeq)
  }

  test("model round-trips through parquet and scores bit-identically") {
    val dir = java.nio.file.Files.createTempDirectory("graft-rfae").toString
    model.toDF(spark).write.parquet(s"$dir/model")
    val back = AutoEncoder.RfaeModel.fromDF(spark.read.parquet(s"$dir/model"))
    assert(back.tags == model.tags && back.threshold == model.threshold)
    assert(back.beta.flatten.toSeq == model.beta.flatten.toSeq)
    assert(back.w.flatten.toSeq == model.w.flatten.toSeq)
    val a = model.score(train).select("anomaly_score").collect().map(_.getDouble(0))
    val b = back.score(train).select("anomaly_score").collect().map(_.getDouble(0))
    assert(a.toSeq == b.toSeq)
  }

  test("scoring plan is narrow: no shuffle, no MLlib transformer") {
    val plan = model.score(train).queryExecution
      .explainString(org.apache.spark.sql.execution.FormattedMode)
    assert(!plan.contains("Exchange"), s"scoring must not shuffle:\n$plan")
  }

  test("null rows are dropped from fit but score as null, not garbage") {
    val withNull = train.union(Seq((Double.NaN, 1.0, 1.0)).toDF("t1", "t2", "t3"))
    val scored = model.score(withNull.na.drop("any", Seq("t1", "t2", "t3")))
    assert(scored.filter(col("anomaly_score").isNull).count() == 0)
  }
}
