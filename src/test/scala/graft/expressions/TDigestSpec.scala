package graft.expressions

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.ops.AnomalyMath

class TDigestSpec extends SparkSpec {
  import spark.implicits._

  // deterministic heavy-tailed sample: exp(z) over Box-Muller normals
  private lazy val sample: IndexedSeq[Double] = {
    val r = new java.util.SplittableRandom(11)
    (1 to 100000).map { _ =>
      val u1 = math.max(r.nextDouble(), 1e-12); val u2 = r.nextDouble()
      math.exp(math.sqrt(-2 * math.log(u1)) * math.cos(2 * math.Pi * u2))
    }
  }

  private def rankOf(v: Double): Double =
    sample.count(_ <= v).toDouble / sample.size

  test("sketch quantiles land within 1% rank error, tails tighter") {
    val d = new TDigest(100)
    sample.foreach(d.add(_))
    for (q <- Seq(0.5, 0.9, 0.99, 0.999)) {
      val est = d.quantile(q)
      assert(math.abs(rankOf(est) - q) < 0.01, s"q=$q est=$est rank=${rankOf(est)}")
    }
    // t-digest's point: the extreme tail stays accurate at O(compression) memory
    assert(math.abs(rankOf(d.quantile(0.999)) - 0.999) < 0.001)
    assert(d.centroidCount < 200)
  }

  test("merging partial sketches matches a single sketch's accuracy") {
    val whole = new TDigest(100)
    sample.foreach(whole.add(_))
    val merged = new TDigest(100)
    sample.grouped(9973).foreach { chunk =>
      val part = new TDigest(100)
      chunk.foreach(part.add(_))
      // round-trip through serialization: the exact path Spark exchanges use
      merged.merge(TDigest.deserialize(part.serialize()))
    }
    for (q <- Seq(0.5, 0.99)) {
      assert(math.abs(rankOf(merged.quantile(q)) - q) < 0.01, s"q=$q")
    }
  }

  test("thresholdSketch aggregates per group and tracks the exact percentile") {
    val df = sample.zipWithIndex
      .map { case (v, i) => (if (i % 2 == 0) "a" else "b", v) }.toDF("g", "v")
      .repartition(8) // partial sketches must merge across partitions
    val out = df.groupBy("g").agg(
        AnomalyMath.thresholdSketch(col("v"), 0.99).as("thr_sketch"),
        AnomalyMath.threshold(col("v"), 0.99).as("thr_exact"))
      .collect()
    assert(out.length == 2)
    out.foreach { r =>
      val (sk, ex) = (r.getDouble(1), r.getDouble(2))
      assert(math.abs(sk - ex) / ex < 0.05, s"sketch=$sk exact=$ex")
    }
    // null/NaN contract: absent values, not poison
    val edge = Seq(Some(1.0), None, Some(Double.NaN), Some(3.0)).toDF("v")
      .agg(AnomalyMath.thresholdSketch(col("v"), 1.0)).head().getDouble(0)
    assert(edge == 3.0)
    // empty input -> null, like percentile
    assert(Seq.empty[Double].toDF("v")
      .agg(AnomalyMath.thresholdSketch(col("v"), 0.5)).head().isNullAt(0))
  }

  test("registered as SQL and usable in a STREAMING aggregation") {
    // newSession: registry isolation, like GraftExtensionsSpec
    val s = spark.newSession()
    org.apache.spark.sql.graft.Bridge.registerFunctions(s)
    s.createDataFrame(sample.take(1000).map(Tuple1(_))).toDF("v")
      .createOrReplaceTempView("tdq_t")
    val viaSql = s.sql(
      "SELECT graft_tdigest_quantile(v, 0.5) FROM tdq_t").head().getDouble(0)
    assert(math.abs(rankOf(viaSql) - 0.5) < 0.05)

    // the capability percentile() lacks: a streaming groupBy aggregation
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[(String, Double)]
    val q = mem.toDF.toDF("g", "v")
      .groupBy("g").agg(AnomalyMath.thresholdSketch(col("v"), 0.5).as("thr"))
      .writeStream.format("memory").queryName("tdq_out").outputMode("complete")
      .start()
    try {
      mem.addData(sample.take(2000).map(("a", _)))
      q.processAllAvailable()
      mem.addData(sample.slice(2000, 4000).map(("a", _)))
      q.processAllAvailable()
      val thr = spark.sql("SELECT thr FROM tdq_out").head().getDouble(0)
      val exact = sample.take(4000).sorted.apply(2000)
      assert(math.abs(thr - exact) / exact < 0.1, s"stream=$thr exact=$exact")
    } finally q.stop()
  }
}
