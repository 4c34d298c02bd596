package graft.ml

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ServeSpec extends SparkSpec {
  import spark.implicits._

  private lazy val model: PcaAnomalyModel = {
    // training manifold: t3 ≈ t1 + t2 (rank 2), so k=2 reconstructs it
    val train = (1 to 200).map { i =>
      val a = math.sin(i / 10.0) * 10; val b = math.cos(i / 7.0) * 5
      (a, b, a + b)
    }.toDF("t1", "t2", "t3")
    PcaAnomaly.fit(train, Seq("t1", "t2", "t3"), k = 2, pctl = 0.99)
  }

  test("the nonlinear autoencoder serves through the same request path") {
    val train = (1 to 200).map { i =>
      val a = math.sin(i / 10.0) * 10; val b = math.cos(i / 7.0) * 5
      (a, b, a + b)
    }.toDF("t1", "t2", "t3")
    val rfae = AutoEncoder.fit(train, Seq("t1", "t2", "t3"), hidden = 16, pctl = 0.99)
    // the nonlinear model learns the 1-D TRAJECTORY, not PCA's plane —
    // an "on-manifold" probe must be an actual trajectory point
    val (a, b) = (math.sin(3.0) * 10, math.cos(30.0 / 7) * 5)
    val json =
      s"""[{"t1":$a,"t2":$b,"t3":${a + b}},{"t1":$a,"t2":$b,"t3":${a + b + 50}}]"""
    val rows = Serve.scoreRequest(spark, rfae, json, Seq("t1", "t2", "t3"))
      .orderBy("req_idx").collect()
    assert(!rows(0).getAs[Boolean]("anomalous"))
    assert(rows(1).getAs[Boolean]("anomalous"))
    assert(rows(1).getAs[Double]("tag_anomaly_t3") > rows(1).getAs[Double]("tag_anomaly_t1"))
  }

  test("scoreRequest parses records, scores, and flags the off-manifold row") {
    val json =
      """[{"ts":"2024-01-01T00:00:00Z","t1":5.0,"t2":3.0,"t3":8.0},
        |{"ts":"2024-01-01T00:10:00Z","t1":5.0,"t2":3.0,"t3":80.0}]""".stripMargin
    val out = Serve.scoreRequest(spark, model, json, Seq("t1", "t2", "t3"))
    val rows = out.orderBy("ts").collect()
    assert(rows.length == 2)
    val onManifold = rows(0)
    val outlier = rows(1)
    assert(!onManifold.getAs[Boolean]("anomalous"))
    assert(outlier.getAs[Boolean]("anomalous"))
    // per-tag decomposition localizes the broken tag
    assert(outlier.getAs[Double]("tag_anomaly_t3") > outlier.getAs[Double]("tag_anomaly_t1"))
  }

  test("every record answers in payload order; missing tags score null") {
    val json =
      """[{"t1":5.0,"t2":3.0,"t3":8.0},
        |{"t1":1.0},
        |{"t1":5.0,"t2":3.0,"t3":8.0}]""".stripMargin
    val out = Serve.scoreRequest(spark, model, json, Seq("t1", "t2", "t3"))
    val rows = out.collect()
    assert(rows.length == 3) // request-response row correspondence holds
    assert(rows.map(_.getAs[Long]("req_idx")).toSeq == Seq(0L, 1L, 2L))
    assert(!rows(0).isNullAt(rows(0).fieldIndex("anomaly_score")))
    assert(rows(1).isNullAt(rows(1).fieldIndex("anomaly_score")))
    assert(rows(1).isNullAt(rows(1).fieldIndex("anomalous")))
    val parsed = Serve.parseRequest(spark, """[{"t1":1.0,"junk":"x"}]""", Seq("t1", "t2", "t3"))
    assert(parsed.count() == 1 && !parsed.columns.contains("junk"))
  }

  test("JSON response round-trips the scored fields") {
    val json = """[{"ts":"2024-01-01T00:00:00Z","t1":5.0,"t2":3.0,"t3":8.0}]"""
    val resp = Serve.toJsonResponse(
      Serve.scoreRequest(spark, model, json, Seq("t1", "t2", "t3")))
    assert(resp.startsWith("[") && resp.contains("anomaly_score")
      && resp.contains("tag_anomaly_t3"))
  }
}
