package graft.ml

import java.net.{HttpURLConnection, URI}
import java.nio.charset.StandardCharsets

import graft.SparkSpec

/** End-to-end HTTP serving: a real socket on loopback, a real POST, the
  * real Spark scoring plan behind it.
  */
class HttpServeSpec extends SparkSpec {
  import spark.implicits._

  private lazy val model: PcaAnomalyModel = {
    val train = (1 to 200).map { i =>
      val a = math.sin(i / 10.0) * 10; val b = math.cos(i / 7.0) * 5
      (a, b, a + b)
    }.toDF("t1", "t2", "t3")
    PcaAnomaly.fit(train, Seq("t1", "t2", "t3"), k = 2, pctl = 0.99)
  }

  private lazy val server =
    new PredictionServer(spark, model, Seq("t1", "t2", "t3")).start()

  override def afterAll(): Unit = {
    try server.stop() finally super.afterAll()
  }

  private def http(method: String, path: String, body: Option[String] = None):
      (Int, String) = {
    val conn = URI.create(s"http://127.0.0.1:${server.boundPort}$path")
      .toURL.openConnection().asInstanceOf[HttpURLConnection]
    conn.setRequestMethod(method)
    body.foreach { b =>
      conn.setDoOutput(true)
      val os = conn.getOutputStream
      try os.write(b.getBytes(StandardCharsets.UTF_8)) finally os.close()
    }
    val code = conn.getResponseCode
    val is = if (code < 400) conn.getInputStream else conn.getErrorStream
    val text = try new String(is.readAllBytes(), StandardCharsets.UTF_8)
    finally is.close()
    (code, text)
  }

  test("healthz and metadata respond") {
    assert(http("GET", "/healthz") == (200, "{\"status\":\"ok\"}"))
    val (code, meta) = http("GET", "/metadata")
    assert(code == 200)
    assert(meta.contains("\"t1\"") && meta.contains("\"threshold\":"))
  }

  test("POST /prediction scores a payload through the real plan") {
    val payload =
      """[{"t1":5.0,"t2":3.0,"t3":8.0},{"t1":5.0,"t2":3.0,"t3":80.0}]"""
    val (code, body) = http("POST", "/prediction", Some(payload))
    assert(code == 200, body)
    // response stays row-aligned with the request: req_idx 0 normal, 1 not
    assert(body.contains("\"req_idx\":0") && body.contains("\"req_idx\":1"))
    assert(body.contains("\"anomalous\":false") && body.contains("\"anomalous\":true"))
  }

  test("malformed JSON is a 400 with an error body, not a 500") {
    val (code, body) = http("POST", "/prediction", Some("this is not json"))
    assert(code == 400)
    assert(body.contains("\"error\""))
  }

  test("empty POST body is a 400, not a silent empty 200") {
    val (code, body) = http("POST", "/prediction", Some("   "))
    assert(code == 400)
    assert(body.contains("empty request body"))
  }

  test("GET /models without a registry is a 404; with one it enumerates builds") {
    // serverless default: no registry attached
    val (code0, body0) = http("GET", "/models")
    assert(code0 == 404 && body0.contains("no registry"))

    // a real registry with one fleet build behind a fresh server
    val out = java.nio.file.Files.createTempDirectory("graft-watchman").toString
    val events = graft.sources.Events.read(spark, "/root/testdata/sf0.001/events.parquet")
    val fleet = WorkflowGenerator.buildFleet(spark,
      """{"defaults": {"dataset": {"resolution": "1 hour",
        |              "tag_col": "event_type", "value_col": "value"},
        |              "evaluation": {"n_splits": 2}},
        | "machines": [{"name": "w1", "dataset": {"tags": ["click", "view"]},
        |               "model": {"type": "pca_anomaly", "k": 1,
        |                         "threshold_pctl": 0.95}}]}""".stripMargin,
      events, out)
    assert(fleet.failed.isEmpty)
    val watch = new PredictionServer(spark, model, Seq("t1", "t2", "t3"),
      registry = Some(DiskRegistry(s"$out/registry"))).start()
    try {
      val conn = URI.create(s"http://127.0.0.1:${watch.boundPort}/models")
        .toURL.openConnection().asInstanceOf[HttpURLConnection]
      val body = new String(conn.getInputStream.readAllBytes(), StandardCharsets.UTF_8)
      assert(conn.getResponseCode == 200)
      assert(body.contains("\"config_key\"") && body.contains("\"w1\""))
      assert(body.contains("\"threshold\"")) // from the embedded metadata.json
    } finally watch.stop()
  }

  test("GET on the prediction route is a 405") {
    assert(http("GET", "/prediction")._1 == 405)
  }

  private def httpBytes(path: String, body: Array[Byte],
      contentType: String, accept: String): (Int, Array[Byte]) = {
    val conn = URI.create(s"http://127.0.0.1:${server.boundPort}$path")
      .toURL.openConnection().asInstanceOf[HttpURLConnection]
    conn.setRequestMethod("POST")
    conn.setRequestProperty("Content-Type", contentType)
    conn.setRequestProperty("Accept", accept)
    conn.setDoOutput(true)
    val os = conn.getOutputStream
    try os.write(body) finally os.close()
    val code = conn.getResponseCode
    val is = if (code < 400) conn.getInputStream else conn.getErrorStream
    val bytes = try is.readAllBytes() finally is.close()
    (code, bytes)
  }

  private def requestParquetBytes: Array[Byte] = {
    // same two records as the JSON test: row 0 on-pattern, row 1 wild
    val df = Seq((5.0, 3.0, 8.0), (5.0, 3.0, 80.0)).toDF("t1", "t2", "t3")
    val dir = java.nio.file.Files.createTempDirectory("graft-req-pq")
    df.coalesce(1).write.mode("overwrite").parquet(dir.resolve("r").toString)
    val part = java.nio.file.Files.list(dir.resolve("r"))
      .filter(p => p.getFileName.toString.endsWith(".parquet")).findFirst().get()
    java.nio.file.Files.readAllBytes(part)
  }

  test("POST parquet body, Accept parquet: full parquet round trip") {
    val (code, bytes) = httpBytes("/prediction", requestParquetBytes,
      "application/x-parquet", "application/x-parquet")
    assert(code == 200)
    // parse the response parquet and check request↔response alignment
    val tmp = java.nio.file.Files.createTempFile("graft-resp", ".parquet")
    java.nio.file.Files.write(tmp, bytes)
    val resp = spark.read.parquet(tmp.toString).orderBy("req_idx").collect()
    assert(resp.length == 2)
    assert(resp(0).getAs[Long]("req_idx") == 0L && !resp(0).getAs[Boolean]("anomalous"))
    assert(resp(1).getAs[Long]("req_idx") == 1L && resp(1).getAs[Boolean]("anomalous"))
  }

  test("POST parquet body with JSON Accept answers JSON (mixed negotiation)") {
    val (code, bytes) = httpBytes("/prediction", requestParquetBytes,
      "application/octet-stream", "application/json")
    val body = new String(bytes, StandardCharsets.UTF_8)
    assert(code == 200, body)
    assert(body.startsWith("[") && body.contains("\"req_idx\":0"))
    assert(body.contains("\"anomalous\":false") && body.contains("\"anomalous\":true"))
  }

  test("unreadable parquet body is a 400, not a 500") {
    val (code, bytes) = httpBytes("/prediction",
      "definitely not parquet".getBytes(StandardCharsets.UTF_8),
      "application/x-parquet", "application/json")
    assert(code == 400)
    assert(new String(bytes, StandardCharsets.UTF_8).contains("\"error\""))
  }

  test("parquet request missing a tag column null-scores those rows") {
    val df = Seq((5.0, 3.0)).toDF("t1", "t2") // no t3 column at all
    val dir = java.nio.file.Files.createTempDirectory("graft-req-pq2")
    df.coalesce(1).write.mode("overwrite").parquet(dir.resolve("r").toString)
    val part = java.nio.file.Files.list(dir.resolve("r"))
      .filter(p => p.getFileName.toString.endsWith(".parquet")).findFirst().get()
    val (code, bytes) = httpBytes("/prediction",
      java.nio.file.Files.readAllBytes(part),
      "application/x-parquet", "application/json")
    val body = new String(bytes, StandardCharsets.UTF_8)
    assert(code == 200, body)
    // the row comes back (alignment holds) but cannot be scored
    assert(body.contains("\"req_idx\":0") && !body.contains("\"anomalous\":true"))
    assert(!body.contains("\"anomaly_score\":") ||
      body.contains("\"anomaly_score\":null"))
  }
}
