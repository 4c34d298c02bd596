package graft.ml

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ModelBuilderSpec extends SparkSpec {

  private val config =
    """{"name": "events-anomaly",
      |  "dataset": {"tags": ["click", "view", "purchase"],
      |              "resolution": "1 hour",
      |              "tag_col": "event_type", "value_col": "value"},
      |  "model": {"k": 2, "threshold_pctl": 0.95},
      |  "evaluation": {"n_splits": 2}}""".stripMargin

  private def events =
    graft.sources.Events.read(spark, "/root/testdata/sf0.001/events.parquet")

  test("build produces a reloadable model, metadata, and scores new data") {
    val out = java.nio.file.Files.createTempDirectory("graft-build").toString
    val result = ModelBuilder.build(spark, config, events, out)

    assert(result.metadata.contains("\"name\": \"events-anomaly\""))
    assert(result.metadata.contains("\"cv\":"))
    assert(result.model.threshold > 0)
    assert(java.nio.file.Files.exists(java.nio.file.Paths.get(result.path, "metadata.json")))

    val scored = ModelBuilder.predict(result, events, config)
    assert(scored.columns.contains("anomaly_score") && scored.columns.contains("anomalous"))
    val n = scored.count()
    val flagged = scored.filter(col("anomalous")).count()
    assert(n > 0 && flagged < n) // 0.95 pctl threshold: some but not all flagged
  }

  test("buildForecast trains the per-tag fleet, persists coefficients, CV on later data") {
    val out = java.nio.file.Files.createTempDirectory("graft-fbuild").toString
    val fconfig =
      """{"name": "events-forecast",
        |  "dataset": {"tags": ["click", "view"], "resolution": "1 hour",
        |              "tag_col": "event_type", "value_col": "value"},
        |  "model": {"type": "ar_forecast", "lookback": 4},
        |  "evaluation": {"n_splits": 2}}""".stripMargin
    val result = ModelBuilder.buildForecast(spark, fconfig, events, out)
    assert(result.model.coefs.map(_._1).sorted == Seq("click", "view"))
    assert(result.model.lb == 4)
    assert(result.metadata.contains("\"type\": \"ar_forecast\""))
    assert(result.metadata.contains("val_mean_abs_err"))
    // the persisted coefficient table round-trips into a scoring model
    val scored = result.model.forecast(
      events.filter(col("event_type").isin("click", "view"))
        .groupBy(graft.ops.Timeseries.bucket(col("ts"), "1 hour").as("bucket"),
          col("event_type"))
        .agg(avg(col("value")).as("v")),
      "bucket")
    assert(scored.count() > 0 && scored.columns.contains("v_hat"))
    // second build of the same config is a registry hit
    val again = ModelBuilder.buildForecast(spark, fconfig, events, out)
    assert(again.path == result.path)
  }

  test("buildAutoEncoder persists the nonlinear model and reloads it exactly") {
    val out = java.nio.file.Files.createTempDirectory("graft-aebuild").toString
    val aconfig =
      """{"name": "events-rfae",
        |  "dataset": {"tags": ["click", "view", "purchase"],
        |              "resolution": "1 hour",
        |              "tag_col": "event_type", "value_col": "value"},
        |  "model": {"type": "autoencoder", "hidden": 8, "threshold_pctl": 0.95,
        |            "seed": 7},
        |  "evaluation": {"n_splits": 2}}""".stripMargin
    val result = ModelBuilder.buildAutoEncoder(spark, aconfig, events, out)
    assert(result.metadata.contains("\"type\": \"autoencoder\""))
    assert(result.metadata.contains("val_mean_score"))
    assert(result.model.threshold > 0)
    // reloaded model == a direct fit with the same config on the same data
    val (wide, tags) = ModelBuilder.dataset(events,
      Map("dataset" -> Map(
        "tags" -> Seq("click", "view", "purchase"), "resolution" -> "1 hour",
        "tag_col" -> "event_type", "value_col" -> "value")))
    val direct = AutoEncoder.fit(wide, tags, hidden = 8, pctl = 0.95, seed = 7L)
    assert(result.model.beta.flatten.toSeq == direct.beta.flatten.toSeq)
    assert(result.model.threshold == direct.threshold)
    // second build of the same config is a registry hit
    val again = ModelBuilder.buildAutoEncoder(spark, aconfig, events, out)
    assert(again.path == result.path)
  }

  test("buildAll isolates per-machine failures and dedupes via the registry") {
    val out = java.nio.file.Files.createTempDirectory("graft-fleet").toString
    val bad = """{"name": "broken", "dataset": {"tags": "not-a-list"}}"""
    val second = config.replace("events-anomaly", "events-anomaly-2")
    val (ok, failed) = ModelBuilder.buildAll(
      spark, Seq(config, bad, second, config), events, out)
    assert(ok.length == 3) // two distinct + the duplicate (registry hit)
    assert(ok.head.path == ok(2).path) // duplicate config -> same artifact
    assert(failed.length == 1 && failed.head._1 == bad)
  }

  test("rebuilding the same config is a registry hit (no new artifact)") {
    val out = java.nio.file.Files.createTempDirectory("graft-build2").toString
    val r1 = ModelBuilder.build(spark, config, events, out)
    val mtime = java.nio.file.Files.getLastModifiedTime(
      java.nio.file.Paths.get(r1.path, "metadata.json"))
    val r2 = ModelBuilder.build(spark, config, events, out)
    assert(r1.path == r2.path)
    assert(java.nio.file.Files.getLastModifiedTime(
      java.nio.file.Paths.get(r2.path, "metadata.json")) == mtime)
  }
}
