package graft.ml

import java.nio.file.{Files, Paths}

import org.apache.spark.ml.PipelineModel
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.json4s._
import org.json4s.jackson.JsonMethods

import graft.ops.{Filters, Timeseries}

/** The `gordo-components build` analogue (reference trace SURVEY.md §3.1:
  * `cli/cli.py::build` → `builder/build_model.py::build_model` →
  * `TimeSeriesDataset.get_data` → pipeline fit → CV → metadata dump;
  * public repo, mount empty §0) — re-expressed as ONE SparkSession job:
  *
  *   long scan → resample+align (one shuffle) → row filter → CV folds
  *   (ts-range filters) → MLlib fit → threshold agg → artifact + metadata.
  *
  * The reference's per-machine pod, ThreadPool tag downloads, and chunked
  * client loop all collapse into Spark task scheduling. The md5 build
  * cache (`provide_saved_model`) survives as DiskRegistry.
  *
  * Machine config (JSON; YAML parses to the same tree):
  * {{{
  * { "name": "m1",
  *   "dataset": { "tags": ["click","view"], "resolution": "10 minutes",
  *                "row_filter": "`click` > 0" },
  *   "model": { "k": 2, "threshold_pctl": 0.99 },
  *   "evaluation": { "n_splits": 3 } }
  * }}}
  */
object ModelBuilder {

  case class BuildResult(path: String, model: PcaAnomalyModel, metadata: String)

  /** Build the wide feature matrix from a long-format frame per the
    * dataset config — the `TimeSeriesDataset.get_data` analogue.
    */
  def dataset(longDf: DataFrame, cfg: Map[String, Any]): (DataFrame, Seq[String]) = {
    val ds = obj(cfg, "dataset")
    val tags = strList(ds, "tags")
    val resolution = ds.getOrElse("resolution", "10 minutes").toString
    val tsCol = ds.getOrElse("ts_col", "ts").toString
    val tagCol = ds.getOrElse("tag_col", "tag").toString
    val valueCol = ds.getOrElse("value_col", "value").toString
    var wide = Timeseries.align(longDf, tsCol, tagCol, valueCol, tags, resolution)
    ds.get("row_filter").foreach(f => wide = Filters.rowFilter(wide, f.toString))
    (wide, tags)
  }

  /** Full build: dataset → expanding-window CV (per-fold threshold +
    * score stats on strictly-later validation data) → final fit on all
    * data → model + metadata.json under `outDir/<name>/`, registered in
    * the content-addressed cache (a config re-build is a registry hit and
    * does no Spark work).
    */
  def build(spark: SparkSession, configJson: String, longDf: DataFrame,
      outDir: String): BuildResult = {
    val cfg = parse(configJson)
    val name = cfg.getOrElse("name", "machine").toString
    val registry = DiskRegistry(s"$outDir/registry")
    // the registry key carries the BUILDER kind: the same config routed
    // through a different builder must never hit this builder's artifact
    val regKey = s"pca_anomaly\n$configJson"

    val path = registry.getOrBuild(regKey) {
      val (wide, tags) = dataset(longDf, cfg)
      val model = obj(cfg, "model")
      val k = intOf(model, "k", 2)
      val pctl = model.get("threshold_pctl").map(_.toString.toDouble).getOrElse(0.99)
      val nSplits = intOf(obj(cfg, "evaluation"), "n_splits", 3)

      val folds = TimeSeriesCV.folds(wide, "bucket", nSplits)
      val foldMeta = folds.zipWithIndex.map { case ((train, valid), i) =>
        val m = PcaAnomaly.fit(train, tags, k, pctl)
        val stats = m.score(valid).agg(
          count(lit(1)).as("n"),
          avg(col("anomaly_score")).as("mean_score"),
          max(col("anomaly_score")).as("max_score")).head()
        s"""{"fold": $i, "threshold": ${jnum(m.threshold)}, "val_rows": ${stats.getLong(0)},
           | "val_mean_score": ${jnumAt(stats, "mean_score")},
           | "val_max_score": ${jnumAt(stats, "max_score")}}""".stripMargin
          .replaceAll("\n", "")
      }

      val finalModel = PcaAnomaly.fit(wide, tags, k, pctl)
      // artifact dir carries the config key: two configs sharing a `name`
      // must not overwrite (and then serve) each other's artifacts
      val dir = Paths.get(outDir, s"$name-${registry.key(regKey).take(8)}")
      Files.createDirectories(dir)
      finalModel.pipeline.write.overwrite().save(dir.resolve("model").toString)
      val metadata =
        s"""{"name": ${jstr(name)},
           | "tags": [${tags.map(jstr).mkString(", ")}],
           | "resolution": ${jstr(resolutionOf(cfg))},
           | "rows": ${wide.count()},
           | "model": {"type": "pca_anomaly", "k": $k, "threshold": ${jnum(finalModel.threshold)},
           |           "threshold_pctl": $pctl},
           | "cv": [${foldMeta.mkString(", ")}],
           | "config_key": "${registry.key(regKey)}"}""".stripMargin
      Files.writeString(dir.resolve("metadata.json"), metadata)
      Files.writeString(dir.resolve("threshold.txt"), finalModel.threshold.toString)
      dir.toString
    }

    val threshold = Files.readString(Paths.get(path, "threshold.txt")).trim.toDouble
    val pipeline = PipelineModel.load(Paths.get(path, "model").toString)
    BuildResult(path, PcaAnomalyModel(pipeline, threshold),
      Files.readString(Paths.get(path, "metadata.json")))
  }

  case class ForecastBuildResult(path: String,
      model: Forecast.KeyedForecastModel, metadata: String)

  /** Config-driven FORECAST build (`model.type: "ar_forecast"`) — same
    * lifecycle as `build` but for the trainable per-tag forecaster: keyed
    * long resample → expanding-window CV (per-fold fleet fit + strictly
    * later validation MAE) → final one-shuffle fleet fit → coefficient
    * table + metadata under `outDir/<name>/`, registry-cached.
    *
    * Config: `{ "name": ..., "dataset": {"tags": [...], "resolution":
    * "10 minutes"}, "model": {"type": "ar_forecast", "lookback": 6},
    * "evaluation": {"n_splits": 3} }`
    */
  def buildForecast(spark: SparkSession, configJson: String, longDf: DataFrame,
      outDir: String): ForecastBuildResult = {
    val cfg = parse(configJson)
    val name = cfg.getOrElse("name", "machine").toString
    val registry = DiskRegistry(s"$outDir/registry")
    val ds = obj(cfg, "dataset")
    val tags = strList(ds, "tags")
    val resolution = ds.getOrElse("resolution", "10 minutes").toString
    val tsCol = ds.getOrElse("ts_col", "ts").toString
    val tagCol = ds.getOrElse("tag_col", "tag").toString
    val valueCol = ds.getOrElse("value_col", "value").toString
    val model = obj(cfg, "model")
    val lb = intOf(model, "lookback", 6)
    val nSplits = intOf(obj(cfg, "evaluation"), "n_splits", 3)
    val regKey = s"ar_forecast\n$configJson"

    val long = longDf
      .filter(col(tagCol).isin(tags: _*))
      .groupBy(Timeseries.bucket(col(tsCol), resolution).as("bucket"), col(tagCol))
      .agg(avg(col(valueCol)).as("v"))

    val path = registry.getOrBuild(regKey) {
      val foldMeta = TimeSeriesCV.folds(long, "bucket", nSplits).zipWithIndex.map {
        case ((train, valid), i) =>
          val m = Forecast.fitPerKey(train, tagCol, "v", lb, "bucket")
          val stats = m.forecast(valid, "bucket").agg(
            count(lit(1)).as("n"),
            avg(col("v_anomaly")).as("mean_abs_err"),
            max(col("v_anomaly")).as("max_abs_err")).head()
          s"""{"fold": $i, "val_rows": ${stats.getLong(0)},
             | "val_mean_abs_err": ${jnumAt(stats, "mean_abs_err")},
             | "val_max_abs_err": ${jnumAt(stats, "max_abs_err")}}""".stripMargin
            .replaceAll("\n", "")
      }
      val finalModel = Forecast.fitPerKey(long, tagCol, "v", lb, "bucket")
      // fail BEFORE anything is written/registered: an empty model (too
      // few buckets per tag for the lookback) must not poison the cache
      require(finalModel.coefs.nonEmpty,
        s"no tag had enough buckets for lookback=$lb — nothing to fit")
      val dir = Paths.get(outDir, s"$name-${registry.key(regKey).take(8)}")
      Files.createDirectories(dir)
      finalModel.toDF(spark).write.mode("overwrite").parquet(dir.resolve("model").toString)
      val metadata =
        s"""{"name": ${jstr(name)},
           | "tags": [${tags.map(jstr).mkString(", ")}],
           | "resolution": ${jstr(resolutionOf(cfg))},
           | "model": {"type": "ar_forecast", "lookback": $lb},
           | "cv": [${foldMeta.mkString(", ")}],
           | "config_key": "${registry.key(regKey)}"}""".stripMargin
      Files.writeString(dir.resolve("metadata.json"), metadata)
      dir.toString
    }

    val reloaded = Forecast.KeyedForecastModel.fromDF(
      spark.read.parquet(Paths.get(path, "model").toString))
    ForecastBuildResult(path, reloaded,
      Files.readString(Paths.get(path, "metadata.json")))
  }

  case class EsnBuildResult(path: String,
      model: EchoState.EsnModel, metadata: String)

  /** Config-driven RECURRENT forecast build (`model.type: "esn_forecast"`)
    * — the same lifecycle as `buildForecast` with the [[EchoState]]
    * reservoir in place of the linear per-tag AR fleet: keyed long
    * resample → expanding-window CV (per-fold reservoir fit + strictly
    * later validation MAE — the validation scan restarts the state from
    * zero, so the first `washout` validation steps carry the same
    * transient the fit excludes) → final fit → persisted reservoir frame
    * + metadata, registry-cached.
    *
    * Config: `{ "name": ..., "dataset": {"tags": [...], "resolution":
    * "10 minutes"}, "model": {"type": "esn_forecast", "reservoir": 64,
    * "spectral_radius": 0.9, "leak": 0.5, "washout": 10, "input_scale":
    * 0.5, "ridge": 1e-4}, "evaluation": {"n_splits": 3} }`
    */
  def buildEsn(spark: SparkSession, configJson: String, longDf: DataFrame,
      outDir: String): EsnBuildResult = {
    val cfg = parse(configJson)
    val name = cfg.getOrElse("name", "machine").toString
    val registry = DiskRegistry(s"$outDir/registry")
    val ds = obj(cfg, "dataset")
    val tags = strList(ds, "tags")
    val resolution = ds.getOrElse("resolution", "10 minutes").toString
    val tsCol = ds.getOrElse("ts_col", "ts").toString
    val tagCol = ds.getOrElse("tag_col", "tag").toString
    val valueCol = ds.getOrElse("value_col", "value").toString
    val model = obj(cfg, "model")
    val reservoir = intOf(model, "reservoir", 64)
    val rho = model.get("spectral_radius").map(_.toString.toDouble).getOrElse(0.9)
    val leak = model.get("leak").map(_.toString.toDouble).getOrElse(0.5)
    val washout = intOf(model, "washout", 10)
    val inScale = model.get("input_scale").map(_.toString.toDouble).getOrElse(0.5)
    val ridge = model.get("ridge").map(_.toString.toDouble).getOrElse(1e-4)
    val nSplits = intOf(obj(cfg, "evaluation"), "n_splits", 3)
    val regKey = s"esn_forecast\n$configJson"

    val long = longDf
      .filter(col(tagCol).isin(tags: _*))
      .groupBy(Timeseries.bucket(col(tsCol), resolution).as("bucket"), col(tagCol))
      .agg(avg(col(valueCol)).as("v"))

    def fitOn(frame: DataFrame) = EchoState.fit(frame, Seq("v"), "bucket",
      Seq(tagCol), reservoir = reservoir, ridge = ridge, spectralRadius = rho,
      leak = leak, washout = washout, inputScale = inScale)

    val path = registry.getOrBuild(regKey) {
      val foldMeta = TimeSeriesCV.folds(long, "bucket", nSplits).zipWithIndex.map {
        case ((train, valid), i) =>
          val m = fitOn(train)
          val stats = m.forecast(valid, "bucket", Seq(tagCol)).agg(
            count(lit(1)).as("n"),
            avg(col("v_anomaly")).as("mean_abs_err"),
            max(col("v_anomaly")).as("max_abs_err")).head()
          s"""{"fold": $i, "val_rows": ${stats.getLong(0)},
             | "val_mean_abs_err": ${jnumAt(stats, "mean_abs_err")},
             | "val_max_abs_err": ${jnumAt(stats, "max_abs_err")}}""".stripMargin
            .replaceAll("\n", "")
      }
      val finalModel = fitOn(long)
      val dir = Paths.get(outDir, s"$name-${registry.key(regKey).take(8)}")
      Files.createDirectories(dir)
      finalModel.toDF(spark).write.mode("overwrite")
        .parquet(dir.resolve("model").toString)
      val metadata =
        s"""{"name": ${jstr(name)},
           | "tags": [${tags.map(jstr).mkString(", ")}],
           | "resolution": ${jstr(resolutionOf(cfg))},
           | "model": {"type": "esn_forecast", "reservoir": $reservoir,
           |           "spectral_radius": $rho, "leak": $leak,
           |           "washout": $washout, "input_scale": $inScale},
           | "cv": [${foldMeta.mkString(", ")}],
           | "config_key": "${registry.key(regKey)}"}""".stripMargin
      Files.writeString(dir.resolve("metadata.json"), metadata)
      dir.toString
    }

    val reloaded = EchoState.EsnModel.fromDF(
      spark.read.parquet(Paths.get(path, "model").toString))
    EsnBuildResult(path, reloaded,
      Files.readString(Paths.get(path, "metadata.json")))
  }

  case class AutoEncoderBuildResult(path: String,
      model: AutoEncoder.RfaeModel, metadata: String)

  /** Config-driven NONLINEAR autoencoder build (`model.type:
    * "autoencoder"`) — the same lifecycle as `build` with
    * [[AutoEncoder]] in place of the PCA pipeline: dataset →
    * expanding-window CV (per-fold fit + strictly-later validation score
    * stats) → final one-pass ridge fit → persisted coefficient frame +
    * metadata, registry-cached.
    *
    * Config: `{ "name": ..., "dataset": {...}, "model": {"type":
    * "autoencoder", "hidden": 16, "ridge": 1e-3, "threshold_pctl":
    * 0.99, "seed": 42}, "evaluation": {"n_splits": 3} }`
    */
  def buildAutoEncoder(spark: SparkSession, configJson: String, longDf: DataFrame,
      outDir: String): AutoEncoderBuildResult = {
    val cfg = parse(configJson)
    val name = cfg.getOrElse("name", "machine").toString
    val registry = DiskRegistry(s"$outDir/registry")
    val regKey = s"autoencoder\n$configJson"

    val path = registry.getOrBuild(regKey) {
      val (wide, tags) = dataset(longDf, cfg)
      val model = obj(cfg, "model")
      val hidden = intOf(model, "hidden", 16)
      val ridge = model.get("ridge").map(_.toString.toDouble).getOrElse(1e-3)
      val pctl = model.get("threshold_pctl").map(_.toString.toDouble).getOrElse(0.99)
      val seed = model.get("seed").map(_.toString.toLong).getOrElse(42L)
      val nSplits = intOf(obj(cfg, "evaluation"), "n_splits", 3)

      val foldMeta = TimeSeriesCV.folds(wide, "bucket", nSplits).zipWithIndex.map {
        case ((train, valid), i) =>
          val m = AutoEncoder.fit(train, tags, hidden, ridge, pctl, seed)
          val stats = m.score(valid.na.drop("any", tags)).agg(
            count(lit(1)).as("n"),
            avg(col("anomaly_score")).as("mean_score"),
            max(col("anomaly_score")).as("max_score")).head()
          s"""{"fold": $i, "threshold": ${jnum(m.threshold)}, "val_rows": ${stats.getLong(0)},
             | "val_mean_score": ${jnumAt(stats, "mean_score")},
             | "val_max_score": ${jnumAt(stats, "max_score")}}""".stripMargin
            .replaceAll("\n", "")
      }

      val finalModel = AutoEncoder.fit(wide, tags, hidden, ridge, pctl, seed)
      val dir = Paths.get(outDir, s"$name-${registry.key(regKey).take(8)}")
      Files.createDirectories(dir)
      finalModel.toDF(spark).write.mode("overwrite")
        .parquet(dir.resolve("model").toString)
      val metadata =
        s"""{"name": ${jstr(name)},
           | "tags": [${tags.map(jstr).mkString(", ")}],
           | "resolution": ${jstr(resolutionOf(cfg))},
           | "model": {"type": "autoencoder", "hidden": $hidden, "ridge": $ridge,
           |           "threshold": ${jnum(finalModel.threshold)}, "threshold_pctl": $pctl},
           | "cv": [${foldMeta.mkString(", ")}],
           | "config_key": "${registry.key(regKey)}"}""".stripMargin
      Files.writeString(dir.resolve("metadata.json"), metadata)
      dir.toString
    }

    val reloaded = AutoEncoder.RfaeModel.fromDF(
      spark.read.parquet(Paths.get(path, "model").toString))
    AutoEncoderBuildResult(path, reloaded,
      Files.readString(Paths.get(path, "metadata.json")))
  }

  /** Config-driven GRADIENT-trained autoencoder build (`model.type:
    * "autoencoder_sgd"`) — the backprop counterpart of
    * [[buildAutoEncoder]]: same dataset/CV/threshold/registry lifecycle,
    * with [[AutoEncoderSGD]]'s distributed mini-batch descent in place of
    * the one-pass ridge solve. The persisted artifact is the SAME
    * coefficient-frame format (RfaeModel), so serving is type-agnostic.
    *
    * Config: `{ "name": ..., "dataset": {...}, "model": {"type":
    * "autoencoder_sgd", "hidden": 8, "epochs": 120, "lr": 0.05,
    * "batch_fraction": 0.5, "threshold_pctl": 0.99, "seed": 42},
    * "evaluation": {"n_splits": 3} }`
    */
  def buildAutoEncoderSgd(spark: SparkSession, configJson: String, longDf: DataFrame,
      outDir: String): AutoEncoderBuildResult = {
    val cfg = parse(configJson)
    val name = cfg.getOrElse("name", "machine").toString
    val registry = DiskRegistry(s"$outDir/registry")
    val regKey = s"autoencoder_sgd\n$configJson"

    val path = registry.getOrBuild(regKey) {
      val (wide, tags) = dataset(longDf, cfg)
      val model = obj(cfg, "model")
      val hidden = intOf(model, "hidden", 8)
      val epochs = intOf(model, "epochs", 120)
      val lr = model.get("lr").map(_.toString.toDouble).getOrElse(0.05)
      val batchFraction =
        model.get("batch_fraction").map(_.toString.toDouble).getOrElse(0.5)
      val pctl = model.get("threshold_pctl").map(_.toString.toDouble).getOrElse(0.99)
      val seed = model.get("seed").map(_.toString.toLong).getOrElse(42L)
      val nSplits = intOf(obj(cfg, "evaluation"), "n_splits", 3)

      val foldMeta = TimeSeriesCV.folds(wide, "bucket", nSplits).zipWithIndex.map {
        case ((train, valid), i) =>
          val m = AutoEncoderSGD.fit(train, tags, hidden, epochs, lr,
            batchFraction = batchFraction, pctl = pctl, seed = seed)
          val stats = m.score(valid.na.drop("any", tags)).agg(
            count(lit(1)).as("n"),
            avg(col("anomaly_score")).as("mean_score"),
            max(col("anomaly_score")).as("max_score")).head()
          s"""{"fold": $i, "threshold": ${jnum(m.threshold)}, "val_rows": ${stats.getLong(0)},
             | "val_mean_score": ${jnumAt(stats, "mean_score")},
             | "val_max_score": ${jnumAt(stats, "max_score")}}""".stripMargin
            .replaceAll("\n", "")
      }

      val (finalModel, losses) = AutoEncoderSGD.fitWithHistory(wide, tags,
        hidden, epochs, lr, batchFraction = batchFraction, pctl = pctl, seed = seed)
      val dir = Paths.get(outDir, s"$name-${registry.key(regKey).take(8)}")
      Files.createDirectories(dir)
      finalModel.toDF(spark).write.mode("overwrite")
        .parquet(dir.resolve("model").toString)
      val metadata =
        s"""{"name": ${jstr(name)},
           | "tags": [${tags.map(jstr).mkString(", ")}],
           | "resolution": ${jstr(resolutionOf(cfg))},
           | "model": {"type": "autoencoder_sgd", "hidden": $hidden,
           |           "epochs": $epochs, "lr": $lr,
           |           "threshold": ${jnum(finalModel.threshold)}, "threshold_pctl": $pctl,
           |           "train_mse_first": ${jnum(losses.head)},
           |           "train_mse_last": ${jnum(losses.last)}},
           | "cv": [${foldMeta.mkString(", ")}],
           | "config_key": "${registry.key(regKey)}"}""".stripMargin
      Files.writeString(dir.resolve("metadata.json"), metadata)
      dir.toString
    }

    val reloaded = AutoEncoder.RfaeModel.fromDF(
      spark.read.parquet(Paths.get(path, "model").toString))
    AutoEncoderBuildResult(path, reloaded,
      Files.readString(Paths.get(path, "metadata.json")))
  }

  case class SeqAeBuildResult(path: String, model: SequenceAE.SeqAeModel,
      metadata: String)

  /** Config-driven SEQUENCE autoencoder build (`model.type:
    * "autoencoder_seq"`) — the KerasLSTMAutoEncoder slot in the
    * lifecycle: same dataset/CV/threshold/registry flow, with
    * [[SequenceAE]]'s lag-embedded window model. The CV folds split the
    * WIDE frame by time exactly as the dense builds do; each fold embeds
    * its own slice, so no window ever straddles the train/validation cut
    * (the embed drops rows without lb in-slice predecessors — the same
    * boundary discipline the Keras generator gets from batching within a
    * split).
    *
    * Config: `{ "name": ..., "dataset": {...}, "model": {"type":
    * "autoencoder_seq", "lookback": 4, "hidden": 12, "epochs": 120,
    * "lr": 0.02, "batch_fraction": 0.5, "threshold_pctl": 0.99,
    * "seed": 42}, "evaluation": {"n_splits": 3} }`
    */
  def buildAutoEncoderSeq(spark: SparkSession, configJson: String, longDf: DataFrame,
      outDir: String): SeqAeBuildResult = {
    val cfg = parse(configJson)
    val name = cfg.getOrElse("name", "machine").toString
    val registry = DiskRegistry(s"$outDir/registry")
    val regKey = s"autoencoder_seq\n$configJson"

    val path = registry.getOrBuild(regKey) {
      val (wide, tags) = dataset(longDf, cfg)
      val model = obj(cfg, "model")
      val lb = intOf(model, "lookback", 4)
      val hidden = intOf(model, "hidden", 12)
      val epochs = intOf(model, "epochs", 120)
      val lr = model.get("lr").map(_.toString.toDouble).getOrElse(0.02)
      val batchFraction =
        model.get("batch_fraction").map(_.toString.toDouble).getOrElse(0.5)
      val pctl = model.get("threshold_pctl").map(_.toString.toDouble).getOrElse(0.99)
      val seed = model.get("seed").map(_.toString.toLong).getOrElse(42L)
      val nSplits = intOf(obj(cfg, "evaluation"), "n_splits", 3)

      val foldMeta = TimeSeriesCV.folds(wide, "bucket", nSplits).zipWithIndex.map {
        case ((train, valid), i) =>
          val m = SequenceAE.fit(train.na.drop("any", tags), tags, lb, "bucket",
            hidden = hidden, epochs = epochs, lr = lr,
            batchFraction = batchFraction, pctl = pctl, seed = seed)
          val stats = m.score(valid.na.drop("any", tags)).agg(
            count(lit(1)).as("n"),
            avg(col("anomaly_score")).as("mean_score"),
            max(col("anomaly_score")).as("max_score")).head()
          s"""{"fold": $i, "threshold": ${jnum(m.threshold)}, "val_rows": ${stats.getLong(0)},
             | "val_mean_score": ${jnumAt(stats, "mean_score")},
             | "val_max_score": ${jnumAt(stats, "max_score")}}""".stripMargin
            .replaceAll("\n", "")
      }

      val (finalModel, losses) = SequenceAE.fitWithHistory(
        wide.na.drop("any", tags), tags, lb, "bucket",
        hidden = hidden, epochs = epochs, lr = lr,
        batchFraction = batchFraction, pctl = pctl, seed = seed)
      val dir = Paths.get(outDir, s"$name-${registry.key(regKey).take(8)}")
      Files.createDirectories(dir)
      finalModel.toDF(spark).write.mode("overwrite")
        .parquet(dir.resolve("model").toString)
      val metadata =
        s"""{"name": ${jstr(name)},
           | "tags": [${tags.map(jstr).mkString(", ")}],
           | "resolution": ${jstr(resolutionOf(cfg))},
           | "model": {"type": "autoencoder_seq", "lookback": $lb,
           |           "hidden": $hidden, "epochs": $epochs, "lr": $lr,
           |           "threshold": ${jnum(finalModel.threshold)}, "threshold_pctl": $pctl,
           |           "train_mse_first": ${jnum(losses.head)},
           |           "train_mse_last": ${jnum(losses.last)}},
           | "cv": [${foldMeta.mkString(", ")}],
           | "config_key": "${registry.key(regKey)}"}""".stripMargin
      Files.writeString(dir.resolve("metadata.json"), metadata)
      dir.toString
    }

    val reloaded = SequenceAE.SeqAeModel.fromDF(
      spark.read.parquet(Paths.get(path, "model").toString))
    SeqAeBuildResult(path, reloaded,
      Files.readString(Paths.get(path, "metadata.json")))
  }

  /** Fleet build — the workflow-generator analogue (SURVEY.md §3.1: one
    * Argo pod per machine, thousands of machines). Here each machine is a
    * sequence of Spark jobs inside ONE session; the registry dedupes
    * already-built configs across the fleet, and failures are isolated
    * per machine (a broken config doesn't sink the fleet — it lands in
    * the error list, like a failed Argo step).
    */
  def buildAll(spark: SparkSession, configs: Seq[String], longDf: DataFrame,
      outDir: String): (Seq[BuildResult], Seq[(String, Throwable)]) = {
    val results = configs.map { cfg =>
      try Right(build(spark, cfg, longDf, outDir))
      catch { case e: Throwable => Left(cfg -> e) }
    }
    (results.collect { case Right(r) => r }, results.collect { case Left(f) => f })
  }

  /** Bulk scoring over a time range — the `client predict` analogue
    * (SURVEY.md §3.3): one lazy plan, no chunking/retry loop.
    */
  def predict(result: BuildResult, longDf: DataFrame, cfg: String): DataFrame = {
    val (wide, _) = dataset(longDf, parse(cfg))
    result.model.anomaly(wide)
  }

  // -- metadata JSON emission ---------------------------------------------

  /** JSON string literal with full escaping — a machine name containing a
    * quote must not produce an unparseable metadata.json AFTER the
    * artifact is already registered.
    */
  /** The dataset resolution a config builds at — metadata.json records it
    * so serve/client can align requests to the trained granularity.
    */
  private def resolutionOf(cfg: Map[String, Any]): String =
    obj(cfg, "dataset").getOrElse("resolution", "10 minutes").toString

  private def jstr(s: String): String = Serve.jsonString(s)

  /** JSON number: NaN/Infinity (possible in degenerate CV stats) → null. */
  private def jnum(d: Double): String =
    if (d.isNaN || d.isInfinite) "null" else d.toString

  /** Aggregate field → JSON number; SQL NULL (empty validation fold) →
    * JSON null. `getAs[Double]` alone would unbox NULL to 0.0 and record
    * a fabricated score.
    */
  private def jnumAt(r: org.apache.spark.sql.Row, field: String): String =
    if (r.isNullAt(r.fieldIndex(field))) "null" else jnum(r.getAs[Double](field))

  // -- config plumbing ----------------------------------------------------

  private def parse(json: String): Map[String, Any] =
    toPlain(JsonMethods.parse(json)).asInstanceOf[Map[String, Any]]

  private def toPlain(v: JValue): Any = v match {
    case JObject(fields) => fields.map { case (k, x) => k -> toPlain(x) }.toMap
    case JArray(items) => items.map(toPlain)
    case JString(s) => s
    case JInt(i) => i.toInt
    case JLong(l) => l
    case JDouble(d) => d
    case JDecimal(d) => d.toDouble
    case JBool(b) => b
    case JNull | JNothing => null
  }

  private def obj(m: Map[String, Any], k: String): Map[String, Any] = m.get(k) match {
    case Some(o: Map[_, _]) => o.asInstanceOf[Map[String, Any]]
    case _ => Map.empty
  }
  private def strList(m: Map[String, Any], k: String): Seq[String] = m.get(k) match {
    case Some(s: Seq[_]) => s.map(_.toString)
    case _ => throw new IllegalArgumentException(s"dataset.$k must be a string list")
  }
  private def intOf(m: Map[String, Any], k: String, default: Int): Int =
    m.get(k).map(_.toString.toInt).getOrElse(default)
}
