package graft.ml

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Request/response prediction surface — the reference's
  * `server/views/base.py::BaseModelView.post` analogue (public repo; mount
  * empty, SURVEY.md §0): POST /prediction receives an X payload of
  * records, returns per-row anomaly output. This environment has no HTTP
  * framework, so the surface is (model, JSON payload) → response frame /
  * JSON — an HTTP shim would wrap these 1:1; everything data-shaped is
  * real.
  *
  * Contract notes mirrored from the reference: records parse against an
  * EXPLICIT schema (no inference scan — a request must not cost two
  * passes), unknown fields are ignored, missing tags surface as nulls and
  * score as anomalous-null rather than crashing, and the response carries
  * the total anomaly, the threshold verdict, and per-tag error columns.
  */
object Serve {

  /** Explicit request schema: optional `ts` + one double per tag. */
  def requestSchema(tags: Seq[String], tsCol: String = "ts"): StructType =
    StructType(StructField(tsCol, TimestampType, nullable = true) +:
      tags.map(t => StructField(t, DoubleType, nullable = true)))

  /** Parse a JSON-array payload ("[{...}, {...}]") into the X frame. */
  def parseRequest(spark: SparkSession, json: String, tags: Seq[String],
      tsCol: String = "ts"): DataFrame = {
    import spark.implicits._
    spark.createDataset(Seq(json)).toDF("__body")
      .select(explode(from_json(col("__body"), ArrayType(requestSchema(tags, tsCol)))).as("r"))
      .select(col("r.*"))
  }

  /** Score a request payload: total anomaly + threshold verdict + per-tag
    * decomposition — the reference's prediction frame columns.
    */
  def scoreRequest(spark: SparkSession, model: PcaAnomalyModel, json: String,
      tags: Seq[String], tsCol: String = "ts"): DataFrame = {
    val x = parseRequest(spark, json, tags, tsCol).na.drop("any", tags)
    val scored = PcaAnomaly.perTagScores(model, x, tags)
    scored
      .withColumn("anomalous", col("anomaly_score") > lit(model.threshold))
  }

  /** Response as a JSON-lines string (what the HTTP shim would write). */
  def toJsonResponse(response: DataFrame): String =
    response.toJSON.collect().mkString("[", ",", "]")
}
