package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Sensor-tag sources: the reference's data-provider layer re-expressed as
  * Spark readers that all land in ONE canonical long format
  * `(ts timestamp, tag string, value double)` — the input contract of
  * `graft.ops.Timeseries.align`.
  *
  * Reference analogues (public repo; mount empty, SURVEY.md §0):
  *   - `data_provider/ncs_reader.py::NcsReader.read_tag_files`: per-tag,
  *     per-year parquet/CSV files `{tag}_{year}.parquet` from a data lake;
  *   - `iroc_reader.py::read_iroc_file`: multi-tag CSV with a tag column.
  *
  * Scale notes: explicit path construction per (tag, year) is the
  * partition-pruning story — Spark lists and splits only the requested
  * files, and the per-file tag is reattached from the file path (one
  * regexp on `input_file_name`, no per-tag driver loop over reads). A
  * missing (tag, year) file is skipped silently, mirroring the
  * reference's "tags with no data" behavior (surface via `missingTags`).
  */
object TagSources {

  val csvSchema: StructType = StructType(Seq(
    StructField("ts", TimestampType, nullable = true),
    StructField("value", DoubleType, nullable = true)))

  /** Existence via Hadoop FileSystem, not java.io.File — the path may live
    * on any supported filesystem (object store, HDFS), and the session's
    * Hadoop conf carries the credentials/scheme mapping.
    */
  private def pathExists(spark: SparkSession, p: String): Boolean = {
    val hp = new org.apache.hadoop.fs.Path(p)
    hp.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(hp)
  }

  /** Per-tag/per-year parquet layout: `dir/{tag}_{year}.parquet`, each file
    * holding (ts, value). All requested files go into a single multi-path
    * scan; the tag comes back out of the file name.
    */
  def readTagParquet(spark: SparkSession, dir: String, tags: Seq[String],
      years: Seq[Int]): DataFrame = {
    val paths = for (t <- tags; y <- years) yield s"$dir/${t}_$y.parquet"
    val existing = paths.filter(p => pathExists(spark, p))
    if (existing.isEmpty) {
      return spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        csvSchema.add("tag", StringType))
    }
    // input_file_name() is a percent-encoded URI: "pump 01" arrives as
    // "pump%2001" and would silently match nothing downstream. Decode via
    // url_decode, protecting literal '+' first (URI paths keep '+' as-is,
    // but url_decode applies the form rule '+'→space). The greedy ".*/"
    // pins the match to the LAST path segment of that shape — an ancestor
    // directory named like a tag file can't hijack the extraction; the
    // stem itself isn't end-anchored because {tag}_{year}.parquet may be a
    // directory of part files.
    val decoded = url_decode(regexp_replace(input_file_name(), "\\+", "%2B"))
    spark.read.parquet(existing: _*)
      .withColumn("tag", regexp_extract(decoded, ".*/([^/]+)_\\d{4}\\.parquet", 1))
  }

  /** Hive-layout year lake (`dir/year=YYYY/…parquet`): the time range
    * derives a filter on the `year` PARTITION column, so Catalyst prunes
    * whole year directories at file-listing time — the scan never even
    * enumerates non-matching years' files (`PartitionFilters` in the
    * plan, asserted in PlanAuditSpec). The companion of
    * [[readTagParquet]]'s per-file `{tag}_{year}.parquet` enumeration:
    * same year-bounded I/O guarantee, expressed through Catalyst instead
    * of path construction — at a decade-deep 100 TB lake either form
    * reads only the queried years.
    */
  def readYearPartitioned(spark: SparkSession, dir: String,
      from: java.sql.Timestamp, to: java.sql.Timestamp,
      tsCol: String = "ts"): DataFrame = {
    // Year bounds in the SESSION timezone — the zone `year(ts)` used when
    // the partition values were written. toLocalDateTime would use the
    // JVM default zone: when that differs from the session zone, a
    // boundary instant maps to the wrong year and a matching partition
    // is pruned away — silent data loss, not a perf bug.
    val zone = java.time.ZoneId.of(
      spark.conf.get("spark.sql.session.timeZone",
        java.util.TimeZone.getDefault.getID))
    val y0 = from.toInstant.atZone(zone).getYear
    // `to` is exclusive; an exact year boundary keeps one extra (empty
    // after the row filter) year rather than risking an off-by-one
    val y1 = to.toInstant.atZone(zone).getYear
    spark.read.parquet(dir)
      .filter(col("year") >= y0 && col("year") <= y1) // partition pruning
      .filter(col(tsCol) >= lit(from) && col(tsCol) < lit(to)) // row pushdown
  }

  /** NcsReader CSV branch: `;`-separated (ts, value) per-tag files with an
    * explicit schema (never inferred — inference is a second full scan).
    */
  def readTagCsv(spark: SparkSession, pathsByTag: Map[String, Seq[String]],
      sep: String = ";"): DataFrame = {
    val perTag = pathsByTag.toSeq.sortBy(_._1).flatMap { case (tag, paths) =>
      val existing = paths.filter(p => pathExists(spark, p))
      if (existing.isEmpty) None
      else Some(
        spark.read.option("sep", sep).schema(csvSchema).csv(existing: _*)
          .withColumn("tag", lit(tag)))
    }
    perTag.reduceOption(_ unionByName _).getOrElse(
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        csvSchema.add("tag", StringType)))
  }

  /** IROC-style multi-tag CSV: (tag, ts, value) rows, filtered to the
    * requested tag list at the scan.
    */
  def readIrocCsv(spark: SparkSession, paths: Seq[String], tags: Seq[String],
      sep: String = ","): DataFrame = {
    val schema = StructType(Seq(
      StructField("tag", StringType, nullable = true),
      StructField("ts", TimestampType, nullable = true),
      StructField("value", DoubleType, nullable = true)))
    spark.read.option("sep", sep).schema(schema).csv(paths: _*)
      .filter(col("tag").isin(tags: _*))
      .select("ts", "value", "tag")
  }

  /** RandomDataProvider analogue (`data_provider/providers.py::
    * RandomDataProvider`): a deterministic pseudo-random series per tag for
    * tests and load generation. Values are md5-derived uniforms in [0, 1)
    * — portable determinism (identical in any engine computing the same
    * md5 arithmetic; the same trick as the LSH hyperplanes), unlike
    * `rand(seed)` whose stream is engine-private. Generated distributed
    * (`spark.range`), never on the driver.
    */
  def randomSeries(spark: SparkSession, tags: Seq[String], n: Long,
      startEpochSec: Long, stepSeconds: Long): DataFrame = {
    import spark.implicits._
    spark.range(n).toDF("i")
      .crossJoin(broadcast(tags.toDF("tag")))
      .select(col("tag"), col("i"),
        expr(s"timestamp_micros((${startEpochSec}L + i * ${stepSeconds}L) * 1000000L)").as("ts"),
        (conv(substring(md5(concat_ws("#", col("tag"), col("i"))), 1, 15), 16, 10)
          .cast("long").cast("double") / lit(1152921504606846976.0)).as("value")) // 2^60
  }

  /** Tags from the request list that yielded no rows — the dataset-metadata
    * "missing tags" report (anti-join semantics, distributed).
    */
  def missingTags(spark: SparkSession, longDf: DataFrame, requested: Seq[String]): DataFrame = {
    import spark.implicits._
    requested.toDF("tag").join(longDf.select("tag").distinct(), Seq("tag"), "left_anti")
  }
}
