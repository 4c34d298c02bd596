package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling for training-data curation.
  *
  * `rand(seed)` samples depend on partitioning and row order — re-running
  * on a different cluster layout selects DIFFERENT rows, which poisons
  * dataset reproducibility. Hashing the row's id instead makes membership
  * a pure function of the data: stable across runs, engines, partition
  * counts, and incremental re-ingestion (a doc keeps its verdict when new
  * data arrives). The same md5 arithmetic runs in any engine, so sampling
  * is oracle-checkable.
  *
  * North-star extension (not in the reference). Scale shape: a narrow
  * filter over the scan — no shuffle, no state; stratified rates are a
  * literal CASE over the stratum column.
  */
object Sampling {

  private val Buckets = 1000000L // hash space for rate resolution 1e-6

  /** Uniform bucket in [0, 1e6) from the id — md5-derived like the LSH
    * planes and `randomSeries`; mirror in SQL as
    * `CAST(('0x'||substr(md5(id),1,15)) AS BIGINT) % 1000000`.
    */
  def hashBucket(id: Column): Column =
    pmod(conv(substring(md5(id.cast("string")), 1, 15), 16, 10).cast("long"), lit(Buckets))

  /** Keep ~`fraction` of rows, deterministically by id. */
  def hashSample(df: DataFrame, idCol: String, fraction: Double): DataFrame = {
    require(fraction >= 0 && fraction <= 1, "fraction must be in [0,1]")
    df.filter(hashBucket(col(idCol)) < lit((fraction * Buckets).toLong))
  }

  /** Per-stratum rates (e.g. downsample dominant languages): strata not
    * listed get `defaultFraction`.
    */
  def stratifiedSample(df: DataFrame, idCol: String, strataCol: String,
      fractions: Map[String, Double], defaultFraction: Double = 0.0): DataFrame = {
    (fractions.values.toSeq :+ defaultFraction).foreach(f =>
      require(f >= 0 && f <= 1, s"fractions must be in [0,1], got $f"))
    val threshold = fractions.toSeq.sortBy(_._1)
      .foldLeft(lit((defaultFraction * Buckets).toLong)) { case (acc, (stratum, f)) =>
        when(col(strataCol) === stratum, lit((f * Buckets).toLong)).otherwise(acc)
      }
    df.filter(hashBucket(col(idCol)) < threshold)
  }
}
