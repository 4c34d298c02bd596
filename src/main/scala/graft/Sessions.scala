package graft

import org.apache.spark.sql.SparkSession

/** Canonical session configuration for graft jobs — the settings every
  * deployment should start from, sized by `cores` (= executor-core total
  * on a cluster; on local[n], n).
  */
object Sessions {

  def builder(master: String, cores: Int): SparkSession.Builder =
    SparkSession.builder()
      .master(master)
      .withExtensions(new GraftExtensions) // graft_dot etc. in SQL
      .config("spark.sql.session.timeZone", "UTC") // tz-aware discipline
      // shuffle partitions ≈ core count at these scales; AQE coalesces
      // further down when partitions run small
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      // events-style ns-timestamp parquet reads as long (see SparkEntry.E)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")

  def local(cores: Int = Runtime.getRuntime.availableProcessors()): SparkSession =
    builder(s"local[$cores]", cores)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
}
