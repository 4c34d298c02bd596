package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) compaction layout — the multi-dimensional
  * cousin of `repartitionByRange(ts)` compaction: files get TIGHT min/max
  * parquet statistics on TWO columns at once, so scans filtering on
  * either dimension (or both) skip whole files/row groups. A time-sorted
  * layout prunes time predicates perfectly but leaves every file spanning
  * the full key domain; interleaving the bits of both normalized
  * dimensions puts rows that are close in (ts, user_id) space into the
  * same file. The pattern is standard lake maintenance (Delta/Iceberg
  * `OPTIMIZE ZORDER BY`, public docs; the curve itself is Morton 1966).
  *
  * Cost at 100 TB is the SAME as linear compaction: one narrow min/max
  * aggregate (4 scalars to the driver — bounded), a map-side z-value
  * projection, one range shuffle, per-partition sort, write. Nothing
  * quadratic, nothing driver-sided, no skew sensitivity beyond what
  * `repartitionByRange`'s sampler already handles.
  */
object ZOrder {

  /** Morton interleave of two 16-bit values held in long columns:
    * bit i of `a` lands at position 2i, bit i of `b` at 2i+1 — a 32-bit
    * z-value. 16 bits per dimension is the standard file-clustering
    * granularity: 65536 cells per axis is far finer than any realistic
    * file count, and the whole fold stays in one small codegen span.
    */
  def morton16(a: Column, b: Column): Column =
    (0 until 16).map { i =>
      shiftleft(shiftright(a, i).bitwiseAND(lit(1L)), 2 * i) +
        shiftleft(shiftright(b, i).bitwiseAND(lit(1L)), 2 * i + 1)
    }.reduce(_ + _)

  /** Normalize a numeric column to [0, 65535] given its min/max (a
    * degenerate domain maps to 0 — one distinct value needs no bits).
    */
  private def norm16(c: Column, mn: Double, mx: Double): Column =
    if (mx <= mn) lit(0L)
    else ((c.cast("double") - lit(mn)) * lit(65535.0 / (mx - mn)))
      .cast("long")

  /** Lay `df` out as `nFiles` files z-ordered on (`colA`, `colB`).
    * Both columns must be numeric-comparable (timestamps: pass
    * `Events.epochMicros(col)` / `unix_micros(col.cast("timestamp"))` —
    * a bare `unix_micros(col)` rejects TIMESTAMP_NTZ at analysis time,
    * the fixture-generation trap; see sources/Events).
    *
    * The min/max aggregate runs once (4 scalars); rows are then range-
    * partitioned and sorted by z-value, so each file covers one z-curve
    * segment — a roughly square tile in normalized (A, B) space, giving
    * BOTH columns per-file spans of ~domain/√nFiles instead of the
    * sorted dimension getting domain/nFiles and the other the full
    * domain.
    */
  def layout(df: DataFrame, colA: Column, colB: Column, nFiles: Int): DataFrame = {
    require(!df.columns.contains("__z"),
      "zorder layout uses a scratch '__z' column; input already has one")
    val row = df.agg(
      min(colA.cast("double")), max(colA.cast("double")),
      min(colB.cast("double")), max(colB.cast("double"))).head()
    require(!row.isNullAt(0) && !row.isNullAt(2),
      "zorder layout needs non-null min/max on both columns")
    val z = morton16(
      norm16(colA, row.getDouble(0), row.getDouble(1)),
      norm16(colB, row.getDouble(2), row.getDouble(3)))
    df.withColumn("__z", z)
      .repartitionByRange(nFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
  }
}
