package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot keys: salted two-stage aggregation.
  *
  * A plain `groupBy(key)` sends every row of a hot key to one reduce task.
  * Salting splits each key into `salts` sub-keys for a balanced partial
  * aggregate, then combines partials in a second (tiny) aggregate keyed on
  * the original key. Two shuffles, both balanced — the standard trade at
  * 100 TB when AQE skew handling isn't enough (AQE only splits skewed
  * JOIN partitions, not aggregation keys; map-side partial aggregation
  * already helps, salting guarantees it).
  *
  * Aggregates are expressed as (partial, combine) pairs so algebraic
  * functions (sum/count/min/max/avg) compose exactly.
  */
object Skew {

  /** Salted sum/count/min/max/avg of `valueCol` per `keyCols`. Result is
    * identical to the direct groupBy (asserted in specs); only the
    * physical distribution differs.
    */
  def saltedStats(df: DataFrame, keyCols: Seq[String], valueCol: String,
      salts: Int = 16): DataFrame = {
    // monotonically_increasing_id already embeds the partition id
    // (partitionId << 33), so it alone cycles 0..salts-1 evenly per task
    val keyed = df.withColumn("__salt", pmod(monotonically_increasing_id(), lit(salts)))
    val partial = keyed
      .groupBy((keyCols :+ "__salt").map(col): _*)
      .agg(
        sum(col(valueCol)).as("__sum"),
        count(col(valueCol)).as("__cnt"),
        min(col(valueCol)).as("__min"),
        max(col(valueCol)).as("__max"))
    partial
      .groupBy(keyCols.map(col): _*)
      .agg(
        sum(col("__sum")).as("sum"),
        sum(col("__cnt")).as("cnt"),
        min(col("__min")).as("min"),
        max(col("__max")).as("max"))
      .withColumn("avg", col("sum") / col("cnt"))
  }

  /** Salt one side of a skewed equi-join: replicate the small side per
    * salt value, salt the big side's rows randomly-but-deterministically,
    * join on (key, salt). The hot key's rows spread over `salts` tasks.
    */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String, salts: Int = 16): DataFrame = {
    val bigSalted = big.withColumn("__salt",
      pmod(monotonically_increasing_id(), lit(salts)))
    val smallReplicated = small.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1)))).withColumn("__salt", col("__salt").cast("long"))
    bigSalted.join(smallReplicated, Seq(key, "__salt")).drop("__salt")
  }
}
