package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Record-linkage scoring beyond edit distance: Jaro-Winkler entity
  * resolution (the reference's data-cleaning surface stops at exact tag
  * matching — public repo, mount empty per SURVEY.md §0 — so this family
  * generalizes `join_fuzzy`'s Levenshtein blocking to the census-bureau
  * metric record linkage actually ships).
  *
  * Scale shape (the part that matters at 100 TB): scoring runs over the
  * DISTINCT value vocabulary, not the corpus — names/titles/brands are
  * Zipfian, so `select distinct` collapses billions of rows to a
  * vocab-sized table BEFORE any pairing, and the blocked self-join's
  * quadratic is bounded per block over that vocab. Matched name pairs
  * then re-join to corpus rows by equality (hash join, linear). The
  * distinct + block + re-join decomposition is exactly
  * [[Dedup.fuzzyPairs]]'s discipline one level up.
  */
object Linkage {

  /** Jaro-Winkler similarity column (native codegen expression —
    * [[graft.expressions.JaroWinklerSim]]; classic Winkler semantics,
    * bit-identical to the oracle engine's `jaro_winkler_similarity`,
    * fuzz-verified on 30k random pairs).
    */
  def jaroWinkler(a: Column, b: Column): Column =
    org.apache.spark.sql.graft.Bridge.column(
      graft.expressions.JaroWinklerSim(
        org.apache.spark.sql.graft.Bridge.expression(a),
        org.apache.spark.sql.graft.Bridge.expression(b)))

  /** Blocked Jaro-Winkler candidate pairs over the DISTINCT values of
    * `nameCol`: rows sharing `blockExpr` pair up (lexicographic a < b),
    * pairs scoring below `minSim` drop. Both sides repartition on the
    * block key by the session's shuffle parallelism for the same
    * AQE-coalescer reason documented at [[Dedup.fuzzyPairs]]: the
    * exchange moves vocab-sized bytes but buys block-parallel O(block²)
    * scoring CPU.
    */
  def jwPairs(df: DataFrame, nameCol: String, blockExpr: Column,
      minSim: Double): DataFrame = {
    val n = df.sparkSession.sessionState.conf.numShufflePartitions
    val names = df.select(col(nameCol).as("name")).distinct()
      .withColumn("blk", blockExpr)
    val a = names.select(col("blk"), col("name").as("name_a")).repartition(n, col("blk"))
    val b = names.select(col("blk"), col("name").as("name_b")).repartition(n, col("blk"))
    a.join(b, Seq("blk")).filter(col("name_a") < col("name_b"))
      .withColumn("jw", jaroWinkler(col("name_a"), col("name_b")))
      .filter(col("jw") >= minSim)
      .select(col("name_a"), col("name_b"), round(col("jw"), 6).as("jw"))
  }
}
