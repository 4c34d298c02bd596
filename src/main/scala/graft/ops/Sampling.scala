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

  /** IMPORTANCE sampling by a per-row integer weight in [0, 1e6]: keep
    * the row iff its md5 bucket < weight, i.e. with acceptance
    * probability weight/1e6 — the quality-weighted acceptance of
    * published curation recipes ("sample high-quality documents more")
    * under the repo's RNG-free discipline: membership is a pure function
    * of the id, reproducible across runs/engines/partition layouts, and
    * MONOTONE in the weight (raising a row's weight never evicts it —
    * re-curation with a better quality model only adds rows). Weights
    * above 1e6 clamp to certain acceptance. Pure scan filter, pushdown-
    * safe, no shuffle.
    */
  def importanceSample(df: DataFrame, idCol: String, weightBuckets: Column): DataFrame =
    df.filter(hashBucket(col(idCol)) < least(lit(Buckets), weightBuckets))

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

  /** Data-MIXING rates — downsample strata to hit target PROPORTIONS
    * (the domain-reweighting stage of training-data recipes: "the mix
    * should be 60% web, 30% code, 10% papers"): the largest feasible
    * total is T = min_s(n_s / p_s) — the scarcest-relative-to-target
    * stratum is kept (approximately) whole and every other stratum
    * downsamples to p_s·T. Shares need not sum to 1 (scaling all of them
    * cancels out of the rates). Strata not in `targets` are dropped.
    *
    * Membership uses the same deterministic md5 bucket as
    * [[stratifiedSample]] — rate-accurate (binomial around p_s·T),
    * reproducible across runs/engines/layouts, and oracle-checkable
    * because the rate arithmetic below is mirrored operation-for-
    * operation in SQL. The per-stratum counts collect |targets| scalars
    * to the driver (bounded by the explicit target map, never data-sized).
    */
  def targetMix(df: DataFrame, idCol: String, strataCol: String,
      targets: Map[String, Double]): DataFrame = {
    require(targets.nonEmpty, "targets must name at least one stratum")
    targets.values.foreach(p => require(p > 0, s"target shares must be positive, got $p"))
    val counts = df.filter(col(strataCol).isin(targets.keys.toSeq: _*))
      .groupBy(strataCol).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    targets.keys.foreach(s =>
      require(counts.getOrElse(s, 0L) > 0L, s"target stratum '$s' has no rows"))
    val feasibleTotal = targets.map { case (s, p) => counts(s).toDouble / p }.min
    // IEEE op order (p * T / n) * 1e6, floor — mirrored verbatim in the
    // oracle SQL so thresholds are bit-identical across engines
    val thresholds = targets.map { case (s, p) =>
      s -> math.floor(p * feasibleTotal / counts(s).toDouble * 1000000).toLong
    }
    val thrExpr = thresholds.toSeq.sortBy(_._1)
      .foldLeft(lit(-1L)) { case (acc, (s, t)) => // untargeted strata keep nothing
        when(col(strataCol) === s, lit(t)).otherwise(acc)
      }
    df.filter(hashBucket(col(idCol)) < thrExpr)
  }

  /** Per-source cap — the curation stage that stops one domain/source from
    * dominating the mix (cap documents per stratum; the "no more than N
    * pages per site" rule of web-corpus pipelines): keep at most `cap`
    * rows per stratum, selected in deterministic md5(id) order. Hash
    * order makes the kept set a pure function of the data (a uniform
    * random draw without an RNG — stable across runs, engines, and
    * layouts) and NESTED: the cap-k survivors are a subset of the
    * cap-(k+1) survivors, so tightening a cap never churns unrelated
    * rows.
    *
    * Scale shape: one window partitioned BY STRATUM (never a global
    * sort); at 100 TB strata are many and the shuffle is balanced — a
    * single hot stratum is exactly the salting case `Skew` handles.
    */
  def capPerKey(df: DataFrame, idCol: String, strataCol: String, cap: Int): DataFrame = {
    require(cap > 0, "cap must be positive")
    // id tie-break after the hash: md5 collisions must not leave peers
    // unordered (row_number over a non-total order is layout-dependent)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(strataCol).orderBy(md5(col(idCol).cast("string")), col(idCol))
    df.withColumn("__rnk", row_number().over(w))
      .filter(col("__rnk") <= cap).drop("__rnk")
  }

  /** Sequence packing for LLM training batches: assign each document a
    * (shard, bin, offset) so documents concatenate into fixed
    * `budgetTokens` context windows — contiguous fill in id order, a doc
    * starting in the bin where its cumulative-token start position lands
    * (the standard "pack then split at window boundaries" layout; a doc
    * may straddle into the next bin, recorded by `end_bin`).
    *
    * Scale shape: packing is inherently sequential, so the corpus is cut
    * into `shards` INDEPENDENT streams by deterministic md5 bucket and
    * each shard packs under its own cumulative-sum window — parallelism
    * = shards, no global sort, and the same doc always lands in the same
    * (shard, bin) regardless of cluster layout. All-integer arithmetic,
    * mirrored 1:1 in SQL.
    */
  def packSequences(df: DataFrame, idCol: String, tokensCol: String,
      budgetTokens: Long, shards: Int): DataFrame = {
    require(budgetTokens > 0 && shards > 0)
    // explicit ROWS frame: the orderBy default is a RANGE frame, which
    // makes duplicate-id rows PEERS — both would read the sum including
    // each other and overlap in the window. ROWS matches the SQL mirror.
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("shard").orderBy(idCol)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    df.select(col(idCol), col(tokensCol).cast("long").as("n_tokens"))
      .withColumn("shard", pmod(hashBucket(col(idCol)), lit(shards.toLong)))
      .withColumn("__start", sum(col("n_tokens")).over(w) - col("n_tokens"))
      .select(col(idCol), col("shard"), col("n_tokens"),
        // integer `div` (not `/` + cast): token cumsums are exact longs
        // and must stay exact past double's 2^53 at extreme corpus sizes.
        // greatest(n_tokens, 1): an empty doc ends in the bin it starts
        // in — and never feeds -1 into `div`, whose truncation-toward-
        // zero would diverge from SQL floor division.
        expr(s"__start div ${budgetTokens}L").as("bin"),
        pmod(col("__start"), lit(budgetTokens)).as("offset"),
        expr(s"(__start + greatest(n_tokens, 1L) - 1L) div ${budgetTokens}L").as("end_bin"))
  }
}
