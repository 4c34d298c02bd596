package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Document deduplication for large-scale training-data pipelines: exact
  * (hash groupBy), MinHash+LSH banding, SimHash, and n-gram Jaccard.
  *
  * Not present in the reference (equinor/gordo-components is a sensor-ML
  * framework); these are the north-star LLM-data-pipeline operators the
  * engine adds on top. Every hash is derived from md5 hex strings so the
  * DuckDB oracle can reproduce the exact same values (no engine-specific
  * hash functions anywhere).
  *
  * Scale design (100 TB):
  *   - exact dedup is one hash-aggregate keyed on the content hash —
  *     partial aggregation map-side, uniform key space, no skew;
  *   - MinHash signatures are ONE groupBy(doc) with k min() aggregates
  *     (never k passes); candidate generation is an equi-join on
  *     (band, band_hash) — band buckets are small by construction, and AQE
  *     skew-join splits any hot bucket;
  *   - nothing collects to the driver; pair output is itself distributed.
  */
object Dedup {

  /** Default document-frequency cap for shingles. Pair generation over a
    * shingle shared by df documents is O(df²), so one boilerplate shingle
    * ("terms of service …") in an uncapped corpus quietly turns a linear
    * job quadratic. Every public entry point defaults to this finite cap —
    * an uncapped run is an explicit `maxDocFreq = Int.MaxValue` opt-in,
    * never an accident of the default (round-2 verdict). 1000 bounds any
    * single shingle's pair blowup at ~5·10⁵ while keeping recall: a real
    * near-dup shingle shared by >1000 docs adds no discriminating signal.
    */
  val DefaultMaxDocFreq = 1000

  /** Lowercased whitespace tokenization shared by every text op — must stay
    * identical to the oracle's `string_split_regex(lower(trim(text)), '\s+')`.
    */
  def words(text: Column): Column = split(lower(trim(text)), "\\s+")

  /** Word n-gram shingles (1-based indexing to mirror the oracle SQL);
    * documents shorter than n words yield no shingles.
    */
  def shingles(ws: Column, n: Int = 3): Column =
    when(size(ws) >= n,
      transform(sequence(lit(1), size(ws) - (n - 1)), i =>
        concat_ws(" ", (0 until n).map(o => element_at(ws, i + o)): _*))
    ).otherwise(array().cast("array<string>"))

  /** Exact dedup: group by md5 of the normalized text; the canonical doc is
    * the smallest id in the group. One shuffle on the content hash.
    */
  def exact(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs
      .groupBy(md5(lower(trim(col(textCol)))).as("h"))
      .agg(min(col(idCol)).as("canonical_id"), count(lit(1)).as("n_members"))

  /** Blocked fuzzy-match pairs — the classic entity-resolution shape
    * (record linkage): candidates share a BLOCKING key (an equi-join,
    * never an all-pairs product — the same bound-the-quadratic move as
    * LSH banding and SemDeDup clustering), then an exact Levenshtein
    * re-score keeps pairs within `maxDist` edits. Recall is bounded by
    * the blocking function — matches split across blocks are missed by
    * design (the standard trade; run several blocking passes to tighten
    * it). Levenshtein is a codegen'd builtin with the identical unit-cost
    * definition in DuckDB, so the whole pipeline oracle-checks.
    *
    * At 100 TB: the block equi-join shuffles (block, id, name) rows only;
    * per-block pair cost is O(block²·len²) — choose blocks like LSH
    * buckets (hundreds of rows), and AQE's skew join splits hot blocks.
    */
  def fuzzyPairs(df: DataFrame, idCol: String, nameCol: String,
      blockCol: Column, maxDist: Int): DataFrame = {
    // Repartition the probe side by block: the build side broadcasts
    // (skinny dimension-sized rows), so WITHOUT this the pair explosion
    // and every Levenshtein run in however few partitions the source scan
    // produced — ONE task for a single-file table (measured: the whole
    // 1.5M-comparison re-score serialized on one core). One narrow
    // exchange of (blk, id, name) rows buys block-parallel compute; the
    // O(block²·len²) edit-distance work after it dwarfs the shuffle at
    // every scale. The partition count is pinned to the session's
    // shuffle parallelism: a COUNT-FLEXIBLE repartition(col) is fair
    // game for AQE's coalescer, which sees the few shuffled BYTES (not
    // the quadratic per-block CPU behind them) and folds the exchange
    // back to one partition — measured, the whole point of the shuffle
    // lost.
    val a = df.select(blockCol.as("blk"), col(idCol).as("id_a"),
      col(nameCol).as("name_a"))
      .repartition(df.sparkSession.sessionState.conf.numShufflePartitions, col("blk"))
    // BOTH sides pinned: the planner is free to broadcast either side
    // (identical size stats), and whichever becomes the broadcast build,
    // the STREAMED side must still be block-partitioned or the one-task
    // re-score returns. At scale, where the join degrades to SMJ, both
    // sides being pre-partitioned on the join key is exactly SMJ's
    // required distribution — the pins add no exchange SMJ wouldn't.
    // (A broadcast(b) hint would be wrong here: b is the full table, and
    // forcing it into a broadcast build at 100 TB is an OOM, not a fix.)
    val b = df.select(blockCol.as("blk"), col(idCol).as("id_b"),
      col(nameCol).as("name_b"))
      .repartition(df.sparkSession.sessionState.conf.numShufflePartitions, col("blk"))
    a.join(b, Seq("blk")).filter(col("id_a") < col("id_b"))
      .withColumn("dist", levenshtein(col("name_a"), col("name_b")).cast("long"))
      .filter(col("dist") <= maxDist)
      .select("id_a", "id_b", "name_a", "name_b", "dist")
  }

  /** (doc, shingle) pairs in long format — input to MinHash and Jaccard.
    * Explodes ~(n_words-2) shingles per doc. `dedupe = false` skips the
    * distinct shuffle for consumers whose aggregates are duplicate-
    * insensitive (MinHash's min() — set semantics for free); Jaccard
    * counts need real set semantics and must keep it.
    *
    * `maxDocFreq` drops shingles present in more than that many documents
    * (corpus boilerplate). The shared-shingle self-join is O(Σ df²) over
    * shingle document frequency, so one hot shingle ("the quick brown" of
    * the corpus) explodes quadratically at scale — standard practice is to
    * cap df before any pair generation. The hot list is by construction
    * tiny (only shingles ABOVE the cap), so the anti-join broadcasts.
    */
  def shingleTable(docs: DataFrame, idCol: String, textCol: String, n: Int = 3,
      dedupe: Boolean = true, maxDocFreq: Int = DefaultMaxDocFreq): DataFrame = {
    // Materialize the word array as a column FIRST: if `shingles` received
    // the raw split(...) expression, every element_at inside the transform
    // lambda would re-run the split — ~3·shingle-count tokenizations per
    // row (measured 8s for 287k shingles; this projection makes it one).
    val exploded = docs
      .select(col(idCol).as("doc_id"), words(col(textCol)).as("__ws"))
      .select(col("doc_id"), explode(shingles(col("__ws"), n)).as("s"))
    val base = if (dedupe) exploded.distinct() else exploded
    if (maxDocFreq == Int.MaxValue) base
    else {
      // df by count(*), NOT countDistinct: partial aggregation reduces
      // map-side to |vocab| rows before the shuffle, where a countDistinct
      // would shuffle every (s, doc) row just to build the hot list. With
      // dedupe=true the input is distinct so count ≡ doc-frequency; with
      // dedupe=false count ≥ df — a CONSERVATIVE cap (a shingle repeated
      // within docs trips it sooner), the right direction for a guard.
      // Two-pass on purpose: filtering ABOVE the aggregation means no
      // oversized group is ever materialized, unlike a collect_set+filter.
      val hot = base.groupBy("s").agg(count(lit(1)).as("df"))
        .filter(col("df") > maxDocFreq).select("s")
      base.join(broadcast(hot), Seq("s"), "left_anti")
    }
  }

  /** MinHash signatures via the Carter-Wegman affine family: ONE md5 per
    * shingle yields two integers (h1 = hex[0,15), h2 = hex[16,31) of the
    * digest), hash_i = h1 + i·(h2 mod 2^40) — k independent-enough hashes
    * for the cost of one digest instead of k. All values stay positive
    * 61-bit, so the arithmetic is exact and identical in any engine.
    * Signature component i = min(hash_i). One groupBy(doc_id) with k
    * min-aggregates — a single shuffle regardless of k.
    */
  def minhashSignatures(shingled: DataFrame, k: Int = 20): DataFrame = {
    val digest = md5(col("s"))
    val h1 = conv(substring(digest, 1, 15), 16, 10).cast("long")
    val h2 = conv(substring(digest, 17, 15), 16, 10).cast("long") % lit(1099511627776L) // 2^40
    val withH = shingled.select(col("doc_id"), h1.as("h1"), h2.as("h2"))
    val sigExprs = (0 until k).map(i => min(col("h1") + lit(i.toLong) * col("h2")).as(s"m$i"))
    withH.groupBy("doc_id").agg(sigExprs.head, sigExprs.tail: _*)
  }

  /** LSH banding: split the k-component signature into `bands` bands of
    * k/bands rows; band key = md5 of the concatenated components. Emits
    * (doc_id, band, bh) long format.
    */
  def lshBands(sigs: DataFrame, k: Int = 20, bands: Int = 5): DataFrame = {
    val r = k / bands
    val bandStructs = (0 until bands).map { b =>
      struct(lit(b).as("band"),
        md5(concat_ws("#", (0 until r).map(j => col(s"m${b * r + j}")): _*)).as("bh"))
    }
    sigs
      .select(col("doc_id"), explode(array(bandStructs: _*)).as("bb"))
      .select(col("doc_id"), col("bb.band").as("band"), col("bb.bh").as("bh"))
  }

  /** Candidate near-duplicate pairs: docs sharing any LSH band bucket.
    * Equi-join on (band, bh); AQE handles skewed buckets at scale.
    */
  def minhashLshPairs(docs: DataFrame, idCol: String, textCol: String,
      k: Int = 20, bands: Int = 5, shingleN: Int = 3,
      maxDocFreq: Int = DefaultMaxDocFreq): DataFrame = {
    // The self-join references the band table twice. Materialize it ONCE
    // (eager localCheckpoint): runtime stage reuse does NOT deduplicate
    // the shingle→signature→band subtree here — the two join sides prune
    // columns and push predicates differently, so their canonical plans
    // differ and each side re-runs the tokenize+digest+20-min-agg
    // pipeline (round 7 A/B: 2.2–2.9 s recomputed vs 1.9 s checkpointed
    // at sf0.1; an earlier round-3 measurement favoring recompute
    // predates the codegen-cache fix and no longer reproduces). At
    // 100 TB the skinny (doc_id, band, bh) frame is exactly what the
    // incremental path persists to parquet as state — same trade.
    val bl = bandTable(docs, idCol, textCol, k, bands, shingleN, maxDocFreq)
      .localCheckpoint()
    pairsFromBands(bl)
  }

  /** Candidate pairs from an already-materialized band table `(doc_id,
    * band, bh)` — the serve-side half of [[minhashLshPairs]]. Callers
    * that persist the band table (the registry discipline: fit/derive
    * once per corpus fingerprint, serve many) pay exactly one parquet
    * scan + one equi-join here, never the shingle→digest→k-min-agg
    * derivation. The input must be a materialized frame (parquet read or
    * localCheckpoint): the self-join references it twice.
    */
  def pairsFromBands(bands: DataFrame): DataFrame = {
    val a = bands.as("a")
    val b = bands.as("b")
    a.join(b,
        col("a.band") === col("b.band") && col("a.bh") === col("b.bh") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
  }

  /** SimHash: 60-bit signature (60 = 15 hex chars of md5, keeps the value
    * in a positive BIGINT for oracle portability). Bit b is set when the
    * sum over distinct tokens of ±1 (sign of token-hash bit b) is > 0.
    * One explode + one groupBy(doc) with 60 sum-aggregates.
    */
  def simhash(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tokens = docs.select(
      col(idCol).as("doc_id"),
      explode(array_distinct(words(col(textCol)))).as("t"))
    val h = conv(substring(md5(col("t")), 1, 15), 16, 10).cast("long")
    val withH = tokens.select(col("doc_id"), h.as("h"))
    val bitSums = (0 until 60).map(b =>
      sum(when(shiftright(col("h"), b).bitwiseAND(1) === 1, 1).otherwise(-1)).as(s"s$b"))
    val sums = withH.groupBy("doc_id").agg(bitSums.head, bitSums.tail: _*)
    val sig = (0 until 60)
      .map(b => when(col(s"s$b") > 0, lit(1L << b)).otherwise(lit(0L)))
      .reduce(_ + _)
    sums.select(col("doc_id"), sig.as("simhash"))
  }

  /** Exact Jaccard re-score of a given candidate pair set — the 100 TB
    * composition: `minhashLshPairs` prunes the n² space to candidates,
    * this joins each pair to its two shingle sets (collect_set per doc —
    * one shuffle) and computes exact |A∩B|/|A∪B| with array intersection.
    * Cost is O(candidates), never O(n²).
    *
    * Shingle sets are built ONLY for docs that appear in a candidate pair
    * (semi-join): on a 100 TB corpus with a small near-dup fraction the
    * alternative — collect_set over EVERY document — re-tokenizes the
    * whole corpus to score a sliver of it. The candidate materialization
    * this requires costs ~1 s of fixed overhead at toy scale; it is the
    * difference between O(candidates) and O(corpus) at real scale.
    */
  def jaccardRescore(docs: DataFrame, idCol: String, textCol: String,
      pairs: DataFrame, threshold: Double, shingleN: Int = 3,
      maxDocFreq: Int = DefaultMaxDocFreq): DataFrame = {
    // Candidates are SMALL after LSH pruning and referenced three times
    // below (the pair join + both sides of the semi-join): materialize
    // once so the generation pipeline behind them runs exactly once
    // (lazy, round 14 — cached on first use, no dedicated job).
    val p = pairs.localCheckpoint(false)
    // only docs that appear in a candidate pair need a shingle set —
    // after LSH pruning that is a small fraction of the corpus
    val docsInPairs = p.select(col("doc_a").as(idCol))
      .unionByName(p.select(col("doc_b").as(idCol))).distinct()
    val needed = docs.join(docsInPairs, Seq(idCol), "left_semi")
    // df-cap via a count window, not shingleTable's two-pass hot list:
    // the two-pass form evaluates the tokenize+explode subtree once for
    // the hot aggregate and again for the anti-join probe (no exchange
    // between them, so nothing is reusable — measured 2× the rescore
    // cost). Here the input is candidate-bounded, so one extra shuffle
    // of its shingles is cheap and tokenization runs exactly once.
    // count(*) ≥ doc-frequency (dedupe=false) — the same conservative
    // cap shingleTable applies.
    // shingles move as xxhash64 keys from here down (the
    // shingleIntersections discipline — see its scaladoc for the
    // collision bound): the cap window, the set agg, and the per-pair
    // merge-count all run on 8-byte longs
    val st = shingleTable(needed, idCol, textCol, shingleN, dedupe = false,
        maxDocFreq = Int.MaxValue)
      .select(col("doc_id"), xxhash64(col("s")).as("s"))
    val capped = if (maxDocFreq == Int.MaxValue) st
      else st.withColumn("__df", count(lit(1)).over(
          org.apache.spark.sql.expressions.Window.partitionBy("s")))
        .filter(col("__df") <= maxDocFreq).drop("__df")
    // sa and sb below are two references to this frame; exchange reuse
    // covers the double reference (pinning it eagerly measured slower)
    val sets = capped
      .groupBy("doc_id").agg(sort_array(collect_set(col("s"))).as("ss"))
    scorePairs(p, sets, threshold)
  }

  /** Shared tail of the re-score stage: join each candidate pair to its
    * two ASCENDING-SORTED hashed shingle sets and keep pairs with exact
    * Jaccard >= threshold — |A∩B| is the zero-allocation merge walk
    * (graft_sorted_intersect), not a per-pair hash-set build.
    */
  private def scorePairs(p: DataFrame, sets: DataFrame, threshold: Double): DataFrame = {
    import org.apache.spark.sql.graft.Bridge
    val jac = col("i") * lit(1.0) / (col("na") + col("nb") - col("i"))
    p
      .join(sets.select(col("doc_id"), col("ss").as("sa")), col("doc_a") === col("doc_id")).drop("doc_id")
      .join(sets.select(col("doc_id"), col("ss").as("sb")), col("doc_b") === col("doc_id")).drop("doc_id")
      .withColumn("i", Bridge.column(graft.expressions.SortedIntersectCount(
        Bridge.expression(col("sa")), Bridge.expression(col("sb")))))
      .withColumn("na", size(col("sa"))).withColumn("nb", size(col("sb")))
      .filter(jac >= threshold)
      .select(col("doc_a"), col("doc_b"), round(jac, 6).as("jaccard"))
  }

  /** Persistable LSH band table `(doc_id, band, bh)` for a corpus batch —
    * write it once, reuse it for every later incremental batch.
    */
  def bandTable(docs: DataFrame, idCol: String, textCol: String,
      k: Int = 20, bands: Int = 5, shingleN: Int = 3,
      maxDocFreq: Int = DefaultMaxDocFreq): DataFrame =
    lshBands(minhashSignatures(
      shingleTable(docs, idCol, textCol, shingleN, dedupe = false, maxDocFreq), k), k, bands)

  /** INCREMENTAL near-dup for a growing corpus (the daily-crawl shape):
    * band only the NEW batch, join it against the persisted band table ∪
    * its own bands, and re-score just the candidate pairs that involve a
    * new doc. Cost scales with |new batch| × collision rate — the
    * existing corpus is touched only through the (band, bh) equi-join and
    * the re-score's semi-joined shingle sets, never re-processed.
    *
    * `maxDocFreq` caps are PER BATCH: existingBands were filtered against
    * the old corpus's document frequencies and the new batch only against
    * its own, so a shingle that crosses the cap only in the union is NOT
    * dropped and the result can differ from a full rebuild as batches
    * accumulate. That is the standard incremental trade; when rebuild
    * parity matters, use [[incrementalStepExact]], which carries the
    * corpus-wide shingle stats as state and re-bands the (usually empty)
    * set of docs a newly-hot shingle touches — parity is spec'd.
    *
    * @param allDocs existing ∪ new docs (re-score needs both sides' text)
    * @param existingBands persisted `bandTable` of the existing corpus
    * @param newDocs the newly arrived batch
    * @return near-dup pairs involving at least one new doc; union with the
    *         existing corpus's own pairs for the full picture. Persist
    *         `bandTable(newDocs)` ∪ existingBands as the next state.
    */
  def incrementalNearDuplicates(allDocs: DataFrame, existingBands: DataFrame,
      newDocs: DataFrame, idCol: String, textCol: String, threshold: Double,
      k: Int = 20, bands: Int = 5, shingleN: Int = 3,
      maxDocFreq: Int = DefaultMaxDocFreq): DataFrame = {
    val newBands = bandTable(newDocs, idCol, textCol, k, bands, shingleN, maxDocFreq)
    val unionBands = existingBands.unionByName(newBands)
    val a = newBands.as("a")
    val b = unionBands.as("b")
    val cand = a.join(b,
        col("a.band") === col("b.band") && col("a.bh") === col("b.bh") &&
          col("a.doc_id") =!= col("b.doc_id"))
      .select(least(col("a.doc_id"), col("b.doc_id")).as("doc_a"),
        greatest(col("a.doc_id"), col("b.doc_id")).as("doc_b"))
      .distinct()
    jaccardRescore(allDocs, idCol, textCol, cand, threshold, shingleN, maxDocFreq)
  }

  // --------------------------------------------------------------------
  // Rebuild-exact incremental dedup: the hot-shingle-list mitigation the
  // per-batch-cap scaladoc above documents, made concrete. State carried
  // between batches = the band table + corpus-wide shingle occurrence
  // counts; the df cap is evaluated against the WHOLE corpus every step,
  // so the incremental state never drifts from what a from-scratch build
  // would produce.
  // --------------------------------------------------------------------

  /** Persistable incremental-dedup state: the corpus band table and the
    * corpus-wide shingle occurrence counts `(s, df)` the hot list derives
    * from. Both are plain frames — write to parquet, reload next batch.
    */
  final case class DedupState(bands: DataFrame, stats: DataFrame)

  /** One incremental step's output: the near-dup pairs involving a
    * CHANGED doc (new batch ∪ re-banded existing docs), the changed doc
    * ids, and the next state. Maintain the corpus pair set as
    * `previousPairs anti-joined on changedIds (both endpoints) ∪ pairs` —
    * pairs between two unchanged docs are untouched by construction (their
    * shingle sets and bands did not change), which is what makes the rule
    * exact.
    */
  final case class IncrementalResult(pairs: DataFrame, changedIds: DataFrame,
      state: DedupState)

  /** Corpus-wide shingle occurrence counts `(s, df)` — count(*) over the
    * non-deduped shingle explosion, the SAME conservative df measure
    * `shingleTable`'s cap uses, and additive across disjoint batches
    * (which is what makes the state mergeable with one sum).
    */
  def shingleStats(docs: DataFrame, idCol: String, textCol: String,
      n: Int = 3): DataFrame =
    docs.select(col(idCol).as("doc_id"), words(col(textCol)).as("__ws"))
      .select(explode(shingles(col("__ws"), n)).as("s"))
      .groupBy("s").agg(count(lit(1)).as("df"))

  /** Merge a batch's shingle stats into the corpus stats (one sum-agg). */
  def mergeShingleStats(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b).groupBy("s").agg(sum(col("df")).cast("long").as("df"))

  /** Would the planner decline to broadcast this frame? Read from
    * plan-time statistics (Catalyst's size estimate — file sizes for a
    * parquet scan; NO job runs). The merge path uses this as its
    * slice-vs-direct-join boundary: it is by construction the same
    * boundary at which the planner stops broadcasting the base side of
    * a small-left outer join and falls back to shuffling it whole.
    */
  private def exceedsBroadcast(df: DataFrame): Boolean = {
    val thr = df.sparkSession.sessionState.conf.autoBroadcastJoinThreshold
    thr <= 0 || df.queryExecution.optimizedPlan.stats.sizeInBytes >
      BigInt(thr)
  }

  /** Shingles over the df cap — tiny by construction (only the corpus
    * boilerplate above the cap), so every consumer broadcasts it.
    */
  def hotList(stats: DataFrame, maxDocFreq: Int = DefaultMaxDocFreq): DataFrame =
    stats.filter(col("df") > maxDocFreq).select("s")

  /** Band table built against an EXPLICIT hot list instead of the batch's
    * own df counts — the rebuild-exact form (`bandTable` caps per batch).
    */
  def bandTableWithHotList(docs: DataFrame, idCol: String, textCol: String,
      hot: DataFrame, k: Int = 20, bands: Int = 5, shingleN: Int = 3): DataFrame =
    lshBands(minhashSignatures(
      shingleTable(docs, idCol, textCol, shingleN, dedupe = false,
          maxDocFreq = Int.MaxValue)
        .join(broadcast(hot), Seq("s"), "left_anti"), k), k, bands)

  /** Exact Jaccard re-score with the corpus hot list as the cap: the
    * anti-join replaces `jaccardRescore`'s candidate-local count window,
    * so the dropped shingles are exactly the corpus-wide hot ones — the
    * re-score twin of [[bandTableWithHotList]].
    */
  def jaccardRescoreWithHotList(docs: DataFrame, idCol: String, textCol: String,
      pairs: DataFrame, threshold: Double, shingleN: Int,
      hot: DataFrame): DataFrame = {
    val p = pairs.localCheckpoint()
    val docsInPairs = p.select(col("doc_a").as(idCol))
      .unionByName(p.select(col("doc_b").as(idCol))).distinct()
    val needed = docs.join(docsInPairs, Seq(idCol), "left_semi")
    // hot-list anti-join stays on the STRING key (the persisted hot list
    // is string-keyed state); hashing happens after, so the set agg and
    // merge-count run on longs like jaccardRescore's
    val sets = shingleTable(needed, idCol, textCol, shingleN, dedupe = false,
        maxDocFreq = Int.MaxValue)
      .join(broadcast(hot), Seq("s"), "left_anti")
      .select(col("doc_id"), xxhash64(col("s")).as("s"))
      .groupBy("doc_id").agg(sort_array(collect_set(col("s"))).as("ss"))
    scorePairs(p, sets, threshold)
  }

  /** From-scratch build of the rebuild-exact pipeline — what
    * [[incrementalStepExact]]'s accumulated output must equal (the parity
    * oracle, and the one-shot form for a static corpus).
    */
  def nearDuplicatesExact(docs: DataFrame, idCol: String, textCol: String,
      threshold: Double, k: Int = 20, bands: Int = 5, shingleN: Int = 3,
      maxDocFreq: Int = DefaultMaxDocFreq): DataFrame = {
    val hot = hotList(shingleStats(docs, idCol, textCol, shingleN), maxDocFreq)
      .localCheckpoint() // tiny; referenced by banding AND re-score
    val bt = bandTableWithHotList(docs, idCol, textCol, hot, k, bands, shingleN)
    val cand = bt.as("a").join(bt.as("b"),
        col("a.band") === col("b.band") && col("a.bh") === col("b.bh") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
    jaccardRescoreWithHotList(docs, idCol, textCol, cand, threshold, shingleN, hot)
  }

  /** Initial state for [[incrementalStepExact]] from the first corpus
    * batch (or a full rebuild checkpoint).
    */
  def initialDedupState(docs: DataFrame, idCol: String, textCol: String,
      k: Int = 20, bands: Int = 5, shingleN: Int = 3,
      maxDocFreq: Int = DefaultMaxDocFreq): DedupState = {
    val stats = shingleStats(docs, idCol, textCol, shingleN)
    DedupState(
      bandTableWithHotList(docs, idCol, textCol, hotList(stats, maxDocFreq),
        k, bands, shingleN),
      stats)
  }

  /** Rebuild-EXACT incremental near-dup step. Unlike
    * [[incrementalNearDuplicates]] (whose per-batch df caps drift from a
    * full rebuild as batches accumulate — see its scaladoc), this step
    * keeps corpus-wide df state and re-bands the (rare, usually empty)
    * set of existing docs whose shingle sets changed because a shingle
    * crossed the cap only in the union:
    *
    *   1. merge the batch's shingle counts into the corpus stats;
    *   2. newly-hot = hot(now) − hot(before). In the common case this is
    *      EMPTY and the existing corpus is not touched at all;
    *   3. otherwise the existing docs containing a newly-hot shingle
    *      (found with one tokenize + broadcast semi-join — a narrow scan,
    *      no pair generation) are re-banded alongside the new batch: a
    *      doc's signature depends only on its own capped shingle set, so
    *      every OTHER doc's bands are provably unchanged;
    *   4. candidates = changed-side bands ⋈ full band table; re-score
    *      against the corpus hot list.
    *
    * The returned state is identical to `initialDedupState(allDocs)` —
    * the no-drift invariant the parity spec pins.
    */
  def incrementalStepExact(allDocs: DataFrame, state: DedupState,
      newDocs: DataFrame, idCol: String, textCol: String, threshold: Double,
      k: Int = 20, bands: Int = 5, shingleN: Int = 3,
      maxDocFreq: Int = DefaultMaxDocFreq): IncrementalResult = {
    // LAZY checkpoints (round 14): eager=false keeps the materialize-once
    // contract (every consumer reads the cached blocks) but folds the
    // materialization into the FIRST consuming job instead of a dedicated
    // job + driver gap per frame — the step ran ~6 such launch-bound jobs
    // at fixture scale (JobTrace).
    val stats = mergeShingleStats(state.stats,
      shingleStats(newDocs, idCol, textCol, shingleN)).localCheckpoint(false)
    val hot = hotList(stats, maxDocFreq).localCheckpoint(false)
    val newlyHot = hot.join(hotList(state.stats, maxDocFreq), Seq("s"), "left_anti")
      .localCheckpoint(false)
    val newIds = newDocs.select(col(idCol))
    val existingDocs = allDocs.join(newIds, Seq(idCol), "left_anti")
    val affectedIds =
      if (newlyHot.isEmpty) existingDocs.select(col(idCol)).limit(0)
      else existingDocs
        .select(col(idCol), words(col(textCol)).as("__ws"))
        .select(col(idCol), explode(shingles(col("__ws"), shingleN)).as("s"))
        .join(broadcast(newlyHot), Seq("s"), "left_semi")
        .select(col(idCol)).distinct()
    val changedIds = newIds.unionByName(affectedIds).distinct()
      .localCheckpoint(false)
    val changedDocs = allDocs.join(changedIds, Seq(idCol), "left_semi")
    val changedBands =
      bandTableWithHotList(changedDocs, idCol, textCol, hot, k, bands, shingleN)
        .localCheckpoint(false) // referenced by the union AND the join side
    val keptBands = state.bands.join(
      changedIds.select(col(idCol).as("doc_id")), Seq("doc_id"), "left_anti")
    val unionBands = keptBands.unionByName(changedBands)
    val cand = changedBands.as("a").join(unionBands.as("b"),
        col("a.band") === col("b.band") && col("a.bh") === col("b.bh") &&
          col("a.doc_id") =!= col("b.doc_id"))
      .select(least(col("a.doc_id"), col("b.doc_id")).as("doc_a"),
        greatest(col("a.doc_id"), col("b.doc_id")).as("doc_b"))
      .distinct()
    IncrementalResult(
      jaccardRescoreWithHotList(allDocs, idCol, textCol, cand, threshold,
        shingleN, hot),
      changedIds.select(col(idCol).as("doc_id")),
      DedupState(unionBands, stats))
  }

  /** Duplicate-cluster assignment: connected components of the near-dup
    * pair graph by min-label propagation — the canonical step AFTER pair
    * generation in a training-data dedup pipeline (each doc maps to the
    * smallest doc id reachable through duplicate pairs; keep one doc per
    * cluster).
    *
    * Spark-first iterative shape (the GraphX/Pregel pattern without the
    * GraphX dependency): labels start as own id; each round takes the min
    * of neighbor labels (one equi-join + one groupBy min per round) and
    * stops at fixpoint. The min label travels one hop per round, so
    * rounds ≤ graph diameter — near-dup clusters are shallow (dups of
    * dups), so this converges in a handful of rounds; `maxIter` bounds
    * pathological chains. Per-round `localCheckpoint` truncates the plan
    * lineage (iterative joins otherwise stack exponentially deep plans).
    */
  def duplicateClusters(pairs: DataFrame, maxIter: Int = 20): DataFrame = {
    val edges = pairs.select(col("doc_a").as("src"), col("doc_b").as("dst"))
      .unionByName(pairs.select(col("doc_b").as("src"), col("doc_a").as("dst")))
      .localCheckpoint()
    // seed with min(id, min direct neighbor): the self-loop union makes one
    // groupBy produce what round 1 of propagation would — one fewer round
    var labels = edges
      .unionByName(edges.select(col("src"), col("src").as("dst"))) // self-loops
      .groupBy(col("dst").as("id")).agg(min(col("src")).as("label"))
      .localCheckpoint()
    var iter = 0
    var converged = false
    while (!converged && iter < maxIter) {
      val nbrMin = edges.join(labels, edges("src") === labels("id"))
        .groupBy(col("dst").as("id2")).agg(min(col("label")).as("nbr_min"))
      // carry the old label through so the fixpoint test is a filter over
      // the just-checkpointed round output — type-agnostic (string or
      // numeric ids; a decimal-cast label sum would crash or, worse,
      // null out and fake convergence on string ids) and join-free
      val stepped = labels.join(nbrMin, labels("id") === nbrMin("id2"), "left")
        .select(col("id"), col("label").as("__prev"),
          least(col("label"), coalesce(col("nbr_min"), col("label"))).as("label"))
        .localCheckpoint()
      converged = stepped.filter(col("label") =!= col("__prev")).isEmpty
      labels = stepped.drop("__prev")
      iter += 1
    }
    // never return silently-split components: a chain longer than maxIter
    // would emit several canonical ids for ONE cluster and a dedup
    // pipeline would silently keep extra duplicates
    require(converged,
      s"duplicateClusters did not converge in $maxIter rounds — a component's " +
        "diameter exceeds maxIter; raise maxIter for deep duplicate chains")
    labels.select(col("id").as("doc_id"), col("label").as("canonical_id"))
  }
  /** TWO-PHASE connected components for LONG ids — the job-count killer
    * for graphs whose components are shallow but numerous (grid DBSCAN's
    * ε-graph: [[duplicateClusters]]' per-round label joins cost 2 Spark
    * jobs each, and a dozen rounds of driver-scheduled launches dominate
    * wall time long before data does).
    *
    * Phase 1: edges hash-partition by src (both directions, so a node's
    * whole neighborhood lands in its partition) and a partition-LOCAL
    * union-find labels every node it sees with its local component's min
    * id — one shuffle + one mapPartitions, no iteration. Union attaches
    * the larger root under the smaller, so labels are deterministic
    * regardless of edge arrival order. Phase 2: a node straddling
    * partitions carries several local labels; linking each to the node's
    * min label CONTRACTS the graph to the cross-partition stitch points,
    * and [[duplicateClusters]] runs its min-label rounds there — a graph
    * of boundary labels, not points, whose diameter collapses with the
    * contraction (components fully inside one partition never iterate at
    * all). Phase 3 joins the contracted canonicals back. Output contract
    * identical to [[duplicateClusters]]: every node → its component's
    * min id; equality spec'd in DedupSpec.
    */
  def duplicateClustersTwoPhase(pairs: DataFrame, maxIter: Int = 20): DataFrame = {
    val s = pairs.sparkSession
    import s.implicits._
    val edges = pairs.select(col("doc_a").cast("long").as("src"),
      col("doc_b").cast("long").as("dst"))
    val undirected = edges.unionByName(
      edges.select(col("dst").as("src"), col("src").as("dst")))
    val local = undirected
      .repartition(col("src"))
      .as[(Long, Long)]
      .mapPartitions { it =>
        val parent = new scala.collection.mutable.LongMap[Long]()
        def find(x0: Long): Long = {
          var x = x0
          while (parent.getOrElse(x, x) != x) x = parent(x)
          // path compression
          var y = x0
          while (parent.getOrElse(y, y) != y) { val n = parent(y); parent(y) = x; y = n }
          x
        }
        it.foreach { case (a, b) =>
          if (!parent.contains(a)) parent(a) = a
          if (!parent.contains(b)) parent(b) = b
          val ra = find(a); val rb = find(b)
          if (ra != rb) {
            // min-id root: deterministic under any edge order
            if (ra < rb) parent(rb) = ra else parent(ra) = rb
          }
        }
        // snapshot keys BEFORE resolving: find()'s path compression
        // mutates the map, which must not race the key iteration
        val nodes = parent.keys.toArray
        nodes.iterator.map(n => (n, find(n)))
      }
      .toDF("id", "plabel")
      .localCheckpoint()
    val byNode = local.groupBy("id")
      .agg(min(col("plabel")).as("lmin"), collect_set(col("plabel")).as("ls"))
    val contractedEdges = byNode
      .select(explode(col("ls")).as("doc_a"), col("lmin").as("doc_b"))
      .filter(col("doc_a") =!= col("doc_b"))
    val contracted = duplicateClusters(contractedEdges, maxIter)
      .select(col("doc_id").as("plabel"), col("canonical_id"))
    local.join(contracted, Seq("plabel"), "left")
      .select(col("id"),
        coalesce(col("canonical_id"), col("plabel")).as("lbl"))
      .groupBy("id").agg(min(col("lbl")).as("canonical_id"))
      .select(col("id").as("doc_id"), col("canonical_id"))
  }

  def nearDuplicates(docs: DataFrame, idCol: String, textCol: String,
      threshold: Double, k: Int = 20, bands: Int = 5, shingleN: Int = 3,
      maxDocFreq: Int = DefaultMaxDocFreq): DataFrame =
    jaccardRescore(docs, idCol, textCol,
      minhashLshPairs(docs, idCol, textCol, k, bands, shingleN, maxDocFreq),
      threshold, shingleN, maxDocFreq)

  /** Exact n-gram Jaccard: |A∩B| / (|A|+|B|−|A∩B|) ≥ threshold over the
    * maxDocFreq-capped shingle universe (sets keyed by xxhash64 — exact
    * up to 64-bit hash equality; see [[shingleIntersections]]).
    *
    * Candidates come from [[shingleIntersections]]' prefix filter with
    * the Jaccard-specific bound `jac ≥ τ ⟹ i/min(|A|,|B|) ≥ 2τ/(1+τ)`
    * (from `i ≥ τ(|A|+|B|−i) ⟹ i ≥ τ/(1+τ)·(|A|+|B|) ≥ 2τ/(1+τ)·min`)
    * — strictly tighter than the raw containment bound, so prefixes are
    * shorter and candidate fan-out smaller. The exact Jaccard predicate
    * re-applies here, so output equals the all-pairs formulation's.
    *
    * This operator is the exact baseline / re-scorer; at 100 TB, pair
    * generation should normally go through minhashLshPairs first.
    */
  def ngramJaccardPairs(docs: DataFrame, idCol: String, textCol: String,
      threshold: Double, shingleN: Int = 3,
      maxDocFreq: Int = DefaultMaxDocFreq): DataFrame = {
    val jac = col("i") * lit(1.0) / (col("na") + col("nb") - col("i"))
    // size-compatibility prune: jac ≤ min/max, so jac ≥ τ needs min ≥ τ·max
    shingleIntersections(docs, idCol, textCol, shingleN, maxDocFreq,
        minOverlapFrac = 2.0 * threshold / (1.0 + threshold),
        minSizeRatio = threshold)
      .filter(jac >= threshold)
      .select(col("doc_a"), col("doc_b"), round(jac, 6).as("jaccard"))
  }

  /** Exact n-gram CONTAINMENT over the same candidate space: per unordered
    * pair, `cont_a = |A∩B| / |A|` (how much of A lies inside B) and the
    * symmetric `cont_b`; kept when EITHER side reaches the threshold.
    * Containment catches the subset duplicates Jaccard structurally
    * misses — a document quoted whole inside a much longer one has
    * containment ≈ 1 but Jaccard ≈ |A|/|B| (tiny), so a Jaccard-only
    * dedup keeps the embedded copy. Same plan shape (and cap discipline)
    * as [[ngramJaccardPairs]].
    */
  def containmentPairs(docs: DataFrame, idCol: String, textCol: String,
      threshold: Double, shingleN: Int = 3,
      maxDocFreq: Int = DefaultMaxDocFreq): DataFrame = {
    val contA = col("i") * lit(1.0) / col("na")
    val contB = col("i") * lit(1.0) / col("nb")
    // max(i/na, i/nb) = i/min(na,nb): the containment threshold IS the
    // prefix filter's min-side overlap bound
    shingleIntersections(docs, idCol, textCol, shingleN, maxDocFreq,
        minOverlapFrac = threshold)
      .filter(greatest(contA, contB) >= threshold)
      .select(col("doc_a"), col("doc_b"),
        round(contA, 6).as("cont_a"), round(contB, 6).as("cont_b"))
  }

  /** Train/test DECONTAMINATION — the benchmark-overlap scan a
    * training-data pipeline runs before release (the published GPT-3
    * appendix-C shape: flag any training document sharing at least
    * `minShared` distinct word n-grams with a held-out benchmark/eval
    * document; n is 8–13 for prose, lower for short documents).
    *
    * Plan: the corpus is touched ONCE with a narrow tokenize and never
    * pair-explodes against itself — candidates come from the equi-join on
    * the shingle against the (small, by construction) benchmark side,
    * broadcast by default; the only wide shuffle is the final
    * (corpus doc, bench doc) overlap count, whose size is the match set,
    * not the corpus. Corpus boilerplate is df-capped as usual so a stock
    * phrase cannot fan one benchmark shingle out to the whole corpus.
    * Cost O(corpus shingles + matches) — the right 100 TB shape. For a
    * benchmark too large to broadcast, set `broadcastBench = false` (the
    * equi-join then shuffles the corpus shingle stream once).
    *
    * Output: `(doc_id, bench_id, shared)` — shared = |distinct shingle
    * intersection|, integer-exact.
    */
  def decontaminationMatches(corpus: DataFrame, idCol: String, textCol: String,
      bench: DataFrame, benchIdCol: String, benchTextCol: String,
      shingleN: Int = 8, minShared: Int = 1,
      maxDocFreq: Int = DefaultMaxDocFreq,
      broadcastBench: Boolean = true): DataFrame = {
    val b = shingleTable(bench, benchIdCol, benchTextCol, shingleN,
        dedupe = true, maxDocFreq = Int.MaxValue)
      .select(col("doc_id").as("bench_id"), col("s"))
      // feeds the key set AND the final join — materialize once (lazy:
      // cached by the first consuming job, no dedicated job)
      .localCheckpoint(false)
    // Semi-join the corpus explode against the benchmark's shingle SET
    // before the distinct and the df cap (round 14): only shingles that
    // exist on the benchmark side can ever reach the output, the filter
    // is on `s` itself so it commutes with distinct(doc, s), and a kept
    // shingle keeps every one of its rows so its doc-frequency — hence
    // its hot-list membership — is unchanged. Effect: the corpus-wide
    // (doc, s) distinct and the df aggregation shuffle only the
    // benchmark-matching sliver instead of the whole corpus vocabulary,
    // and the explode runs once (cached) instead of twice (the hot-list
    // leg and the main leg each re-ran it).
    val sSet = b.select("s").distinct()
    val matched = corpus
      .select(col(idCol).as("doc_id"), words(col(textCol)).as("__ws"))
      .select(col("doc_id"), explode(shingles(col("__ws"), shingleN)).as("s"))
      .join(broadcast(sSet), Seq("s"), "left_semi")
      .distinct()
      .localCheckpoint(false) // feeds the hot-list agg AND the join
    val c = if (maxDocFreq == Int.MaxValue) matched
      else {
        val hot = matched.groupBy("s").agg(count(lit(1)).as("df"))
          .filter(col("df") > maxDocFreq).select("s")
        matched.join(broadcast(hot), Seq("s"), "left_anti")
      }
    c.join(if (broadcastBench) broadcast(b) else b, Seq("s"))
      .groupBy("doc_id", "bench_id")
      .agg(count(lit(1)).as("shared"))
      .filter(col("shared") >= minShared)
  }

  /** Shared machinery of the exact set-overlap scorers: every ordered
    * pair that can reach `i ≥ minOverlapFrac · min(|A|,|B|)` with its
    * EXACT intersection count and both (capped-universe) set sizes —
    * `(doc_a, doc_b, i, na, nb)`. Callers pass the weakest such bound
    * their own threshold implies (containment τ: the bound is τ itself;
    * Jaccard τ: `jac ≥ τ ⟹ i/min ≥ 2τ/(1+τ)`, strictly tighter) and
    * re-apply their exact predicate downstream, so the output they keep
    * is identical to the all-pairs formulation's.
    *
    * Scale shape — PREFIX FILTERING (the AllPairs bound of Bayardo, Ma
    * & Srikant, WWW'07, with PPJoin's df-ascending global order, Xiao
    * et al., WWW'08): rank each doc's shingles by (global df asc,
    * shingle asc) — one total order corpus-wide — and index only the
    * first `n − iMin + 1` as candidate-generation keys, where
    * `iMin = ⌈frac·n⌉` is the doc's qualifying overlap were it the
    * smaller side. Pigeonhole: a pair whose intersection avoids the
    * smaller doc's whole prefix has `i ≤ iMin − 1` and cannot qualify,
    * so probing prefix(X) against the FULL capped table catches every
    * qualifying pair from whichever side is smaller. Candidate cost
    * drops from the all-pairs Σ df² to Σ df_prefix·df — and because the
    * prefix is the RAREST (1−frac) fraction of each doc, boilerplate
    * shingles (high df) almost never serve as keys: the quadratic term
    * rides the df of rare shingles only. `iMin` is computed in integer
    * micro-units (`T = ⌊frac·1e6⌋`, `iMin = ⌈T·n/1e6⌉` by long
    * arithmetic) — floor makes T a conservative lower bound and no
    * float rounding can shorten a prefix below the safe length;
    * rationals i/n sit ≥ 1/(1e6·n) apart so the downstream double
    * compare can never admit a pair the integer bound excluded.
    */
  private def shingleIntersections(docs: DataFrame, idCol: String,
      textCol: String, shingleN: Int, maxDocFreq: Int,
      minOverlapFrac: Double, minSizeRatio: Double = 0.0): DataFrame =
    shingleIntersectionsFromIndex(
      buildShingleIndex(docs, idCol, textCol, shingleN, maxDocFreq,
        materialize = true),
      minOverlapFrac, minSizeRatio)

  /** The set-overlap scorers' PERSISTENT STATE — the corpus statistics
    * the prefix filter runs on, factored out of the per-query plan so a
    * production corpus maintains them as an index instead of re-deriving
    * them per run (the fitOrLoadIvf / minhash-band-table discipline;
    * round-10's 100× probe measured the global-df build + per-doc sort
    * dominating the containment plan past ~sf1 — this is the fix).
    *
    *   - `groups`: one row per DISTINCT shingle (xxhash64 key) —
    *     `(s, df, ds)` with `ds` the sorted member-doc list when
    *     df ≤ cap and NULL once df exceeds it (over-cap members are
    *     never candidate keys, and df only grows, so the list never
    *     comes back — but the row must survive so an incremental merge
    *     keeps counting it);
    *   - `docs`: one row per doc — `(doc_id, ts, n)` with `ts` the
    *     doc's **df ≥ 2** capped shingles sorted by the corpus-global
    *     (df asc, s asc) order and `n` the FULL capped-universe set
    *     size (df = 1 included — the jaccard/containment denominators
    *     need it; the singletons themselves never intersect and are
    *     stored once, in `groups`, not per doc — the third-decade disk
    *     fix, see [[docSetsFromMembership]]). The QUERY-TIME threshold
    *     decides the prefix length, so one index serves every
    *     (jaccard, containment, τ) variant.
    *
    * Incremental contract (see [[mergeShingleIndex]]): a doc's `ts` row
    * is rebuilt only when the doc is new or one of its shingles crossed
    * the cap; untouched docs keep their OLD df-order. That is sound
    * because prefix-filter correctness is a pure pigeonhole on prefix
    * LENGTH — if a qualifying pair's intersection avoided the smaller
    * doc's whole prefix it would fit inside the n − p = ⌈τ·n⌉ − 1
    * suffix, contradicting i ≥ ⌈τ·n⌉ — for ANY total order; df-ascending
    * merely minimizes candidates. Stale order costs a few extra
    * candidates, never a missed pair, and the exact re-score keeps
    * output identical to the full rebuild's.
    *
    * Round-14 additions (both optional — a pre-v3 artifact loads with
    * None and serves exactly as before):
    *   - `stats`: the strategy-pick statistics ([[ShingleStats]]),
    *     computed once at build/merge/save and persisted as `meta/` —
    *     no serve ever re-aggregates the groups table;
    *   - `pairs`: the PAIR STATE — exact intersection counts `(doc_a,
    *     doc_b, i)` over the capped df ≥ 2 universe, persisted as
    *     `pairs/` and maintained incrementally by [[mergeShingleIndex]]
    *     (the dedupstate pattern applied to the set-overlap family).
    *     With it, serving any (jaccard|containment, τ) is scan +
    *     attach n + filter — the sf100 probe's 383 s recompute becomes
    *     a state scan. Built only while the mention economics hold
    *     ([[mentionPlanPreferred]]): past the crossover the state is
    *     Σ C(df,2)-scale and the prefix plan is the right serve anyway.
    */
  final case class ShingleIndex(groups: DataFrame, docs: DataFrame,
      statsF: () => Option[ShingleStats] = () => None,
      pairs: Option[DataFrame] = None) {
    /** Strategy-pick statistics, LAZY (round 14, the r13 ADVICE item
      * generalized): forcing them costs a driver action — a meta-parquet
      * `head()` on a loaded index, the delta-vocabulary aggregate on a
      * merged one — that a pair-state serve never needs. Memoized, so
      * save + pick on the same index pay at most one action.
      */
    lazy val stats: Option[ShingleStats] = statsF()
  }

  /** Strategy-pick statistics over the capped df ≥ 2 groups — `mentions`
    * = Σ C(df,2) (the mention plan's explode volume) and `memberships`
    * = Σ df (the corpus co-occurrence mass). Computed ONCE at
    * build/merge time and persisted with the index (`meta/`), never
    * re-aggregated per serve (round-13 ADVICE: the per-serve stats agg
    * + `.head()` cost ~20 s at sf100 and blocked the driver on every
    * call for a lazily merged index).
    */
  final case class ShingleStats(mentions: Long, memberships: Long)

  /** One narrow model-sized aggregate over the groups stats — the only
    * corpus-scale action the strategy pick ever needs, paid at
    * build/merge/save, or once per serve only for an index that carries
    * no stored stats (a pre-v3 artifact).
    */
  private[graft] def computeShingleStats(groups: DataFrame): ShingleStats = {
    val row = groups.filter(col("ds").isNotNull && col("df") >= 2)
      .agg(sum(expr("(CAST(df AS BIGINT) * (df - 1)) div 2")).as("mentions"),
        sum(col("df").cast("long")).as("memberships"))
      .head()
    ShingleStats(if (row.isNullAt(0)) 0L else row.getLong(0),
      if (row.isNullAt(1)) 0L else row.getLong(1))
  }

  /** The mentions-vs-prefix crossover guard (see
    * [[shingleIntersectionsFromIndex]]): the mention plan moves
    * Σ C(df,2) ids-only rows, the prefix plan ~memberships-scale rows
    * with arrays on the re-score edge; mentions ≤ 32× memberships keeps
    * the explode strictly cheaper than the measured pairs×arrays
    * exchange it replaces. Pure function of the stored stats.
    */
  private[graft] def mentionPlanPreferred(st: ShingleStats): Boolean =
    st.mentions <= 32L * math.max(1L, st.memberships)

  /** Build the index from scratch: ONE groupBy(s) (map-side collect_set —
    * the dedup rides the aggregation, round 11 removed the separate
    * distinct shuffle) yields df and the member lists; one explode +
    * groupBy(doc_id) yields the df-sorted per-doc sets. Shingles leave
    * the scan as xxhash64 KEYS (the text_novelty ids-only-shuffle
    * discipline): every downstream stage shuffles, sorts, and compares
    * 8-byte longs instead of ~40-byte n-gram strings (measured
    * 4.6 → 2.9 s at sf0.1). Scores stay set-exact up to 64-bit hash
    * equality: a pair's count is wrong only if two DISTINCT shingles of
    * that pair collide (P ≤ |A|·|B|/2⁶⁴ per pair); the DuckDB oracle
    * computes the string-exact sets, so a fixture collision would
    * hash-fail loudly.
    *
    * `materialize = true` localCheckpoints both frames (the bandTable
    * discipline) for one-shot in-memory use, where groups feeds both the
    * doc-set derivation and the candidate join; pass false when the
    * frames are about to be persisted anyway ([[saveShingleIndex]]).
    */
  /** The per-doc aggregate shared by every index build/rebuild path:
    * from `(doc_id, s, df)` membership rows over the CAPPED universe
    * (df ≤ cap), emit `(doc_id, ts, n)` — `ts` the df-ordered struct
    * array of **df ≥ 2 shingles only**, `n` the FULL capped-universe
    * set size. A df = 1 shingle lives in exactly one document, so it
    * can never contribute to an intersection; storing it in the doc's
    * set only to re-shuffle it through the prefix join and the
    * re-score arrays was the measured third-decade wall (sf100: this
    * repetition-free corpus is ~90 % df = 1 vocabulary — ~30 GB of
    * doc-set entries + their in-flight shuffles exceeded the box's
    * disk). Scores stay exact: `i` counts only shared shingles (df ≥ 2
    * by definition) and `n` keeps the full size for the caller's
    * jaccard/containment denominators. The prefix pigeonhole stays
    * sound on the filtered sets — see [[shingleIntersectionsFromIndex]].
    */
  private def docSetsFromMembership(m: DataFrame): DataFrame =
    m.groupBy("doc_id")
      .agg(count(lit(1)).cast("int").as("n"),
        sort_array(collect_list(when(col("df") >= 2,
          struct(col("df"), col("s"))))).as("ts"))
      .select(col("doc_id"), col("ts"), col("n"))

  def buildShingleIndex(docs: DataFrame, idCol: String, textCol: String,
      shingleN: Int = 3, maxDocFreq: Int = DefaultMaxDocFreq,
      materialize: Boolean = true, pairState: Boolean = false): ShingleIndex = {
    val d = shingleTable(docs, idCol, textCol, shingleN, dedupe = false,
        maxDocFreq = Int.MaxValue)
      .select(col("doc_id"), xxhash64(col("s")).as("s"))
    // (A/B note: the full PPJoin POSITIONAL filter was measured here and
    // REVERTED — carrying (doc, pos, n) structs through a second
    // full-table shuffle cost ~2× what the extra candidate pruning saved
    // at every probed scale; the prefix + smaller-side + size-ratio
    // filters keep the candidate stream linear without it.)
    val grouped0 = d.groupBy("s")
      .agg(sort_array(collect_set(col("doc_id"))).as("ds0"))
      .select(col("s"), size(col("ds0")).as("df"),
        when(size(col("ds0")) <= maxDocFreq, col("ds0")).as("ds"))
    val grouped = if (materialize) grouped0.localCheckpoint() else grouped0
    // ONE per-doc aggregate over the capped universe: the df ≥ 2 shingle
    // array sorted by the global (df asc, s asc) order — sort_array over
    // structs IS that lexicographic order — plus the full capped size n.
    val docSets0 = docSetsFromMembership(grouped
      .filter(col("ds").isNotNull)
      .select(col("s"), col("df"), explode(col("ds")).as("doc_id")))
    val docSets = if (materialize) docSets0.localCheckpoint() else docSets0
    // stats ride the build (one model-sized agg on the just-checkpointed
    // groups — the serve-time strategy pick becomes a pure in-memory
    // compare); the lazy materialize=false form stays action-free and
    // leaves stats to the save path, which computes them from the
    // written parquet.
    val st: () => Option[ShingleStats] =
      if (materialize) {
        lazy val v = Some(computeShingleStats(grouped))
        () => v
      } else () => None
    // pair state only when the mention economics allow (the same guard
    // the serve-time strategy pick runs): past the crossover the state
    // is Σ C(df,2)-scale — larger than the corpus — and the prefix plan
    // is the right serve anyway. (Requesting pair state forces the
    // stats; a plain build leaves them lazy — round 14.)
    val ps = if (pairState && materialize && st().exists(mentionPlanPreferred))
      Some(mentionPairCounts(grouped).localCheckpoint()) else None
    ShingleIndex(grouped, docSets, st, ps)
  }

  /** Persist an index (groups + pairs + docs + meta parquet; the META
    * `_SUCCESS` marker commits last — it is the component every v3
    * writer always emits, so a half-written index never gates (round
    * 15: was docs-last, changed so the build can overlap the pairs and
    * docs jobs — see [[buildAndSaveShingleIndex]]). Stats are computed
    * here when the index carries none, so a saved artifact ALWAYS has
    * `meta/` and a loaded index never pays a per-serve strategy
    * aggregate; the pair state is written only when present (see
    * [[buildShingleIndex]]'s economics guard).
    */
  def saveShingleIndex(idx: ShingleIndex, path: String): Unit = {
    val spark = idx.groups.sparkSession
    import spark.implicits._
    idx.groups.write.mode("overwrite").parquet(s"$path/groups")
    idx.pairs.foreach(_.repartition(col("doc_a"))
      .sortWithinPartitions("doc_a", "doc_b") // see buildAndSaveShingleIndex
      .write.mode("overwrite").parquet(s"$path/pairs"))
    val st = idx.stats.getOrElse(computeShingleStats(idx.groups))
    idx.docs.write.mode("overwrite").parquet(s"$path/docs")
    Seq((st.mentions, st.memberships)).toDF("mentions", "memberships")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/meta")
  }

  /** Build an index DIRECTLY onto disk — the corpus-scale path. The
    * composed build+save ([[buildShingleIndex]] then
    * [[saveShingleIndex]]) stages every frame TWICE: both frames
    * localCheckpoint to block storage and then write again as parquet,
    * so the box carries ~2× the index's size in intermediates (measured:
    * the sf100 probe leg filled the sandbox's disk — ~700 M group rows
    * staged to block manager AND parquet, plus both aggregation
    * shuffles' files held until job end). Here `groups` is born as
    * parquet (one shuffle chain, one write), read BACK for the per-doc
    * aggregation (a column-pruned scan — cheaper than the checkpoint it
    * replaces), and `docs` written from that — peak disk ≈ the final
    * artifact plus one live shuffle, the LSM discipline of never holding
    * a second staged copy of state.
    */
  def buildAndSaveShingleIndex(docs: DataFrame, idCol: String,
      textCol: String, path: String, shingleN: Int = 3,
      maxDocFreq: Int = DefaultMaxDocFreq,
      pairState: Boolean = true): ShingleIndex = {
    val spark = docs.sparkSession
    import spark.implicits._
    val idx = buildShingleIndex(docs, idCol, textCol, shingleN, maxDocFreq,
      materialize = false)
    idx.groups.write.mode("overwrite").parquet(s"$path/groups")
    val grouped = spark.read.parquet(s"$path/groups")
    // stats from the WRITTEN groups (a pruned two-column scan), stored
    // as meta so no serve ever re-aggregates; the pair state — the
    // round-13 verdict's named lead — is born from the same parquet
    // scan when the mention economics allow, turning every later serve
    // into scan + attach-n + filter instead of the ΣC(df,2) explode +
    // hash-agg recompute (measured 383 s at sf100).
    val st = computeShingleStats(grouped)
    // (Round-15 A/B, documented negative: submitting the pairs job from
    // a second driver thread to overlap it with the docs job — guide
    // §2.6 — measured 618 vs 526 s at sf100 in adjacent windows. Both
    // jobs are full-width on a saturated 32-thread box, so they fight
    // for execution memory and disk instead of back-filling a tail;
    // reverted to sequential. meta/ still commits LAST as the gate.)
    if (pairState && mentionPlanPreferred(st))
      // cluster + sort the pair state before writing: unsorted (doc_a,
      // doc_b, i) longs are incompressible id noise (measured 11 GB at
      // the sf100 probe — 2.75× the rest of the index and the disk
      // wall of the incr-probe leg); sorted runs RLE/delta-encode.
      // ONE exchange for agg + layout (round 15, guide §2.4): the
      // mention stream is hash-partitioned by doc_a BEFORE the pair
      // aggregation — hashpartitioning(doc_a) satisfies the
      // groupBy(doc_a, doc_b) clustering requirement, so the
      // aggregation's own exchange IS the write layout and the
      // pair-scale repartition(doc_a) that followed the agg disappears
      // (r14 shape: agg exchange on (doc_a, doc_b) + a second full
      // pair-scale exchange on doc_a — two shuffles of ΣC(df,2)-scale
      // data where one suffices; sf100 build 584.9 → 526.0 s).
      mentionPairCountsByDocA(grouped)
        .sortWithinPartitions("doc_a", "doc_b")
        .write.mode("overwrite").parquet(s"$path/pairs")
    val docSets = docSetsFromMembership(grouped
      .filter(col("ds").isNotNull)
      .select(col("s"), col("df"), explode(col("ds")).as("doc_id")))
    docSets.write.mode("overwrite").parquet(s"$path/docs")
    Seq((st.mentions, st.memberships)).toDF("mentions", "memberships")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/meta")
    loadShingleIndex(spark, path)
  }

  def shingleIndexExists(spark: org.apache.spark.sql.SparkSession,
      path: String): Boolean = {
    // meta commits LAST in both writers (round 15 — previously docs;
    // every v3 artifact has meta, verified across the live registry
    // before the switch), so this is the never-gate-a-half-index marker
    val p = new org.apache.hadoop.fs.Path(s"$path/meta", "_SUCCESS")
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  def loadShingleIndex(spark: org.apache.spark.sql.SparkSession,
      path: String): ShingleIndex = {
    val conf = spark.sparkContext.hadoopConfiguration
    def committed(sub: String): Boolean = {
      val p = new org.apache.hadoop.fs.Path(s"$path/$sub", "_SUCCESS")
      p.getFileSystem(conf).exists(p)
    }
    // meta/pairs are optional on disk (pre-v3 artifacts; indexes past
    // the pair-economics guard) — absence degrades to the per-serve
    // stats agg / recompute plans, never to an error
    // LAZY (round 14): the meta head() is a driver action per load; a
    // pair-state serve never consults the stats, so loading must not
    // pay for them
    val st: () => Option[ShingleStats] = () =>
      if (committed("meta")) {
        val r = spark.read.parquet(s"$path/meta").head()
        Some(ShingleStats(r.getAs[Long]("mentions"), r.getAs[Long]("memberships")))
      } else None
    val ps = if (committed("pairs")) Some(spark.read.parquet(s"$path/pairs"))
      else None
    ShingleIndex(spark.read.parquet(s"$path/groups"),
      spark.read.parquet(s"$path/docs"), st, ps)
  }

  /** O(delta + affected) index maintenance — the daily-crawl step. New
    * docs' shingles merge into `groups` (df adds; member lists concat
    * while the shingle stays under cap, NULL once it crosses — df keeps
    * counting so it can never drift back under). Doc rows are rebuilt
    * ONLY for (a) the delta docs, (b) old docs holding a shingle that
    * CROSSED the cap this step (their capped sets shrank — the hot-list
    * no-drift contract of bandTableWithHotList, applied to the df
    * state), and (c) old docs holding a shingle that GREW from df = 1
    * to df ≥ 2 (their stored ts must gain it — singletons are not
    * stored per doc, see [[docSetsFromMembership]]; n is unchanged but
    * the shingle can now intersect). Every other doc keeps its existing
    * row — stale df-order is sound, see [[ShingleIndex]]. Append-only
    * contract: delta doc ids must be new (the incrementalStepExact
    * precondition).
    */
  def mergeShingleIndex(idx: ShingleIndex, delta: DataFrame, idCol: String,
      textCol: String, shingleN: Int = 3,
      maxDocFreq: Int = DefaultMaxDocFreq): ShingleIndex = {
    val dNew = shingleTable(delta, idCol, textCol, shingleN, dedupe = false,
        maxDocFreq = Int.MaxValue)
      .select(col("doc_id"), xxhash64(col("s")).as("s"))
      .distinct() // set semantics: rebuild keys and df both need it
      // lazy (round 14): materialize-once on first use, no dedicated job
      .localCheckpoint(false) // O(delta): feeds dGroups AND the rebuild keys
    val dGroups = dNew.groupBy("s")
      .agg(sort_array(collect_list(col("doc_id"))).as("dsd"))
      .select(col("s"), size(col("dsd")).as("dfd"), col("dsd"))
    // ONLY the delta-vocabulary rows change; they join the base stats
    // and MATERIALIZE small — O(delta vocabulary). Base rows are never
    // rewritten: the returned index is a LAZY view (base anti-join ∪
    // updated rows), so a daily step's compute is O(delta + affected)
    // plus base SCANS the serving plan was paying anyway — no O(corpus)
    // state churn. A caller that wants the merged state durable pays
    // the linear saveShingleIndex write explicitly (LSM-style compaction
    // cadence, not per step); the first un-persisted version of this
    // merge localCheckpointed the full merged state per step and the
    // 100× probe measured exactly that (e = 0.92 from checkpoint churn).
    //
    // SEMI-JOIN SLICE FIRST when the base side outgrows a broadcast
    // (round 15, guide §3.2): a LeftOuter with the small side on the
    // LEFT cannot broadcast-build its big right side, so past fixture
    // scale the planner sort-merge-shuffles the ENTIRE base groups table
    // (the 4 GB index at sf100) just to attach O(delta-vocab) rows. The
    // left-semi slice streams the base scan against the broadcast delta
    // keys (no corpus shuffle), and the outer join then runs small ×
    // small. Result identical: the left join reads exactly the base rows
    // whose s is a delta key, which is exactly the slice. The decision
    // is the planner's own boundary, read from plan-time statistics (no
    // job): under the broadcast threshold the direct join already
    // broadcasts the base and the slice would only add a pass.
    // the keys side is EXPLICITLY broadcast: the checkpointed delta
    // frame carries no usable static size, so an unhinted semi-join
    // plans sort-merge and pays the base shuffle's map side before AQE
    // can convert; delta smallness is the incremental path's standing
    // contract (the broadcast(hot)/broadcast(newlyHot) discipline)
    val baseForUpdate =
      if (exceedsBroadcast(idx.groups))
        idx.groups.join(broadcast(dGroups.select("s")), Seq("s"), "left_semi")
      else idx.groups
    val updated = dGroups.as("n").join(baseForUpdate.as("g"), Seq("s"), "left")
      .select(col("s"), coalesce(col("g.df"), lit(0)).as("df_old"),
        (coalesce(col("g.df"), lit(0)) + col("n.dfd")).as("df2"),
        col("g.ds").as("ds_old"), col("n.dsd").as("dsd"))
      .select(col("s"), col("df_old"), col("dsd"), col("df2").as("df"),
        when(col("df2") > maxDocFreq, lit(null))
          .when(col("ds_old").isNotNull,
            sort_array(concat(col("ds_old"), col("dsd"))))
          .otherwise(col("dsd"))
          .as("ds"),
        // crossing = was under cap (list present) and no longer is
        (col("ds_old").isNotNull && col("df2") > maxDocFreq).as("__crossed"),
        // GREW = was a singleton (df = 1, hence excluded from its one
        // member's stored ts — see docSetsFromMembership) and now has
        // df ≥ 2 while staying under the cap: the old member doc's ts
        // must GAIN the shingle or a (old, new) pair sharing it would
        // be invisible to both sides' prefixes (its own set is stale,
        // and the delta doc only probes as the SMALLER side).
        (col("df_old") === 1 && col("df2") <= maxDocFreq).as("__grew"),
        col("ds_old"))
      .localCheckpoint(false) // lazy — see dNew
    val crossedDocs = updated.filter(col("__crossed") || col("__grew"))
      .select(explode(col("ds_old")).as("doc_id")).distinct()
    val newGroups = idx.groups
      .join(dGroups.select("s"), Seq("s"), "left_anti")
      .unionByName(updated.select("s", "df", "ds"))
    // rebuild = delta docs' sets ∪ crossed/grew old docs' sets, re-keyed
    // to the MERGED df and re-capped; shingle membership for old docs
    // comes from their existing ts rows (df ≥ 2) PLUS the base index's
    // singleton rows (df = 1 shingles live only in groups — a map-side
    // explode of the df = 1 slice semi-joined to the rebuild set, one of
    // the base scans the serving plan pays anyway; output is O(affected
    // docs' vocabulary)). rebuildKeys is small — AQE broadcasts it
    // against the newGroups scan.
    val rebuildKeys = dNew.unionByName(
      idx.docs.join(crossedDocs, Seq("doc_id"))
        .select(col("doc_id"), explode(col("ts")).as("t"))
        .select(col("doc_id"), col("t.s").as("s")))
      .unionByName(
        idx.groups.filter(col("df") === 1)
          .select(explode(col("ds")).as("doc_id"), col("s"))
          .join(crossedDocs, Seq("doc_id"))
          .select(col("doc_id"), col("s")))
    val rebuilt = docSetsFromMembership(rebuildKeys
      .join(newGroups.filter(col("ds").isNotNull).select("s", "df"), Seq("s")))
      .localCheckpoint(false) // O(delta + affected); lazy — see dNew
    val untouched = idx.docs
      .join(crossedDocs, Seq("doc_id"), "left_anti")
      .join(delta.select(col(idCol).as("doc_id")).distinct(),
        Seq("doc_id"), "left_anti")
    // ----- pair-state + stats maintenance (round 14): both derive from
    // the SAME checkpointed `updated` frame — O(delta vocabulary), no
    // corpus re-scan, no extra base pass beyond the pair-state scan the
    // serving plan pays anyway.
    //
    // Stats: only updated rows change the capped df ≥ 2 sums. Per row,
    // new contribution − old contribution; old side counted iff the
    // base row was under cap (ds_old present; C(1,2) = 0 handles the
    // df = 1 slice), new side iff the merged row stays under cap.
    // LAZY thunk (round 14): the delta aggregate + head() is a driver
    // action a pair-state serve never needs; only save/strategy-pick
    // forces it (ShingleIndex.stats memoizes). `updated` is already
    // checkpointed, so a deferred force re-reads the materialized
    // blocks, not the merge lineage.
    val mergedStats: () => Option[ShingleStats] = () => idx.stats.map { base =>
      val c2new = expr("(CAST(df AS BIGINT) * (df - 1)) div 2")
      val c2old = expr("(CAST(df_old AS BIGINT) * (df_old - 1)) div 2")
      val r = updated.agg(
        sum(when(col("ds").isNotNull, c2new).otherwise(0L) -
          when(col("ds_old").isNotNull, c2old).otherwise(0L)).as("dm"),
        sum(when(col("ds").isNotNull && col("df") >= 2,
            col("df").cast("long")).otherwise(0L) -
          when(col("ds_old").isNotNull && col("df_old") >= 2,
            col("df_old").cast("long")).otherwise(0L)).as("dmem"))
        .head()
      ShingleStats(base.mentions + (if (r.isNullAt(0)) 0L else r.getLong(0)),
        base.memberships + (if (r.isNullAt(1)) 0L else r.getLong(1)))
    }
    // Pair state: the delta-mention algebra. An updated group that STAYS
    // under cap gains exactly its (old × new) + C(new, 2) member pairs
    // (+1 mention each — the df 1→2 grow case falls out: C(1,2) = 0 old
    // pairs, the cross pairs appear here); a group that CROSSES the cap
    // loses the C(df_old, 2) pairs it contributed while under it (−1
    // each); a group born or already over cap contributes nothing on
    // either side. i' = i + Σ delta, rows dropped at i' = 0 (a pair
    // whose only shared shingle crossed the cap). All ids-only, all
    // bounded by cap × |delta vocabulary|.
    val mergedPairs = idx.pairs.map { basePairs =>
      // ONE pass over `updated` (round 15; was three explode legs + a
      // 3-way union, each leg re-scanning the checkpointed frame and the
      // union re-shuffling into the delta aggregate). Per group row the
      // delta mentions are
      //   under cap → (old × new) cross adds + C(new, 2) within-new adds
      //   crossed   → −C(df_old, 2) retractions
      // and the two cases are DISJOINT (ds non-null ⟺ under cap, while
      // __crossed ⟹ over cap), so one flattened pair array per row
      // covers every leg — bounded by C(cap, 2) structs per row, and a
      // row that is neither (born/stayed over cap) yields NULL, which
      // explode drops. Pair semantics identical to the three legs:
      // cross pairs take least/greatest (base vs delta ids unordered),
      // within-array pairs enumerate x < y directly off the build-sorted
      // arrays via index slicing.
      def crossPairs(xs: Column, ys: Column, w: Long): Column =
        flatten(transform(xs, x => transform(ys, y =>
          struct(least(x, y).as("doc_a"), greatest(x, y).as("doc_b"),
            lit(w).as("w")))))
      def orderedPairs(xs: Column, w: Long): Column =
        flatten(transform(xs, (x, i) =>
          transform(slice(xs, i + lit(2), size(xs)), y =>
            struct(x.as("doc_a"), y.as("doc_b"), lit(w).as("w")))))
      val noOld = slice(col("dsd"), 1, 0) // empty, same element type
      val pairArr =
        when(col("ds").isNotNull,
          concat(
            crossPairs(when(col("ds_old").isNotNull, col("ds_old"))
              .otherwise(noOld), col("dsd"), 1L),
            orderedPairs(col("dsd"), 1L)))
        .when(col("__crossed"), orderedPairs(col("ds_old"), -1L))
      val dAgg = updated
        .select(explode(pairArr).as("p"))
        .select(col("p.doc_a").as("doc_a"), col("p.doc_b").as("doc_b"),
          col("p.w").as("w"))
        .groupBy("doc_a", "doc_b").agg(sum(col("w")).as("dw"))
        .filter(col("dw") =!= 0)
        .localCheckpoint(false) // O(delta pairs); joined twice below
      // (Round-15 A/B, documented negative: slicing basePairs with a
      // broadcast semi-join on the dAgg keys — the baseForUpdate move —
      // REGRESSED the sf100 merge probe. Unlike the delta VOCABULARY,
      // the delta PAIR key set is delta-memberships × df-scale (tens of
      // millions of rows at sf100) — far past sane broadcast size, so
      // the "slice" paid a giant driver collect + build where the
      // direct join's pair-state shuffle is exchange-reused by the
      // anti-join leg below anyway. Reverted to the r14 direct join.)
      val touched = dAgg.join(basePairs, Seq("doc_a", "doc_b"), "left")
        .select(col("doc_a"), col("doc_b"),
          (coalesce(col("i"), lit(0L)) + col("dw")).cast("long").as("i"))
        .filter(col("i") >= 1)
      basePairs
        .join(dAgg.select("doc_a", "doc_b"), Seq("doc_a", "doc_b"), "left_anti")
        .unionByName(touched)
    }
    ShingleIndex(newGroups, untouched.unionByName(rebuilt),
      mergedStats, mergedPairs)
  }

  /** The serving leg: every ordered pair that can reach
    * `i ≥ minOverlapFrac · min(|A|,|B|)` with its EXACT intersection
    * count and both (capped-universe) set sizes — `(doc_a, doc_b, i,
    * na, nb)`. Callers pass the weakest such bound their own threshold
    * implies and re-apply their exact predicate downstream, so the
    * output they keep is identical to the all-pairs formulation's.
    * With a loaded index this is the WHOLE per-run plan: two map-side
    * projections (prefix slice + ss re-sort), the candidate equi-join,
    * and the merge-count re-score — no corpus-wide aggregation at all.
    */
  private[graft] def shingleIntersectionsFromIndex(idx: ShingleIndex,
      minOverlapFrac: Double, minSizeRatio: Double = 0.0): DataFrame = {
    require(minOverlapFrac > 0.0 && minOverlapFrac <= 1.0,
      s"minOverlapFrac must be in (0, 1], got $minOverlapFrac")
    // STRATEGY (round 13, the third-decade fix): the prefix-filter +
    // array-re-score plan's pair-scale exchange carries candidate pairs
    // × BOTH docs' shingle arrays — measured 12.4 GB at ~sf10 (→ ~10×
    // that a decade up, the exact in-flight-shuffle wall that killed the
    // r12 sf100 attempt). When the capped df distribution is low (every
    // shipped graft surface runs cap = 20), the EXACT intersection
    // counts come far cheaper from CO-MEMBERSHIP MENTIONS: each capped
    // df ≥ 2 group emits its C(df, 2) ordered member pairs (ids only,
    // 24 B), one hash-agg counts i per pair — Σ C(df,2) ≤ (cap/2)·
    // memberships rows, and NO ARRAY EVER CROSSES THE WIRE (the
    // scoredBucketPairs lesson applied to sets). A boilerplate-heavy
    // corpus at a large cap inverts the economics (one df = 1000
    // shingle is 5·10⁵ mentions), so the strategy is picked from the
    // STORED index stats (computed once at build/merge/save — the
    // fit-once discipline); both plans are exact and emit the identical
    // (doc_a, doc_b, i, na, nb) contract, spec'd equal in DedupSpec.
    val tMicro = math.floor(minOverlapFrac * 1e6).toLong
    // PAIR STATE (round 14): an index carrying persisted iCounts serves
    // any (jaccard|containment, τ) as scan pairs + attach n + filter —
    // no explode, no aggregation, no strategy question (the state IS
    // the mention plan's aggregate, maintained incrementally by
    // mergeShingleIndex). Without it, the strategy pick runs on the
    // STORED stats (computed once at build/merge/save) and only a
    // stats-less pre-v3 artifact pays a per-serve aggregate.
    if (idx.pairs.isDefined) pairStateIntersections(idx, tMicro, minSizeRatio)
    else if (mentionPlanPreferred(
        idx.stats.getOrElse(computeShingleStats(idx.groups))))
      mentionIntersections(idx, tMicro, minSizeRatio)
    else prefixIntersections(idx, tMicro, minSizeRatio)
  }

  /** The mention-count plan: i(A, B) = the number of capped df ≥ 2
    * groups whose member list contains both docs, counted by exploding
    * each group's ordered member pairs and one hash aggregation —
    * ids-only end to end. Emits every pair with i ≥ 1 that survives the
    * conservative integer micro-unit bounds (a SUPERSET of the
    * qualifying pairs, like the prefix plan — callers re-apply their
    * exact predicate).
    */
  private[graft] def mentionIntersections(idx: ShingleIndex, tMicro: Long,
      minSizeRatio: Double): DataFrame =
    boundedIntersections(mentionPairCounts(idx.groups), idx.docs,
      tMicro, minSizeRatio)

  /** Serve from the PERSISTED pair state: the iCounts scan replaces the
    * whole mention explode + hash-agg (the sf100 383 s → state-scan
    * turn). Identical `(doc_a, doc_b, i, na, nb)` contract — spec'd
    * row-equal to [[mentionIntersections]] in DedupSpec.
    */
  private[graft] def pairStateIntersections(idx: ShingleIndex, tMicro: Long,
      minSizeRatio: Double): DataFrame =
    boundedIntersections(idx.pairs.get, idx.docs, tMicro, minSizeRatio)

  /** Exact per-pair intersection counts `(doc_a, doc_b, i)` from the
    * capped df ≥ 2 groups — the mention plan's aggregate and the pair
    * state's on-disk layout. Two chained explodes stream C(df, 2) rows
    * per group and keep (a < b): ds is build-sorted so values compare
    * directly; no combination array is ever materialized.
    */
  private[graft] def mentionPairCounts(groups: DataFrame): DataFrame =
    groups.filter(col("ds").isNotNull && col("df") >= 2)
      .select(col("s"), explode(col("ds")).as("doc_a"), col("ds"))
      .select(col("doc_a"), explode(col("ds")).as("doc_b"))
      .filter(col("doc_a") < col("doc_b"))
      .groupBy("doc_a", "doc_b")
      .agg(count(lit(1)).as("i"))

  /** [[mentionPairCounts]] in the pair state's ON-DISK layout: the
    * mention stream repartitions by doc_a FIRST, and because
    * hashpartitioning(doc_a) satisfies ClusteredDistribution(doc_a,
    * doc_b), the pair aggregation runs on that same exchange — agg
    * partitioning and write layout share ONE shuffle (guide §2.4). The
    * map-side partial aggregation the explicit repartition forgoes
    * bought little here by construction: a pair's duplicate mentions
    * come from different shingle groups, which the groups scan spreads
    * across partitions, so pre-exchange rows ≈ post-partial rows — and
    * the r14 shape paid a SECOND full pair-scale exchange to get the
    * doc_a layout back. Same rows, same aggregation, same final layout.
    */
  private[graft] def mentionPairCountsByDocA(groups: DataFrame): DataFrame =
    groups.filter(col("ds").isNotNull && col("df") >= 2)
      .select(col("s"), explode(col("ds")).as("doc_a"), col("ds"))
      .select(col("doc_a"), explode(col("ds")).as("doc_b"))
      .filter(col("doc_a") < col("doc_b"))
      .repartition(col("doc_a"))
      .groupBy("doc_a", "doc_b")
      .agg(count(lit(1)).as("i"))

  /** Shared serving tail: attach both docs' capped-universe sizes and
    * apply the conservative integer micro-unit bounds — reachability
    * (i ≥ frac·min; floor'd tMicro keeps a superset) and size
    * compatibility (min ≥ ratio·max).
    */
  private def boundedIntersections(iCounts: DataFrame, docSizes: DataFrame,
      tMicro: Long, minSizeRatio: Double): DataFrame = {
    val sizes = docSizes.select(col("doc_id"), col("n"))
    iCounts
      .join(sizes.select(col("doc_id").as("doc_a"), col("n").as("na")),
        Seq("doc_a"))
      .join(sizes.select(col("doc_id").as("doc_b"), col("n").as("nb")),
        Seq("doc_b"))
      .filter(lit(1000000L) * col("i") >=
        lit(tMicro) * least(col("na"), col("nb")))
      .filter(lit(1000000L) * least(col("na"), col("nb")) >=
        lit(math.floor(minSizeRatio * 1e6).toLong) *
          greatest(col("na"), col("nb")))
      .select(col("doc_a"), col("doc_b"), col("i").cast("long").as("i"),
        col("na").cast("long").as("na"), col("nb").cast("long").as("nb"))
  }

  /** The prefix-filter + sorted-merge re-score plan — the right shape
    * when hot capped shingles make Σ C(df,2) explode (large caps on
    * boilerplate-heavy corpora); see [[shingleIntersectionsFromIndex]].
    */
  private[graft] def prefixIntersections(idx: ShingleIndex, tMicro: Long,
      minSizeRatio: Double): DataFrame = {
    // Candidate keys come only from df ≥ 2 groups: a df = 1 shingle's
    // member list has one element, so its self-join contributes nothing
    // — skipping the slice keeps ~90 % of a natural corpus's vocabulary
    // out of the candidate join's build side.
    val grouped = idx.groups.filter(col("ds").isNotNull && col("df") >= 2)
    // Pigeonhole on the FILTERED set: iMin = ⌈τ·n⌉ runs on the FULL
    // capped size n (stored — the caller's denominators need it), but
    // every intersection element is shared, hence df ≥ 2, hence inside
    // the stored ts (size n2). If a qualifying pair's intersection
    // avoided the smaller doc's first p = n2 − iMin + 1 stored shingles
    // it would fit in the n2 − p = iMin − 1 suffix, contradicting
    // i ≥ iMin — the same argument as before, run on ts instead of the
    // full set. p ≤ 0 (n2 < iMin) means the doc cannot be the smaller
    // side of any qualifying pair: no prefix keys at all.
    val docSets = idx.docs
      .withColumn("p",
        size(col("ts")) - expr(s"($tMicro * n + 999999) div 1000000") + 1)
      .select(col("doc_id"),
        sort_array(transform(col("ts"), t => t.getField("s"))).as("ss"),
        transform(slice(col("ts"), lit(1), greatest(col("p"), lit(0))),
          t => t.getField("s")).as("pref"),
        col("n"))
    // Prefix keys explode map-side. Only the SMALLER side needs its
    // prefix indexed (the pigeonhole runs on min(|A|,|B|)), so the probe
    // keeps a pair only when it is the smaller doc — half the candidate
    // stream of symmetric generation.
    val prefix = docSets.select(col("doc_id").as("__pa"), col("n").as("__na"),
      explode(col("pref")).as("s"))
    val cand = prefix.join(grouped.select(col("s"), col("ds")), Seq("s"))
      .select(col("__pa"), col("__na"), explode(col("ds")).as("__pb"))
      .filter(col("__pa") =!= col("__pb"))
      .join(docSets.select(col("doc_id").as("__pb"), col("n").as("__nb")),
        Seq("__pb"))
      .filter(col("__na") < col("__nb") ||
        (col("__na") === col("__nb") && col("__pa") < col("__pb")))
      // size-compatibility prune BEFORE the distinct and the re-score:
      // callers whose predicate implies min ≥ ratio·max (Jaccard) pass
      // it; containment admits any size pair and passes 0. Integer
      // micro-unit compare with floor — conservative, never drops a
      // boundary-qualifying pair.
      .filter(lit(1000000L) * col("__na") >=
        lit(math.floor(minSizeRatio * 1e6).toLong) * col("__nb"))
      // output contract stays id-ordered (doc_a < doc_b), independent of
      // which side generated the candidate
      .select(least(col("__pa"), col("__pb")).as("doc_a"),
        greatest(col("__pa"), col("__pb")).as("doc_b"))
      .distinct()
    // exact re-score: candidates are SMALL (AQE broadcasts them), so the
    // two set joins stream docSets without shuffling it
    val sets = docSets.select(col("doc_id"), col("ss"), col("n"))
    cand
      .join(sets.select(col("doc_id"), col("ss").as("sa"), col("n").as("na")),
        col("doc_a") === col("doc_id")).drop("doc_id")
      .join(sets.select(col("doc_id"), col("ss").as("sb"), col("n").as("nb")),
        col("doc_b") === col("doc_id")).drop("doc_id")
      // merge-count intersect (graft.expressions.SortedIntersectCount):
      // both arrays are ascending-sorted above, so |A∩B| is one
      // zero-allocation merge walk instead of array_intersect's
      // per-pair hash-set build + materialized result array
      .select(col("doc_a"), col("doc_b"),
        org.apache.spark.sql.graft.Bridge.column(
          graft.expressions.SortedIntersectCount(
            org.apache.spark.sql.graft.Bridge.expression(col("sa")),
            org.apache.spark.sql.graft.Bridge.expression(col("sb"))))
          .cast("long").as("i"),
        col("na").cast("long").as("na"), col("nb").cast("long").as("nb"))
      .filter(col("i") >= 1)
  }

  /** [[ngramJaccardPairs]] served from a maintained [[ShingleIndex]]. */
  def ngramJaccardPairsFromIndex(idx: ShingleIndex, threshold: Double): DataFrame = {
    val jac = col("i") * lit(1.0) / (col("na") + col("nb") - col("i"))
    shingleIntersectionsFromIndex(idx,
        minOverlapFrac = 2.0 * threshold / (1.0 + threshold),
        minSizeRatio = threshold)
      .filter(jac >= threshold)
      .select(col("doc_a"), col("doc_b"), round(jac, 6).as("jaccard"))
  }

  /** [[containmentPairs]] served from a maintained [[ShingleIndex]]. */
  def containmentPairsFromIndex(idx: ShingleIndex, threshold: Double): DataFrame = {
    val contA = col("i") * lit(1.0) / col("na")
    val contB = col("i") * lit(1.0) / col("nb")
    shingleIntersectionsFromIndex(idx, minOverlapFrac = threshold)
      .filter(greatest(contA, contB) >= threshold)
      .select(col("doc_a"), col("doc_b"),
        round(contA, 6).as("cont_a"), round(contB, 6).as("cont_b"))
  }

  /** EXACT-SUBSTRING duplication scan — the published "Deduplicating
    * Training Data Makes Language Models Better" (Lee et al., 2021)
    * semantic, re-shaped for Spark: that paper builds a corpus-wide suffix
    * array to find any ≥50-token span shared verbatim between documents; a
    * suffix array is a total order over 100 TB of text and does not
    * distribute. The Spark-native estimator fingerprints spanLen-char
    * windows at TWO kinds of start position, unioned:
    *   - STRIDED (1, 1+stride, …): catches whole-document and
    *     aligned-offset copies exactly (and periodic runs at any offset,
    *     since collision is on span CONTENT, not position);
    *   - CONTENT-DEFINED anchors (positions whose anchorGram-char prefix
    *     hashes to 0 mod anchorMod — the CDC/winnowing idea): start
    *     positions are a pure function of local content, so a shared run
    *     produces IDENTICAL anchor positions inside the run in both
    *     documents regardless of alignment; a non-degenerate shared run
    *     of length L carries an in-run anchor with probability
    *     ≈ 1 − (1−1/anchorMod)^(L−spanLen), ≈1 beyond a few hundred chars.
    * Together: aligned copies are detected deterministically, misaligned
    * copies with probability ≈1 — without any corpus-wide order.
    *
    * Plan: explode is bounded (len/stride strided + len/anchorMod expected
    * anchor spans per doc); the groupBy shuffles md5 keys (uniform by
    * construction — no skew); the semi-join back against the shared-hash
    * set is AQE-broadcast when the duplicated-span universe is small (the
    * usual case). Boilerplate spans shared by half the corpus fan out only
    * as |docs containing them|, the honest answer for exact duplication.
    * Anchor detection here prices one md5 per character to stay
    * cross-engine oracle-parity (DuckDB has no xxhash64); a production
    * deployment swaps in a rolling-hash codegen Expression — one pass,
    * same anchor semantics.
    *
    * Output: `(doc_id, n_dup_spans)` — spans of the doc whose fingerprint
    * occurs in ≥2 distinct documents; docs with none are absent.
    */
  def duplicatedSpans(docs: DataFrame, idCol: String, textCol: String,
      spanLen: Int = 64, stride: Int = 32,
      anchorGram: Int = 16, anchorMod: Int = 16): DataFrame = {
    val lastStart = greatest(length(col(textCol)) - (spanLen - 1), lit(1))
    val strided = sequence(lit(1), lastStart, lit(stride))
    val anchors = filter(sequence(lit(1), lastStart), p =>
      conv(md5(col(textCol).substr(p, lit(anchorGram))).substr(1, 2), 16, 10)
        .cast("int") % anchorMod === 0)
    // Pin the anchor scan's width BEFORE the per-character hashing: the
    // projection below prices one md5 per character of corpus, and a
    // single-file table otherwise runs it in however few partitions the
    // scan produced (ONE task on a 32-core box — the fuzzyPairs lesson,
    // same count-pinned-repartition fix so AQE's byte-sighted coalescer
    // cannot fold the CPU-dense stage back together).
    // NULL text is dropped (r11 ADVICE): md5/xxhash64 of a NULL substring
    // collapses every null-text doc onto one fingerprint — they would
    // all count as mutual "duplicates" while a SQL oracle's
    // content-equality join never matches NULL.
    val wide = docs.select(col(idCol).as("doc_id"), col(textCol))
      .filter(col(textCol).isNotNull)
      .repartition(docs.sparkSession.sessionState.conf.numShufflePartitions,
        col("doc_id"))
    val spans = wide.select(col("doc_id"),
      explode(transform(array_union(strided, anchors),
        p => md5(col(textCol).substr(p, lit(spanLen))))).as("h"))
    spanDupCounts(spans)
  }

  /** Shared tail of the substring-dedup variants: spans `(doc_id, h)` →
    * per-doc count of spans whose fingerprint occurs in ≥2 distinct docs.
    * The groupBy shuffles hash keys (uniform — no skew); the semi-join
    * back is AQE-broadcast when the duplicated-span universe is small.
    */
  private def spanDupCounts(spans: DataFrame): DataFrame = {
    val shared = spans.groupBy("h")
      .agg(countDistinct(col("doc_id")).as("nd"))
      .filter(col("nd") > 1)
      .select("h")
    spans.join(shared, Seq("h"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_dup_spans"))
  }

  /** Production-path twin of [[duplicatedSpans]]: identical strided ∪
    * content-defined-anchor algebra, but anchors come from the native
    * [[graft.expressions.RollingAnchors]] rolling hash (ONE O(1)-per-char
    * pass — no per-position substring or digest allocation) and span
    * fingerprints are `xxhash64` instead of md5. Same alignment-free
    * detection guarantee (anchor selection is content-local either way);
    * not oracle-expressible because the oracle engine has neither hash,
    * so [[duplicatedSpans]] stays the hash-checked variant and
    * SpanDedupSpec pins this one's recall equivalence on constructed
    * corpora.
    */
  def duplicatedSpansRolling(docs: DataFrame, idCol: String, textCol: String,
      spanLen: Int = 64, stride: Int = 32,
      anchorGram: Int = 16, anchorMod: Int = 16): DataFrame = {
    import org.apache.spark.sql.graft.Bridge
    val lastStart = greatest(length(col(textCol)) - (spanLen - 1), lit(1))
    val strided = sequence(lit(1), lastStart, lit(stride))
    val anchors = Bridge.column(graft.expressions.RollingAnchors(
      Bridge.expression(col(textCol)), Bridge.expression(lit(anchorGram)),
      Bridge.expression(lit(anchorMod)), Bridge.expression(lit(spanLen))))
    val wide = docs.select(col(idCol).as("doc_id"), col(textCol))
      .filter(col(textCol).isNotNull) // see duplicatedSpans' NULL note
      .repartition(docs.sparkSession.sessionState.conf.numShufflePartitions,
        col("doc_id"))
    val spans = wide.select(col("doc_id"),
      explode(transform(array_union(strided, anchors),
        p => xxhash64(col(textCol).substr(p, lit(spanLen))))).as("h"))
    spanDupCounts(spans)
  }

  /** Strided-only duplicated-span counts — the SQL-exact FLOOR behind
    * dedup_substring_fast's oracle flags. Both substring variants
    * examine every strided position, and extra (anchor) positions can
    * only ADD occurrences of a span's content to the shared set, so the
    * rolling variant's per-doc count is ≥ this strided-only count on
    * every doc (hash-collision inflation included: a 64-bit collision
    * can only add false dups, never remove true ones). Fingerprints are
    * xxhash64; the oracle groups raw 64-char content, equal up to
    * 64-bit collisions (P ≤ n_spans²/2⁶⁴ — the shingle-keying
    * argument).
    */
  def duplicatedSpansStrided(docs: DataFrame, idCol: String, textCol: String,
      spanLen: Int = 64, stride: Int = 32): DataFrame = {
    val lastStart = greatest(length(col(textCol)) - (spanLen - 1), lit(1))
    val wide = docs.select(col(idCol).as("doc_id"), col(textCol))
      .filter(col(textCol).isNotNull) // see duplicatedSpans' NULL note
      .repartition(docs.sparkSession.sessionState.conf.numShufflePartitions,
        col("doc_id"))
    val spans = wide.select(col("doc_id"),
      explode(transform(sequence(lit(1), lastStart, lit(stride)),
        p => xxhash64(col(textCol).substr(p, lit(spanLen))))).as("h"))
    spanDupCounts(spans)
  }

  /** Bloom-pruned EXACT-duplicate detection for the incremental ingest
    * path: which delta documents carry text already present verbatim in
    * the base corpus? The naive answer is one delta⋈base semi-join on the
    * text — correct, but at 100 TB it shuffles the ENTIRE delta against
    * the ENTIRE base every ingest. This operator builds Spark's own
    * `BloomFilterAggregate` sketch (the runtime-row-level-filter
    * machinery, here driven explicitly) over `xxhash64(text)` of the
    * base, prunes the delta to bloom candidates — false-positive rate set
    * by `numBits`/`expectedItems`, false NEGATIVES impossible — and
    * exact-confirms only the survivors with the semi-join. Output is
    * EXACT regardless of the bloom's FP rate (every candidate is
    * re-checked), so the operator is oracle-checkable against the plain
    * semi-join SQL; the bloom only bounds the join's probe side to
    * |true dups| + fpp·|delta|. Driver state is the sketch (numBits/8
    * bytes — model-sized, like the IVF centroid table), broadcast to
    * executors as a literal. In production the base-side sketch is
    * persisted with the corpus and merged incrementally
    * (BloomFilterAggregate partials are mergeable), so a daily ingest
    * never re-scans the base — the same economics as
    * [[incrementalStepExact]], for the exact-match tier.
    */
  def bloomPrunedExactMatches(base: DataFrame, delta: DataFrame,
      textCol: String, expectedItems: Long = 1000000L,
      numBits: Long = 8388608L): DataFrame = {
    import org.apache.spark.sql.graft.Bridge
    import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
    import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
    val bloomBytes = base.agg(Bridge.column(new BloomFilterAggregate(
        Bridge.expression(xxhash64(col(textCol))),
        Literal(expectedItems), Literal(numBits)).toAggregateExpression())
        .as("bf"))
      .head().getAs[Array[Byte]]("bf")
    val baseTexts = base.select(col(textCol)).distinct()
    if (bloomBytes == null) delta.limit(0) // empty base: no sketch, no dups
    else delta
      .filter(Bridge.column(BloomFilterMightContain(Literal(bloomBytes),
        Bridge.expression(xxhash64(col(textCol))))))
      .join(baseTexts, Seq(textCol), "left_semi")
  }
}
