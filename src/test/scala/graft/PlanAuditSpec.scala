package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.FormattedMode

/** §4 physical-plan invariants: pushdown, pruning, broadcast. */
class PlanAuditSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def planOf(name: String): String =
    SparkEntry.queries(name)(spark, dir).queryExecution.explainString(FormattedMode)

  test("proj_tags prunes the parquet read schema to the selected columns") {
    val plan = planOf("proj_tags")
    val read = plan.linesIterator.find(_.contains("ReadSchema")).get
    assert(read.contains("l_orderkey") && read.contains("l_quantity"))
    assert(!read.contains("l_returnflag") && !read.contains("l_shipdate"), read)
  }

  test("filter_rowexpr predicates reach PushedFilters") {
    val plan = planOf("filter_rowexpr")
    val pushed = plan.linesIterator.find(_.contains("PushedFilters")).get
    assert(pushed.contains("l_quantity") && pushed.contains("l_discount"), pushed)
  }

  test("filter_timerange pushes the time bounds to the events scan") {
    val plan = planOf("filter_timerange")
    val pushed = plan.linesIterator.filter(_.contains("PushedFilters")).mkString("\n")
    assert(pushed.contains("GreaterThanOrEqual(ts") || pushed.contains("ts,"),
      s"time range not pushed:\n$plan")
  }

  test("join_dim_broadcast and join_multiway broadcast their dimension sides") {
    assert(planOf("join_dim_broadcast").contains("BroadcastHashJoin"))
    val multi = planOf("join_multiway")
    assert(multi.contains("BroadcastHashJoin"))
  }

  test("join_interval stays a keyed join — never a nested-loop range join") {
    val plan = planOf("join_interval")
    // equi-join on the key with the interval as residual condition: any of
    // the keyed strategies is fine (broadcast at tiny SF, SMJ at scale)
    assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin")
      || plan.contains("BroadcastHashJoin"), s"expected a keyed join:\n$plan")
    assert(!plan.contains("NestedLoop"), s"range condition degraded the join:\n$plan")
  }

  test("text queries prune the documents scan to the columns they touch") {
    val plan = planOf("text_tokens")
    val read = plan.linesIterator.find(_.contains("ReadSchema")).get
    assert(read.contains("doc_id") && read.contains("text"), read)
    assert(!read.contains("lang"), s"documents scan reads unused columns: $read")
  }

  test("text_decontaminate broadcasts the benchmark shingles — the corpus never self-joins") {
    val plan = planOf("text_decontaminate")
    assert(plan.contains("BroadcastHashJoin"), s"benchmark side not broadcast:\n$plan")
  }

  test("sample_target_mix and sample_cap_per_key stay stratum-local") {
    // target mix: thresholds are plan-time literals, so the kept set is a
    // pure scan filter — no join, no aggregation in the serving plan
    val mix = planOf("sample_target_mix")
    assert(!mix.contains("Join"), s"target-mix filter should not join:\n$mix")
    // per-key cap: the window partitions by the stratum, audited globally
    // by the single-partition-window invariant below
    assert(planOf("sample_cap_per_key").contains("Window"))
  }

  test("no shipped query windows over a single partition (100 TB scale audit)") {
    // A WindowExec with an empty partitionSpec forces ALL rows through one
    // Exchange SinglePartition — correct at sf0.01, a scale-killer at 100×.
    // Sink-side global orderBy (range exchange) is allowed: it is the
    // oracle's determinism contract and would be dropped in production.
    // Exception: a window whose input subtree is LIMIT-BOUNDED (top-k
    // selection before ranking, e.g. the hybrid-retrieval legs) processes
    // O(k) rows wherever it runs — the exchange it forces is k rows, not
    // the corpus.
    import org.apache.spark.sql.execution.window.WindowExec
    import org.apache.spark.sql.execution.{CollectLimitExec, GenerateExec, GlobalLimitExec, SparkPlan, TakeOrderedAndProjectExec, UnionExec}
    import org.apache.spark.sql.execution.joins.BaseJoinExec
    // The limit must bound the window's INPUT PATH cardinality, not merely
    // exist somewhere in the subtree: a limit on one branch of a join whose
    // other branch is the full corpus bounds nothing. Walking down: a limit
    // node bounds; a join bounds only if BOTH sides bound (≤ k·k rows); a
    // union if ALL legs bound; a row-multiplying Generate (explode) never
    // bounds from below; any other unary node passes through; leaves and
    // unrecognized multi-child nodes are unbounded.
    def limitBounded(p: SparkPlan): Boolean = p match {
      case _: GlobalLimitExec | _: CollectLimitExec |
           _: TakeOrderedAndProjectExec => true
      case _: GenerateExec => false
      case j: BaseJoinExec => limitBounded(j.left) && limitBounded(j.right)
      case u: UnionExec => u.children.forall(limitBounded)
      case other if other.children.size == 1 => limitBounded(other.children.head)
      case _ => false
    }
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      val plan = fn(spark, dir).queryExecution.sparkPlan
      val bad = plan.collect {
        case w: WindowExec if w.partitionSpec.isEmpty && !limitBounded(w.child) => w
      }
      if (bad.nonEmpty) Some(name) else None
    }
    assert(offenders.isEmpty, s"global-window queries: ${offenders.mkString(", ")}")
  }

  test("join_bloom_prune: the fact scan carries a might_contain prefilter BEFORE the join") {
    val df = SparkEntry.queries("join_bloom_prune")(spark, dir)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"),
      s"bloom prefilter missing from the fact side:\n${plan.take(3000)}")
    // and the prefilter must not change the answer: equal to the plain join
    val plain = spark.read.parquet(s"$dir/lineitem.parquet")
      .join(spark.read.parquet(s"$dir/part.parquet")
        .filter(col("p_brand") === "Brand#7"),
        col("l_partkey") === col("p_partkey"))
      .groupBy("p_type").agg(count(lit(1)).as("n"))
      .orderBy("p_type").collect().map(r => (r.getString(0), r.getLong(1)))
    val pruned = df.collect().map(r => (r.getString(0), r.getLong(1)))
    assert(pruned.toSeq == plain.toSeq)
  }

  test("multi-reference dedup plans dedupe their shared subtrees via exchange reuse") {
    // ngram: since round 11 the shingle statistics live in the PERSISTED
    // ShingleIndex (fingerprint-keyed registry, the minhash-band
    // discipline) — serving executions must read the skinny index
    // parquet (groups on the candidate side, docs on the prefix + both
    // re-score sides) and NEVER touch the raw documents corpus (i.e.
    // never re-run the shingle→hash→groupBy derivation per run).
    val df = SparkEntry.queries("dedup_ngram_jaccard")(spark, dir)
    df.collect()
    val executed = df.queryExecution.executedPlan.toString
    val idxScans = executed.linesIterator.count(l =>
      l.contains("Scan parquet") && l.contains("shidx_"))
    val ngramCorpusScans = executed.linesIterator.count(l =>
      l.contains("Scan parquet") && !l.contains("shidx_"))
    assert(idxScans >= 3 && ngramCorpusScans == 0,
      s"ngram serving must read the persisted shingle index only " +
        s"(index=$idxScans corpus=$ngramCorpusScans):\n${executed.take(4000)}")
    // lsh: since round 10 the band table is PERSISTED fingerprint-keyed
    // in the registry (the fitOrLoadIvf discipline) — serving executions
    // must read the skinny (doc_id, band, bh) parquet on BOTH self-join
    // sides and never touch the raw documents corpus (i.e. never re-run
    // the shingle→digest→20-min-agg derivation)
    val lsh = SparkEntry.queries("dedup_minhash_lsh")(spark, dir)
    lsh.collect()
    val lshPlan = lsh.queryExecution.executedPlan.toString
    val bandScans = lshPlan.linesIterator.count(l =>
      l.contains("Scan parquet") && l.contains("minhashbands_"))
    val corpusScans = lshPlan.linesIterator.count(l =>
      l.contains("Scan parquet") && !l.contains("minhashbands_"))
    assert(bandScans >= 2 && corpusScans == 0,
      s"band self-join must read the persisted band table on both sides " +
        s"(band=$bandScans corpus=$corpusScans):\n${lshPlan.take(4000)}")
  }

  test("sink_influx_lines is a narrow scan→codec→sort plan") {
    val plan = planOf("sink_influx_lines")
    // format+parse must stay row-local column expressions: the ONLY
    // exchange is the sink-side determinism sort
    val exchanges = plan.linesIterator.count(_.trim.startsWith("Exchange"))
    assert(exchanges <= 1, s"codec round trip introduced a shuffle:\n$plan")
    assert(!plan.contains("BatchEvalPython") && !plan.contains("mapPartitions"))
  }

  test("multimodal_decode shuffles only for the sink sort") {
    val plan = planOf("multimodal_decode")
    val exchanges = plan.linesIterator.count(_.trim.startsWith("Exchange"))
    assert(exchanges <= 1, s"decode pipeline must be partition-local:\n$plan")
  }

  test("sample_pack windows per shard — never a single global sort") {
    import org.apache.spark.sql.execution.window.WindowExec
    val plan = SparkEntry.queries("sample_pack")(spark, dir).queryExecution.sparkPlan
    val windows = plan.collect { case w: WindowExec => w }
    assert(windows.nonEmpty && windows.forall(_.partitionSpec.nonEmpty),
      "packing cumsum must partition by shard")
  }

  test("pipeline_curation shuffles only for dedup, its id join, and the sink sort") {
    val plan = planOf("pipeline_curation")
    val exchanges = plan.linesIterator.count(_.trim.startsWith("Exchange"))
    // dedup groupBy + canonical-id join sides + final sort; the quality
    // gate must NOT contribute (pass-through scoring, no metric join)
    assert(exchanges <= 4, s"curation pipeline gained a shuffle:\n$plan")
  }

  test("join_fuzzy is a keyed block join, never a cartesian") {
    val plan = planOf("join_fuzzy")
    assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin")
      || plan.contains("BroadcastHashJoin"), s"expected a keyed join:\n$plan")
    assert(!plan.contains("CartesianProduct") && !plan.contains("NestedLoop"),
      s"blocking degraded to all-pairs:\n$plan")
  }

  test("dedup_semantic broadcasts the seed side; the pair join keys on the cluster") {
    val plan = planOf("dedup_semantic")
    // seed assignment = broadcast (tiny limit-k side); within-cluster pair
    // join = keyed equi-join (any strategy), never an unbounded cartesian
    assert(plan.contains("BroadcastExchange"), s"seeds must broadcast:\n$plan")
    assert(!plan.contains("CartesianProduct"), s"pair stage went all-pairs:\n$plan")
  }

  test("agg_robust_zscore attaches its parameter frames by broadcast join") {
    val plan = planOf("agg_robust_zscore")
    assert(plan.contains("BroadcastHashJoin"),
      s"median/MAD frames must broadcast back:\n$plan")
  }

  test("unpivot and chunking stay narrow: no shuffle beyond the sink sort") {
    for (name <- Seq("proj_unpivot", "text_chunk")) {
      val plan = planOf(name)
      val exchanges = plan.linesIterator.count(_.trim.startsWith("Exchange"))
      assert(exchanges <= 1, s"$name gained a shuffle:\n$plan")
    }
  }

  test("phash and incremental dedup stay keyed — no cartesian anywhere") {
    // both are banded/blocked candidate generators: a CartesianProduct or
    // nested loop in EITHER plan means the blocking degraded to all-pairs
    for (name <- Seq("multimodal_phash_dedup", "dedup_incremental")) {
      val plan = planOf(name)
      assert(!plan.contains("CartesianProduct") && !plan.contains("NestedLoop"),
        s"$name went all-pairs:\n${plan.take(4000)}")
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin")
        || plan.contains("BroadcastHashJoin"), s"$name: expected a keyed join")
    }
  }

  test("per-year lake layout prunes non-matching year directories at listing time") {
    // The ncs-reader lake shape: dir/year=YYYY/part-*.parquet. A
    // time-range read must touch ONLY the matching years' files — at a
    // decade-deep 100 TB lake this is the difference between scanning
    // one year and scanning ten.
    val lake = java.nio.file.Files.createTempDirectory("graft-yearlake").toString
    val ev = graft.sources.Events.read(spark, s"$dir/events.parquet")
    // the sf0.001 fixture spans a single year — shift a copy +1y so the
    // lake has two year= directories and pruning is observable
    ev.union(ev.withColumn("ts", col("ts") + expr("INTERVAL 1 YEAR")))
      .withColumn("year", year(col("ts")))
      .write.partitionBy("year").mode("overwrite").parquet(lake)
    val years = new java.io.File(lake).listFiles().map(_.getName)
      .filter(_.startsWith("year=")).sorted
    assert(years.length >= 2, s"fixture spans ${years.mkString(",")} — need 2+ years")
    val y = years.head.stripPrefix("year=").toInt
    val df = graft.sources.TagSources.readYearPartitioned(spark, lake,
      java.sql.Timestamp.valueOf(s"$y-01-01 00:00:00"),
      java.sql.Timestamp.valueOf(s"$y-12-31 23:59:59"))
    // the physical scan's selected partitions are the post-pruning file
    // list (inputFiles reports the UNpruned relation — not what executes)
    import org.apache.spark.sql.execution.FileSourceScanExec
    val scan = df.queryExecution.sparkPlan.collectFirst { case s: FileSourceScanExec => s }.get
    val files = scan.selectedPartitions.toPartitionArray.map(_.urlEncodedPath)
    assert(files.nonEmpty && files.forall(_.contains(s"year=$y")),
      s"scan listed non-matching years: ${files.filterNot(_.contains(s"year=$y")).take(3).mkString(",")}")
    // and the plan carries it as a PARTITION filter (pruning, not a scan filter)
    val plan = df.queryExecution.explainString(FormattedMode)
    val pf = plan.linesIterator.find(_.contains("PartitionFilters")).getOrElse("")
    assert(pf.contains("year"), s"year bound not a partition filter:\n$plan")
    // the row-level ts bound still reaches the parquet reader
    val pushed = plan.linesIterator.filter(_.contains("PushedFilters")).mkString
    assert(pushed.contains("ts"), s"ts bound not pushed:\n$plan")
  }

  test("autoencoder scoring stays shuffle-free column math") {
    import spark.implicits._
    val train = (1 to 50).map(i => (i * 1.0, i * 2.0)).toDF("a", "b")
    val m = graft.ml.AutoEncoder.fit(train, Seq("a", "b"), hidden = 4)
    val plan = m.score(train).queryExecution.explainString(FormattedMode)
    assert(!plan.contains("Exchange"), s"scoring must not shuffle:\n$plan")
  }

  test("LSH and IVF plans carry the native matrix expressions, not literal trees") {
    // The literal forms (4096 inlined plane doubles / nLists×dim centroid
    // literals) made Janino compile time dominate execution — round 7.
    // The native expressions keep the generated source loop-sized.
    val lsh = planOf("simsearch_lsh")
    assert(lsh.contains("graft_lsh_buckets"),
      s"simsearch_lsh lost the native bucketing expression:\n${lsh.take(2000)}")
    val ivf = planOf("simsearch_ivf")
    assert(ivf.contains("graft_nearest_centroid"),
      s"simsearch_ivf lost the native assignment expression:\n${ivf.take(2000)}")
  }

  test("fuzzy join pins a block-keyed exchange on the probe side") {
    // A count-flexible repartition gets folded back to one partition by
    // AQE's byte-sighted coalescer, serializing the whole Levenshtein
    // re-score on one core (round 7). The explicit-width repartition must
    // survive in the plan as a blk-keyed shuffle.
    val plan = planOf("join_fuzzy")
    assert(plan.contains("hashpartitioning(blk") && plan.contains("REPARTITION_BY_NUM"),
      s"probe-side pinned block exchange missing — re-score will serialize:\n$plan")
  }

  test("repeat executions of a wide pipeline recompile nothing (codegen cache holds)") {
    import org.apache.spark.metrics.source.CodegenMetrics
    val fn = SparkEntry.queries("dedup_incremental")
    fn(spark, dir).count() // populate the cache (and any registry state)
    val before = CodegenMetrics.METRIC_COMPILATION_TIME.getCount
    fn(spark, dir).count()
    val recompiles = CodegenMetrics.METRIC_COMPILATION_TIME.getCount - before
    // The default 100-entry cache thrashed here: 130 fresh compiles per
    // execution (round 7). The deployment-sized cache must make repeat
    // executions compile-free; a small allowance covers unrelated
    // concurrent suites sharing the JVM-global metric.
    assert(recompiles <= 5,
      s"$recompiles codegen units recompiled on a repeat execution — cache thrash is back")
  }

  test("search_bm25 filters postings to query terms via broadcast BEFORE the tf shuffle") {
    // the term filter must be a broadcast semi/inner join against the
    // 3-row query frame, and the documents scan must stay 2-column — at
    // 100 TB the tf shuffle is |matching postings|, never |tokens|
    val plan = planOf("search_bm25")
    assert(plan.contains("BroadcastHashJoin"), s"query terms not broadcast:\n$plan")
    val read = plan.linesIterator.find(l => l.contains("ReadSchema") &&
      l.contains("text")).get
    assert(!read.contains("lang") && !read.contains("source"),
      s"documents scan reads unused columns: $read")
  }

  test("Lake.upsert plans a keyed anti join, never a cartesian") {
    import graft.ops.Lake
    val base = spark.read.parquet(s"$dir/events.parquet")
    val updates = base.limit(10)
    val plan = Lake.upsert(base, updates, Seq("event_id"))
      .queryExecution.sparkPlan.toString
    assert(plan.contains("LeftAnti"), s"expected an anti join:\n$plan")
    assert(!plan.contains("NestedLoop") && !plan.contains("Cartesian"),
      s"merge degraded to a cartesian:\n$plan")
  }

  test("dedup_substring pins a doc-keyed exchange before the per-char anchor scan") {
    // same lesson as join_fuzzy: the hash projection prices one md5 per
    // corpus character; an unpinned single-file scan serializes it
    val plan = planOf("dedup_substring")
    assert(plan.contains("hashpartitioning(doc_id") && plan.contains("REPARTITION_BY_NUM"),
      s"anchor-scan exchange missing — per-char hashing will serialize:\n$plan")
  }

  test("drift queries attach per-key bin ranges by broadcast join") {
    for (q <- Seq("agg_ks_drift", "agg_psi_drift")) {
      val plan = planOf(q)
      assert(plan.contains("BroadcastHashJoin"), s"$q ranges not broadcast:\n$plan")
    }
  }

  test("sink_partitioned's read-back prunes non-matching date partitions " +
      "at the scan") {
    val df = SparkEntry.queries("sink_partitioned")(spark, dir)
    // the layout must actually CONTAIN out-of-range dates, or the prune
    // assertion below is vacuous (the fixture month spans 2024-01)
    val root = SparkEntry.partitionedRoot(spark, dir)
    val all = new java.io.File(root).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("event_date="))
      .map(_.getName.stripPrefix("event_date=")).sorted
    assert(all.exists(_ < "2024-01-08") || all.exists(_ >= "2024-01-15"),
      s"layout has no out-of-range partitions: ${all.mkString(",")}")
    // the physical scan's selected partitions are the post-pruning list
    import org.apache.spark.sql.execution.FileSourceScanExec
    val scan = df.queryExecution.sparkPlan
      .collectFirst { case s: FileSourceScanExec => s }.get
    val dates = scan.selectedPartitions.toPartitionArray
      .map(_.urlEncodedPath)
      .flatMap(_.split("/").find(_.startsWith("event_date=")))
      .map(_.stripPrefix("event_date=")).distinct.sorted
    assert(dates.nonEmpty &&
      dates.forall(d => d >= "2024-01-08" && d < "2024-01-15"),
      s"scan listed out-of-range partitions: ${dates.mkString(",")}")
    val plan = df.queryExecution.explainString(FormattedMode)
    val pf = plan.linesIterator.find(_.contains("PartitionFilters")).getOrElse("")
    assert(pf.contains("event_date"), s"date bound not a partition filter:\n$plan")
  }

  // ---- round-15 regression guards for the r14 optimization round's
  // headline plan shapes (the r14 verdict's #8): a future refactor that
  // silently reintroduces a replayed subtree or the per-character langid
  // exchange must fail here, not in a scale probe two rounds later.

  private def countIn(plan: String, needle: String): Int =
    plan.sliding(needle.length).count(_ == needle)

  test("agg_basket_lift never replays the stats subtree through its pair union (r14: 80→2 Exchanges)") {
    val plan = planOf("agg_basket_lift")
    val n = countIn(plan, "Exchange")
    assert(n <= 4, s"agg_basket_lift carries $n Exchanges (r14 shape: 2):\n${plan.take(2000)}")
  }

  test("simsearch_knn_incr keeps the one-bucket-join merge shape (r14: 48→12 scans, 24→0 Generate)") {
    val plan = planOf("simsearch_knn_incr")
    val scans = countIn(plan, "Scan parquet")
    assert(scans <= 12, s"simsearch_knn_incr carries $scans parquet scans (r14 shape: 12)")
    assert(!plan.contains("Generate"),
      "simsearch_knn_incr re-grew an explode leg (r14 removed all 24)")
  }

  test("langid plans never reintroduce the per-character synthetic-id window (r14: grams are scan-side)") {
    for (q <- Seq("text_langid", "text_langid_trained")) {
      val plan = planOf(q)
      assert(!plan.contains("monotonically_increasing_id"),
        s"$q re-grew the per-character __rid window")
      val n = countIn(plan, "Exchange")
      assert(n <= 8, s"$q carries $n Exchanges (r14 shape: 8)")
    }
  }
}
