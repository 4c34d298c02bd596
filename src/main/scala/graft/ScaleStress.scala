package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** 10× scale-stress probe — the "would this survive 100 TB" evidence run.
  *
  * Correctness is graded at sf0.01 and throughput at sf0.1; every heavy
  * operator is ARGUED scale-safe (banded/blocked/df-capped designs). This
  * main produces measurements instead of argument: it deterministically
  * expands the sf0.1 fixture 10× (≈ sf1) and times the heaviest operator
  * plans at both scales, printing the per-probe scaling exponent
  * e = log10(t_10x / t_1x) — e ≈ 1 is linear (good), e ≪ 1 means fixed
  * costs still dominate at sf1, e > 1.2 names a super-linear stage to fix.
  *
  * Expansion (all derivations deterministic, no RNG):
  *   - documents ×R: replica r rewrites every word w → "w~r", so shingle
  *     sets are DISJOINT across replicas — corpus grows 10× with the
  *     within-replica duplicate structure intact, instead of turning every
  *     doc into a 10-way near-duplicate cluster (which would measure a
  *     pathological corpus, not scale);
  *   - events ×R: replica r shifts ts by r×35 days (disjoint time ranges —
  *     a 10× longer history at identical density) and offsets
  *     event_id/user_id into disjoint ranges;
  *   - embeddings ×R: vec_id offset per replica; vectors kept verbatim
  *     (10× corpus density — bucketed ANN must absorb denser buckets).
  *
  * The dedup twin-family (minhash/near-dup/clusters) is probed at the
  * OPERATOR level with a replica-safe twin offset: the registry queries'
  * `docsWithDups` pins its +100000 twin offset to the driver fixture's
  * id domain (mirrored literally in the DuckDB oracles), which a 500k-doc
  * corpus legitimately outgrows.
  *
  * Usage: `sbt "runMain graft.ScaleStress [baseDir] [replicas]"`.
  * Artifacts land under target/scale-stress/ (SUCCESS-gated, reused);
  * results print as one JSON line + a markdown table for BASELINE.md.
  */
object ScaleStress {

  private def gated(s: SparkSession, out: String)(write: => Unit): String = {
    val marker = new org.apache.hadoop.fs.Path(out, "_SUCCESS")
    val fs = marker.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (!fs.exists(marker)) write
    out
  }

  /** Expand the three extension tables ×R into `outDir` (same layout as a
    * testdata dir, so dir-parameterized query fns run on it unchanged).
    */
  def expand(s: SparkSession, baseDir: String, outDir: String, r: Int): Unit = {
    val reps = s.range(r).select(col("id").cast("int").as("rep"))
    // output file count scales with the expansion (16 at 10×, 160 at
    // 100×) so scan parallelism and per-file size stay in the tuned
    // band as the fixture grows — a literal 16 would make each 100×
    // file 10× larger and cap the scan at 16 tasks
    val nFiles = math.min(512, math.max(16, 16 * r / 10))

    gated(s, s"$outDir/documents.parquet") {
      val docs = s.read.parquet(s"$baseDir/documents.parquet")
      docs.crossJoin(broadcast(reps)).select(
          (col("doc_id") + col("rep").cast("long") * 1000000L).as("doc_id"),
          when(col("rep") === 0, col("text")).otherwise(concat_ws(" ",
            transform(split(col("text"), " "),
              w => concat(w, lit("~"), col("rep"))))).as("text"),
          col("lang"), col("source"))
        .withColumn("n_chars", length(col("text")).cast("long"))
        .repartition(nFiles)
        .write.mode("overwrite").parquet(s"$outDir/documents.parquet")
    }

    gated(s, s"$outDir/events.parquet") {
      val ev = graft.sources.Events.read(s, s"$baseDir/events.parquet")
      ev.crossJoin(broadcast(reps)).select(
          (col("event_id") + col("rep").cast("long") * 100000000L).as("event_id"),
          expr("timestampadd(DAY, rep * 35, ts)").as("ts"),
          (col("user_id") + col("rep").cast("long") * 1000000L).as("user_id"),
          col("event_type"), col("value"), col("props"))
        .repartition(nFiles)
        .write.mode("overwrite").parquet(s"$outDir/events.parquet")
    }

    gated(s, s"$outDir/embeddings.parquet") {
      val em = s.read.parquet(s"$baseDir/embeddings.parquet")
      // Replica vectors are deterministically PERTURBED (±0.5/component
      // from xxhash64(vec_id, rep, j); replica 0 verbatim): verbatim
      // copies make a 100× corpus DEGENERATE for vector ops — every
      // point's true kNN is its 99 identical twins, all copies collide
      // in every LSH table, and the candidate join carries ~10⁹
      // irreducible pairs that measure the pathological corpus, not
      // scale (observed: graph_cc's 100× rep ran 45+ min). Distinct
      // replicas are also what a real 100× corpus looks like.
      em.crossJoin(broadcast(reps)).select(
          (col("vec_id") + col("rep").cast("long") * 10000000L).as("vec_id"),
          when(col("rep") === 0, col("embedding")).otherwise(
            transform(col("embedding"), (x, j) =>
              (x.cast("double") +
                (pmod(xxhash64(col("vec_id"), col("rep"), j), lit(2001L))
                  .cast("double") - lit(1000.0)) / lit(2000.0))
                .cast("float"))).as("embedding"),
          col("label"))
        .repartition(nFiles)
        .write.mode("overwrite").parquet(s"$outDir/embeddings.parquet")
    }

    // Dim tables copy VERBATIM — the honest scale story is facts ×R with
    // fixed model-sized dims (a 10× corpus does not mint 10× suppliers);
    // needed so dim-joining probes (join_geo_polygon) run on the dir.
    for (t <- Seq("customer", "supplier")) gated(s, s"$outDir/$t.parquet") {
      s.read.parquet(s"$baseDir/$t.parquet")
        .write.mode("overwrite").parquet(s"$outDir/$t.parquet")
    }
  }

  /** Artifact path for a probe-scoped persisted ShingleIndex, keyed by
    * the probed dir's basename (sf0.1 vs x10 vs x100) — probe lambdas
    * must never write into the read-only testdata dirs.
    */
  private def twinIndexPath(d: String, variant: String): String =
    new java.io.File(
      // v3: + persisted pair state and strategy stats — a v2-era
      // artifact (no pairs/meta) must never serve the new reader
      s"target/scale-stress/idx/${new java.io.File(d).getName}-$variant-v3")
      .getAbsolutePath

  /** Probe-scoped materialized binary image corpus for the phash family
    * (the phashMediaMaterialized discipline): every doc's 4×4 digest PNG
    * bilinear-rendered at 32×32, every 10th doc adding a 64×64 twin at
    * an id offset clear of every replica range. Built once per dir —
    * both phash probes read it, so neither times the synthetic render.
    */
  private def phashMediaPath(s: SparkSession, d: String): String = {
    import graft.multimodal.Multimodal
    val out = new java.io.File(
      s"target/scale-stress/idx/${new java.io.File(d).getName}-phashmedia-v1")
      .getAbsolutePath
    gated(s, out) {
      val media = Multimodal.fromDigestPng(
        s.read.parquet(s"$d/documents.parquet"), "doc_id", "text")
      val originals = Multimodal.resizePayload(media, "bytes", 8.0)
      val twins = Multimodal.resizePayload(
        media.filter(col("media_id") % 10 === 0), "bytes", 16.0)
        .select((col("media_id") + 1000000000L).as("media_id"), col("kind"),
          col("bytes"), col("meta"))
      originals.unionByName(twins).write.mode("overwrite").parquet(out)
    }
  }

  /** Replica-safe analogue of SparkEntry's docsWithDups: case-mutated
    * twins of every 10th doc at an offset clear of any replica id range.
    */
  private def withTwins(s: SparkSession, dir: String): DataFrame = {
    val d = s.read.parquet(s"$dir/documents.parquet").select("doc_id", "text")
    d.unionByName(
      d.filter(col("doc_id") % 10 === 0)
        .select((col("doc_id") + 100000000L).as("doc_id"),
          upper(col("text")).as("text")))
  }

  def main(args: Array[String]): Unit = {
    val baseDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val reps = if (args.length > 1) args(1).toInt else 10
    val scaledDir = new java.io.File(
      s"target/scale-stress/x$reps").getAbsolutePath
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Sessions.builder(s"local[$cpus]", cpus.toInt)
      .config("spark.ui.enabled", "false")
      // see the per-probe System.gc() note below — the periodic driver
      // GC backstops shuffle-file cleanup during long multi-rep probes
      .config("spark.cleaner.periodicGC.interval", "2min")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    System.err.println(s"[scale] expanding $baseDir x$reps -> $scaledDir")
    expand(spark, baseDir, scaledDir, reps)

    import graft.ops.{Dedup, Drift}

    // Registry-query probes: dir-parameterized fns that only touch
    // documents/events/embeddings, so they run on the expanded dir as-is.
    val queryProbes = Seq(
      "dedup_ngram_jaccard", "text_langid_trained",
      "dedup_substring_fast", "text_tfidf", "search_bm25",
      "stream_drift", "stream_ohlc", "agg_resample_mean",
      // round 11: the partitioned copy-on-write upsert — at fixture
      // scale the partition bookkeeping ≈ the data volume, the probe
      // shows where the touched-partitions-only write pays
      "stream_upsert",
      // round 14 (r13 verdict #3): the segment-explode dedup family —
      // shares dedup_substring_fast's span/segment discipline but each
      // has its own shuffle shape (global first-occurrence window /
      // df-weight join); probed to the third decade alongside it
      "dedup_paragraphs", "sample_soft_dedup",
      // The LSH-surfaced registry queries (simsearch_lsh and the graph
      // family) are probed AS the registry queries since round 11's
      // autoPlanes change: every LSH caller now density-scales its
      // bucket bits (Similarity.autoPlanes — identical plans below
      // 10240 vectors, so oracle hashes are untouched), which is the
      // production parameterization the round-10 verdict named as the
      // documented scale lever. Probing the old fixed-8 form at 100×
      // measured 256 buckets absorbing a 1M-vector corpus (e = 1.39 at
      // 10×; a 100× leg ran 25+ min before being cut) — bucket-density
      // collapse by construction, not the plan.
      "simsearch_lsh", "simsearch_ivf", "dedup_semantic",
      // round 15 (r14 verdict #4): the incremental kNN merge — r14
      // halved its bucket hashing (one bucket join, both orientations
      // from one explode) with 100×-only evidence; the base/delta split
      // is vec_id % 5 (replica-safe, no fixed id-domain offset) and the
      // base edge table is registry-built on the cold leg like every
      // fit-once artifact
      "simsearch_knn_incr",
      // round-8 session-3 additions: graph, MMR, streaming multivariate,
      // sliding windows, correlogram, per-stream sorts
      "graph_pagerank", "graph_triangles", "simsearch_mmr",
      "stream_mahalanobis", "stream_sliding", "agg_acf", "agg_gini",
      "agg_rfm", "text_pmi",
      // round-9 additions: winsorize (corpus clamp), KM (corpus groupBy +
      // bounded fold), GMM EM (12 jobs of sufficient statistics), audio
      // ZCR (per-row decode), CMS (one sketch buffer per partition)
      "win_winsorize", "agg_kaplan_meier", "ml_gmm",
      "multimodal_audio_zcr", "agg_countmin",
      // round-9 session 3: R/S blocks, bootstrap generator map, ECOD
      // ranks, attribution range join, one-pass expectations, MI table
      "agg_hurst", "agg_bootstrap_ci", "ml_ecod", "join_attribution",
      "agg_expectations", "agg_mutual_info", "stream_tdigest",
      // round-9 session 4: geo cells, exact moments, knn vote
      "agg_geo_density", "agg_moments", "ml_knn_classify",
      // round-9 session 5: eval metrics, graph structure (ml_dbscan is
      // probed UNCAPPED at the operator level below — the registry query's
      // 4500-point cap exists only for its all-pairs oracle)
      "ml_confusion_prf", "ml_auc_roc", "ml_calibration",
      "graph_cc", "graph_degree", "text_textrank",
      "ml_lof", "join_geo_polygon", "ml_ols_multi",
      "graph_bfs", "graph_jaccard_nbrs",
      "agg_top_paths", "agg_skyline", "search_phrase",
      "agg_uplift", "search_boolean", "scan_pruned_manifest",
      "join_geo_radius_sql", "stream_geo_fence",
      "agg_levene", "agg_runs_test", "agg_spearman")
    // Operator probes for the twin-offset dedup family (see scaladoc).
    val opProbes: Seq[(String, (SparkSession, String) => DataFrame)] = Seq(
      "op_minhash_lsh" -> ((s: SparkSession, d: String) =>
        Dedup.minhashLshPairs(withTwins(s, d), "doc_id", "text")),
      "op_near_duplicates" -> ((s: SparkSession, d: String) =>
        Dedup.nearDuplicates(withTwins(s, d), "doc_id", "text", 0.6)),
      "op_dup_clusters" -> ((s: SparkSession, d: String) =>
        // two-phase CC (round 14) — tracks the registry queries' plan
        Dedup.duplicateClustersTwoPhase(
          Dedup.minhashLshPairs(withTwins(s, d), "doc_id", "text"))),
      // The set-overlap scorers split into three probes after round 11's
      // ShingleIndex registry (the round-10 verdict's named scale risk:
      // the global-df/per-doc-sort build dominated the one-shot plan
      // past ~sf1, e = 0.82 at 100×):
      //   op_containment       — the SERVING plan over the maintained
      //                          index (what a production corpus pays
      //                          per run; cold leg builds + persists,
      //                          warm legs load + candidate join +
      //                          re-score);
      //   op_shidx_build       — the one-time index BUILD (amortized
      //                          state cost, reported separately so the
      //                          serving exponent is not hiding it);
      //   op_containment_incr  — the daily-crawl step: merge a 1/101
      //                          delta into yesterday's persisted index
      //                          and serve (O(delta + affected) compute
      //                          + one linear state pass).
      "op_containment" -> ((s: SparkSession, d: String) => {
        val path = twinIndexPath(d, "cont")
        if (!Dedup.shingleIndexExists(s, path))
          Dedup.buildAndSaveShingleIndex(withTwins(s, d), "doc_id", "text",
            path, 3, 20)
        Dedup.containmentPairsFromIndex(Dedup.loadShingleIndex(s, path), 0.7)
      }),
      "op_shidx_build" -> ((s: SparkSession, d: String) =>
        // the parquet-through production build (incl. the index write):
        // the in-memory materialize=true form stages the ~corpus-scale
        // groups frame to block storage AND parquet — at sf100 that
        // double-staging alone filled the sandbox disk
        Dedup.buildAndSaveShingleIndex(withTwins(s, d), "doc_id", "text",
          twinIndexPath(d, "bld"), 3, 20).docs),
      "op_containment_incr" -> ((s: SparkSession, d: String) => {
        val all = withTwins(s, d)
        val base = all.filter(col("doc_id") % 101 =!= 3)
        val delta = all.filter(col("doc_id") % 101 === 3)
        val path = twinIndexPath(d, "base101")
        if (!Dedup.shingleIndexExists(s, path))
          Dedup.buildAndSaveShingleIndex(base, "doc_id", "text", path, 3, 20)
        Dedup.containmentPairsFromIndex(
          Dedup.mergeShingleIndex(Dedup.loadShingleIndex(s, path), delta,
            "doc_id", "text", 3, 20), 0.7)
      }),
      // round 14 (r13 verdict #4): incremental image-dedup economics —
      // the full rebuild decodes EVERY image then band-joins; the merge
      // step decodes only the 1/101 delta and joins delta×all. Both
      // read the same materialized binary corpus (phashMediaPath), so
      // the timing contrast isolates decode volume + join shape — the
      // O(delta) claim measured instead of argued.
      "op_phash_rebuild" -> ((s: SparkSession, d: String) => {
        import graft.multimodal.Multimodal
        Multimodal.phashPairsFromHashes(
          Multimodal.averageHashes(
            s.read.parquet(phashMediaPath(s, d)), "media_id", "bytes"), 3)
      }),
      "op_phash_incr" -> ((s: SparkSession, d: String) => {
        import graft.multimodal.Multimodal
        val media = phashMediaPath(s, d)
        val st = new java.io.File(
          s"target/scale-stress/idx/${new java.io.File(d).getName}-phashbase-v1")
          .getAbsolutePath
        gated(s, s"$st/pairs") {
          val baseHashes = Multimodal.averageHashes(
            s.read.parquet(media).filter(col("media_id") % 101 =!= 3),
            "media_id", "bytes").localCheckpoint()
          baseHashes.write.mode("overwrite").parquet(s"$st/hashes")
          Multimodal.phashPairsFromHashes(baseHashes, 3)
            .write.mode("overwrite").parquet(s"$st/pairs")
        }
        Multimodal.phashMergePairs(
          s.read.parquet(s"$st/hashes"), s.read.parquet(s"$st/pairs"),
          Multimodal.averageHashes(
            s.read.parquet(media).filter(col("media_id") % 101 === 3),
            "media_id", "bytes"), 3)
      }),
      // decontamination: the benchmark side stays FIXED (real pipelines
      // scan a growing corpus against a fixed eval set), so the probe
      // measures corpus-side scaling only
      "op_decontaminate" -> ((s: SparkSession, d: String) =>
        Dedup.decontaminationMatches(
          s.read.parquet(s"$d/documents.parquet"), "doc_id", "text",
          s.read.parquet(s"$baseDir/documents.parquet")
            .filter(col("doc_id") % 50 === 0)
            .select(col("doc_id").as("bench_id"), col("text")),
          "bench_id", "text", shingleN = 8)),
      // grid radius join over the dir's user population (customer/supplier
      // aren't expanded, so the registry query can't be probed directly):
      // left = every user site, right = every 200th user as a "facility" —
      // density is scale-invariant, candidate work should scale ~linearly
      "op_geo_radius" -> ((s: SparkSession, d: String) => {
        import graft.ops.Geo
        val users = graft.sources.Events.read(s, s"$d/events.parquet")
          .select("user_id").distinct()
        val pts = users.select(col("user_id"),
          (conv(substring(md5(concat(lit("u"), col("user_id").cast("string"))), 1, 15), 16, 10)
            .cast("long") % 1200000L - 600000L).as("lat_e4"),
          (conv(substring(md5(concat(lit("u"), col("user_id").cast("string"))), 17, 15), 16, 10)
            .cast("long") % 3600000L - 1800000L).as("lon_e4"))
        val sites = pts.filter(col("user_id") % 200 === 0)
          .select(col("user_id").as("site_id"), col("lat_e4"), col("lon_e4"))
        Geo.radiusPairs(pts, "user_id", sites, "site_id", 500.0, 45249L, 100000L)
      }),
      // uncapped grid DBSCAN over the dir's user population: ε = 50 km is
      // subcritical at BOTH densities (avg ε-neighbors ≈ 0.2 at 1x, ≈ 2 at
      // 10x, below the ~4.5 percolation threshold), so component diameters
      // stay small and the probe measures the grid join + ids-only aggs
      "op_geo_dbscan" -> ((s: SparkSession, d: String) => {
        import graft.ops.Geo
        val pts = graft.sources.Events.read(s, s"$d/events.parquet")
          .select("user_id").distinct()
          .select(col("user_id").as("uid"),
            (conv(substring(md5(concat(lit("u"), col("user_id").cast("string"))), 1, 15), 16, 10)
              .cast("long") % 1200000L - 600000L).as("lat_e4"),
            (conv(substring(md5(concat(lit("u"), col("user_id").cast("string"))), 17, 15), 16, 10)
              .cast("long") % 3600000L - 1800000L).as("lon_e4"))
        Geo.dbscan(pts, "uid", epsKm = 50.0, minPts = 3,
          dLatE4 = 4600L, dLonE4 = 10000L)
      }),
      // LSH pair generation at the PRODUCTION parameterization (same
      // density-scaled bucket-bit rule as op_graph_cc below): the
      // registry query's fixed nPlanes=8 is the oracle-scale setting —
      // probing THAT at 100× measures 256 buckets absorbing a 200k-vector
      // corpus (quadratic in-bucket candidates, the round-11 sweep
      // measured e = 1.39), not the plan. Bits scale with n so per-bucket
      // density stays at the tuned level.
      "op_simsearch_lsh" -> ((s: SparkSession, d: String) => {
        // autoPlanesSchedule = the production parameterization since
        // round 13 (fractional bits hold mean bucket density ~constant
        // across decades — the r12 verdict's density turn)
        val e = s.read.parquet(s"$d/embeddings.parquet")
        graft.ops.Similarity.lshCosinePairsAuto(e, "vec_id", "embedding", 0.3)
      }),
      // kNN-graph connected components at the PRODUCTION LSH
      // parameterization: bucket bits scale with corpus size
      // (nPlanes = log2(n / ~40-per-bucket), i.e. +log2(R) bits at R×),
      // so per-bucket density — and with it the quadratic in-bucket
      // candidate work — stays at the tuned level as the corpus grows.
      // The registry query's fixed nPlanes=8 is the oracle-scale
      // setting; probing THAT at 100× measures bucket-density collapse
      // (256 buckets absorbing 1M vectors → ~4000²-pair buckets), not
      // the plan. Density-targeted bits are the documented scale path.
      "op_graph_cc" -> ((s: SparkSession, d: String) => {
        val e = s.read.parquet(s"$d/embeddings.parquet")
        val pairs = graft.ops.Similarity
          .knnGraphAuto(e, "vec_id", "embedding", 3)
          .select(col("qid").as("doc_a"), col("nid").as("doc_b"))
        // two-phase CC (round 14) — tracks q_graph_cc's plan
        Dedup.duplicateClustersTwoPhase(pairs, maxIter = 64)
      }),
      // the LSH edge build ALONE (knnGraphAuto): the graph family's
      // shared first stage, isolated so tiny-baseline exponents like
      // graph_degree's (1× ≈ 0.7 s, nearly all fixed cost) can be
      // decomposed into "edge build at scale" + "op's own work"
      "op_knn_edges" -> ((s: SparkSession, d: String) =>
        graft.ops.Similarity.knnGraphAuto(
          s.read.parquet(s"$d/embeddings.parquet"), "vec_id", "embedding", 3)),
      "op_ks_drift" -> ((s: SparkSession, d: String) => {
        val ev = graft.sources.Events.read(s, s"$d/events.parquet")
        Drift.ksStatistic(ev, "event_type", "value",
          graft.sources.Events.epochMicros(col("ts")) <
            graft.sources.Events.epochMicros(
              ev.agg(min(col("ts")).as("m")).select(
                expr("timestampadd(DAY, 15, m)").as("c")).head().getTimestamp(0)
                match { case t => lit(t) }))
      }))

    def time(fn: => Long): Double = {
      val t0 = System.nanoTime(); fn; (System.nanoTime() - t0) / 1e9
    }
    def steadyState(fn: (SparkSession, String) => DataFrame, d: String): Double = {
      time(fn(spark, d).count()) // cold: JIT + one-time fits on this dir
      math.min(time(fn(spark, d).count()), time(fn(spark, d).count()))
    }

    // Scaled-dir runs get shuffle parallelism proportional to the data
    // (32 at the 10× reference, 320 at 100×, capped 512): on a real
    // cluster 100× data comes with ~100× tasks, so per-task state stays
    // the tuned size. Holding 32 partitions while data grows 100× is a
    // single-box artifact — 32 threads sharing one execution-memory pool
    // each build ~100×-sized hash state and the probe measures memory
    // collapse (SPILL_OUT_OF_MEMORY on text_textrank's edge agg at 48 g),
    // not the plan's work growth. The 1× leg keeps the session's 32.
    val scaledShuffle = math.min(512, math.max(32, 32 * reps / 10))
    def withShuffle(n: Int)(body: => Double): Double = {
      val saved = spark.conf.get("spark.sql.shuffle.partitions")
      spark.conf.set("spark.sql.shuffle.partitions", n.toString)
      try body finally spark.conf.set("spark.sql.shuffle.partitions", saved)
    }

    // optional trailing names: probe only those (local iteration aid /
    // the heavy-plan 100× runs; the full sweep passes none)
    val only = args.drop(2).toSet
    val all: Seq[(String, (SparkSession, String) => DataFrame)] =
      (queryProbes.map(n => n -> SparkEntry.queries(n)) ++ opProbes)
        .filter { case (n, _) => only.isEmpty || only(n) }
    val rows = all.map { case (name, fn) =>
      val t1 = steadyState(fn, baseDir)
      val tR = withShuffle(scaledShuffle)(steadyState(fn, scaledDir))
      // Release completed probes' shuffle files: ContextCleaner only
      // deletes them after the driver GCs the shuffle objects, and a
      // 64 g heap may not GC across a whole 100× sweep — spills then
      // ACCUMULATE across probes until the box's disk fills (observed:
      // two 100×-probe runs left 46 GB of blockmgr files). An explicit
      // GC after each probe keeps disk high-water ≈ one probe's spill.
      System.gc()
      Thread.sleep(2000)
      val e = math.log(tR / t1) / math.log(reps.toDouble)
      System.err.println(f"[scale] $name%-22s 1x=$t1%7.2fs ${reps}x=$tR%7.2fs e=$e%.2f")
      (name, t1, tR, e)
    }

    def s3(x: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", x)
    println(rows.map { case (n, t1, tR, e) =>
      s""""$n":{"t1":${s3(t1)},"t$reps":${s3(tR)},"exp":${s3(e)}}"""
    }.mkString("{\"replicas\":" + reps + ",\"probes\":{", ",", "}}"))
    System.err.println("| probe | sf0.1 (s) | ~sf1 (s) | exponent |")
    System.err.println("|---|---|---|---|")
    rows.foreach { case (n, t1, tR, e) =>
      System.err.println(f"| `$n` | ${t1}%.2f | ${tR}%.2f | ${e}%.2f |")
    }
    spark.stop()
  }
}
