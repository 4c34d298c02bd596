package graft

import org.apache.spark.sql.functions._

/** Semantic invariants for the model-eval family (confusion/PRF,
  * ROC-AUC, calibration), the kNN-graph structure queries (CC, degree)
  * and grid DBSCAN — cross-checks the oracle hash-match cannot express
  * (pair-counted AUC, marginal consistency, component well-formedness,
  * the DBSCAN core/border/noise contract).
  */
class EvalMetricsSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("confusion marginals: tp+fn per class = true-label counts, tp+fp = predicted counts") {
    val pred = SparkEntry.queries("ml_knn_classify")(spark, dir)
      .select(col("label_true"), col("label_pred")).collect()
    val prf = SparkEntry.queries("ml_confusion_prf")(spark, dir).collect()
      .map(r => r.getAs[Int]("cls") ->
        (r.getAs[Long]("tp"), r.getAs[Long]("fp"), r.getAs[Long]("fn")))
      .toMap
    val trueCnt = pred.groupBy(_.getAs[Int]("label_true")).view.mapValues(_.length)
    val predCnt = pred.groupBy(_.getAs[Int]("label_pred")).view.mapValues(_.length)
    prf.foreach { case (cls, (tp, fp, fn)) =>
      assert(tp + fn == trueCnt.getOrElse(cls, 0).toLong, s"tp+fn mismatch for $cls")
      assert(tp + fp == predCnt.getOrElse(cls, 0).toLong, s"tp+fp mismatch for $cls")
    }
    assert(prf.values.map(_._1).sum ==
      pred.count(r => r.getAs[Int]("label_true") == r.getAs[Int]("label_pred")))
  }

  test("rank AUC equals the brute-force concordant-pair count") {
    val auc = SparkEntry.queries("ml_auc_roc")(spark, dir).collect()
    assert(auc.nonEmpty)
    // recompute per class by explicit pair counting on the driver
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
      .select("vec_id", "label", "embedding").collect()
      .map(r => (r.getLong(0), r.getInt(1),
        r.getSeq[Float](2).map(_.toDouble).toArray))
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      for (i <- a.indices) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i) }
      d / math.sqrt(na * nb)
    }
    auc.take(3).foreach { row =>
      val cls = row.getAs[Int]("cls")
      val probe = e.filter(_._2 == cls).minBy(_._1)
      val scored = e.filter(_._1 != probe._1)
        .map { case (id, l, v) => (id, l == cls, cos(v, probe._3)) }
      // tie order (score, id): pair (pos, neg) concordant iff pos ranks
      // above neg in that total order
      val pos = scored.filter(_._2); val neg = scored.filterNot(_._2)
      val conc = (for (p <- pos; n <- neg)
        yield if (p._3 > n._3 || (p._3 == n._3 && p._1 > n._1)) 1L else 0L).sum
      val expected = conc.toDouble / (pos.length.toLong * neg.length)
      assert(math.abs(row.getAs[Double]("auc") - expected) < 1e-6,
        s"AUC mismatch for class $cls")
    }
  }

  test("calibration bins partition the scored frame; frac_pos is an exact ratio") {
    val cal = SparkEntry.queries("ml_calibration")(spark, dir).collect()
    val nClasses = spark.read.parquet(s"$dir/embeddings.parquet")
      .select("label").distinct().count()
    val nVecs = spark.read.parquet(s"$dir/embeddings.parquet").count()
    // each class scores every vector except its own probe
    assert(cal.map(_.getAs[Long]("n")).sum == nClasses * (nVecs - 1))
    cal.foreach { r =>
      val bin = r.getAs[Long]("bin")
      assert(bin >= 0 && bin <= 9)
      val fp = r.getAs[Double]("frac_pos")
      assert(fp >= 0.0 && fp <= 1.0)
    }
  }

  test("graph_cc components are edge-consistent and labeled by their min member") {
    val comp = SparkEntry.queries("graph_cc")(spark, dir).collect()
      .map(r => r.getAs[Long]("vec_id") ->
        (r.getAs[Long]("comp"), r.getAs[Long]("n_members"))).toMap
    val edges = graft.ops.Similarity
      .knnGraph(spark.read.parquet(s"$dir/embeddings.parquet"),
        "vec_id", "embedding", 3)
      .select("qid", "nid").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    edges.foreach { case (a, b) =>
      assert(comp(a)._1 == comp(b)._1, s"edge ($a,$b) crosses components")
    }
    // label = min member id; size consistent with the member count
    comp.groupBy(_._2._1).foreach { case (lbl, members) =>
      assert(members.keys.min == lbl, s"component $lbl not labeled by min id")
      assert(members.values.map(_._2).toSet == Set(members.size.toLong))
    }
  }

  test("graph_degree sums to the edge count; out_deg ≤ k") {
    val deg = SparkEntry.queries("graph_degree")(spark, dir).collect()
    val nEdges = graft.ops.Similarity
      .knnGraph(spark.read.parquet(s"$dir/embeddings.parquet"),
        "vec_id", "embedding", 3).count()
    assert(deg.map(_.getAs[Long]("out_deg")).sum == nEdges)
    assert(deg.map(_.getAs[Long]("in_deg")).sum == nEdges)
    deg.foreach(r => assert(r.getAs[Long]("out_deg") <= 3))
  }

  test("bfs hops satisfy the BFS recurrence (seed 0; hop k has a hop k-1 neighbor)") {
    val hops = SparkEntry.queries("graph_bfs")(spark, dir).collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Long]("hops")).toMap
    val seeds = spark.read.parquet(s"$dir/embeddings.parquet")
      .filter(col("label") === 0).select("vec_id").collect().map(_.getLong(0)).toSet
    val dirE = graft.ops.Similarity
      .knnGraph(spark.read.parquet(s"$dir/embeddings.parquet"),
        "vec_id", "embedding", 3)
      .select("qid", "nid").collect().map(r => (r.getLong(0), r.getLong(1)))
    val und = (dirE ++ dirE.map(_.swap)).distinct.groupBy(_._1).view
      .mapValues(_.map(_._2).toSet).toMap
    seeds.foreach(sd => assert(hops(sd) == 0L))
    hops.foreach { case (v, h) =>
      if (h > 0)
        assert(und.getOrElse(v, Set.empty).exists(n => hops(n) == h - 1),
          s"node $v at hop $h lacks a hop ${h - 1} neighbor")
      if (h == 0) assert(seeds.contains(v))
      if (h == -1)
        assert(und.getOrElse(v, Set.empty)
          .forall(n => hops(n) == -1 || hops(n) == 10),
          s"unreached $v borders a reached node below the bound")
    }
  }

  test("neighbor jaccard recomputes exactly from the undirected edge sets") {
    val dirE = graft.ops.Similarity
      .knnGraph(spark.read.parquet(s"$dir/embeddings.parquet"),
        "vec_id", "embedding", 3)
      .select("qid", "nid").collect().map(r => (r.getLong(0), r.getLong(1)))
    val nbr = (dirE ++ dirE.map(_.swap)).distinct.groupBy(_._1).view
      .mapValues(_.map(_._2).toSet).toMap
    val got = SparkEntry.queries("graph_jaccard_nbrs")(spark, dir).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val a = r.getAs[Long]("a"); val b = r.getAs[Long]("b")
      val inter = (nbr(a) intersect nbr(b)).size.toLong
      assert(inter == r.getAs[Long]("inter"))
      val jac = inter.toDouble / (nbr(a).size + nbr(b).size - inter)
      assert(math.abs(r.getAs[Double]("jaccard") - jac) < 1e-6)
      assert(r.getAs[Boolean]("is_edge") == nbr(a).contains(b))
      assert(jac >= 0.4 - 1e-9)
    }
  }

  test("lof: scores recompute from the edge list (quantized Breunig algebra)") {
    val edges = graft.ops.Similarity
      .knnGraph(spark.read.parquet(s"$dir/embeddings.parquet"),
        "vec_id", "embedding", 3)
      .select(col("qid"), col("nid"), (lit(1.0) - col("cos_sim")).as("d"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val kdist = edges.groupBy(_._1).view.mapValues(_.map(_._3).max).toMap
    val lrd = edges.groupBy(_._1).view.mapValues { es =>
      val sr = es.map(e => math.floor(math.max(kdist(e._2), e._3) * 1e6).toLong).sum
      (es.length.toLong, es.length.toLong * 1000000000000L / math.max(sr, 1L))
    }.toMap
    val expected = edges.groupBy(_._1).map { case (p, es) =>
      val sl = es.map(e => lrd(e._2)._2).sum
      val (n, l) = lrd(p)
      p -> math.rint(sl.toDouble / (n * l).toDouble * 1e6) / 1e6
    }
    val got = SparkEntry.queries("ml_lof")(spark, dir).collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Double]("lof")).toMap
    assert(got.keySet == expected.keySet)
    expected.foreach { case (id, v) =>
      assert(math.abs(got(id) - v) < 1e-9, s"lof mismatch for $id") }
  }

  test("point-in-triangle agrees with a double-precision barycentric check") {
    val rows = SparkEntry.queries("join_geo_polygon")(spark, dir).collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("tri_id"))).toSet
    // re-derive points and triangles from the same hash arithmetic and
    // re-test every (point, triangle) pair with barycentric coordinates
    def h(prefix: String, id: Long, off: Int, span: Long): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$prefix$id".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      java.lang.Long.parseLong(md.substring(off - 1, off - 1 + 15), 16) % span - span / 2
    }
    val users = spark.read.parquet(s"$dir/events.parquet")
      .select("user_id").distinct().collect().map(_.getLong(0))
    val supp = spark.read.parquet(s"$dir/supplier.parquet")
      .select("s_suppkey").collect().map(_.getLong(0))
    def pt(u: Long) = (h("u", u, 1, 1200000L).toDouble,
      h("u", u, 17, 3600000L).toDouble)
    def tri(k: Long) = {
      val cy = h("tc", k, 1, 1000000L); val cx = h("tc", k, 17, 3400000L)
      (1 to 3).map(i => ((cy + h(s"tv$i", k, 1, 200000L)).toDouble,
        (cx + h(s"tv$i", k, 17, 200000L)).toDouble))
    }
    var inside = 0
    for (u <- users; k <- supp) {
      val (py, px) = pt(u); val v = tri(k)
      val Seq((y1, x1), (y2, x2), (y3, x3)) = v
      val den = (y2 - y3) * (x1 - x3) + (x3 - x2) * (y1 - y3)
      val a = ((y2 - y3) * (px - x3) + (x3 - x2) * (py - y3)) / den
      val b = ((y3 - y1) * (px - x3) + (x1 - x3) * (py - y3)) / den
      val c = 1.0 - a - b
      val eps = 1e-9
      val in = a >= -eps && b >= -eps && c >= -eps
      if (in) inside += 1
      // strict interior / exterior must agree exactly with the query
      if (a > eps && b > eps && c > eps)
        assert(rows.contains((u, k)), s"interior point ($u,$k) missed")
      if (a < -eps || b < -eps || c < -eps)
        assert(!rows.contains((u, k)), s"exterior point ($u,$k) included")
    }
    assert(rows.nonEmpty && inside >= rows.size - 2)
  }

  test("ols betas match an independent double-precision Gaussian solve") {
    val got = SparkEntry.queries("ml_ols_multi")(spark, dir).collect()
    assert(got.nonEmpty)
    val ev = spark.read.parquet(s"$dir/events.parquet")
      .filter(col("value").isNotNull)
      .select(col("event_type"),
        (expr("cast(cast(value as decimal(18,6)) * 100 as bigint)") / 100.0).as("y"),
        weekday(col("ts").cast("timestamp")).cast("double").as("x2"),
        hour(col("ts").cast("timestamp")).cast("double").as("x1"))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getDouble(3), r.getDouble(2)))
    got.foreach { r =>
      val et = r.getAs[String]("event_type")
      val rows = ev.filter(_._1 == et)
      // 3x3 normal equations, Gaussian elimination with partial pivoting
      val a = Array.ofDim[Double](3, 4)
      rows.foreach { case (_, y, x1, x2) =>
        val x = Array(1.0, x1, x2)
        for (i <- 0 until 3) { for (j <- 0 until 3) a(i)(j) += x(i) * x(j); a(i)(3) += x(i) * y }
      }
      for (p <- 0 until 3) {
        val piv = (p until 3).maxBy(i => math.abs(a(i)(p)))
        val t = a(p); a(p) = a(piv); a(piv) = t
        for (i <- 0 until 3 if i != p) {
          val f = a(i)(p) / a(p)(p)
          for (j <- p to 3) a(i)(j) -= f * a(p)(j)
        }
      }
      val beta = (0 until 3).map(i => a(i)(3) / a(i)(i))
      assert(math.abs(r.getAs[Double]("beta0") - beta(0)) < 1e-4, s"$et beta0")
      assert(math.abs(r.getAs[Double]("beta1") - beta(1)) < 1e-4, s"$et beta1")
      assert(math.abs(r.getAs[Double]("beta2") - beta(2)) < 1e-4, s"$et beta2")
    }
  }

  test("skyline members are mutually non-dominated and dominate every non-member") {
    val cents = expr("cast(cast(value as decimal(18,6)) * 100 as bigint)")
    val per = spark.read.parquet(s"$dir/events.parquet")
      .filter(col("value").isNotNull)
      .groupBy("user_id").agg(sum(cents).as("v"), count(lit(1)).as("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val sky = SparkEntry.queries("agg_skyline")(spark, dir).collect()
      .map(_.getAs[Long]("user_id")).toSet
    def dominates(a: (Long, Long, Long), b: (Long, Long, Long)) =
      a._2 >= b._2 && a._3 >= b._3 && (a._2 > b._2 || a._3 > b._3)
    val expected = per.filter(p => !per.exists(q => dominates(q, p)))
      .map(_._1).toSet
    assert(sky == expected)
  }

  test("phrase hits equal a regex scan for the adjacent pair") {
    val got = SparkEntry.queries("search_phrase")(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_hits"), r.getAs[Long]("first_pos"))).toMap
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text").collect()
    docs.foreach { r =>
      val ws = r.getString(1).trim.toLowerCase.split("\\s+")
      val hits = (0 until ws.length - 1)
        .filter(i => ws(i) == "hash" && ws(i + 1) == "join")
      if (hits.nonEmpty) {
        val (n, first) = got(r.getLong(0))
        assert(n == hits.length && first == hits.head + 1)
      } else assert(!got.contains(r.getLong(0)))
    }
  }

  test("manifest pruning skips files and the pruned scan equals the full scan") {
    val lo = java.sql.Timestamp.valueOf("2024-01-08 00:00:00")
    val hi = java.sql.Timestamp.valueOf("2024-01-15 00:00:00")
    val (files, total) = SparkEntry.manifestPrunedFiles(spark, dir, lo, hi)
    assert(total >= 8, s"expected a multi-file layout, got $total")
    assert(files.nonEmpty && files.length < total,
      s"no pruning: ${files.length} of $total files selected")
    val pruned = SparkEntry.queries("scan_pruned_manifest")(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val full = graft.sources.Events.read(spark, s"$dir/events.parquet")
      .filter(col("ts") >= lit(lo) && col("ts") < lit(hi))
      .groupBy("event_type").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(pruned.toSet == full.toSet)
  }

  test("dbscan roles partition the points and honor the core/border/noise contract") {
    val out = SparkEntry.queries("ml_dbscan")(spark, dir).collect()
      .map(r => (r.getAs[Long]("cust"), r.getAs[String]("role"),
        r.getAs[Long]("cluster")))
    val pts = spark.read.parquet(s"$dir/customer.parquet")
      .filter(col("c_custkey") <= 4500).count()
    assert(out.length == pts)
    assert(out.map(_._1).distinct.length == out.length)
    val byRole = out.groupBy(_._2)
    byRole.getOrElse("noise", Array.empty).foreach(p => assert(p._3 == -1L))
    byRole.getOrElse("core", Array.empty).foreach(p => assert(p._3 >= 0L))
    // border points carry a real cluster id owned by some core point
    val coreClusters = byRole.getOrElse("core", Array.empty).map(_._3).toSet
    byRole.getOrElse("border", Array.empty)
      .foreach(p => assert(coreClusters.contains(p._3)))
  }
}
