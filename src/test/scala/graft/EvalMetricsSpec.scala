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
