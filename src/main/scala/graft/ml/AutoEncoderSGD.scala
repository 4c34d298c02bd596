package graft.ml

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** GRADIENT-trained dense autoencoder — the backprop analogue of the
  * reference's `model/models.py::KerasAutoEncoder` (public repo; mount
  * empty, SURVEY.md §0), closing the one model-family gap the ELM
  * construction ([[AutoEncoder]]) left: there the tanh encoder is random
  * and only the linear decoder is solved; here BOTH layers train by
  * distributed mini-batch gradient descent, so the encoder adapts its
  * features to the manifold (spec'd: at equal width it reconstructs a
  * curved manifold the random encoder cannot, AutoEncoderSgdSpec).
  *
  * Architecture (d → h tanh → d, identical to the ELM scorer):
  *
  *   z = tanh(W x_std + b)      both layers trained
  *   x̂_std = Vᵀz + c
  *
  * Training is the classic distributed-GD shape (cf. `mllib.optimization
  * .GradientDescent`, public Spark source): per epoch, a seeded sample of
  * the cached standardized set flows through one gradient job — each
  * executor runs forward + backprop per row and accumulates into a flat
  * O(h·d) array; the per-partition partials are merged on the driver in
  * partition order (unlike treeAggregate, whose fetch-order double sums
  * drift by ulps run-to-run and would break same-seed reproducibility),
  * and the driver applies an Adam update with linear lr decay. No
  * shuffle of data rows, ever: per epoch the data moves zero bytes —
  * only numPartitions gradient vectors (~KB each) travel. At 100 TB the
  * per-epoch cost is a scan of the (sampled) training set; standard
  * practice is to train on a bounded sample and score the full corpus —
  * scoring is the same coefficient-literal codegen column math as the
  * ELM model.
  *
  * Determinism: seeded init (SplittableRandom Box-Muller), seeded
  * per-epoch samples, partition-ordered gradient merge — repeated fits
  * on the same input produce the bit-identical model.
  *
  * The fitted parameters are returned AS an [[AutoEncoder.RfaeModel]]
  * (beta rows = decoder weights + intercept): scoring, thresholding,
  * parquet persistence, and the serving surface are shared with the ELM
  * path — a config flips `model.type` between the one-pass ridge fit and
  * the gradient fit without touching anything downstream.
  */
object AutoEncoderSGD {

  import RandomFeatures.randn

  /** Fit by mini-batch gradient descent; returns the model plus the
    * per-epoch mean-squared reconstruction loss trajectory (monotone
    * decrease is spec'd; the builder records the head/tail in metadata).
    * The returned parameters are the BEST epoch's, not the last's (see
    * the restore-best note in the loop) — one extra evaluation-only
    * gradient job prices the final update.
    */
  def fitWithHistory(train: DataFrame, tags: Seq[String], hidden: Int = 8,
      epochs: Int = 120, lr: Double = 0.02, beta1: Double = 0.9,
      batchFraction: Double = 0.5, l2: Double = 1e-4, pctl: Double = 0.99,
      seed: Long = 42L, warmStart: Boolean = true): (AutoEncoder.RfaeModel, Array[Double]) = {
    require(tags.nonEmpty && hidden > 0 && epochs > 0)
    require(batchFraction > 0.0 && batchFraction <= 1.0)
    val d = tags.length
    val h = hidden

    // Warm start (default): pretrain as the ELM construction — random
    // encoder, ridge-OPTIMAL decoder — then descend BOTH layers jointly
    // from there. Together with the best-epoch restore below, the
    // trained model can only improve on the warm start (the spec'd
    // guarantee); cold start exists for the pure-backprop path. One
    // extra ridge pass (fitParams — the warm start never uses a
    // threshold, so the percentile scoring job is skipped), same seed
    // discipline.
    val warm: Option[AutoEncoder.RfaeModel] =
      if (warmStart) Some(AutoEncoder.fitParams(train, tags, h, ridge = 1e-3,
        seed = seed))
      else None

    val clean = train.na.drop("any", tags)
    val (means, stds) = warm.map(m => (m.means, m.stds))
      .getOrElse(RandomFeatures.standardStats(clean, tags))

    // Cached standardized rows as primitive arrays — the per-partition
    // imperative gradient loop is the genuine RDD case (a Column-math
    // gradient would materialize h·d accumulator columns per row).
    // Standardization happens executor-side from captured stats; the
    // cache holds exactly one double[] per row.
    val (mB, sB) = (means, stds)
    val data = clean
      .select(tags.map(t => org.apache.spark.sql.functions.col(t).cast("double")): _*)
      .rdd.map { r =>
        val a = new Array[Double](d)
        var j = 0
        while (j < d) { a(j) = (r.getDouble(j) - mB(j)) / sB(j); j += 1 }
        a
      }.persist(StorageLevel.MEMORY_AND_DISK)

    // Parameter layout, flat for treeAggregate: W (h×d) | b (h) | V (d×h)
    // | c (d). Gradient buffers append [sumLoss, count].
    val nW = h * d; val nB = h; val nV = d * h; val nC = d
    val nParams = nW + nB + nV + nC
    val offB = nW; val offV = nW + nB; val offC = nW + nB + nV

    val theta = new Array[Double](nParams)
    warm match {
      case Some(m) =>
        // encoder and decoder from the pretrained ELM solution
        for (ii <- 0 until h; jj <- 0 until d) theta(ii * d + jj) = m.w(ii)(jj)
        for (ii <- 0 until h) theta(offB + ii) = m.b(ii)
        for (jj <- 0 until d; ii <- 0 until h) theta(offV + jj * h + ii) = m.beta(ii)(jj)
        for (jj <- 0 until d) theta(offC + jj) = m.beta(h)(jj)
      case None =>
        // same init scaling discipline as the ELM encoder; decoder scaled
        // by 1/√h (Xavier-ish) so early reconstructions stay bounded
        val w0 = randn(seed, nW)
        var i = 0
        while (i < nW) { theta(i) = w0(i) / math.sqrt(d.toDouble); i += 1 }
        val b0 = randn(seed + 1, nB)
        i = 0
        while (i < nB) { theta(offB + i) = b0(i) * 0.5; i += 1 }
        val v0 = randn(seed + 2, nV)
        i = 0
        while (i < nV) { theta(offV + i) = v0(i) / math.sqrt(h.toDouble); i += 1 }
        // c starts at zero: standardized targets have mean ~0
    }

    // Adam state (Kingma & Ba 2015): per-parameter first/second moment.
    // Adaptive steps reach a given train loss in far fewer epochs than
    // plain momentum here — and every epoch saved is a full Spark job.
    val mom1 = new Array[Double](nParams)
    val mom2 = new Array[Double](nParams)
    val beta2 = 0.999; val adamEps = 1e-8
    val losses = new Array[Double](epochs)
    val sc = data.sparkContext

    // Restore-best-epoch (the Keras `restore_best_weights` discipline):
    // each epoch's recorded loss measures the CURRENT theta over that
    // epoch's batch, so theta snapshots are comparable across epochs; a
    // final evaluation-only pass (ep == epochs, no update) prices the
    // last update too. Without this, a descent started AT an optimum
    // (warm start on an easy manifold) ORBITS it — Adam's normalized
    // steps have ~lr magnitude even when the gradient is tiny — and the
    // returned model would be strictly worse than its own starting
    // point (observed: ELM-optimal threshold 0.02 drifting to 0.4 on
    // the lag-embedded sine before this guard).
    var bestLoss = Double.PositiveInfinity
    var bestTheta: Array[Double] = null

    var ep = 0
    while (ep <= epochs) {
      val batch =
        if (batchFraction >= 1.0) data
        else data.sample(withReplacement = false, batchFraction, seed + 1000L + ep)
      val thetaB = sc.broadcast(theta.clone())

      // Per-partition gradient accumulation, merged on the driver in
      // PARTITION ORDER: treeAggregate's combine order depends on fetch
      // timing, which makes double sums drift by ulps across runs —
      // enough to break the same-seed-same-model guarantee. Each partial
      // is O(h·d) doubles (~KB); even at thousands of partitions the
      // driver merge is MBs, and it is the only thing that moves.
      val partials = batch.mapPartitionsWithIndex { (pid, it) =>
        val th = thetaB.value
        val acc = new Array[Double](nParams + 2)
        it.foreach { x =>
          accumulate(th, x, acc, h, d, offB, offV, offC, nParams)
        }
        Iterator.single((pid, acc))
      }.collect()
      val grad = new Array[Double](nParams + 2)
      partials.sortBy(_._1).foreach { case (_, p) =>
        var k = 0
        while (k < grad.length) { grad(k) += p(k); k += 1 }
      }
      thetaB.destroy()

      val n = math.max(grad(nParams + 1), 1.0)
      val loss = grad(nParams) / n
      if (ep < epochs) losses(ep) = loss
      if (loss < bestLoss) { bestLoss = loss; bestTheta = theta.clone() }
      if (ep < epochs) {
        // Adam update; decoupled L2 on weights only (not biases). Linear
        // lr decay to 10% anneals out the mini-batch sampling noise so
        // the final parameters settle instead of orbiting the optimum.
        val lrEp = lr * (1.0 - 0.9 * ep / math.max(epochs - 1, 1).toDouble)
        val bc1 = 1.0 - math.pow(beta1, ep + 1.0)
        val bc2 = 1.0 - math.pow(beta2, ep + 1.0)
        var k = 0
        while (k < nParams) {
          val isWeight = k < nW || (k >= offV && k < offC)
          val g = grad(k) / n + (if (isWeight) l2 * theta(k) else 0.0)
          mom1(k) = beta1 * mom1(k) + (1.0 - beta1) * g
          mom2(k) = beta2 * mom2(k) + (1.0 - beta2) * g * g
          theta(k) -= lrEp * (mom1(k) / bc1) / (math.sqrt(mom2(k) / bc2) + adamEps)
          k += 1
        }
      }
      ep += 1
    }
    data.unpersist(blocking = false)

    // Repack the BEST-epoch parameters into the shared scorer:
    // beta(i)(j) = V(j)(i), beta(h)(j) = c(j)
    val chosen = bestTheta
    val w = Array.tabulate(h, d)((ii, jj) => chosen(ii * d + jj))
    val b = Array.tabulate(h)(ii => chosen(offB + ii))
    val beta = Array.tabulate(h + 1, d)((ii, jj) =>
      if (ii < h) chosen(offV + jj * h + ii) else chosen(offC + jj))

    val prelim = AutoEncoder.RfaeModel(tags, means, stds, w, b, beta, Double.NaN)
    val thr = prelim.score(clean)
      .agg(org.apache.spark.sql.functions.percentile(
        org.apache.spark.sql.functions.col("anomaly_score"),
        org.apache.spark.sql.functions.lit(pctl))).head().getDouble(0)
    (prelim.copy(threshold = thr), losses)
  }

  /** One row's forward pass + backprop, accumulated into `acc` (layout:
    * dW | db | dV | dc | sumSqErr | count). Runs on executors; primitive
    * loops only — no allocation beyond the two layer scratch arrays.
    */
  private def accumulate(th: Array[Double], x: Array[Double], acc: Array[Double],
      h: Int, d: Int, offB: Int, offV: Int, offC: Int, nParams: Int): Unit = {
    // forward
    val z = new Array[Double](h)
    var ii = 0
    while (ii < h) {
      var s = th(offB + ii)
      var jj = 0
      while (jj < d) { s += th(ii * d + jj) * x(jj); jj += 1 }
      z(ii) = math.tanh(s)
      ii += 1
    }
    val e = new Array[Double](d) // xhat - x
    var jj = 0
    while (jj < d) {
      var s = th(offC + jj)
      var kk = 0
      while (kk < h) { s += th(offV + jj * h + kk) * z(kk); kk += 1 }
      e(jj) = s - x(jj)
      acc(nParams) += e(jj) * e(jj)
      jj += 1
    }
    // backprop: decoder grads, then encoder through tanh'
    jj = 0
    while (jj < d) {
      var kk = 0
      while (kk < h) { acc(offV + jj * h + kk) += e(jj) * z(kk); kk += 1 }
      acc(offC + jj) += e(jj)
      jj += 1
    }
    ii = 0
    while (ii < h) {
      var dz = 0.0
      jj = 0
      while (jj < d) { dz += th(offV + jj * h + ii) * e(jj); jj += 1 }
      dz *= 1.0 - z(ii) * z(ii)
      jj = 0
      while (jj < d) { acc(ii * d + jj) += dz * x(jj); jj += 1 }
      acc(offB + ii) += dz
      ii += 1
    }
    acc(nParams + 1) += 1.0
  }

  /** Fit by mini-batch gradient descent (see [[fitWithHistory]]). */
  def fit(train: DataFrame, tags: Seq[String], hidden: Int = 8,
      epochs: Int = 120, lr: Double = 0.02, beta1: Double = 0.9,
      batchFraction: Double = 0.5, l2: Double = 1e-4, pctl: Double = 0.99,
      seed: Long = 42L, warmStart: Boolean = true): AutoEncoder.RfaeModel =
    fitWithHistory(train, tags, hidden, epochs, lr, beta1, batchFraction,
      l2, pctl, seed, warmStart)._1
}
