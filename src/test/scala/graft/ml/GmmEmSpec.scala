package graft.ml

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** EM on planted mixtures: component recovery, EM's monotone
  * log-likelihood (the algorithm's defining guarantee), weight
  * normalization, and partitioning-invariance of the fit.
  */
class GmmEmSpec extends SparkSpec {
  import spark.implicits._

  // two well-separated clumps around 2 and 10, deterministic offsets
  private def planted(n: Int): Seq[(String, Double)] =
    (0 until n).map { i =>
      val off = ((i * 2654435761L) % 1000) / 1000.0 - 0.5 // [-0.5, 0.5)
      if (i % 3 == 0) ("a", 10.0 + off) else ("a", 2.0 + off)
    }

  test("recovers a planted 2-component mixture: means, weights") {
    val df = planted(900).toDF("k", "x")
    val fit = GmmEm.fit(df, "k", "x", k = 2, iters = 25)
    val comps = fit.params("a").sortBy(_._2)
    assert(math.abs(comps(0)._2 - 2.0) < 0.1, s"low mean ${comps(0)._2}")
    assert(math.abs(comps(1)._2 - 10.0) < 0.1, s"high mean ${comps(1)._2}")
    assert(math.abs(comps(0)._1 - 2.0 / 3) < 0.05) // weight ≈ 2/3
    assert(math.abs(comps(0)._1 + comps(1)._1 - 1.0) < 1e-9)
  }

  test("log-likelihood is monotone non-decreasing across EM iterations") {
    val df = planted(600).toDF("k", "x")
    val fit = GmmEm.fit(df, "k", "x", k = 2, iters = 15)
    fit.logLik.sliding(2).foreach {
      case Array(a, b) => assert(b >= a - 1e-6, s"LL decreased: $a -> $b")
      case _ =>
    }
    assert(fit.logLik.last > fit.logLik.head)
  }

  test("fit is bit-identical under different partitionings") {
    val base = planted(500).toDF("k", "x")
    val f1 = GmmEm.fit(base.repartition(1), "k", "x", k = 3, iters = 8)
    val f8 = GmmEm.fit(base.repartition(8), "k", "x", k = 3, iters = 8)
    assert(f1.params("a").toSeq == f8.params("a").toSeq)
    assert(f1.logLik.toSeq == f8.logLik.toSeq)
  }

  test("toDF emits ordered components with rounded parameters") {
    val df = planted(300).toDF("k", "x")
    val out = GmmEm.toDF(df, GmmEm.fit(df, "k", "x", k = 2, iters = 5))
      .orderBy("k", "component").collect()
    assert(out.length == 2)
    assert(out(0).getDouble(3) <= out(1).getDouble(3)) // ordered by mean
    out.foreach(r => assert(r.getDouble(4) > 0.0)) // positive sigma
  }
}
