package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Cross-query SEMANTIC invariants over the round-8 analytics families —
  * properties that must hold on any input, checked on the sf0.001
  * fixture through the shipped registry queries (the oracle proves
  * cross-engine equality; these prove the VALUES mean what they claim).
  */
class InvariantSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private def q(name: String): DataFrame = SparkEntry.queries(name)(spark, dir)

  test("funnel stages are monotone and the stream twin agrees exactly") {
    val batch = q("agg_funnel").collect().map(r => r.getLong(0) -> r.getLong(2))
    assert(batch.length == 3)
    val byStage = batch.toMap
    assert(byStage(1L) >= byStage(2L) && byStage(2L) >= byStage(3L))
    val live = q("stream_funnel").collect().map(r => r.getLong(0) -> r.getLong(2))
    assert(live.toMap == byStage)
    // windowed funnel partitions the clicking users exactly
    val wf = q("agg_window_funnel").collect().map(_.getLong(1)).sum
    assert(wf == byStage(1L))
  }

  test("concentration measures live in their ranges") {
    q("agg_gini").collect().foreach { r =>
      val g = r.getDouble(2)
      assert(g >= 0.0 && g < 1.0, s"gini $g")
    }
    q("agg_pareto").collect().foreach { r =>
      val s = r.getDouble(3)
      assert(s > 0.0 && s <= 1.0, s"pareto share $s")
    }
    q("graph_triangles").collect().foreach { r =>
      val c = r.getDouble(3)
      assert(c >= 0.0 && c <= 1.0, s"clustering $c")
    }
  }

  test("drawdown is non-negative and zero at each stream's running max") {
    val rows = q("win_drawdown").collect()
      .map(r => (r.getString(0), r.getLong(3), r.getLong(4)))
    assert(rows.forall(_._3 >= 0L))
    // every stream's first bucket IS its own running max → drawdown 0
    assert(rows.groupBy(_._1).values.forall(_.exists(_._3 == 0L)))
  }

  test("interval union and sessions stay within physical bounds") {
    q("agg_interval_union").collect().foreach { r =>
      assert(r.getLong(2) >= 1L)  // n_islands
      assert(r.getLong(3) >= 0L)  // covered_us
    }
    val ss = q("agg_session_stats").head()
    assert(ss.getLong(0) >= ss.getLong(1)) // sessions >= users
  }

  test("recall audit is a true subset ratio; MASE baselines non-negative") {
    val ra = q("simsearch_recall_audit").head()
    assert(ra.getLong(1) <= ra.getLong(0), "lsh pairs must subset exact")
    val rec = ra.getDouble(2)
    assert(rec >= 0.0 && rec <= 1.0)
    q("ml_mase_baselines").collect().foreach { r =>
      assert(r.getDouble(2) >= 0.0 && r.getDouble(3) >= 0.0)
    }
  }

  test("dataset split partitions the corpus; stationary mass is bounded") {
    val total = spark.read.parquet(s"$dir/documents.parquet").count()
    assert(q("sample_split").agg(sum("n")).head.getLong(0) == total)
    // power iteration only leaks mass — never creates it
    val pi = q("agg_markov_stationary").collect().map(_.getLong(1))
    assert(pi.sum <= pi.length * 1000000L)
    assert(pi.forall(_ >= 0L))
  }
}
