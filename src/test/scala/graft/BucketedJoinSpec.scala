package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.FormattedMode

/** Bucketing = the pre-shuffled co-located join: both sides bucketed by
  * the join key join WITHOUT a shuffle — the 100 TB answer to repeated
  * fact-fact joins on the same key.
  */
class BucketedJoinSpec extends SparkSpec {

  test("join of two tables bucketed on the key plans no Exchange") {
    val dir = "/root/testdata/sf0.001" // warehouse dir set in SparkSpec (static conf)

    spark.read.parquet(s"$dir/orders.parquet")
      .write.bucketBy(4, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("orders_b")
    spark.read.parquet(s"$dir/lineitem.parquet")
      .write.bucketBy(4, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("lineitem_b")

    val joined = spark.table("orders_b").join(spark.table("lineitem_b"),
      col("o_orderkey") === col("l_orderkey"))
    val plan = joined.queryExecution.explainString(FormattedMode)
    val exchanges = "(?m)^\\(\\d+\\) Exchange".r.findAllIn(plan).size
    assert(exchanges == 0, s"bucketed join must not shuffle:\n$plan")
    assert(joined.count() > 0)

    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS lineitem_b")
  }

  test("join_bucketed query: the join itself adds no Exchange — only the agg and sink sort shuffle") {
    // broadcast off so the join can't sidestep the bucketed layout; the
    // SMJ must then feed DIRECTLY off the bucketed scans
    val saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", -1)
    try {
      val plan = SparkEntry.queries("join_bucketed")(spark, "/root/testdata/sf0.001")
        .queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode)
      assert(plan.contains("SortMergeJoin"), plan)
      val exchanges = "(?m)^\\(\\d+\\) Exchange".r.findAllIn(plan).size
      // hashpartitioning for the groupBy + rangepartitioning for the
      // orderBy; a third Exchange means the bucketed layout was ignored
      assert(exchanges == 2, s"expected agg+sort shuffles only:\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
  }
}
