package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SkewSpec extends SparkSpec {
  import spark.implicits._

  // heavily skewed: 90% of rows share one key
  private lazy val skewed = ((1 to 900).map(i => ("hot", i.toDouble)) ++
    (1 to 100).map(i => (s"k${i % 10}", i.toDouble))).toDF("k", "v")

  test("saltedStats equals the direct groupBy exactly") {
    val direct = skewed.groupBy("k").agg(
      sum("v").as("sum"), count("v").as("cnt"), min("v").as("min"),
      max("v").as("max"), (sum("v") / count("v")).as("avg"))
      .orderBy("k").collect()
    val salted = Skew.saltedStats(skewed, Seq("k"), "v")
      .select("k", "sum", "cnt", "min", "max", "avg")
      .orderBy("k").collect()
    assert(direct.map(_.toSeq).toSeq == salted.map(_.toSeq).toSeq)
  }

  test("saltedJoin equals the direct join row-for-row") {
    val dim = Seq(("hot", "H"), ("k1", "A"), ("k2", "B")).toDF("k", "label")
    val direct = skewed.join(dim, "k")
    val salted = Skew.saltedJoin(skewed, dim, "k")
    assert(salted.count() == direct.count())
    assert(salted.select("k", "v", "label").except(direct.select("k", "v", "label")).count() == 0)
    assert(direct.select("k", "v", "label").except(salted.select("k", "v", "label")).count() == 0)
  }
}
