package graft.expressions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DotProductSpec extends SparkSpec {
  import spark.implicits._

  private def foldDot = (a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =>
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  test("native dot is bit-identical to the functional fold on real embeddings") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val both = e.as("a").join(e.as("b"), col("a.vec_id") < col("b.vec_id")).limit(500)
      .select(
        graft.ops.Similarity.dot(col("a.embedding"), col("b.embedding")).as("native"),
        foldDot(col("a.embedding"), col("b.embedding")).as("fold"))
    val mismatches = both.filter(col("native") =!= col("fold")).count()
    assert(mismatches == 0)
  }

  test("null array and null element both yield null") {
    val df = Seq(
      (1L, Some(Seq(Some(1.0f), Some(2.0f))), Some(Seq(Some(3.0f), Some(4.0f)))),
      (2L, None, Some(Seq(Some(1.0f)))),
      (3L, Some(Seq(Some(1.0f), None)), Some(Seq(Some(1.0f), Some(1.0f))))
    ).toDF("id", "a", "b")
    val out = df.select(col("id"), graft.ops.Similarity.dot(col("a"), col("b")).as("d"))
      .orderBy("id").collect()
    assert(out(0).getDouble(1) == 11.0)
    assert(out(1).isNullAt(1))
    assert(out(2).isNullAt(1))
  }

  test("dot participates in whole-stage codegen") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val df = e.select(graft.ops.Similarity.dot(col("embedding"), col("embedding")).as("n"))
    val plan = df.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    // formatted mode marks whole-stage-codegen nodes with "[codegen id : N]"
    assert(plan.contains("[codegen id :"), plan)
    // and evaluates without interpreted fallback errors
    assert(df.agg(sum("n")).head().getDouble(0) > 0)
  }
}
