package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ScalersSpec extends SparkSpec {
  import spark.implicits._

  test("minMax scales to [0, 1]") {
    val df = Seq(10.0, 20.0, 30.0).toDF("v")
    val out = Scalers.minMax(df, Seq("v")).select("v_scaled").as[Double].collect().sorted
    assert(out.toSeq == Seq(0.0, 0.5, 1.0))
  }

  test("standard scales to zero mean, unit sample stddev") {
    val df = Seq(2.0, 4.0, 6.0).toDF("v")
    val out = Scalers.standard(df, Seq("v")).select("v_scaled").as[Double].collect()
    assert(math.abs(out.sum) < 1e-12)
    assert(math.abs(out.map(x => x * x).sum / (out.length - 1) - 1.0) < 1e-12)
  }

  test("scaler transform preserves row count and adds suffixed columns") {
    val df = Seq((1, 10.0), (2, 20.0)).toDF("k", "v")
    val out = Scalers.minMax(df, Seq("v"))
    assert(out.count() == 2)
    assert(out.columns.toSet == Set("k", "v", "v_scaled"))
  }
}
