package graft.expressions

import graft.SparkSpec
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.Bridge

/** Unit semantics of the two matrix-reference vector expressions
  * (HyperplaneBuckets, NearestCentroid): codegen/interpreted parity,
  * bit-parity with the literal column forms they replaced, and the
  * null / wrong-length / NaN edges the replacement froze in place.
  */
class VectorExprSpec extends SparkSpec {
  import spark.implicits._

  private val dim = 4
  private def planes(nTables: Int, nPlanes: Int): Seq[Double] =
    for {
      t <- 0 until nTables; p <- 0 until nPlanes; x <- graft.ops.Similarity.planeVector(t, p, dim)
    } yield x

  private def buckets(v: Column, nTables: Int, nPlanes: Int): Column =
    Bridge.column(HyperplaneBuckets(Bridge.expression(v),
      planes(nTables, nPlanes), nTables, nPlanes, dim))

  test("HyperplaneBuckets matches the per-plane dot/when literal form bit-for-bit") {
    val vecs = Seq(
      (1L, Array(0.25, -0.75, 0.5, 1.0)),
      (2L, Array(-1.0, -1.0, -1.0, -1.0)),
      (3L, Array(0.0, 0.0, 0.0, 0.0)),
      (4L, Array(1e300, -1e300, 1e300, -1e300))).toDF("id", "v")
    // the replaced form: per-plane dot against a literal, when(d>=0) bit
    def oldForm(t: Int, nPlanes: Int): Column =
      (0 until nPlanes).map { p =>
        val d = graft.ops.Similarity.dot(col("v"),
          typedLit(graft.ops.Similarity.planeVector(t, p, dim)))
        when(d >= 0, lit(1L << p)).otherwise(lit(0L))
      }.reduce(_ + _)
    val both = vecs.select(col("id"),
      buckets(col("v"), 3, 8).as("neu"),
      array((0 until 3).map(t => oldForm(t, 8)): _*).as("old"))
      .collect()
    both.foreach { r =>
      assert(r.getSeq[Long](1) == r.getSeq[Long](2),
        s"id=${r.getLong(0)}: new ${r.getSeq[Long](1)} != old ${r.getSeq[Long](2)}")
    }
  }

  test("HyperplaneBuckets: null vector / wrong length / null element give zero bits, never null") {
    val rows = Seq(
      (1L, null.asInstanceOf[Array[java.lang.Double]]),
      (2L, Array[java.lang.Double](0.5, 0.5)), // wrong length
      (3L, Array[java.lang.Double](0.5, null, 0.5, 0.5))) // null element
      .toDF("id", "v")
    val out = rows.select(col("id"), buckets(col("v").cast("array<double>"), 2, 8).as("b"))
      .orderBy("id").collect()
    out.foreach { r =>
      assert(!r.isNullAt(1), s"id=${r.getLong(0)} returned null")
      assert(r.getSeq[Long](1) == Seq(0L, 0L), s"id=${r.getLong(0)}: ${r.getSeq[Long](1)}")
    }
  }

  test("HyperplaneBuckets: interpreted eval agrees with codegen") {
    val v = Array(0.25, -0.75, 0.5, 1.0)
    val expr = HyperplaneBuckets(
      org.apache.spark.sql.catalyst.expressions.Literal.create(v,
        org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.DoubleType)),
      planes(3, 8), 3, 8, dim)
    val interpreted = expr.eval(null)
      .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData].toLongArray.toSeq
    val viaPlan = Seq(Tuple1(v)).toDF("v")
      .select(buckets(col("v"), 3, 8)).as[Seq[Long]].head()
    assert(interpreted == viaPlan, s"interpreted $interpreted != codegen $viaPlan")
  }

  private val centroids = Seq(
    0 -> Seq(1.0, 0.0, 0.0, 0.0),
    1 -> Seq(0.0, 1.0, 0.0, 0.0),
    2 -> Seq(0.0, 0.0, 1.0, 1.0))

  private def nearest(v: Column): Column =
    Bridge.column(NearestCentroid(Bridge.expression(v),
      centroids.flatMap(_._2), centroids.map(_._1), dim))

  test("NearestCentroid picks the true argmin with lowest-id ties") {
    val out = Seq(
      (1L, Array(0.9, 0.1, 0.0, 0.0)),   // -> 0
      (2L, Array(0.0, 2.0, 0.1, 0.0)),   // -> 1
      (3L, Array(0.0, 0.0, 3.0, 3.0)),   // -> 2
      (4L, Array(0.0, 0.0, 0.0, 0.0)))   // equidistant to 0 and 1 (d=1): tie -> 0... 2 has d=2
      .toDF("id", "v")
      .select(col("id"), nearest(col("v")).as("c")).orderBy("id")
      .as[(Long, Int)].collect().toMap
    assert(out == Map(1L -> 0, 2L -> 1, 3L -> 2, 4L -> 0), out.toString)
  }

  test("NearestCentroid matches IvfModel assignment on real embeddings") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val m = graft.ops.Similarity.fitIvf(e, "embedding", nLists = 8, seed = 7L)
    // assignExpr IS NearestCentroid now; cross-check against a SQL argmin
    // over the same centroid literals (the replaced array_min shape)
    val entries = m.centroids.map { case (i, c) =>
      val cn = c.map(x => x * x).sum
      struct((lit(cn) - lit(2.0) * graft.ops.Similarity.dot(
        col("embedding").cast("array<double>"), typedLit(c))).as("d"),
        lit(i).as("cluster"))
    }
    val out = e.select(
      m.assignExpr(col("embedding")).as("neu"),
      array_min(array(entries: _*)).getField("cluster").as("old"))
      .collect()
    out.foreach(r => assert(r.getInt(0) == r.getInt(1), r.toString))
  }

  test("NearestCentroid: null vector or wrong length is null") {
    val rows = Seq(
      (1L, null.asInstanceOf[Array[java.lang.Double]]),
      (2L, Array[java.lang.Double](0.5, 0.5)))
      .toDF("id", "v")
    val out = rows.select(nearest(col("v").cast("array<double>"))).collect()
    out.foreach(r => assert(r.isNullAt(0), r.toString))
  }
}
