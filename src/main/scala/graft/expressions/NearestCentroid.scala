package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** IVF coarse-quantizer assignment as ONE native expression: the id of
  * the nearest centroid under squared L2, computed as
  * argmin over −2·v·cᵢ + ‖cᵢ‖² (‖v‖² is constant per row and cannot
  * change the argmin), ties → the earliest centroid in `ids` order
  * (callers pass centroids sorted by id, so ties → lowest id — the
  * `array_min(array(struct(d, id)))` tie rule of the previous form).
  *
  * Same rationale as [[HyperplaneBuckets]]: the previous column form
  * inlined nLists literal centroid arrays plus struct/array_min
  * machinery into the plan, and Janino compile time of the generated
  * projection dominated execution. Here the centroid matrix is one flat
  * `double[]` reference object; the dot folds are the same sequential
  * left-to-right accumulation, so assignments are bit-identical.
  *
  * NaN distances follow Spark comparison semantics (NaN = greatest
  * double: a NaN distance never beats a finite one, and among all-NaN
  * the earliest id wins). A null vector, wrong-length vector, or null
  * element yields null (the previous form degenerated to an arbitrary
  * struct ordering over null fields there; no caller feeds nulls —
  * vectors are non-null embeddings cast to array<double>).
  *
  * `centroids` is flat `[list][dim]` row-major; `ids(i)` is the cluster
  * id of row i. Seqs so case-class equality is structural.
  */
case class NearestCentroid(child: Expression, centroids: Seq[Double],
    ids: Seq[Int], dim: Int) extends UnaryExpression {

  require(ids.nonEmpty && centroids.length == ids.length * dim,
    s"centroids length ${centroids.length} != ${ids.length}*$dim")

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_nearest_centroid"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs array<double>, got ${other.sql}")
  }

  @transient private lazy val flat: Array[Double] = centroids.toArray
  @transient private lazy val idArr: Array[Int] = ids.toArray
  @transient private lazy val cNormSq: Array[Double] = {
    val n = ids.length
    val out = new Array[Double](n)
    var l = 0
    while (l < n) {
      var s = 0.0
      var i = 0
      while (i < dim) { val x = flat(l * dim + i); s += x * x; i += 1 }
      out(l) = s
      l += 1
    }
    out
  }

  /** Spark's double ordering: NaN is greater than everything. */
  private def sparkLt(a: Double, b: Double): Boolean =
    (!java.lang.Double.isNaN(a) && java.lang.Double.isNaN(b)) ||
      (!java.lang.Double.isNaN(a) && a < b)

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) return null
    val arr = v.asInstanceOf[ArrayData]
    if (arr.numElements() != dim) return null
    val n = idArr.length
    var best = 0
    var bestD = Double.NaN
    var l = 0
    while (l < n) {
      var acc = 0.0
      var i = 0
      while (i < dim) {
        if (arr.isNullAt(i)) return null
        acc += arr.getDouble(i) * flat(l * dim + i)
        i += 1
      }
      val d = cNormSq(l) - 2.0 * acc
      if (l == 0 || sparkLt(d, bestD)) { best = l; bestD = d }
      l += 1
    }
    idArr(best)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cRef = ctx.addReferenceObj("centroids", flat, "double[]")
    val nRef = ctx.addReferenceObj("cnormsq", cNormSq, "double[]")
    val idRef = ctx.addReferenceObj("ids", idArr, "int[]")
    nullSafeCodeGen(ctx, ev, v => {
      val l = ctx.freshName("l")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val d = ctx.freshName("d")
      val best = ctx.freshName("best")
      val bestD = ctx.freshName("bestD")
      val bad = ctx.freshName("bad")
      val better = ctx.freshName("better")
      // Janino misparses compound parenthesized boolean expressions that
      // start with `(!` as cast expressions — keep the NaN ordering as a
      // flat if/else chain (same Spark semantics: NaN = greatest double).
      s"""
         |if ($v.numElements() != $dim) { ${ev.isNull} = true; } else {
         |  int $best = 0; double $bestD = Double.NaN; boolean $bad = false;
         |  for (int $l = 0; $l < ${idArr.length} && !$bad; $l++) {
         |    double $acc = 0.0;
         |    for (int $i = 0; $i < $dim; $i++) {
         |      if ($v.isNullAt($i)) { $bad = true; break; }
         |      $acc += $v.getDouble($i) * $cRef[$l * $dim + $i];
         |    }
         |    if ($bad) break;
         |    double $d = $nRef[$l] - 2.0 * $acc;
         |    boolean $better;
         |    if ($l == 0) { $better = true; }
         |    else if (Double.isNaN($d)) { $better = false; }
         |    else if (Double.isNaN($bestD)) { $better = true; }
         |    else { $better = $d < $bestD; }
         |    if ($better) { $best = $l; $bestD = $d; }
         |  }
         |  if ($bad) { ${ev.isNull} = true; }
         |  else { ${ev.value} = $idRef[$best]; }
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
