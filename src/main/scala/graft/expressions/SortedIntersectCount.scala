package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodeGenerator, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native codegen |A ∩ B| over two ASCENDING-SORTED string or long
  * arrays — the verify step of every exact set-overlap scorer (n-gram
  * Jaccard / containment re-score), where it runs once per candidate
  * pair. The long form is the hot one: set-overlap scorers shingle as
  * xxhash64 keys (the ids-only-shuffle discipline), so the merge walk
  * compares two primitives per step.
  *
  * Semantics: equal to `size(array_intersect(a, b))` when both inputs
  * are duplicate-free and sorted ascending (`sort_array` order — UTF8
  * binary for strings, signed numeric for longs, the same total order
  * this merge walks). The built-in is a generic hash-set build per ROW
  * PAIR (one OpenHashSet allocation + per-element hashing + an output
  * array that only gets size()'d); sorted inputs make all of that
  * unnecessary — one branch-per-element merge walk, zero allocation,
  * codegen-inlined. Callers guarantee the sort (unsorted inputs
  * undercount — the spec pins agreement with array_intersect on sorted
  * real-corpus sets).
  *
  * Null contract: a null ARRAY yields null (BinaryExpression default);
  * null ELEMENTS are rejected with an error — set members are real
  * values by construction (collect_list output), and silently skipping
  * them would hide an upstream bug as a plausible undercount.
  */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_sorted_intersect"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), ArrayType(StringType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName needs two string or two long arrays, got " +
          s"${left.dataType.sql} and ${right.dataType.sql}")
    }

  private def elemType: DataType =
    left.dataType.asInstanceOf[ArrayType].elementType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val nx = x.numElements()
    val ny = y.numElements()
    var i = 0
    var j = 0
    var c = 0
    val longs = elemType == LongType
    while (i < nx && j < ny) {
      if (x.isNullAt(i) || y.isNullAt(j))
        throw new IllegalArgumentException(
          s"$prettyName: null element — inputs must be null-free sets")
      val cmp =
        if (longs) java.lang.Long.compare(x.getLong(i), y.getLong(j))
        else x.getUTF8String(i).compareTo(y.getUTF8String(j))
      if (cmp == 0) { c += 1; i += 1; j += 1 }
      else if (cmp < 0) i += 1
      else j += 1
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val c = ctx.freshName("c")
      val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      val cmp = ctx.freshName("cmp")
      val getA = CodeGenerator.getValue(a, elemType, i)
      val getB = CodeGenerator.getValue(b, elemType, j)
      val cmpExpr =
        if (elemType == LongType) s"java.lang.Long.compare($getA, $getB)"
        else s"($getA).compareTo($getB)"
      s"""
         |int $nx = $a.numElements();
         |int $ny = $b.numElements();
         |int $i = 0; int $j = 0; int $c = 0;
         |while ($i < $nx && $j < $ny) {
         |  if ($a.isNullAt($i) || $b.isNullAt($j)) {
         |    throw new IllegalArgumentException(
         |      "graft_sorted_intersect: null element - inputs must be null-free sets");
         |  }
         |  int $cmp = $cmpExpr;
         |  if ($cmp == 0) { $c++; $i++; $j++; }
         |  else if ($cmp < 0) { $i++; }
         |  else { $j++; }
         |}
         |${ev.value} = $c;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedIntersectCount =
    copy(left = newLeft, right = newRight)
}
