package graft.expressions

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra-Gries frequent-items summary of capacity k: at most k counters,
  * every item with true frequency > n/(k+1) is guaranteed present, and
  * each reported count is a lower bound within n/(k+1) of the truth.
  * Merge follows the mergeable-summaries construction (Agarwal et al.,
  * "Mergeable Summaries", PODS'12): sum counters, then subtract the
  * (k+1)-th largest count and drop non-positive — the error bound
  * composes across arbitrary merge trees, which is what makes the sketch
  * legal as a distributed partial aggregate.
  */
final class MisraGries(val k: Int) extends Serializable {
  require(k >= 1, "capacity must be >= 1")

  private[expressions] val counts = scala.collection.mutable.HashMap.empty[String, Long]
  private var total = 0L

  def n: Long = total
  def size: Int = counts.size

  private[expressions] def restoreTotal(t: Long): Unit = total = t

  def add(item: String): Unit = {
    total += 1
    counts.get(item) match {
      case Some(c) => counts(item) = c + 1
      case None if counts.size < k => counts(item) = 1
      case None =>
        // classic decrement step: every counter pays one, zeros evicted
        val dead = scala.collection.mutable.ArrayBuffer.empty[String]
        counts.foreach { case (key, c) =>
          if (c == 1) dead += key else counts(key) = c - 1
        }
        dead.foreach(counts.remove)
    }
  }

  def merge(other: MisraGries): Unit = {
    other.counts.foreach { case (i, c) => counts(i) = counts.getOrElse(i, 0L) + c }
    total += other.total
    if (counts.size > k) {
      val sorted = counts.values.toArray.sortWith(_ > _)
      val sub = sorted(k) // the (k+1)-th largest
      counts.keys.toArray.foreach { key =>
        val c = counts(key) - sub
        if (c > 0) counts(key) = c else counts.remove(key)
      }
    }
  }

  /** Surviving items, count desc then item asc (deterministic given the
    * counter state). Counts are lower bounds.
    */
  def items: Seq[(String, Long)] =
    counts.toSeq.sortBy { case (item, c) => (-c, item) }

  def serialize(): Array[Byte] = {
    val entries = counts.toSeq.map { case (s, c) => (s.getBytes(StandardCharsets.UTF_8), c) }
    val bb = ByteBuffer.allocate(4 + 8 + 4 + entries.map(e => 4 + e._1.length + 8).sum)
    bb.putInt(k); bb.putLong(total); bb.putInt(entries.size)
    entries.foreach { case (bytes, c) =>
      bb.putInt(bytes.length); bb.put(bytes); bb.putLong(c)
    }
    bb.array()
  }
}

object MisraGries {
  def deserialize(bytes: Array[Byte]): MisraGries = {
    val bb = ByteBuffer.wrap(bytes)
    val mg = new MisraGries(bb.getInt)
    val total = bb.getLong
    val m = bb.getInt
    var i = 0
    while (i < m) {
      val len = bb.getInt
      val sb = new Array[Byte](len); bb.get(sb)
      mg.counts(new String(sb, StandardCharsets.UTF_8)) = bb.getLong
      i += 1
    }
    // restore the true processed-element count (counts sum < total after
    // decrements/subtractions)
    mg.restoreTotal(total)
    mg
  }
}

/** `graft_heavy_hitters(item, k)` — a native TypedImperativeAggregate over
  * the Misra-Gries summary: O(k) memory per group, mergeable partial
  * sketches (map-side combine), legal in streaming aggregations. The
  * sketch answer to "top terms per group" at 100 TB, where the exact
  * groupBy-count vocabulary no longer fits: every item with frequency
  * > n/(k+1) is guaranteed in the output, counts are lower bounds.
  * Returns array<struct<item string, est bigint>>, count desc.
  */
case class HeavyHitters(child: Expression, kExpr: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[MisraGries] {

  override def children: Seq[Expression] = Seq(child, kExpr)
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("item", StringType), StructField("est", LongType))), containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_heavy_hitters"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(s"$prettyName needs a string item column")
    else if (!kExpr.foldable ||
        !Seq[DataType](IntegerType, LongType, ShortType, ByteType)
          .contains(kExpr.dataType))
      TypeCheckResult.TypeCheckFailure(s"$prettyName: k must be an integer constant")
    else kExpr.eval() match {
      // validate the VALUE at analysis time too — a null/zero/negative or
      // >Int k would otherwise surface as an executor-side MatchError /
      // require-crash / silent truncation mid-job
      case null => TypeCheckResult.TypeCheckFailure(s"$prettyName: k must not be null")
      case v =>
        val l = v match {
          case i: Int => i.toLong; case l: Long => l
          case s: Short => s.toLong; case b: Byte => b.toLong
        }
        if (l < 1 || l > 100000)
          TypeCheckResult.TypeCheckFailure(
            s"$prettyName: k must be in [1, 100000], got $l")
        else TypeCheckResult.TypeCheckSuccess
    }

  private lazy val k: Int = (kExpr.eval() match {
    case i: Int => i.toLong
    case l: Long => l
    case s: Short => s.toLong
    case b: Byte => b.toLong
  }).toInt

  override def createAggregationBuffer(): MisraGries = new MisraGries(k)

  override def update(buffer: MisraGries, input: InternalRow): MisraGries = {
    val v = child.eval(input)
    if (v != null) buffer.add(v.asInstanceOf[UTF8String].toString)
    buffer
  }

  override def merge(buffer: MisraGries, input: MisraGries): MisraGries = {
    buffer.merge(input); buffer
  }

  override def eval(buffer: MisraGries): Any =
    new GenericArrayData(buffer.items.map { case (item, est) =>
      new GenericInternalRow(Array[Any](UTF8String.fromString(item), est))
    }.toArray[Any])

  override def serialize(buffer: MisraGries): Array[Byte] = buffer.serialize()
  override def deserialize(bytes: Array[Byte]): MisraGries =
    MisraGries.deserialize(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): HeavyHitters =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HeavyHitters =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): HeavyHitters =
    copy(child = newChildren(0), kExpr = newChildren(1))
}
