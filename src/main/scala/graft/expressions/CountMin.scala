package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Count-Min sketch (Cormode & Muthukrishnan 2005) — the sub-linear
  * frequency estimator that completes the sketch family beside the
  * t-digest (quantiles), HLL++ (cardinality), and Misra-Gries (heavy
  * hitters): `depth × width` counters answer point frequency queries
  * with one-sided error, est ≥ true and est ≤ true + ε·N at probability
  * 1 − δ for width = ⌈e/ε⌉, depth = ⌈ln(1/δ)⌉.
  *
  * Hashing is Carter-Wegman over a fixed 64-bit FNV-1a of the UTF-8
  * bytes — fully deterministic across JVMs, partitionings, AND merge
  * orders (counter arrays add elementwise; addition commutes), so the
  * same corpus always yields the same estimates: the property that
  * makes a sketch auditable in a regression-gated pipeline.
  *
  * 100 TB shape: update is O(depth) per row with zero allocation, the
  * shuffle moves one `depth·width·8`-byte buffer per partition (not per
  * row), and merge is elementwise add — the exact map-side-combine
  * contract of a TypedImperativeAggregate.
  */
final class CMSketch(val depth: Int, val width: Int) extends Serializable {
  // fail at construction, not as an ArrayIndexOutOfBounds inside an
  // executor task on the first add(): each row needs its own seed
  require(depth >= 1 && depth <= CMSketch.Seeds.length,
    s"depth must be in [1, ${CMSketch.Seeds.length}] (one fixed seed per row), got $depth")
  require(width >= 1, s"width must be positive, got $width")
  val counts: Array[Long] = new Array[Long](depth * width)
  var total: Long = 0L

  @inline private def row(i: Int, base: Long): Int = {
    // per-row hash: splitmix64 finalizer of (base ^ fixed seed_i) — exact
    // Long arithmetic, identical on every JVM, rows pairwise independent
    // enough for the CM guarantee in practice
    var z = base ^ CMSketch.Seeds(i)
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z = z ^ (z >>> 31)
    java.lang.Math.floorMod(z, width.toLong).toInt
  }

  def add(key: UTF8String): Unit = {
    val base = CMSketch.fnv1a(key.getBytes)
    var i = 0
    while (i < depth) { counts(i * width + row(i, base)) += 1; i += 1 }
    total += 1
  }

  def estimate(key: UTF8String): Long = {
    val base = CMSketch.fnv1a(key.getBytes)
    var best = Long.MaxValue
    var i = 0
    while (i < depth) {
      val c = counts(i * width + row(i, base))
      if (c < best) best = c
      i += 1
    }
    if (best == Long.MaxValue) 0L else best
  }

  def merge(o: CMSketch): Unit = {
    var i = 0
    while (i < counts.length) { counts(i) += o.counts(i); i += 1 }
    total += o.total
  }
}

object CMSketch {
  // fixed per-row seeds (sha-256 initial hash words, zero-extended) —
  // pinned so the sketch is reproducible forever
  val Seeds: Array[Long] = Array(0x6a09e667f3bcc909L, 0xbb67ae8584caa73bL,
    0x3c6ef372fe94f82bL, 0xa54ff53a5f1d36f1L, 0x510e527fade682d1L,
    0x9b05688c2b3e6c1fL, 0x1f83d9abfb41bd6bL, 0x5be0cd19137e2179L)

  def fnv1a(bytes: Array[Byte]): Long = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < bytes.length) {
      h ^= bytes(i) & 0xffL
      h *= 0x100000001b3L
      i += 1
    }
    h & 0x7fffffffffffffffL
  }

  def serialize(s: CMSketch): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(16 + s.counts.length * 8)
    bb.putInt(s.depth); bb.putInt(s.width); bb.putLong(s.total)
    s.counts.foreach(bb.putLong)
    bb.array()
  }

  def deserialize(bytes: Array[Byte]): CMSketch = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val s = new CMSketch(bb.getInt, bb.getInt)
    s.total = bb.getLong
    var i = 0
    while (i < s.counts.length) { s.counts(i) = bb.getLong; i += 1 }
    s
  }
}

/** Aggregate form: sketch `child` (string), eval returns the point
  * estimates for `probes` (analysis-time string literals) as
  * array<long> aligned with the probe order — probing inside eval keeps
  * the exchanged state one buffer and avoids shipping the sketch to a
  * second operator.
  */
case class CountMinEstimates(child: Expression, probes: Seq[String],
    depth: Int, width: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[CMSketch] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_countmin"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName needs a string key")

  override def createAggregationBuffer(): CMSketch = new CMSketch(depth, width)

  override def update(buffer: CMSketch, input: InternalRow): CMSketch = {
    val v = child.eval(input)
    if (v != null) buffer.add(v.asInstanceOf[UTF8String])
    buffer
  }

  override def merge(buffer: CMSketch, other: CMSketch): CMSketch = {
    buffer.merge(other); buffer
  }

  override def eval(buffer: CMSketch): Any =
    new GenericArrayData(probes.map(p =>
      buffer.estimate(UTF8String.fromString(p))).toArray)

  override def serialize(buffer: CMSketch): Array[Byte] = CMSketch.serialize(buffer)
  override def deserialize(bytes: Array[Byte]): CMSketch = CMSketch.deserialize(bytes)

  override def withNewMutableAggBufferOffset(o: Int): CountMinEstimates =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): CountMinEstimates =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): CountMinEstimates =
    copy(child = c.head)
}
