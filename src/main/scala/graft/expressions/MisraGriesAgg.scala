package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.CatalystBridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries heavy-hitter CANDIDATES as one mergeable aggregate: the
  * sub-quadratic half of exact distributed heavy hitters (the other half
  * is an exact count restricted to the returned candidates —
  * TrainingDataOps.heavyHitterTokens).
  *
  * Buffer: at most 2k (token → counter) entries. Update inserts with
  * count 1, and whenever the buffer exceeds 2k entries subtracts the
  * (k+1)-th largest counter m from EVERY entry and drops the ≤ 0 ones —
  * each such prune removes ≥ (k+1)·m total mass (the k+1 top-ranked
  * entries each lose exactly m), so across a stream of N tokens the
  * total undercount of ANY token is ≤ N/(k+1). Merging adds counters
  * entry-wise then prunes the same way; the bound is preserved under
  * arbitrary partitioning/merge trees (the mergeable-summaries argument
  * of Agarwal et al., PODS'12), which is exactly what a Spark partial
  * aggregate needs. Consequence: every token with true count
  * > N/(k+1) is GUARANTEED to survive with a positive counter, so with
  * k ≥ 2/minFreq the candidate set provably contains every token of
  * frequency ≥ minFreq regardless of how rows were partitioned. The
  * candidate SET itself may vary with partitioning (extra sub-threshold
  * survivors differ) — callers must finish with an exact count + filter,
  * which makes the composed result deterministic.
  *
  * The candidate count never exceeds 2k, independent of corpus size:
  * the buffer, the serialized partial, and the returned array are all
  * constant-bounded — safe to collect at any scale.
  */
case class MisraGriesAgg(
    token: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.HashMap[UTF8String, Array[Long]]] {

  require(k > 0, "k must be positive")

  override def children: Seq[Expression] = Seq(token)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def createAggregationBuffer(): java.util.HashMap[UTF8String, Array[Long]] =
    new java.util.HashMap[UTF8String, Array[Long]]()

  /** Subtract the (k+1)-th largest counter from every entry; drop ≤ 0.
    * Leaves at most k entries (only counters STRICTLY above the pivot
    * survive). O(buffer) — amortized against the ≥ k+1 insertions that
    * grew the buffer past 2k.
    */
  private def prune(buf: java.util.HashMap[UTF8String, Array[Long]]): Unit = {
    val counts = new Array[Long](buf.size())
    var i = 0
    val vit = buf.values().iterator()
    while (vit.hasNext) { counts(i) = vit.next()(0); i += 1 }
    java.util.Arrays.sort(counts)
    val m = counts(counts.length - 1 - k) // (k+1)-th largest
    val eit = buf.entrySet().iterator()
    while (eit.hasNext) {
      val e = eit.next()
      val c = e.getValue
      c(0) -= m
      if (c(0) <= 0L) eit.remove()
    }
  }

  override def update(
      buf: java.util.HashMap[UTF8String, Array[Long]],
      input: InternalRow): java.util.HashMap[UTF8String, Array[Long]] = {
    val tv = token.eval(input)
    if (tv != null) {
      val t = tv.asInstanceOf[UTF8String]
      val cell = buf.get(t)
      if (cell != null) cell(0) += 1L
      else {
        // eval may return a pointer into a reused row buffer: copy on insert
        buf.put(t.copy(), Array(1L))
        if (buf.size() > 2 * k) prune(buf)
      }
    }
    buf
  }

  override def merge(
      buf: java.util.HashMap[UTF8String, Array[Long]],
      other: java.util.HashMap[UTF8String, Array[Long]]): java.util.HashMap[UTF8String, Array[Long]] = {
    other.forEach { (t, c) =>
      val cell = buf.get(t)
      if (cell != null) cell(0) += c(0)
      else buf.put(t, c) // deserialized maps own their keys; no copy needed
    }
    if (buf.size() > 2 * k) prune(buf)
    buf
  }

  override def eval(buf: java.util.HashMap[UTF8String, Array[Long]]): Any = {
    val out = new Array[Any](buf.size())
    var i = 0
    val kit = buf.keySet().iterator()
    while (kit.hasNext) { out(i) = kit.next(); i += 1 }
    new GenericArrayData(out)
  }

  override def serialize(buf: java.util.HashMap[UTF8String, Array[Long]]): Array[Byte] = {
    var bytes = 4
    buf.forEach { (t, _) => bytes += 4 + t.numBytes() + 8 }
    val bb = java.nio.ByteBuffer.allocate(bytes)
    bb.putInt(buf.size())
    buf.forEach { (t, c) =>
      val b = t.getBytes
      bb.putInt(b.length); bb.put(b); bb.putLong(c(0))
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.HashMap[UTF8String, Array[Long]] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new java.util.HashMap[UTF8String, Array[Long]](n * 2)
    var i = 0
    while (i < n) {
      val len = bb.getInt
      val b = new Array[Byte](len)
      bb.get(b)
      buf.put(UTF8String.fromBytes(b), Array(bb.getLong))
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGriesAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGriesAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MisraGriesAgg =
    copy(token = newChildren(0))
  override def prettyName: String = "misra_gries_candidates"
}

object MisraGriesAgg {
  /** array<string> of heavy-hitter candidates for tokens of frequency
    * > 1/(k+1); see the class doc for the guarantee.
    */
  def candidates(token: Column, k: Int): Column =
    CatalystBridge.column(
      MisraGriesAgg(CatalystBridge.expression(token), k).toAggregateExpression())
}
