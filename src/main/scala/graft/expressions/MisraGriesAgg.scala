package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData}
import org.apache.spark.sql.graftbridge.CatalystBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, MapType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Shared Misra–Gries buffer operations (see MisraGriesAgg for the
  * guarantee): a ≤ 2k-entry (token → counter) map whose prune subtracts
  * the (k+1)-th largest counter from every entry and drops the ≤ 0 ones —
  * each prune removes ≥ (k+1)·m total mass, bounding any token's
  * undercount by N/(k+1) under arbitrary partitioning and merge order.
  */
private[graft] object MgBuffer {
  type Buf = java.util.HashMap[UTF8String, Array[Long]]

  def prune(buf: Buf, k: Int): Unit = {
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

  /** Count one occurrence of `t`; `t` may point into a reused row buffer
    * (copied on insert).
    */
  def bump(buf: Buf, t: UTF8String, k: Int): Unit = {
    val cell = buf.get(t)
    if (cell != null) cell(0) += 1L
    else {
      buf.put(t.copy(), Array(1L))
      if (buf.size() > 2 * k) prune(buf, k)
    }
  }

  def mergeInto(buf: Buf, other: Buf, k: Int): Unit = {
    other.forEach { (t, c) =>
      val cell = buf.get(t)
      if (cell != null) cell(0) += c(0)
      else buf.put(t, c) // deserialized maps own their keys; no copy needed
    }
    if (buf.size() > 2 * k) prune(buf, k)
  }

  def ser(buf: Buf): Array[Byte] = {
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

  def deser(bytes: Array[Byte]): Buf = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new Buf(n * 2)
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

  /** Driver-side fold of one PUBLISHED (token, counter) partial into an
    * accumulator — the read/compaction path's merge. Shared by
    * `GuardianStream.readVocab` and `compactQuality` so that compaction
    * is bit-exact lossless: with pruning, merge is only left-fold
    * associative when both paths perform the IDENTICAL operation
    * sequence (add the whole partial, then prune once if over 2k).
    */
  def foldStringPartial(
      acc: java.util.HashMap[String, Array[Long]],
      partial: Seq[(String, Long)], k: Int): Unit = {
    partial.foreach { case (t, c) =>
      val cell = acc.get(t)
      if (cell != null) cell(0) += c else acc.put(t, Array(c))
    }
    if (acc.size() > 2 * k) {
      val counts = new Array[Long](acc.size())
      var i = 0
      val vit = acc.values().iterator()
      while (vit.hasNext) { counts(i) = vit.next()(0); i += 1 }
      java.util.Arrays.sort(counts)
      val m = counts(counts.length - 1 - k)
      val eit = acc.entrySet().iterator()
      while (eit.hasNext) {
        val e = eit.next()
        val c = e.getValue
        c(0) -= m
        if (c(0) <= 0L) eit.remove()
      }
    }
  }
}

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

  override def createAggregationBuffer(): MgBuffer.Buf = new MgBuffer.Buf()

  override def update(buf: MgBuffer.Buf, input: InternalRow): MgBuffer.Buf = {
    val tv = token.eval(input)
    if (tv != null) MgBuffer.bump(buf, tv.asInstanceOf[UTF8String], k)
    buf
  }

  override def merge(buf: MgBuffer.Buf, other: MgBuffer.Buf): MgBuffer.Buf = {
    MgBuffer.mergeInto(buf, other, k)
    buf
  }

  override def eval(buf: MgBuffer.Buf): Any = {
    val out = new Array[Any](buf.size())
    var i = 0
    val kit = buf.keySet().iterator()
    while (kit.hasNext) { out(i) = kit.next(); i += 1 }
    new GenericArrayData(out)
  }

  override def serialize(buf: MgBuffer.Buf): Array[Byte] = MgBuffer.ser(buf)
  override def deserialize(bytes: Array[Byte]): MgBuffer.Buf = MgBuffer.deser(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGriesAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGriesAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MisraGriesAgg =
    copy(token = newChildren(0))
  override def prettyName: String = "misra_gries_candidates"
}

/** misra_gries_text(text, k): the same Misra–Gries summary over the
  * SPACE-SPLIT tokens of a text column, tokenized INSIDE the aggregate —
  * so the sketch can ride `observe()` on un-exploded rows (the standing
  * vocabulary monitor pays zero extra jobs on the commit path). Empty
  * tokens (leading/consecutive/trailing spaces) are skipped, matching
  * the batch operator's `token <> ''` filter. dataType map<string,long>:
  * the candidates WITH their counters — counters are UNDER-counts (never
  * over), short of the true count by at most N/(k+1).
  */
case class MisraGriesTextAgg(
    text: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[MgBuffer.Buf] {

  require(k > 0, "k must be positive")

  override def children: Seq[Expression] = Seq(text)
  override def nullable: Boolean = false
  override def dataType: DataType =
    MapType(StringType, LongType, valueContainsNull = false)

  override def createAggregationBuffer(): MgBuffer.Buf = new MgBuffer.Buf()

  override def update(buf: MgBuffer.Buf, input: InternalRow): MgBuffer.Buf = {
    val tv = text.eval(input)
    if (tv != null) {
      // one pass over a private byte copy; per-token slices reference it
      // (row-lifetime only: MgBuffer.bump copies on insert)
      val bytes = tv.asInstanceOf[UTF8String].getBytes
      var start = 0
      var i = 0
      while (i <= bytes.length) {
        if (i == bytes.length || bytes(i) == ' ') {
          if (i > start)
            MgBuffer.bump(buf, UTF8String.fromBytes(bytes, start, i - start), k)
          start = i + 1
        }
        i += 1
      }
    }
    buf
  }

  override def merge(buf: MgBuffer.Buf, other: MgBuffer.Buf): MgBuffer.Buf = {
    MgBuffer.mergeInto(buf, other, k)
    buf
  }

  override def eval(buf: MgBuffer.Buf): Any = {
    val n = buf.size()
    val keys = new Array[Any](n)
    val vals = new Array[Any](n)
    val it = buf.entrySet().iterator()
    var i = 0
    while (it.hasNext) {
      val e = it.next()
      keys(i) = e.getKey
      vals(i) = e.getValue()(0)
      i += 1
    }
    new ArrayBasedMapData(new GenericArrayData(keys), new GenericArrayData(vals))
  }

  override def serialize(buf: MgBuffer.Buf): Array[Byte] = MgBuffer.ser(buf)
  override def deserialize(bytes: Array[Byte]): MgBuffer.Buf = MgBuffer.deser(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGriesTextAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGriesTextAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MisraGriesTextAgg =
    copy(text = newChildren(0))
  override def prettyName: String = "misra_gries_text"
}

object MisraGriesAgg {
  /** array<string> of heavy-hitter candidates for tokens of frequency
    * > 1/(k+1); see the class doc for the guarantee.
    */
  def candidates(token: Column, k: Int): Column =
    CatalystBridge.column(
      MisraGriesAgg(CatalystBridge.expression(token), k).toAggregateExpression())

  /** map<token, counter> Misra–Gries summary of a text column's
    * space-split tokens (tokenized inside the aggregate — observe()-safe).
    */
  def textColumn(text: Column, k: Int): Column =
    CatalystBridge.column(
      MisraGriesTextAgg(CatalystBridge.expression(text), k).toAggregateExpression())
}
