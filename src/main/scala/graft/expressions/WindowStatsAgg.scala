package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData}
import org.apache.spark.sql.types._

/** Per-window quality statistics as ONE aggregate expression, so the
  * per-epoch drift-window partials ride the audit sink's write job via
  * `observe()` — zero extra Spark jobs and zero extra scans on the commit
  * path (the streaming restatement of the reference validating inside the
  * pipeline, app.py:50-51; GuardianStream.publishQuality).
  *
  * Result: map<window_start_micros, [n, len_min, len_max, len_sum,
  * len_sumsq, n_pii]> over the epoch's rows. Tumbling (slideUs ==
  * windowUs, the default) assignment is `floorDiv(ts_micros, windowUs) *
  * windowUs`; SLIDING (slideUs < windowUs) emits one update per
  * containing window — starts s ≡ 0 (mod slideUs) with
  * ts−windowUs < s ≤ ts — identical to Spark's `window(ts, size, slide)`
  * window set for fixed (month-free) durations with no offset, which is
  * what `readQuality`'s stream≡batch equality test relies on. All six
  * statistics are exact integers (sumsq of 31-bit lengths over any
  * realistic epoch stays far below 2^63), so partials from different
  * epochs merge bit-exactly.
  *
  * The buffer is a primitive-keyed HashMap bounded by the number of
  * DISTINCT event-time windows touched by one micro-batch — thousands at
  * most (× windowUs/slideUs when sliding), independent of row count.
  */
case class WindowStatsAgg(
    ts: Expression,
    len: Expression,
    pii: Expression,
    windowUs: Long,
    slideUs: Long,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.HashMap[java.lang.Long, Array[Long]]] {

  require(windowUs > 0, "windowUs must be positive")
  require(slideUs > 0 && slideUs <= windowUs,
    s"slideUs must be in (0, windowUs]: $slideUs vs $windowUs")

  override def children: Seq[Expression] = Seq(ts, len, pii)
  override def nullable: Boolean = false
  override def dataType: DataType =
    MapType(LongType, ArrayType(LongType, containsNull = false), valueContainsNull = false)

  override def createAggregationBuffer(): java.util.HashMap[java.lang.Long, Array[Long]] =
    new java.util.HashMap[java.lang.Long, Array[Long]]()

  private def slot(
      buf: java.util.HashMap[java.lang.Long, Array[Long]], ws: Long): Array[Long] = {
    var a = buf.get(ws)
    if (a == null) {
      a = Array(0L, Long.MaxValue, Long.MinValue, 0L, 0L, 0L)
      buf.put(ws, a)
    }
    a
  }

  override def update(
      buf: java.util.HashMap[java.lang.Long, Array[Long]],
      input: InternalRow): java.util.HashMap[java.lang.Long, Array[Long]] = {
    val tsv = ts.eval(input)
    val lv = len.eval(input)
    if (tsv != null && lv != null) {
      val us = tsv.asInstanceOf[Long]
      val l = lv.asInstanceOf[Int].toLong
      val p = pii.eval(input)
      val isPii = p != null && p.asInstanceOf[Boolean]
      // every window [ws, ws+windowUs) containing us, ws aligned to slideUs
      var ws = Math.floorDiv(us, slideUs) * slideUs
      while (ws + windowUs > us) {
        val a = slot(buf, ws)
        a(0) += 1L
        if (l < a(1)) a(1) = l
        if (l > a(2)) a(2) = l
        a(3) += l
        a(4) += l * l
        if (isPii) a(5) += 1L
        ws -= slideUs
      }
    }
    buf
  }

  override def merge(
      buf: java.util.HashMap[java.lang.Long, Array[Long]],
      other: java.util.HashMap[java.lang.Long, Array[Long]]): java.util.HashMap[java.lang.Long, Array[Long]] = {
    other.forEach { (ws, b) =>
      val a = slot(buf, ws)
      a(0) += b(0)
      if (b(1) < a(1)) a(1) = b(1)
      if (b(2) > a(2)) a(2) = b(2)
      a(3) += b(3)
      a(4) += b(4)
      a(5) += b(5)
    }
    buf
  }

  override def eval(buf: java.util.HashMap[java.lang.Long, Array[Long]]): Any = {
    val n = buf.size()
    val keys = new Array[Any](n)
    val vals = new Array[Any](n)
    val it = buf.entrySet().iterator()
    var i = 0
    while (it.hasNext) {
      val e = it.next()
      keys(i) = e.getKey.longValue()
      vals(i) = new GenericArrayData(e.getValue)
      i += 1
    }
    new ArrayBasedMapData(new GenericArrayData(keys), new GenericArrayData(vals))
  }

  override def serialize(buf: java.util.HashMap[java.lang.Long, Array[Long]]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + buf.size() * 7 * 8)
    bb.putInt(buf.size())
    buf.forEach { (ws, a) =>
      bb.putLong(ws)
      var i = 0
      while (i < 6) { bb.putLong(a(i)); i += 1 }
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.HashMap[java.lang.Long, Array[Long]] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new java.util.HashMap[java.lang.Long, Array[Long]](n * 2)
    var i = 0
    while (i < n) {
      val ws = bb.getLong
      val a = new Array[Long](6)
      var j = 0
      while (j < 6) { a(j) = bb.getLong; j += 1 }
      buf.put(ws, a)
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): WindowStatsAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): WindowStatsAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): WindowStatsAgg =
    copy(ts = newChildren(0), len = newChildren(1), pii = newChildren(2))
}

/** Element-wise sum of an `array<long>` column — the k-means centroid
  * update's per-position sums as ONE tiny aggregate. The declarative
  * alternative (`dim` separate `sum(element_at(qe, j))` columns) is
  * semantically identical but generates a `dim`-wide codegen class whose
  * janino compilation dominated the whole query at bench scale (~1.5 s
  * for dim=64); this buffer is one long array and the generated plumbing
  * is constant-size. Sums of quantized components are exact integers far
  * below 2^63. Arrays must share one length (true for fixed-dim
  * embedding columns); empty input yields an empty array.
  */
case class ArraySumAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): Array[Long] = Array.empty[Long]

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v == null) return buf
    val arr = v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val n = arr.numElements()
    val acc = if (buf.length == n) buf else {
      require(buf.isEmpty, s"array_sum_agg: ragged input (${buf.length} vs $n)")
      new Array[Long](n)
    }
    var i = 0
    while (i < n) { acc(i) += arr.getLong(i); i += 1 }
    acc
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    if (other.isEmpty) return buf
    if (buf.isEmpty) return other
    require(buf.length == other.length, "array_sum_agg: ragged partials")
    var i = 0
    while (i < buf.length) { buf(i) += other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + buf.length * 8)
    bb.putInt(buf.length)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    Array.fill(n)(bb.getLong)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): ArraySumAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ArraySumAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): ArraySumAgg =
    copy(child = newChildren(0))
  override def prettyName: String = "array_sum_agg"
}

object ArraySumAgg {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.graftbridge.CatalystBridge
  def column(arr: Column): Column =
    CatalystBridge.column(
      ArraySumAgg(CatalystBridge.expression(arr)).toAggregateExpression())
}

object WindowStatsAgg {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.graftbridge.CatalystBridge

  /** `map<window_start_us, [n, min, max, sum, sumsq, n_pii]>` column over
    * (timestamp, int length, boolean pii) with a fixed window duration
    * and optional slide (slideUs == windowUs ⇒ tumbling).
    */
  def column(
      ts: Column, len: Column, pii: Column, windowUs: Long,
      slideUs: Long = 0L): Column =
    CatalystBridge.column(
      WindowStatsAgg(
        CatalystBridge.expression(ts),
        CatalystBridge.expression(len),
        CatalystBridge.expression(pii),
        windowUs,
        if (slideUs > 0) slideUs else windowUs).toAggregateExpression())
}
