package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.CatalystBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** gram_bitmap(text, n, m): a LINEAR-COUNTING bitmap over the token
  * n-gram hashes of a text column — the fixed-size distinct-gram
  * partial behind the standing corpus-diversity monitor (batch twin:
  * TrainingDataOps.gramCardinality). Tokenization and gram hashing run
  * INSIDE the aggregate (single pass over the UTF-8 bytes, no explode),
  * so it can ride `observe()` on the commit path's write job for zero
  * extra jobs, exactly like MisraGriesTextAgg.
  *
  * Semantics mirror the batch operator bit for bit on ASCII corpora
  * (the fixture guarantee Verify enforces): token hash is the
  * polynomial (acc·31 + byte) mod P over space-split tokens INCLUDING
  * empty tokens (split(text, " ") keeps them, hash 0), gram hash is the
  * same fold over n consecutive token hashes, and the bitmap marks
  * gram mod m. On non-ASCII input bytes are used where the batch side
  * hashes code points — deterministic, but a different function (the
  * langId caveat class).
  *
  * The bitmap is m bits = m/64 longs, constant size at ANY corpus
  * scale; merge is bitwise OR — fully associative AND commutative, so
  * unlike the Misra–Gries partial the merged view is independent of
  * epoch boundaries, merge trees, and compaction fold order. v_occ
  * derived from the merged bitmap is EXACT distinct-bucket count;
  * the −m·ln(empty/m) estimate is the standard linear-counting
  * cardinality (Whang et al. 1990).
  */
case class GramBitmapAgg(
    text: Expression,
    n: Int,
    m: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  require(n >= 1, "gram size must be positive")
  require(m >= 64 && m % 64 == 0, "bitmap slots must be a positive multiple of 64")

  private val P = 1000000007L // graft.ops.TrainingDataOps.P (cross-engine polyhash modulus)

  override def children: Seq[Expression] = Seq(text)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): Array[Long] = new Array[Long](m / 64)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val tv = text.eval(input)
    if (tv != null) {
      val bytes = tv.asInstanceOf[UTF8String].getBytes
      val ring = new Array[Long](n)
      var count = 0
      var h = 0L
      var i = 0
      while (i <= bytes.length) {
        if (i == bytes.length || bytes(i) == ' ') {
          // token boundary (empty tokens push hash 0 — split() parity)
          ring(count % n) = h
          count += 1
          if (count >= n) {
            var g = 0L
            var j = count - n
            while (j < count) { g = (g * 31 + ring(j % n)) % P; j += 1 }
            val b = (g % m).toInt
            buf(b >>> 6) |= 1L << (b & 63)
          }
          h = 0L
        } else {
          h = (h * 31 + (bytes(i) & 0xff)) % P
        }
        i += 1
      }
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buf.length) { buf(i) |= other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any =
    new GenericArrayData(buf.map(x => x: Any))

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(buf.length * 8)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    Array.fill(bytes.length / 8)(bb.getLong)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): GramBitmapAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): GramBitmapAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): GramBitmapAgg =
    copy(text = newChildren(0))
  override def prettyName: String = "gram_bitmap"
}

object GramBitmapAgg {
  /** array<long> (m/64 words) linear-counting bitmap over token n-gram
    * hashes, tokenized inside the aggregate — observe()-safe.
    */
  def textColumn(text: Column, n: Int, m: Int): Column =
    CatalystBridge.column(
      GramBitmapAgg(CatalystBridge.expression(text), n, m).toAggregateExpression())

  /** (v_occ, est_linear) of a merged bitmap: exact occupied-slot count
    * and the linear-counting estimate, −1 on saturation (the same
    * disclosure rule as the batch gramCardinality column).
    */
  def summarize(words: Array[Long], m: Int): (Long, Long) = {
    var v = 0L
    words.foreach(w => v += java.lang.Long.bitCount(w))
    val est =
      if (v >= m) -1L
      else math.floor(-m.toDouble * math.log((m - v).toDouble / m)).toLong
    (v, est)
  }
}
