package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.CatalystBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** cms_text(text, w): a count-min sketch over the space-split TOKENS of
  * a text column — d=4 rows of `w` additive counters, tokenized and
  * hashed inside the aggregate so it rides `observe()` on the commit
  * path (the MisraGriesTextAgg / GramBitmapAgg pattern). Together with
  * the Misra–Gries vocabulary summary it gives every candidate token a
  * TWO-SIDED count bracket: the MG counter never over-counts (lower
  * bound) and the CMS min-of-rows never under-counts (upper bound) —
  * `GuardianStream.readVocabBracket` reads both off the same quality
  * manifests.
  *
  * Counter merge is ELEMENTWISE LONG ADDITION — exact, associative and
  * commutative — so like the diversity bitmap (and unlike the
  * order-pinned MG fold) the merged sketch is independent of epoch
  * boundaries, merge trees, and compaction fold order. Empty tokens are
  * SKIPPED, matching the MG text aggregate's `token <> ''` semantics
  * (the bracket must describe the same token stream). Token hash = the
  * byte polynomial (acc·31 + byte) mod P — identical to code-point
  * hashing on the ASCII corpora the fixture guarantees.
  */
case class CmsTextAgg(
    text: Expression,
    w: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  require(w > 0, "counter row width must be positive")

  import CmsTextAgg.{A, B, P}

  override def children: Seq[Expression] = Seq(text)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): Array[Long] = new Array[Long](A.length * w)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val tv = text.eval(input)
    if (tv != null) {
      val bytes = tv.asInstanceOf[UTF8String].getBytes
      var start = 0
      var h = 0L
      var i = 0
      while (i <= bytes.length) {
        if (i == bytes.length || bytes(i) == ' ') {
          if (i > start) { // skip empty tokens (MG parity)
            var j = 0
            while (j < A.length) {
              buf(j * w + ((A(j) * h + B(j)) % P % w).toInt) += 1L
              j += 1
            }
          }
          h = 0L
          start = i + 1
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
    while (i < buf.length) { buf(i) += other(i); i += 1 }
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

  override def withNewMutableAggBufferOffset(newOffset: Int): CmsTextAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CmsTextAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): CmsTextAgg =
    copy(text = newChildren(0))
  override def prettyName: String = "cms_text"
}

object CmsTextAgg {
  /** The d=4 count-min hash rows — shared with the batch
    * cmsFrequencyAudit so the sketches are interchangeable.
    */
  val A: Seq[Long] = Seq(131L, 313L, 523L, 727L)
  val B: Seq[Long] = Seq(19L, 37L, 61L, 89L)
  val P: Long = 1000000007L

  /** array<long> (4·w counters, row-major) CMS over a text column's
    * space-split non-empty tokens — observe()-safe.
    */
  def textColumn(text: Column, w: Int): Column =
    CatalystBridge.column(
      CmsTextAgg(CatalystBridge.expression(text), w).toAggregateExpression())

  /** Driver-side token hash — the same byte polynomial the aggregate
    * applies, for probing a merged sketch with a token string.
    */
  def tokenHash(token: String): Long =
    token.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      .foldLeft(0L)((a, b) => (a * 31 + (b & 0xff)) % P)

  /** Point estimate (upper bound) of one token in a merged sketch. */
  def probe(counters: Array[Long], w: Int, token: String): Long = {
    val h = tokenHash(token)
    A.zip(B).zipWithIndex.map { case ((a, b), j) =>
      counters(j * w + ((a * h + b) % P % w).toInt)
    }.min
  }
}
