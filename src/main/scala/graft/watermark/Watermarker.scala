package graft.watermark

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, StructField, StructType}
import graft.model.WatermarkReport

/** 2-bit LSB steganographic watermarking — the engine restatement of
  * watermark.py.
  *
  * Reference semantics preserved exactly:
  *  - payload = UTF-8 bytes of the watermark, MSB-first bit stream
  *    (watermark.py:29-33);
  *  - each carrier row holds 2 bits: value' = (round(value) & ~3) |
  *    (b1<<1) | b0 (watermark.py:5-10) — note Python round() is
  *    round-half-to-EVEN, so the engine uses Spark's `bround`;
  *  - an odd trailing bit is padded with 0 (watermark.py:40);
  *  - rows beyond the bit stream are untouched (watermark.py:38);
  *  - extraction reads the first ceil(8·bytes/2) rows in order and repacks
  *    MSB-first, truncating to whole bytes (watermark.py:47-67).
  *
  * The crux at scale: the reference's bit position is the *list index*
  * (watermark.py:37). A distributed engine has no list order, so position
  * comes from the stable sort order of explicit key columns — and because
  * only the first ceil(bits/2) rows change (a watermark is tiny: W bytes ⇒
  * 4·W rows), we find that prefix with a distributed top-k
  * (`orderBy(keys).limit(k)` ⇒ TakeOrderedAndProject — no global sort, no
  * single-partition shuffle) and broadcast-join the k-row bit table back.
  * Every other row passes through untouched in the same projection.
  */
object Watermarker {

  /** UTF-8 bytes → MSB-first bit stream (watermark.py:29-33). */
  def bitsOf(watermark: String): Array[Int] = {
    val bytes = watermark.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    bytes.flatMap { b => (7 to 0 by -1).map(i => (b & 0xff) >> i & 1) }
  }

  /** Bit stream → string, mirroring extract_watermark's repacking loop
    * including the whole-byte truncation `range(0, min(total,len)-7, 8)`
    * and per-byte `chr` (watermark.py:60-67).
    */
  def packBits(bits: Seq[Int], totalBits: Int): String = {
    val n = math.min(totalBits, bits.length)
    val sb = new StringBuilder
    var i = 0
    while (i <= n - 8) {
      var byte = 0
      var j = 0
      while (j < 8) { byte = (byte << 1) | bits(i + j); j += 1 }
      sb.append(byte.toChar)
      i += 8
    }
    sb.toString
  }

  /** _embed_bits as a pure Column expression (watermark.py:5-10):
    * (bround(value) & ~3) | (b1 << 1) | b0, back to double. Codegen'd;
    * no UDF.
    */
  def embedBitsExpr(value: Column, b0: Column, b1: Column): Column =
    bround(value).cast("long").bitwiseAND(lit(~3L))
      .bitwiseOR(shiftleft(b1.cast("long").bitwiseAND(lit(1L)), 1))
      .bitwiseOR(b0.cast("long").bitwiseAND(lit(1L)))
      .cast("double")

  /** _extract_bits (watermark.py:13-16). */
  def extractB0(value: Column): Column = bround(value).cast("long").bitwiseAND(lit(1L))
  def extractB1(value: Column): Column =
    shiftright(bround(value).cast("long"), 1).bitwiseAND(lit(1L))

  /** The k-row (keys → b0,b1) bit table for a watermark over the dataset's
    * first k rows in (keys) order. Distributed top-k + driver materialize
    * (k = 4·|wm| rows — constant-bounded).
    */
  private def bitTable(df: DataFrame, watermark: String, keys: Seq[String]): Option[DataFrame] = {
    val bits = bitsOf(watermark)
    if (bits.isEmpty) return None
    val k = (bits.length + 1) / 2
    val keyCols = keys.map(col)
    val prefix = df.select(keyCols: _*).orderBy(keyCols: _*).limit(k).collect()
    val rows: Seq[Row] = prefix.toIndexedSeq.zipWithIndex.map { case (r, i) =>
      val b0 = if (2 * i < bits.length) bits(2 * i) else 0
      val b1 = if (2 * i + 1 < bits.length) bits(2 * i + 1) else 0
      Row.fromSeq(r.toSeq :+ b0 :+ b1)
    }
    val schema = StructType(
      df.select(keyCols: _*).schema.fields ++
        Seq(StructField("__b0", IntegerType), StructField("__b1", IntegerType)))
    Some(df.sparkSession.createDataFrame(
      new java.util.ArrayList[Row](scala.jdk.CollectionConverters.SeqHasAsJava(rows).asJava),
      schema))
  }

  /** embed_watermark (watermark.py:19-44) with row order defined by `keys`.
    * Broadcast hash join against the tiny bit table; untouched rows flow
    * through the same whole-stage-codegen projection. Output column order
    * equals input column order (the reference deep-copies and mutates in
    * place — immutability gives us that for free, watermark.py:26).
    */
  def embed(df: DataFrame, watermark: String, carrier: String, keys: Seq[String]): DataFrame = {
    bitTable(df, watermark, keys) match {
      case None => df
      case Some(bt) =>
        df.join(broadcast(bt), keys, "left_outer")
          .withColumn(carrier,
            when(col("__b0").isNotNull,
              embedBitsExpr(col(carrier), col("__b0"), col("__b1")))
              .otherwise(col(carrier)))
          .select(df.columns.map(col).toIndexedSeq: _*)
    }
  }

  /** extract_watermark (watermark.py:47-67): reads only the
    * ceil(8·lengthBytes/2)-row prefix (distributed top-k), packs on the
    * driver — bounded by the watermark length, never by the data size.
    */
  def extract(df: DataFrame, lengthBytes: Int, carrier: String, keys: Seq[String]): String = {
    val totalBits = lengthBytes * 8
    val need = (totalBits + 1) / 2
    if (need <= 0) return ""
    val keyCols = keys.map(col)
    val rows = df
      .select((keyCols :+ col(carrier).cast("double").as("__v")): _*)
      .orderBy(keyCols: _*)
      .limit(need)
      .collect()
    val bits = rows.flatMap { r =>
      val iv = java.math.BigDecimal.valueOf(r.getAs[Double]("__v"))
        .setScale(0, java.math.RoundingMode.HALF_EVEN).longValueExact()
      Seq((iv & 1L).toInt, ((iv >> 1) & 1L).toInt)
    }
    packBits(bits.toIndexedSeq, totalBits)
  }

  /** verify_watermark (watermark.py:70-77). Note the reference sizes the
    * extraction by the *character* count of the expected string — mirrored
    * here (bytes ≠ chars only for non-ASCII payloads, where the reference
    * itself fails verification). That divergence is PINNED by
    * WatermarkPropertySpec ("∀ non-ASCII watermark: verification fails")
    * so an accidental one-sided "fix" breaks parity loudly.
    */
  def verify(df: DataFrame, expected: String, carrier: String, keys: Seq[String]): WatermarkReport = {
    val extracted = extract(df, expected.length, carrier, keys)
    WatermarkReport(extracted == expected, expected, extracted)
  }

  // -------------------------------------------------------------------
  // Per-turn transcript watermark (the streaming / 10^12-row scale path)
  // -------------------------------------------------------------------
  //
  // Transcripts carry no numeric payload column, and a single global bit
  // stream cannot be maintained exactly-once across micro-batches. The
  // scale design instead restarts the bit stream PER CONVERSATION, using
  // `turn_idx` (0-based, contiguous — the stable-turn-ordering invariant)
  // as the bit position and the 2 LSBs of the event-time microseconds as
  // the carrier: ts shifts by ≤ 3µs, far below the session gap / window
  // sizes, and `text` is untouched (per-turn text equality invariant).
  // Every conversation with ≥ 4·|wm| turns carries the full watermark, so
  // extraction needs any ONE complete conversation — embarrassingly
  // parallel in both directions, no shuffle to embed (pure projection).

  /** Per-turn embed into ts-microsecond LSBs; bit position = 2·turn_idx.
    * Pure codegen'd projection — the "Catalyst-typed per-turn transform"
    * of the north star.
    */
  def embedTurnTs(df: DataFrame, watermark: String): DataFrame = {
    val bits = bitsOf(watermark)
    if (bits.isEmpty) return df
    val arr = array(bits.toIndexedSeq.map(lit): _*)
    val pos = col("turn_idx").cast("long") * 2
    val b0 = element_at(arr, (pos + 1).cast("int"))
    val b1 = when(pos + 1 < bits.length, element_at(arr, (pos + 2).cast("int"))).otherwise(lit(0))
    val micros = unix_micros(col("ts"))
    val embedded = micros.bitwiseAND(lit(~3L))
      .bitwiseOR(shiftleft(b1.cast("long"), 1))
      .bitwiseOR(b0.cast("long"))
    df.withColumn("ts",
      when(pos < bits.length, timestamp_micros(embedded)).otherwise(col("ts")))
  }

  /** Per-conversation extraction: (conv_id, extracted) rows. All built-in
    * higher-order functions — collect_list bounded by the 4·|wm|-turn
    * prefix filter, grouped per conversation (distributed, no global sort).
    */
  def extractTurnTsPerConv(df: DataFrame, lengthBytes: Int): DataFrame = {
    val totalBits = lengthBytes * 8
    val need = (totalBits + 1) / 2
    df.filter(col("turn_idx") < need)
      .select(
        col("conv_id"),
        struct(
          col("turn_idx"),
          unix_micros(col("ts")).bitwiseAND(lit(1L)).cast("int").as("b0"),
          shiftright(unix_micros(col("ts")), 1).bitwiseAND(lit(1L)).cast("int").as("b1"))
          .as("tb"))
      .groupBy(col("conv_id"))
      .agg(array_sort(collect_list(col("tb"))).as("tbs"))
      .select(
        col("conv_id"),
        expr("flatten(transform(tbs, x -> array(x.b0, x.b1)))").as("bits"))
      .select(
        col("conv_id"),
        expr(
          s"""CASE WHEN least($totalBits, size(bits)) >= 8 THEN
             |  concat_ws('', transform(
             |    sequence(0, int(floor((least($totalBits, size(bits)) - 8) / 8))),
             |    i -> char(aggregate(slice(bits, i * 8 + 1, 8), 0, (acc, b) -> acc * 2 + b))))
             |ELSE '' END""".stripMargin).as("extracted"))
  }

  /** Per-conversation verification: WatermarkReport rows keyed by conv_id. */
  def verifyTurnTsPerConv(df: DataFrame, expected: String): DataFrame =
    extractTurnTsPerConv(df, expected.length)
      .select(
        col("conv_id"),
        (col("extracted") === lit(expected)).as("verified"),
        lit(expected).as("expected"),
        col("extracted"))
}
