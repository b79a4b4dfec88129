package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video treated as opaque
  * `binary` payload columns with typed metadata structs, processed with
  * ordinary distributed Spark operators (projection, chunking via
  * higher-order functions, posexplode) so the plan scales like any other
  * columnar pipeline.
  *
  * STUB NOTICE: this container has no image/audio codec libraries, so the
  * `decode` step is a clearly-marked deterministic fake — it derives
  * payload bytes and "features" from SHA-256 of the row key instead of
  * decoding real media. Everything AROUND the stub is real and tested:
  * the schema, the binary column handling, partitioning, the per-frame
  * explode shape, and the feature-vector column layout that a real codec
  * UDF (or mapInPandas on a PySpark deployment) would slot into.
  */
object Multimodal {

  /** Deterministic fake media table: (media_id, kind, payload binary,
    * meta struct). Payload = concatenated SHA-256 blocks — stands in for
    * encoded frames.
    */
  def syntheticMedia(spark: SparkSession, n: Long, seed: Long = 42L): DataFrame = {
    spark.range(n)
      .select(
        col("id").as("media_id"),
        element_at(
          array(lit("image"), lit("audio"), lit("video")),
          (pmod(xxhash64(lit(seed), col("id"), lit("kind")), lit(3)) + 1).cast("int"))
          .as("kind"),
        // STUB decode source: 4 x 32-byte pseudo-frame blocks
        expr(
          s"""unhex(concat(
             |  sha2(concat('f0-', id, '-', $seed), 256),
             |  sha2(concat('f1-', id, '-', $seed), 256),
             |  sha2(concat('f2-', id, '-', $seed), 256),
             |  sha2(concat('f3-', id, '-', $seed), 256)))""".stripMargin).as("payload"),
        struct(
          (pmod(xxhash64(lit(seed), col("id"), lit("w")), lit(1920)) + 1).cast("int").as("width"),
          (pmod(xxhash64(lit(seed), col("id"), lit("h")), lit(1080)) + 1).cast("int").as("height"),
          lit(16000).as("sample_rate"),
          lit(4).as("n_frames")).as("meta"))
  }

  /** Frame sampling: split the payload into `meta.n_frames` equal binary
    * chunks and emit one row per sampled frame — pure higher-order
    * functions + posexplode, no driver loop, no UDF.
    */
  def frameSample(df: DataFrame, everyKth: Int = 1): DataFrame =
    df.withColumn("__frames", expr(
        """transform(sequence(0, meta.n_frames - 1), i ->
          |  substring(payload, i * (length(payload) div meta.n_frames) + 1,
          |            length(payload) div meta.n_frames))""".stripMargin))
      .select(col("media_id"), col("kind"), col("meta"),
        posexplode(col("__frames")).as(Seq("frame_idx", "frame")))
      .filter(pmod(col("frame_idx"), lit(everyKth)) === 0)

  /** STUB feature extraction: a real deployment decodes `frame` and runs a
    * model; here features are a deterministic projection of the frame
    * bytes (first 8 bytes as signed values scaled to [-1, 1]) so the
    * column shapes and downstream joins are exercised end-to-end.
    */
  def extractFeaturesStub(frames: DataFrame): DataFrame =
    frames.withColumn("features", expr(
      // 52/20.0D not 52.0/20.0: SQL literals with a decimal point are
      // DECIMAL in both Spark and DuckDB — the features must be DOUBLE
      """transform(sequence(1, 8), i ->
        |  (ascii(substring(hex(frame), i * 2 - 1, 1)) - 52) / 20.0D)""".stripMargin))

  /** STUB resize: recomputes metadata only (a real codec would transform
    * payload bytes); keeps the plan shape of a per-row media transform.
    */
  def resizeStub(df: DataFrame, w: Int, h: Int): DataFrame =
    df.withColumn("meta", struct(
      lit(w).as("width"), lit(h).as("height"),
      col("meta.sample_rate").as("sample_rate"),
      col("meta.n_frames").as("n_frames")))
}
