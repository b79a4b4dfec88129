package graft.stream

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types._
import graft.lineage.DataLineage
import graft.model.{ColumnSpec, Turn}
import graft.validate.Validator
import graft.watermark.Watermarker

/** The standing guardian pipeline — the streaming restatement of the
  * reference's `/generate` route (app.py:32-53):
  *
  *   transcript stream → event-time watermark → salted stateful dedup →
  *   per-turn watermark embed → stateless quality/PII validators →
  *   per-micro-batch validation report → exactly-once IceLite audit sink
  *   with per-partition lineage manifests.
  *
  * Skew: the stateful dedup shuffles on the SALTED key
  * (conv_id, turn_idx mod salt) — the "salted repartitioning on (conv_id,
  * turn_idx bucket) before the stateful aggregate" of the north star; a
  * hot conversation spreads over `salt` state partitions instead of
  * pinning one.
  *
  * Determinism: no wall clock anywhere — dataset ids derive from the sink
  * identity, lineage timestamps are the checkpoint epoch, so a resume from
  * checkpoint reproduces identical output rows and manifests.
  */
object GuardianStream {

  val turnSchema: StructType = StructType(Seq(
    StructField("conv_id", StringType),
    StructField("turn_idx", IntegerType),
    StructField("role", StringType),
    StructField("text", StringType),
    StructField("tool", StringType),
    StructField("ts", TimestampType)))

  final case class StreamConfig(
      sourceDir: String,
      checkpointDir: String,
      sinkDir: String,
      watermarkPayload: String = "WM01",
      watermarkDelay: String = "10 minutes",
      salt: Int = 16,
      datasetId: String = "transcripts",
      maxFilesPerTrigger: Option[Int] = None,
      availableNow: Boolean = false)

  /** The per-batch text-length spec driving the micro-batch validation
    * report (the streaming analog of validate_dataset's fixed ranges,
    * validator.py:82-95).
    */
  val textLenSpec: ColumnSpec = ColumnSpec("text_len", 0.0, 10000.0)

  /** Transform graph shared by batch and streaming (identical semantics —
    * used by the batch-equivalence tests).
    */
  def transforms(turns: org.apache.spark.sql.Dataset[Turn], cfg: StreamConfig): DataFrame = {
    val deduped = DedupState.dedup(turns, cfg.salt)
    val embedded = Watermarker.embedTurnTs(deduped.toDF, cfg.watermarkPayload)
    Windows.withQualityFlags(embedded)
  }

  /** Validate one micro-batch and commit it exactly-once. Exposed for
    * direct testing; `start` wires it into foreachBatch.
    */
  def processBatch(batch: DataFrame, batchId: Long, cfg: StreamConfig): Unit = {
    if (IceLite.isCommitted(cfg.sinkDir, batchId)) return
    batch.persist()
    try {
      val report = Validator.validate(batch, Seq(textLenSpec))
      val lineage = new DataLineage(cfg.datasetId, createdAt = 0.0)
      val n = report.record_count
      lineage.record("dedup_watermark_flags", n, n,
        Map(
          "watermark_len" -> cfg.watermarkPayload.length.toString,
          "salt" -> cfg.salt.toString),
        timestamp = Some(batchId.toDouble))
      lineage.record("validate", n, n,
        Map(
          "valid" -> report.valid.toString,
          "epoch" -> batchId.toString) ++
          report.checks.get("text_len").map(c =>
            "text_len_mean" -> c.actual_mean.toString),
        timestamp = Some(batchId.toDouble))
      IceLite.commit(batch, cfg.sinkDir, batchId, lineage)
    } finally batch.unpersist()
  }

  /** Start the standing query over a parquet file stream (the IceLite
    * source direction: new data files appended under `sourceDir`).
    */
  def start(spark: SparkSession, cfg: StreamConfig): StreamingQuery = {
    import spark.implicits._
    var reader = spark.readStream.schema(turnSchema)
    cfg.maxFilesPerTrigger.foreach(m => reader = reader.option("maxFilesPerTrigger", m))
    val turns = reader
      .parquet(cfg.sourceDir)
      .withWatermark("ts", cfg.watermarkDelay)
      .as[Turn]

    val out = transforms(turns, cfg)
    var writer = out.writeStream
      .option("checkpointLocation", cfg.checkpointDir)
      .outputMode("append")
      .foreachBatch((batch: DataFrame, batchId: Long) => processBatch(batch, batchId, cfg))
    if (cfg.availableNow) writer = writer.trigger(Trigger.AvailableNow())
    writer.start()
  }
}
