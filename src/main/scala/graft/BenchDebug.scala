package graft

import java.nio.file.Files
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.Trigger
import graft.gen.DeterministicGen
import graft.gen.DeterministicGen.TranscriptSpec
import graft.stream._

/** Scratch harness for locating the streaming bottleneck: runs pipeline
  * variants and prints per-batch StreamingQueryProgress durations.
  */
object BenchDebug {
  private val benchRoot = {
    val p = java.nio.file.Paths.get("/dev/shm/graft-dbg")
    org.apache.commons.io.FileUtils.deleteQuietly(p.toFile)
    Files.createDirectories(p)
    p
  }
  private def tmpDir(prefix: String): String =
    Files.createTempDirectory(benchRoot, prefix).toString

  def main(args: Array[String]): Unit = {
    val cpus = args.headOption.getOrElse("8").toInt
    val variant = if (args.length > 1) args(1) else "full"
    val shufMult = sys.env.getOrElse("DBG_SHUF_MULT", "1").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", (cpus * shufMult).toString)
      .config("spark.sql.files.maxPartitionBytes",
        sys.env.getOrElse("DBG_MAX_PART_BYTES", (8 * 1024 * 1024).toString))
      .config("spark.local.dir", sys.env.getOrElse("DBG_LOCAL_DIR", "/tmp"))
      .config("spark.sql.parquet.compression.codec",
        sys.env.getOrElse("DBG_CODEC", "snappy"))
      .config("spark.sql.streaming.stateStore.providerClass",
        sys.env.getOrElse("DBG_STATE_PROVIDER",
          "graft.stream.state.ArenaStateStoreProvider"))
      .config("spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled",
        sys.env.getOrElse("DBG_ROCKSDB_CHANGELOG", "true"))
      .config("spark.sql.session.timeZone", "UTC")
      // match graft.Bench.session (checksum cost: see Bench.scala)
      .config("spark.sql.streaming.checkpoint.fileChecksum.enabled",
        sys.env.getOrElse("DBG_CKSUM", "false"))
      .config("spark.hadoop.parquet.compression.codec.zstd.level",
        sys.env.getOrElse("DBG_ZSTD_LEVEL", "1")) // match graft.Bench
      .config("spark.sql.streaming.stateStore.compression.codec",
        sys.env.getOrElse("DBG_STATE_CODEC", "lz4"))
      .config("spark.hadoop.parquet.enable.dictionary",
        sys.env.getOrElse("DBG_PARQUET_DICT", "true"))
      .config("spark.shuffle.compress",
        sys.env.getOrElse("DBG_SHUFFLE_COMPRESS", "true"))
      .config("spark.sql.streaming.maxBatchesToRetainInMemory",
        sys.env.getOrElse("DBG_STATE_RETAIN", "2"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val turns = if (args.length > 2) args(2).toLong else 2000000L
    val spec = TranscriptSpec(
      nConvs = turns / 40, turnsPerConv = 40, hotConvs = 4, hotTurns = 40000,
      piiPermille = 20, seed = 42)
    val srcDir = tmpDir("dbg-src")
    DeterministicGen.transcripts(spark, spec)
      .repartitionByRange(64, org.apache.spark.sql.functions.col("ts"))
      .write.mode("overwrite").option("compression", "snappy").parquet(srcDir)
    new java.io.File(srcDir).listFiles().filter(_.getName.endsWith(".parquet"))
      .sortBy(_.getName).zipWithIndex.foreach { case (f, i) =>
        Files.setLastModifiedTime(f.toPath,
          java.nio.file.attribute.FileTime.fromMillis(1700000000000L + i * 1000L))
      }
    println(s"total=${spec.totalTurns} variant=$variant cpus=$cpus")

    // Per-stage task-metric sums: where does task time actually go?
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      private val agg = new java.util.concurrent.ConcurrentHashMap[Int, Array[Long]]()
      override def onTaskEnd(e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        val m = e.taskMetrics
        if (m != null) {
          val a = agg.computeIfAbsent(e.stageId, _ => new Array[Long](6))
          a.synchronized {
            a(0) += 1
            a(1) += m.executorRunTime
            a(2) += m.jvmGCTime
            a(3) += m.executorDeserializeTime
            a(4) += e.taskInfo.duration
            a(5) = math.max(a(5), e.taskInfo.duration)
          }
        }
      }
      override def onStageCompleted(e: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val a = agg.get(e.stageInfo.stageId)
        if (a != null && a(0) > 2) println(
          s"  stage=${e.stageInfo.stageId} name=${e.stageInfo.name.takeWhile(_ != ' ')} tasks=${a(0)} " +
            s"runMs=${a(1)} gcMs=${a(2)} deserMs=${a(3)} durMs=${a(4)} maxTaskMs=${a(5)}")
      }
    })
    spark.streams.addListener(new org.apache.spark.sql.streaming.StreamingQueryListener {
      import org.apache.spark.sql.streaming.StreamingQueryListener._
      def onQueryStarted(e: QueryStartedEvent): Unit = ()
      def onQueryTerminated(e: QueryTerminatedEvent): Unit = ()
      def onQueryProgress(e: QueryProgressEvent): Unit = {
        val p = e.progress
        println(s"batch=${p.batchId} rows=${p.numInputRows} durations=${p.durationMs}")
        p.stateOperators.foreach(so => println(
          s"  state: rowsUpdated=${so.numRowsUpdated} keys=${so.numRowsTotal} commitMs=${so.allUpdatesTimeMs}/${so.commitTimeMs} mem=${so.memoryUsedBytes}"))
      }
    })

    val trigFiles = sys.env.getOrElse("DBG_TRIG_FILES", "16").toInt
    val cfg = GuardianStream.StreamConfig(
      sourceDir = srcDir,
      checkpointDir = tmpDir("dbg-ck"),
      sinkDir = tmpDir("dbg-sink"),
      maxFilesPerTrigger = Some(trigFiles), availableNow = true,
      rowDedup = !sys.env.get("DBG_ROW_DEDUP").contains("off"),
      qualityWindow =
        if (sys.env.get("DBG_QUALITY").contains("off")) None
        else Some(sys.env.getOrElse("DBG_QUALITY", "1 hour")),
      sessionGap = sys.env.get("DBG_SESSION_GAP")) // e.g. "30 minutes"
    val src = spark.readStream.schema(GuardianStream.turnSchema)
      .option("maxFilesPerTrigger", trigFiles)
      .parquet(srcDir).withWatermark("ts", "10 minutes").as[graft.model.Turn]

    val out: DataFrame = variant match {
      case "scanonly" => src.toDF
      case "flags" => Windows.withQualityFlags(
        graft.watermark.Watermarker.embedTurnTs(src.toDF, "WM01"))
      case "dedup" => DedupState.dedup(src).toDF
      case "deduprows" => DedupState.dedupRows(src.toDF)
      // object path (groupByKey shuffle + sort + Turn decode/encode) with
      // NO state store — isolates the state-store commit cost
      case "flatgroups" =>
        src.groupByKey(t => (t.conv_id, t.turn_idx >>> 8))
          .flatMapGroups((_, it) => it).toDF
      // full dedup machinery but rows carry ~empty strings — isolates the
      // per-byte cost of shuffling/decoding the text payload
      case "dedupslim" => {
        import org.apache.spark.sql.functions.lit
        val slimSrc = spark.readStream.schema(GuardianStream.turnSchema)
          .option("maxFilesPerTrigger", trigFiles)
          .parquet(srcDir)
          .withColumn("text", lit("")).withColumn("role", lit(""))
          .withColumn("tool", lit(""))
          .withWatermark("ts", "10 minutes").as[graft.model.Turn]
        DedupState.dedup(slimSrc).toDF
      }
      case _ => GuardianStream.transforms(src, cfg)
    }
    val t0 = System.nanoTime()
    val q = out.writeStream
      .option("checkpointLocation", cfg.checkpointDir)
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val c0 = System.nanoTime()
        variant match {
          case "full" => GuardianStream.processBatch(batch, batchId, cfg)
          case "writeonly" =>
            IceLite.writeData(
              batch.withColumn("pid", org.apache.spark.sql.functions.spark_partition_id()),
              cfg.sinkDir, batchId)
          case "writeflat" =>
            batch.write.mode("overwrite")
              .parquet(cfg.sinkDir + s"/flat-$batchId")
          case _ => batch.write.mode("overwrite").format("noop").save()
        }
        println(f"  foreachBatch $batchId took ${(System.nanoTime() - c0) / 1e9}%.2f s")
        ()
      }
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val wall = (System.nanoTime() - t0) / 1e9
    println(f"wall=$wall%.1f s tp=${spec.totalTurns / wall}%.0f turns/s")
    spark.stop()
  }
}
