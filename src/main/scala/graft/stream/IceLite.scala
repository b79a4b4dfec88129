package graft.stream

import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import com.fasterxml.jackson.databind.ObjectMapper
import graft.lineage.DataLineage

/** IceLite — an Iceberg-emulating table layout: Parquet data files made
  * visible only by atomically-published JSON manifests.
  *
  * The north rule requires an "Iceberg audit sink with per-partition
  * lineage manifests (conv_id-range, offsets, checkpoint epoch)" and
  * exactly-once semantics. No Iceberg runtime jar exists in the offline
  * sandbox (SURVEY.md §7.3), so this implements precisely the subset of
  * Iceberg's contract the north star uses:
  *
  *  - data files land under `data/batch=<epoch>/` and are INVISIBLE to
  *    readers until `manifests/manifest-<epoch>.json` is published with an
  *    atomic rename — a crashed or duplicated `foreachBatch` invocation
  *    leaves no visible trace;
  *  - a manifest that already exists short-circuits the commit
  *    (idempotent by batch id ⇒ exactly-once under Structured Streaming's
  *    at-least-once `foreachBatch` retries);
  *  - each manifest records per-partition lineage: partition id, row
  *    count, conv_id min/max, plus the batch's lineage event log — any
  *    output row is traceable to its source micro-batch by (epoch,
  *    partition, conv_id range).
  *
  * Layout (flat — `pid` is a DATA column, not a directory: `partitionBy`
  * would force a per-batch sort; the file↔partition binding is recovered
  * from each file's parquet footer stats, min == max on `pid`):
  * {{{
  *   <root>/data/batch=<epoch>/part-*.parquet   (pid, conv_id, … columns)
  *   <root>/manifests/manifest-<epoch %09d>.json ("path": "data/batch=<epoch>")
  * }}}
  */
/** The filesystem contract the exactly-once commit rests on — ONE
  * primitive: publish-if-absent of a small manifest file, atomic and
  * winner-takes-all under concurrent publishers.
  *
  * Portability (VERDICT r1 §wrong-6): the default implementation uses
  * POSIX/HDFS atomic rename, correct for local disks, NFS and
  * HDFS-like stores. Object stores have NO atomic rename — a 100 TB
  * deployment on S3/GCS/ABFS implements this trait with the store's
  * conditional put instead (`If-None-Match: *` on S3, `ifGenerationMatch=0`
  * on GCS, ETag precondition on ABFS), which gives the same
  * winner-takes-all semantics without any rename. Everything else IceLite
  * does (data-file writes, footer reads, manifest lists) is plain
  * write-new-object / read / list and needs no atomicity.
  */
trait CommitIO {
  def exists(p: Path): Boolean
  def listNames(dir: Path): Seq[String]
  /** Atomically create `target` with `content` iff absent; false if lost
    * the race (target already exists).
    */
  def publishIfAbsent(target: Path, content: String): Boolean
}

/** Default: temp file + ATOMIC_MOVE rename (POSIX/HDFS semantics). */
object PosixCommitIO extends CommitIO {
  def exists(p: Path): Boolean = Files.exists(p)
  def listNames(dir: Path): Seq[String] = {
    if (!Files.isDirectory(dir)) return Seq.empty
    val stream = Files.list(dir)
    try stream.iterator().asScala.map(_.getFileName.toString).toSeq
    finally stream.close()
  }
  def publishIfAbsent(target: Path, content: String): Boolean = {
    val tmp = target.getParent.resolve(s".tmp-${java.util.UUID.randomUUID()}")
    Files.createDirectories(target.getParent)
    Files.writeString(tmp, content)
    try {
      // createLink is atomic AND fails with EEXIST when the target exists.
      // (Files.move with ATOMIC_MOVE maps to rename(2) on Linux, which
      // silently REPLACES an existing target — last-writer-wins, NOT
      // winner-takes-all; caught by the publish-race test.)
      Files.createLink(target, tmp)
      true
    } catch {
      case _: java.nio.file.FileAlreadyExistsException => false
    } finally {
      Files.deleteIfExists(tmp)
      ()
    }
  }
}

object IceLite {

  /** The commit seam — swap for an object-store CommitIO in deployments
    * without atomic rename (see the CommitIO scaladoc).
    */
  @volatile var commitIO: CommitIO = PosixCommitIO

  private val mapper = new ObjectMapper()

  final case class PartitionManifest(
      pid: Int, rowCount: Long, convIdMin: String, convIdMax: String)
  final case class Manifest(
      batchId: Long,
      datasetId: String,
      rowCount: Long,
      partitions: Seq[PartitionManifest],
      lineageJson: String)

  private def manifestPath(root: String, batchId: Long): Path =
    Paths.get(root, "manifests", f"manifest-$batchId%09d.json")

  def isCommitted(root: String, batchId: Long): Boolean =
    commitIO.exists(manifestPath(root, batchId))

  def committedBatches(root: String): Seq[Long] =
    commitIO.listNames(Paths.get(root, "manifests"))
      .filter(n => n.startsWith("manifest-") && n.endsWith(".json"))
      .map(n => n.stripPrefix("manifest-").stripSuffix(".json").toLong)
      .sorted

  /** Idempotent exactly-once commit of one micro-batch. Returns false when
    * the batch id was already committed (duplicate foreachBatch delivery).
    *
    * Partition binding: rows are stamped with `spark_partition_id()` and
    * `pid` is written as a DATA column (see `writeData` — `partitionBy`
    * would force a per-batch sort; each write task emits one file, so the
    * file↔partition binding is recoverable from parquet footer stats).
    * The per-partition stats in the manifest describe exactly the rows
    * with that `pid` — the (conv_id-range, epoch, partition) triple the
    * north star requires. The stamped frame is persisted so stats and
    * files come from one evaluation.
    */
  def commit(
      df: DataFrame,
      root: String,
      batchId: Long,
      lineage: DataLineage): Boolean = {
    if (isCommitted(root, batchId)) return false
    val stamped = df.withColumn("pid", spark_partition_id())
    // ONE evaluation: write the data files, then read the per-partition
    // stats (row counts, conv_id min/max, pid binding) from the written
    // parquet FOOTERS driver-side — the same single-job commit the
    // streaming sink runs (processBatch). The earlier formulation
    // persisted the frame and ran a separate groupBy(pid) stats job
    // before the write: two jobs + a cache entry per commit for stats the
    // footers already carry.
    val dir = writeData(stamped, root, batchId)
    publish(root, batchId, lineage, footerStats(dir))
  }

  /** Write one batch's data files (invisible until `publish`). Returns the
    * batch data directory.
    *
    * `pid` is written as a DATA column, not a partition directory:
    * `partitionBy` would force a full sort of every micro-batch on the
    * partition key, while each write task emits exactly one file anyway —
    * so the file↔partition binding is recovered from the parquet footer's
    * pid column statistics (min == max per file) at manifest time.
    */
  def writeData(stamped: DataFrame, root: String, batchId: Long): String = {
    Files.createDirectories(Paths.get(root, "data"))
    Files.createDirectories(Paths.get(root, "manifests"))
    val dataDir = Paths.get(root, "data", s"batch=$batchId").toString
    stamped.write.mode("overwrite").parquet(dataDir)
    dataDir
  }

  /** Atomically publish the manifest that makes a written batch visible. */
  def publish(
      root: String,
      batchId: Long,
      lineage: DataLineage,
      stats: Seq[PartitionManifest]): Boolean =
    writeManifest(root, Manifest(
      batchId, lineage.datasetId, stats.map(_.rowCount).sum, stats, lineage.toJson))

  /** Per-partition stats straight from the written parquet FOOTERS —
    * row counts and conv_id min/max come from parquet column statistics,
    * read driver-side in milliseconds with NO Spark job (the same
    * per-file-stats design real Iceberg manifests use).
    */
  /** One file's (pid, rows, conv_id range) from its parquet footer. */
  private def footerOf(
      f: java.io.File,
      conf: org.apache.hadoop.conf.Configuration): Option[PartitionManifest] = {
    val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
      new org.apache.hadoop.fs.Path(f.getAbsolutePath), conf)
    val reader = org.apache.parquet.hadoop.ParquetFileReader.open(in)
    try {
      val blocks = reader.getFooter.getBlocks.asScala
      val rows = blocks.map(_.getRowCount).sum
      var cmin: String = null
      var cmax: String = null
      var pid = -1
      blocks.foreach { b =>
        b.getColumns.asScala.foreach { c =>
          val st = c.getStatistics
          if (st != null && !st.isEmpty) {
            c.getPath.toDotString match {
              case "conv_id" =>
                val mn = st.genericGetMin match {
                  case bin: org.apache.parquet.io.api.Binary => bin.toStringUsingUTF8
                  case o => o.toString
                }
                val mx = st.genericGetMax match {
                  case bin: org.apache.parquet.io.api.Binary => bin.toStringUsingUTF8
                  case o => o.toString
                }
                if (cmin == null || mn < cmin) cmin = mn
                if (cmax == null || mx > cmax) cmax = mx
              case "pid" =>
                pid = st.genericGetMin.toString.toDouble.toInt
              case _ =>
            }
          }
        }
      }
      if (rows == 0) None
      else Some(PartitionManifest(pid, rows, Option(cmin).getOrElse(""), Option(cmax).getOrElse("")))
    } finally reader.close()
  }

  def footerStats(dataDir: String): Seq[PartitionManifest] = {
    val conf = new org.apache.hadoop.conf.Configuration()
    def parquetFiles(f: java.io.File): Seq[java.io.File] = {
      val fs = Option(f.listFiles()).getOrElse(Array.empty).toSeq
      fs.filter(x => x.isFile && x.getName.endsWith(".parquet")) ++
        fs.filter(_.isDirectory).flatMap(parquetFiles)
    }
    // Footer reads are independent small-file reads — do them in parallel
    // (at 32 shuffle partitions a serial loop adds ~32 × read-latency to
    // every epoch's commit path), on a DEDICATED bounded pool: the shared
    // ForkJoinPool.commonPool is also used elsewhere in a driver JVM, and
    // an unbounded fan-out (or a blocked common pool) could stall the
    // commit path.
    val files: Array[java.io.File] = parquetFiles(new java.io.File(dataDir)).toArray
    files
      .map(f => java.util.concurrent.CompletableFuture.supplyAsync(
        () => footerOf(f, conf), footerPool))
      .flatMap(_.join())
      .groupBy(_.pid)
      .map { case (pid, ms) =>
        PartitionManifest(
          pid,
          ms.map(_.rowCount).sum,
          ms.map(_.convIdMin).min,
          ms.map(_.convIdMax).max)
      }
      .toSeq
      .sortBy(_.pid)
  }

  /** Shared bounded pool for footer reads — one per process, daemon
    * threads (a fresh pool per commit would put 8 thread creations inside
    * the very commit path whose p99 the bench headlines).
    */
  private lazy val footerPool: java.util.concurrent.ExecutorService =
    java.util.concurrent.Executors.newFixedThreadPool(8, r => {
      val t = new Thread(r, "icelite-footer")
      t.setDaemon(true)
      t
    })

  /** Commit a frame already stamped with a `pid` column, with per-partition
    * stats the caller computed (lets the pipeline share ONE aggregation
    * job between the validation report and the manifest).
    */
  def commitStamped(
      stamped: DataFrame,
      root: String,
      batchId: Long,
      lineage: DataLineage,
      stats: Seq[PartitionManifest]): Boolean = {
    if (isCommitted(root, batchId)) return false
    writeData(stamped, root, batchId)
    publish(root, batchId, lineage, stats)
  }

  private def writeManifest(root: String, m: Manifest): Boolean = {
    val node = mapper.createObjectNode()
    node.put("batch_id", m.batchId)
    node.put("dataset_id", m.datasetId)
    node.put("row_count", m.rowCount)
    val parts = node.putArray("partitions")
    m.partitions.foreach { p =>
      val pn = parts.addObject()
      pn.put("pid", p.pid)
      pn.put("row_count", p.rowCount)
      pn.put("conv_id_min", p.convIdMin)
      pn.put("conv_id_max", p.convIdMax)
      // pid is a data column (not a partition directory); the binding of
      // files to pid is via each file's parquet footer stats (min==max).
      pn.put("path", s"data/batch=${m.batchId}")
    }
    node.set[com.fasterxml.jackson.databind.JsonNode](
      "lineage", mapper.readTree(m.lineageJson))
    val json = mapper.writerWithDefaultPrettyPrinter().writeValueAsString(node)
    // Winner-takes-all atomic publish through the CommitIO seam.
    commitIO.publishIfAbsent(manifestPath(root, m.batchId), json)
  }

  def readManifest(root: String, batchId: Long): Manifest = {
    val node = mapper.readTree(Files.readString(manifestPath(root, batchId)))
    val parts = node.get("partitions").elements().asScala.map { pn =>
      PartitionManifest(
        pn.get("pid").asInt(), pn.get("row_count").asLong(),
        pn.get("conv_id_min").asText(), pn.get("conv_id_max").asText())
    }.toSeq
    Manifest(
      node.get("batch_id").asLong(), node.get("dataset_id").asText(),
      node.get("row_count").asLong(), parts,
      mapper.writeValueAsString(node.get("lineage")))
  }

  /** Snapshot read: only manifest-listed batches are visible (uncommitted
    * data directories are never listed). basePath makes batch/pid proper
    * partition columns so partition pruning works on them.
    */
  /** Snapshot read: the latest COMPACTED table (if any) plus residual
    * committed batches — O(compacted) paths instead of one directory per
    * epoch since stream start. Uncompacted tables read exactly as before
    * (every manifest-listed batch; uncommitted dirs never visible).
    */
  def read(spark: SparkSession, root: String): DataFrame = {
    val (latest, residual) = compactSources(root)
    require(latest.nonEmpty || residual.nonEmpty,
      s"IceLite table at $root has no committed batches")
    val parts =
      latest.map(u => spark.read.parquet(compactDataDir(root, u))).toSeq ++
        (if (residual.nonEmpty) Seq(readBatches(spark, root, residual)) else Seq.empty)
    parts.reduce(_.unionByName(_))
  }

  /** Residual epoch batches whose manifest per-partition
    * (conv_id_min, conv_id_max) ranges can contain `convId` — the
    * driver-side pruning set for a point audit. Exposed for tests.
    */
  private[graft] def convBatches(root: String, convId: String): Seq[Long] =
    convBatchesOf(root, convId, compactSources(root)._2)

  /** Pruning over an EXPLICIT residual listing: readConv passes the one
    * snapshot it planned everything else from — re-listing here could see
    * a compaction published in between and return a torn (empty) view.
    */
  private def convBatchesOf(
      root: String, convId: String, residual: Seq[Long]): Seq[Long] =
    residual.filter { b =>
      readManifest(root, b).partitions
        .exists(p => p.convIdMin <= convId && convId <= p.convIdMax)
    }

  /** Point audit lookup: all audit rows of ONE conversation, planning
    * only the epochs that can contain it. The north star's promise is
    * that any output row is traceable by (epoch, partition, conv_id
    * range) — at deployment horizons the trace query must USE those
    * manifest stats, not scan the table: residual epoch dirs are pruned
    * driver-side from their manifests' per-partition conv ranges (zero
    * Spark jobs for the pruning), and the compacted table (if any) is
    * included with the conv_id predicate pushed to its parquet
    * row-group stats. Equals `read(...).filter(conv_id = convId)`
    * exactly (asserted by StreamingSpec).
    */
  def readConv(spark: SparkSession, root: String, convId: String): DataFrame = {
    val (latest, residual) = compactSources(root)
    require(latest.nonEmpty || residual.nonEmpty,
      s"IceLite table at $root has no committed batches")
    val hits = convBatchesOf(root, convId, residual)
    val parts =
      latest.map(u => spark.read.parquet(compactDataDir(root, u))).toSeq ++
        (if (hits.nonEmpty) Seq(readBatches(spark, root, hits)) else Seq.empty)
    if (parts.isEmpty)
      // schema-stable empty result: no epoch can contain the conv — plan
      // one pruned-to-nothing scan rather than inventing a schema
      readBatches(spark, root, residual.take(1))
        .filter(org.apache.spark.sql.functions.lit(false))
    else
      parts.reduce(_.unionByName(_)).filter(col("conv_id") === convId)
  }

  /** Snapshot read of SPECIFIC committed batch ids (the compaction read
    * path: latest compacted state + residual epochs).
    */
  def readBatches(spark: SparkSession, root: String, batches: Seq[Long]): DataFrame = {
    require(batches.nonEmpty, s"IceLite table at $root has no committed batches")
    val dirs = batches.map(b => Paths.get(root, "data", s"batch=$b").toString)
    spark.read
      .option("basePath", Paths.get(root, "data").toString)
      .parquet(dirs: _*)
      .drop("pid", "batch")
  }

  // ---- table maintenance: fold epoch dirs into one compacted table ----
  // The small-files discipline a standing query needs at deployment
  // horizons: a month of seconds-cadence epochs is ~10^6 batch
  // directories — listing and scan planning over them dominates any
  // read. Same atomic-marker pattern as the quality/session partial
  // compaction (write data invisible, publish marker winner-takes-all,
  // expire superseded state separately).

  private def compactMarkerPath(root: String, upTo: Long): Path =
    Paths.get(root, "manifests", f"compact-$upTo%09d.json")

  /** Data dir of a PUBLISHED compacted table: resolved from the marker's
    * `path` field (each compaction attempt writes an attempt-unique dir,
    * so a losing concurrent compactor can never clobber the winner's
    * published data — ADVICE r4). Falls back to the legacy `compact/<upTo>`
    * layout for markers written before the path field existed.
    */
  def compactDataDir(root: String, upTo: Long): String =
    resolveCompactDir(root, compactMarkerPath(root, upTo), s"compact/$upTo")

  /** Resolve a compacted table's data dir from its marker's `path` field
    * (shared by the audit table and the session-partials table). The read
    * is failure-tolerant, not just existence-checked: a concurrent expiry
    * sweep may delete a SUPERSEDED marker between the exists() and the
    * read — the legacy fallback keeps both the reader (which never reads
    * superseded markers) and the idempotent sweep well-defined.
    */
  private[stream] def resolveCompactDir(
      root: String, mp: Path, legacyRel: String): String = {
    val rel =
      try {
        if (commitIO.exists(mp))
          Option(mapper.readTree(Files.readString(mp)).get("path"))
            .map(_.asText()).getOrElse(legacyRel)
        else legacyRel
      } catch { case _: java.io.IOException => legacyRel }
    Paths.get(root, rel).toString
  }

  private[graft] def rmTree(f: java.io.File): Unit = {
    if (f.isDirectory)
      Option(f.listFiles()).getOrElse(Array.empty).foreach(rmTree)
    f.delete(); ()
  }

  /** How long an unreferenced attempt dir must sit untouched before the
    * orphan sweep may remove it — a live parquet write keeps refreshing
    * its dir as part files land, so only crashed attempts go stale.
    * Tunable for tests (GRAFT_ORPHAN_GRACE_MS env for deployments).
    */
  @volatile private[graft] var orphanGraceMs: Long =
    sys.env.get("GRAFT_ORPHAN_GRACE_MS").map(_.toLong)
      .getOrElse(15L * 60 * 1000)

  private[stream] def orphanStale(p: Path): Boolean =
    try {
      val cutoff = System.currentTimeMillis() - orphanGraceMs
      def newest(f: java.io.File): Long =
        if (f.isDirectory)
          (f.lastModified() +:
            Option(f.listFiles()).getOrElse(Array.empty).map(newest).toSeq).max
        else f.lastModified()
      newest(p.toFile) < cutoff
    } catch { case _: Throwable => false }

  /** (latest compacted marker's upto-batch, committed batches after it). */
  def compactSources(root: String): (Option[Long], Seq[Long]) = {
    val names = commitIO.listNames(Paths.get(root, "manifests"))
    val latest = names
      .filter(n => n.startsWith("compact-") && n.endsWith(".json"))
      .map(_.stripPrefix("compact-").stripSuffix(".json").toLong)
      .sorted.lastOption
    val residual = names
      .filter(n => n.startsWith("manifest-") && n.endsWith(".json"))
      .map(_.stripPrefix("manifest-").stripSuffix(".json").toLong)
      .filter(b => latest.forall(b > _))
      .sorted
    (latest, residual)
  }

  /** Fold the residual committed batches (plus the previous compacted
    * table, if any) into ONE compacted parquet table. Pure rewrite —
    * audit rows are immutable facts, so read-before ≡ read-after. The
    * marker carries the folded row count so accounting survives expiry
    * of the per-epoch manifests. Returns false with < 2 residual batches.
    *
    * Cost note: this rewrite is O(previous compact + residual) — a
    * MAINTENANCE action run at coarse cadence, unlike the every-N-epochs
    * partial compaction (whose tables are tiny). A production rewrite at
    * 100 TB would bin-pack incrementally (rewrite only undersized files,
    * Iceberg's rewrite_data_files); the marker/visibility protocol here
    * is the part that carries over unchanged.
    */
  def compact(spark: SparkSession, root: String): Boolean = {
    val (latest, residual) = compactSources(root)
    if (residual.size < 2) return false
    val upTo = residual.max
    // a marker for this upTo already exists ⇒ a concurrent compactor won;
    // rewriting would be wasted work (and must never touch its data dir)
    if (commitIO.exists(compactMarkerPath(root, upTo))) return false
    // ATTEMPT-UNIQUE data dir (ADVICE r4): concurrent compactors each
    // write their own dir and race only on the marker publish — the loser
    // deletes its orphan, and readers of the winner's published path are
    // never exposed to a mid-overwrite dir.
    val attemptRel = s"compact/$upTo-${java.util.UUID.randomUUID().toString.take(8)}"
    val attemptDir = Paths.get(root, attemptRel).toString
    val parts =
      latest.map(u => spark.read.parquet(compactDataDir(root, u))).toSeq :+
        readBatches(spark, root, residual)
    val folded = parts.reduce(_.unionByName(_))
    folded.write.mode("overwrite").parquet(attemptDir)
    val prevRows = latest.map { u =>
      val n = mapper.readTree(Files.readString(compactMarkerPath(root, u)))
      n.get("row_count").asLong()
    }.getOrElse(0L)
    val node = mapper.createObjectNode()
    node.put("upto_batch", upTo)
    latest.foreach(node.put("prev_compact", _))
    node.put("path", attemptRel)
    node.put("row_count",
      prevRows + residual.map(b => readManifest(root, b).rowCount).sum)
    val won = commitIO.publishIfAbsent(
      compactMarkerPath(root, upTo), mapper.writeValueAsString(node))
    if (!won) rmTree(new java.io.File(attemptDir))
    won
  }

  /** Expire state superseded by `compact`: folded epoch data dirs and
    * manifests, older compacted tables, and orphan attempt dirs from
    * losing/crashed compactors. Superseded manifests are never on the
    * read path (`compactSources` prefers the latest compacted marker), so
    * the delete ORDER within one entry is immaterial for readers;
    * data-first keeps the sweep idempotent — a crash between the two
    * deletes leaves the manifest in place, so the re-run finds the entry
    * again and re-deletes the (possibly half-gone) data dir. Idempotent.
    */
  def expireCompacted(root: String): Int = {
    val (latest, _) = compactSources(root)
    var removed = 0
    latest.foreach { upTo =>
      val mdir = Paths.get(root, "manifests")
      commitIO.listNames(mdir).foreach { n =>
        val p = mdir.resolve(n)
        if (n.startsWith("manifest-") && n.endsWith(".json") &&
            n.stripPrefix("manifest-").stripSuffix(".json").toLong <= upTo) {
          rmTree(Paths.get(root, "data",
            s"batch=${n.stripPrefix("manifest-").stripSuffix(".json").toLong}").toFile)
          if (Files.deleteIfExists(p)) removed += 1
        } else if (n.startsWith("compact-") && n.endsWith(".json") &&
            n.stripPrefix("compact-").stripSuffix(".json").toLong < upTo) {
          // resolve the marker's data dir BEFORE deleting the marker (the
          // path field is only recoverable from it)
          rmTree(new java.io.File(
            compactDataDir(root, n.stripPrefix("compact-").stripSuffix(".json").toLong)))
          if (Files.deleteIfExists(p)) removed += 1
        }
      }
      // Orphan attempt dirs: a compactor that crashed before publish (or
      // lost the race mid-cleanup) leaves compact/<upTo'>-<uuid> with no
      // marker. A numeric bound alone is NOT safe: a slow compactor that
      // computed its target BEFORE a newer compaction published may still
      // be writing a dir with upTo' <= latest — so only dirs untouched
      // for a grace window are swept (a live parquet write refreshes its
      // dir's mtime as files land; a crashed attempt goes stale).
      val live = Paths.get(compactDataDir(root, upTo)).getFileName.toString
      val cdir = Paths.get(root, "compact")
      commitIO.listNames(cdir).foreach { d =>
        val num = d.takeWhile(_.isDigit)
        if (d != live && num.nonEmpty && num.toLong <= upTo &&
            orphanStale(cdir.resolve(d))) {
          rmTree(cdir.resolve(d).toFile)
          removed += 1
        }
      }
    }
    removed
  }
}
