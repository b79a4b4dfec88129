package graft.stream

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.model.Turn

/** Stateful duplicate-turn detection via flatMapGroupsWithState
  * (BASELINE.json north_star).
  *
  * Replays in an at-least-once transcript stream re-deliver whole turns;
  * a turn is a duplicate when its (turn_idx, text) was already seen for
  * its conversation. State is keyed on a SALTED key
  * (conv_id, turn_idx bucket) rather than conv_id alone: a hot
  * conversation with millions of turns would otherwise pin one state-store
  * partition (the skew clause of the north star). Salting by turn_idx
  * range is *lossless* for dedup — a replay carries the same turn_idx, so
  * it always lands in the same salt bucket as the original.
  *
  * State per key is a bounded set of 64-bit (turn_idx, text) hashes — at
  * 10^12-turn scale each conversation's state is spread over `salt`
  * buckets and capped at `maxHashesPerKey` (NEWEST kept — the right policy
  * next to the event-time TTL, which also ages out the oldest; a Bloom
  * filter would trade per-hash exactness for fixed memory). Dedup keys on
  * the 64-bit hash, so two DISTINCT turns colliding (p ≈ 2⁻⁶⁴ per pair
  * within one salt bucket) would be conflated — a deliberate
  * space/exactness tradeoff, not bit-exact set membership. Keys expire via
  * event-time timeout once the watermark passes their last activity +
  * `stateTtlMs` — late replays older than the watermark are dropped by the
  * watermark itself, so expiry cannot re-admit duplicates.
  */
object DedupState {

  final case class SeenState(hashes: Array[Long], maxEventMs: Long)

  private def turnHash(t: Turn): Long = {
    // FNV-1a over turn_idx and text UTF-16 units — stable across JVMs,
    // no per-row byte[] copy (this runs once per turn at 10^12 scale).
    var h = 0xcbf29ce484222325L
    def mix(b: Int): Unit = { h ^= (b & 0xff); h *= 0x100000001b3L }
    mix(t.turn_idx); mix(t.turn_idx >>> 8); mix(t.turn_idx >>> 16); mix(t.turn_idx >>> 24)
    val s = t.text
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      mix(c & 0xff); mix((c >>> 8) & 0xff)
      i += 1
    }
    h
  }

  /** Primitive open-addressing long set (insertion order kept in a raw
    * array). The state function touches EVERY turn at 10^12 scale, and a
    * boxed `LinkedHashSet[Long]` allocates 2-3 objects per row — measured
    * as multi-second GC storms per micro-batch at 32 threads (round-2
    * profiling). This set allocates two long arrays per GROUP, zero per
    * row. Empty slot sentinel is 0 with an explicit has-zero flag (a
    * 64-bit FNV CAN legitimately be 0).
    */
  private final class LongOrderedSet(initSize: Int) {
    private var cap = {
      var c = 16
      while (c < initSize * 2) c <<= 1
      c
    }
    private var table = new Array[Long](cap)
    private var mask = cap - 1
    private var hasZero = false
    var order = new Array[Long](math.max(initSize, 16))
    var size = 0

    @inline private def slot(x: Long): Int = {
      val h = x * -7046029254386353131L
      ((h ^ (h >>> 32)).toInt) & mask
    }

    /** Adds x if absent; returns true when newly added. */
    def add(x: Long): Boolean = {
      if (x == 0L) {
        if (hasZero) return false
        hasZero = true
      } else {
        var i = slot(x)
        while (table(i) != 0L) {
          if (table(i) == x) return false
          i = (i + 1) & mask
        }
        table(i) = x
        if ((size + 1) * 4 > cap * 3) grow()
      }
      if (size == order.length) order = java.util.Arrays.copyOf(order, size * 2)
      order(size) = x
      size += 1
      true
    }

    private def grow(): Unit = {
      cap <<= 1
      mask = cap - 1
      val old = table
      table = new Array[Long](cap)
      var j = 0
      while (j < old.length) {
        val v = old(j)
        if (v != 0L) {
          var i = slot(v)
          while (table(i) != 0L) i = (i + 1) & mask
          table(i) = v
        }
        j += 1
      }
    }

    /** Insertion-ordered contents, newest-last, trimmed to the newest
      * `max` entries.
      */
    def toTrimmedArray(max: Int): Array[Long] =
      if (size <= max) java.util.Arrays.copyOf(order, size)
      else java.util.Arrays.copyOfRange(order, size - max, size)
  }

  def dedupFn(stateTtlMs: Long, maxHashesPerKey: Int)(
      key: (String, Int),
      turns: Iterator[Turn],
      state: GroupState[SeenState]): Iterator[Turn] = {
    if (state.hasTimedOut) {
      state.remove()
      return Iterator.empty
    }
    val prev = state.getOption.getOrElse(SeenState(Array.empty, 0L))
    val seen = new LongOrderedSet(prev.hashes.length + 16)
    var i = 0
    while (i < prev.hashes.length) { seen.add(prev.hashes(i)); i += 1 }
    var maxEventMs = prev.maxEventMs
    // Engines drop late rows automatically only for windowed aggregations;
    // for arbitrary stateful ops the contract is explicit: a turn whose
    // event time is at-or-behind the current watermark is LATE and
    // dropped — `ms <= wm`, the SAME boundary Spark's built-in stateful
    // operators use (WatermarkSupport.watermarkExpression plans
    // LessThanOrEqual for the late-event filter), so this path and
    // `dedupRows` agree bit-for-bit. Batch runs have watermark ≤ 0 ⇒
    // nothing is late.
    val wmMs = state.getCurrentWatermarkMs()
    val out = scala.collection.mutable.ArrayBuffer.empty[Turn]
    turns.foreach { t =>
      val ms = t.ts.getTime
      if (wmMs <= 0 || ms > wmMs) {
        if (seen.add(turnHash(t))) out += t
        if (ms > maxEventMs) maxEventMs = ms
      }
    }
    if (seen.size == 0) {
      // Nothing admitted and no prior state (e.g. an all-late group):
      // keep no state at all.
      if (state.exists) state.remove()
    } else {
      state.update(SeenState(seen.toTrimmedArray(maxHashesPerKey), maxEventMs))
      if (wmMs >= 0) {
        // Timeout must be strictly beyond the current watermark.
        state.setTimeoutTimestamp(math.max(maxEventMs + stateTtlMs, wmMs + 1))
      }
    }
    out.iterator
  }

  /** Row-level streaming dedup — the pipeline's HOT-PATH dedup stage
    * (round-2 verdict: the fMGWS path below shuffled the full `Turn`
    * including `text` into the state operator and paid a per-group sort
    * plus one object decode/encode per row, and that stage was the
    * measured memory-bandwidth bottleneck at 32 threads).
    *
    * This path keeps the SAME observable semantics but runs entirely at
    * the `InternalRow` level through Spark's built-in streaming
    * deduplicate operator:
    *
    *  - duplicate key = (conv_id, xxhash64(turn_idx, text)) — the same
    *    64-bit-conflation contract the fMGWS path documents (two distinct
    *    turns colliding at p ≈ 2⁻⁶⁴ would be conflated; dedup is on the
    *    hash, not bit-exact membership). The hash is computed in
    *    whole-stage codegen BEFORE the shuffle, so only ~40-byte keys are
    *    ever compared or stored;
    *  - NO per-group sort and NO object codec: `dropDuplicatesWithinWatermark`
    *    plans `StreamingDeduplicateWithinWatermarkExec`, which streams
    *    UnsafeRows through with one state-store lookup per row (the
    *    fMGWS path must first cluster AND sort each 2M-row micro-batch
    *    by group key — with `text` riding every sorted row);
    *  - skew: the shuffle key includes the text hash, so a hot
    *    million-turn conversation spreads uniformly over ALL state
    *    partitions — strictly better than the salt-bucket spreading of
    *    the fMGWS path, with no knob;
    *  - late rows are dropped by the operator's built-in late-event
    *    filter. Spark's stateful operators filter with the PREVIOUS
    *    batch's watermark (`eventTimeWatermarkForLateEvents` lags one
    *    batch — the same contract windowed aggregations have), where
    *    `dedupFn` uses the current one; the two paths agree except for a
    *    one-epoch grace window on freshly-advanced watermarks;
    *  - state per key expires once the eviction watermark passes
    *    `ts + watermarkDelay`. Eviction in epoch B uses watermark(B) and
    *    the late filter of any later epoch B' uses watermark(B'-1) ≥
    *    watermark(B) ≥ ts + delay > ts, so a replay of an evicted key is
    *    always late-dropped — the lagged eviction and the lagged late
    *    filter move in lockstep, and eviction can never re-admit a
    *    duplicate (the same argument the fMGWS TTL makes).
    *
    * On a BATCH frame the same semantics degenerate to a plain
    * hash-aggregate dedup on the key (no watermark, nothing late) —
    * used by the stream≡batch equivalence tests.
    */
  def dedupRows(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.{col, xxhash64}
    // 128-bit FIXED-WIDTH dedup key, computed in whole-stage codegen
    // before the shuffle. An earlier shape keyed on (conv_id, 64-bit
    // hash): the variable-length string in the key made every state-store
    // probe hash-and-compare conv_id bytes and every state key row carry
    // them (~40% more key bytes) — measured on the contended 32-thread
    // state stage. Two INDEPENDENT xxhash64s replace it: h2 prepends a
    // constant salt, so h1 and h2 hash DIFFERENT messages and a false
    // collapse needs both to collide at once (p ≈ 2⁻¹²⁸ per pair; at
    // 10^12 turns the birthday bound stays ≈ 10⁻¹⁵, where a 64-bit key
    // alone would expect ~27k conflations). NOT a chained h2 =
    // f(h1, text): for two turns with EQUAL text — the dominant pair
    // class in a dedup corpus — an h1 collision would make a chained h2
    // collide with certainty, silently re-widening the bound to 2⁻⁶⁴.
    // conv_id feeds both hashes, so skew spreading (hash-partitioned
    // shuffle) is unchanged.
    val keyed = df
      .withColumn("__h1", xxhash64(col("conv_id"), col("turn_idx"), col("text")))
      .withColumn("__h2", xxhash64(
        org.apache.spark.sql.functions.lit(0x9e3779b97f4a7c15L),
        col("conv_id"), col("turn_idx"), col("text")))
    val deduped =
      if (df.isStreaming) keyed.dropDuplicatesWithinWatermark("__h1", "__h2")
      else keyed.dropDuplicates("__h1", "__h2")
    deduped.drop("__h1", "__h2")
  }

  /** Streaming cross-batch NEAR-duplicate suppression (LSH, MinHash
    * bands) composed from BUILT-IN stateful operators only — no custom
    * state function:
    *
    *   1. 4 MinHash band keys per row (TrainingDataOps' 8 signatures,
    *      pure codegen projection) → explode to (band, sig_a, sig_b);
    *   2. `dropDuplicatesWithinWatermark(band, sig_a, sig_b)` — state is
    *      one fixed-width key per distinct band bucket in the watermark
    *      horizon, and each bucket's FIRST arrival survives;
    *   3. a windowed count of surviving band rows per original row:
    *      keep iff all 4 bands survived, i.e. NO earlier in-horizon row
    *      was LSH-similar (the standard any-band match rule: recall
    *      1−(1−j²)⁴ for Jaccard j; false-positive ≈ an independent
    *      sig-PAIR collision, negligible at P ≈ 10⁹).
    *
    * The two stateful stages chain in append mode (dedup → windowed agg
    * is a supported multi-stateful topology; output lags one `slice`
    * window behind the watermark). Arrival order among equal buckets
    * inside ONE micro-batch is partition order — the same tie-break
    * caveat `dropDuplicates` itself has; across batches first-arrival is
    * exact. On a BATCH frame the same function degenerates to
    * min-(ts, conv_id, turn_idx)-per-bucket — the deterministic
    * reference the stream≡batch test compares against.
    *
    * KNOWN STREAMING LIMITATION (ADVICE r5, documented contract): within
    * one micro-batch the per-band first-arrival winners are chosen
    * independently per bucket, so two SAME-BATCH rows sharing all 4
    * bands (a same-batch near-dup family) can split the band wins and
    * lose ALL members — the keep-one-canonical guarantee holds across
    * batches but only at-most-one within a batch (never a false keep;
    * pinned by the same-batch spec case). The batch reference is immune
    * (deterministic min rule). Deployments needing exactly-one within a
    * batch run `dedupRows` (exact, deterministic) upstream — exact
    * same-batch replays then never reach this operator — or
    * pre-aggregate each epoch to the min row per bucket in foreachBatch.
    * Token-LESS rows (null text) carry no LSH signal and BYPASS
    * suppression entirely (emitted unconditionally): their null band
    * signatures would otherwise collapse all null-text rows into one
    * bucket family (null keys compare equal in the dedup state).
    *
    * Scale shape: state is 4 fixed-width keys per UNIQUE in-horizon row
    * (near-dups add nothing), hash-spread over all partitions by the
    * band-bucket shuffle; the windowed count shuffles the surviving
    * rows once more on row identity. Both stages are watermark-bounded.
    */
  def nearDupRows(df: DataFrame, windowSlice: String = "60 seconds"): DataFrame = {
    import org.apache.spark.sql.functions._
    import graft.expressions.PolyHashFunctions.tokenPolyHashes
    val P = graft.ops.TrainingDataOps.P
    val A = graft.ops.TrainingDataOps.MinhashA
    val B = graft.ops.TrainingDataOps.MinhashB
    def sig(j: Int) =
      expr(s"array_min(transform(__hs, h -> (${A(j)} * h + ${B(j)}) % ${P}L))")
    val bands = array((0 until 4).map { b =>
      struct(lit(b).as("band"),
        sig(2 * b).as("sig_a"), sig(2 * b + 1).as("sig_b"))
    }: _*)
    // token-less rows bypass suppression (see scaladoc)
    val nullText = df.filter(col("text").isNull)
      .select(col("conv_id"), col("turn_idx"), col("ts"), col("text"))
    val exploded = df.filter(col("text").isNotNull)
      .withColumn("__hs", tokenPolyHashes(col("text")))
      .select(col("conv_id"), col("turn_idx"), col("ts"), col("text"),
        explode(bands).as("bb"))
      .select(col("conv_id"), col("turn_idx"), col("ts"), col("text"),
        col("bb.band").as("band"),
        col("bb.sig_a").as("sig_a"), col("bb.sig_b").as("sig_b"))
    val survivors =
      if (df.isStreaming)
        exploded.dropDuplicatesWithinWatermark("band", "sig_a", "sig_b")
      else {
        // batch reference: first arrival = min (ts, conv_id, turn_idx)
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy(col("band"), col("sig_a"), col("sig_b"))
          .orderBy(col("ts"), col("conv_id"), col("turn_idx"))
        exploded.withColumn("__rn", row_number().over(w))
          .filter(col("__rn") === 1).drop("__rn")
      }
    // the raw ts column cannot stay in the grouping keys next to the
    // window (two event-time columns); min(ts) restores it after the agg
    survivors
      .groupBy(window(col("ts"), windowSlice), col("conv_id"), col("turn_idx"),
        col("text"))
      .agg(count(lit(1)).as("__bands"), min(col("ts")).as("ts"))
      .filter(col("__bands") === 4)
      .select(col("conv_id"), col("turn_idx"), col("ts"), col("text"))
      .unionByName(nullText)
  }

  /** Append-mode dedup stage. Input must already carry an event-time
    * watermark on `ts` (for state expiry and late-row drop).
    *
    * `turnBucketShift`: the salt bucket is `turn_idx >> shift` (ranges of
    * 2^shift turns), so a normal-sized conversation stays ONE state key
    * (no key-count blowup) while a hot million-turn conversation spreads
    * over thousands of buckets. A replayed turn carries the same turn_idx
    * ⇒ same bucket ⇒ dedup stays lossless.
    */
  def dedup(
      ds: Dataset[Turn],
      turnBucketShift: Int = 8,
      stateTtlMs: Long = 2L * 3600 * 1000,
      maxHashesPerKey: Int = 1 << 20): Dataset[Turn] = {
    import ds.sparkSession.implicits._
    import org.apache.spark.sql.functions.{col, lit, shiftrightunsigned}
    // Column-computed salted key + relational groupBy().as[K, V]: a
    // closure-keyed groupByKey would plan an AppendColumns that
    // DESERIALIZES every turn once to compute the key and then a second
    // time inside the state function — this path computes the key in
    // whole-stage codegen and decodes each turn exactly once (measured
    // ~2x on the state stage's per-row cost, the pipeline hot path).
    ds.toDF()
      .withColumn("__salt",
        shiftrightunsigned(col("turn_idx").cast("long"), turnBucketShift).cast("int"))
      .groupBy(col("conv_id"), col("__salt"))
      .as[(String, Int), Turn]
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(
        dedupFn(stateTtlMs, maxHashesPerKey))
  }
}
