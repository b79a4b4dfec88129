package graft.stream

import org.apache.spark.sql.Dataset
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

  def dedupFn(stateTtlMs: Long, maxHashesPerKey: Int)(
      key: (String, Int),
      turns: Iterator[Turn],
      state: GroupState[SeenState]): Iterator[Turn] = {
    if (state.hasTimedOut) {
      state.remove()
      return Iterator.empty
    }
    val prev = state.getOption.getOrElse(SeenState(Array.empty, 0L))
    val seen = scala.collection.mutable.LinkedHashSet[Long](
      scala.collection.immutable.ArraySeq.unsafeWrapArray(prev.hashes): _*)
    var maxEventMs = prev.maxEventMs
    // Engines drop late rows automatically only for windowed aggregations;
    // for arbitrary stateful ops the contract is explicit: a turn whose
    // event time is behind the current watermark is LATE and dropped
    // (documented north-star late-data semantics). Batch runs have
    // watermark = -1 ⇒ nothing is late.
    val wmMs = state.getCurrentWatermarkMs()
    val out = Vector.newBuilder[Turn]
    turns.foreach { t =>
      val ms = t.ts.getTime
      if (wmMs <= 0 || ms >= wmMs) {
        val h = turnHash(t)
        if (!seen.contains(h)) {
          seen += h
          out += t
        }
        if (ms > maxEventMs) maxEventMs = ms
      }
    }
    if (seen.isEmpty) {
      // Nothing admitted and no prior state (e.g. an all-late group):
      // keep no state at all.
      if (state.exists) state.remove()
    } else {
      val trimmed =
        if (seen.size <= maxHashesPerKey) seen.toArray
        else seen.toArray.takeRight(maxHashesPerKey)
      state.update(SeenState(trimmed, maxEventMs))
      if (wmMs >= 0) {
        // Timeout must be strictly beyond the current watermark.
        state.setTimeoutTimestamp(math.max(maxEventMs + stateTtlMs, wmMs + 1))
      }
    }
    out.result().iterator
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
    ds.groupByKey(t => (t.conv_id, t.turn_idx >>> turnBucketShift))
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(
        dedupFn(stateTtlMs, maxHashesPerKey))
  }
}
