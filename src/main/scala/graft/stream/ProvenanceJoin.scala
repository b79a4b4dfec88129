package graft.stream

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream-stream provenance join of raw vs generated turn streams
  * (BASELINE.json north_star): inner join on (conv_id, turn_idx) with both
  * sides watermarked and a bounded event-time range condition so join
  * state is evictable — without the range bound the state store would
  * grow forever at 10^12-turn scale.
  *
  * Output: one provenance-match row per matched turn with the per-turn
  * text equality verdict (the invariant the watermark embedder must
  * preserve).
  */
object ProvenanceJoin {

  /** `raw` and `gen` must share the Turn schema. For streaming frames the
    * caller applies this AFTER `withWatermark` on both inputs;
    * `maxSkew` bounds |gen.ts − raw.ts| and hence the join state window.
    * Works identically on batch frames (the batch-equivalence test).
    */
  def join(raw: DataFrame, gen: DataFrame, maxSkew: String = "2 minutes"): DataFrame = {
    val g = gen.select(
      col("conv_id").as("g_conv_id"),
      col("turn_idx").as("g_turn_idx"),
      col("text").as("g_text"),
      col("ts").as("g_ts"))
    raw
      .join(
        g,
        col("conv_id") === col("g_conv_id") &&
          col("turn_idx") === col("g_turn_idx") &&
          col("g_ts") >= col("ts") - expr(s"INTERVAL $maxSkew") &&
          col("g_ts") <= col("ts") + expr(s"INTERVAL $maxSkew"),
        "inner")
      .select(
        col("conv_id"),
        col("turn_idx"),
        col("ts").as("raw_ts"),
        col("g_ts").as("gen_ts"),
        (col("text") === col("g_text")).as("text_match"),
        // cast makes this NTZ-agnostic (no-op on TIMESTAMP; NTZ is read in
        // the session's UTC) — batch callers may pass timestamp_ntz frames
        (unix_micros(col("g_ts").cast("timestamp")) -
          unix_micros(col("ts").cast("timestamp"))).as("skew_us"))
  }
}
