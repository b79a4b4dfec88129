package graft.stream

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.validate.Validator

/** Windowed quality validators over the transcript stream — the streaming
  * generalization of validate_column_distribution (validator.py:18-39):
  * the same one-pass statistics, computed per event-time window so drift
  * is visible over time. Works identically on batch and streaming frames
  * (streaming callers add `withWatermark` first).
  */
object Windows {

  val piiEmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val piiSsnRe = "\\b\\d{3}-\\d{2}-\\d{4}\\b"

  /** Stateless per-turn validator stage: PII flags + text quality columns.
    * Pure codegen'd projection — runs before the sink on every turn.
    *
    * Hot-path discipline (this touches every turn at 10^12 scale): ONE
    * custom Catalyst expression (graft.expressions.TextStats, whole-stage
    * codegen) scans the UTF-8 bytes once for length, \S+ token count and
    * both PII patterns — replacing three regex passes; unpacking is
    * shift/mask arithmetic. Byte-exactness vs the regexes is asserted by
    * TextStatsSpec.
    */
  def withQualityFlags(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.graftbridge.CatalystBridge
    val packed = CatalystBridge.column(
      graft.expressions.TextStats(CatalystBridge.expression(col("text"))))
    df.withColumn("__ts", packed)
      .withColumn("text_len", shiftright(col("__ts"), 32).cast("int"))
      .withColumn("n_tokens",
        shiftright(col("__ts"), 1).bitwiseAND(lit(0x7fffffffL)).cast("int"))
      .withColumn("has_pii", col("__ts").bitwiseAND(lit(1L)) === 1L)
      .drop("__ts")
  }

  /** The regex formulation TextStats replaces — kept for the oracle-
    * checked batch queries and the equivalence test.
    */
  def withQualityFlagsRegex(df: DataFrame): DataFrame = {
    val txt = col("text")
    df.withColumn("text_len", length(txt))
      .withColumn("n_tokens", regexp_count(txt, lit("\\S+")))
      .withColumn("has_pii", txt.rlike(s"(?:$piiEmailRe)|(?:$piiSsnRe)"))
  }

  private val qualityAggNames = Seq(
    "n_turns", "len_min", "len_max", "len_mean", "len_std", "n_pii", "approx_convs")

  private def qualityAggs: Seq[Column] = Seq(
    count(lit(1)).as("n_turns"),
    min(col("text_len")).as("len_min"),
    max(col("text_len")).as("len_max"),
    Validator.meanExpr(col("text_len")).as("len_mean"),
    Validator.stdExpr(col("text_len")).as("len_std"),
    sum(col("has_pii").cast("long")).as("n_pii"),
    approx_count_distinct(col("conv_id")).as("approx_convs"))

  /** Tumbling (slide = None) or sliding drift windows: per-window
    * distribution stats of text length + PII counts. Map-side partial
    * aggregation makes this a single shuffle of tiny partial states.
    */
  def driftWindows(df: DataFrame, size: String, slide: Option[String] = None): DataFrame = {
    val w = slide match {
      case Some(s) => window(col("ts"), size, s)
      case None => window(col("ts"), size)
    }
    withQualityFlags(df)
      .groupBy(w.as("w"))
      .agg(qualityAggs.head, qualityAggs.tail: _*)
      .select(
        (col("w.start").as("wstart") +: col("w.end").as("wend") +:
          qualityAggNames.map(col)): _*)
  }

  /** Statistical drift detection between adjacent event-time windows
    * (the "statistical-drift checks" clause of the north star): Welch-style
    * mean-shift z-score of a numeric column between each window and its
    * predecessor; drift flagged when |z| exceeds the threshold.
    * Works identically on batch and streaming-foreachBatch frames.
    */
  def driftDetect(
      df: DataFrame, valueCol: String, windowSize: String,
      zThreshold: Double = 3.0): DataFrame = {
    val v = col(valueCol).cast("double")
    val agg = df
      .groupBy(window(col("ts"), windowSize).as("w"))
      .agg(
        count(lit(1)).as("n"),
        Validator.meanExpr(v).as("mean"),
        Validator.stdExpr(v).as("std"))
      .select(col("w.start").as("wstart"), col("n"), col("mean"), col("std"))
    driftDetectOnAgg(agg, zThreshold)
  }

  /** Welch mean-shift z over an ALREADY-aggregated per-window table
    * `(wstart, n, mean, std)` — shared by the raw-rows form above and the
    * standing monitor over the audit sink's in-flow quality partials
    * (`GuardianStream.driftFromQuality`), which never rescans data rows.
    */
  def driftDetectOnAgg(agg: DataFrame, zThreshold: Double = 3.0): DataFrame = {
    // lag over the (small: time-span / windowSize rows) aggregated window
    // table — a single-partition sort over aggregates, never over raw rows
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("wstart"))
    agg
      .withColumn("prev_n", lag(col("n"), 1).over(w))
      .withColumn("prev_mean", lag(col("mean"), 1).over(w))
      .withColumn("prev_std", lag(col("std"), 1).over(w))
      .withColumn("z",
        when(col("prev_n").isNull, lit(null))
          .otherwise(round(
            abs(col("mean") - col("prev_mean")) /
              sqrt(
                col("std") * col("std") / col("n") +
                  col("prev_std") * col("prev_std") / col("prev_n") + lit(1e-12)),
            5)))
      .withColumn("drifted", coalesce(col("z") > zThreshold, lit(false)))
      .select(col("wstart"), col("n"), round(col("mean"), 5).as("mean"),
        round(col("std"), 5).as("std"), col("z"), col("drifted"))
  }

  /** Per-conversation session windows (gap on ts) with quality stats —
    * the "session windows (gap on ts)" clause of the north star.
    */
  def sessionWindows(df: DataFrame, gap: String): DataFrame =
    withQualityFlags(df)
      .groupBy(session_window(col("ts"), gap).as("sw"), col("conv_id"))
      .agg(
        count(lit(1)).as("n_turns"),
        Validator.meanExpr(col("text_len")).as("len_mean"),
        sum(col("has_pii").cast("long")).as("n_pii"))
      .select(
        col("conv_id"),
        col("sw.start").as("session_start"),
        col("sw.end").as("session_end"),
        col("n_turns"), col("len_mean"), col("n_pii"))
}
