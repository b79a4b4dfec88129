package graft.model

import java.sql.Timestamp

/** Core data model of the guardian engine.
  *
  * The row types mirror the reference's record dicts
  * (reference: generator.py:15-23, generator.py:34-41) and the north-rule
  * transcript schema (BASELINE.json `input_hint`); the report types mirror
  * the reference's report dicts (validator.py:31-39, validator.py:66-71,
  * validator.py:79-98, watermark.py:73-77).
  */

/** One turn of a multi-turn conversation transcript — the engine's primary
  * input row (BASELINE.json input_hint):
  * (conv_id:string, turn_idx:int, role:string, text:string, tool:string,
  * ts:timestamp).
  */
final case class Turn(
    conv_id: String,
    turn_idx: Int,
    role: String,
    text: String,
    tool: String,
    ts: Timestamp)

/** Mirrors reference generate_persons rows (generator.py:15-23). */
final case class Person(
    id: Long,
    name: String,
    email: String,
    age: Int,
    salary: Double,
    city: String,
    country: String)

/** Mirrors reference generate_transactions rows (generator.py:34-41);
  * the reference's ISO-8601 string timestamp is promoted to TimestampType.
  */
final case class Transaction(
    id: Long,
    amount: Double,
    currency: String,
    timestamp: Timestamp,
    merchant: String,
    category: String)

/** Per-column distribution check — the 7-field dict of validator.py:31-39. */
final case class ColumnCheck(
    valid: Boolean,
    actual_min: Double,
    actual_max: Double,
    actual_mean: Double,
    actual_std: Double,
    min_ok: Boolean,
    max_ok: Boolean)

/** Full-dataset validation report (validator.py:74-98). `error` is set only
  * for the empty-dataset case (validator.py:76-77), in which case `checks`
  * is empty and `record_count` is 0.
  */
final case class ValidationReport(
    valid: Boolean,
    checks: Map[String, ColumnCheck],
    record_count: Long,
    error: Option[String] = None)

/** Correlation-preservation report (validator.py:66-71). */
final case class CorrReport(
    preserved: Boolean,
    original_correlation: Double,
    synthetic_correlation: Double,
    delta: Double)

/** Watermark verification report (watermark.py:73-77). */
final case class WatermarkReport(
    verified: Boolean,
    expected: String,
    extracted: String)

/** Expected-range spec for a validated column (validator.py:18-19 defaults
  * tolerance to 0.15; validate_dataset uses [0,120] for age and [0,1e6]
  * for salary, validator.py:84,92).
  */
final case class ColumnSpec(
    name: String,
    expectedMin: Double,
    expectedMax: Double,
    tolerance: Double = 0.15)

object ColumnSpec {
  /** The two auto-dispatched specs of validate_dataset (validator.py:82-95). */
  val age: ColumnSpec = ColumnSpec("age", 0.0, 120.0)
  val salary: ColumnSpec = ColumnSpec("salary", 0.0, 1000000.0)

  /** Schema-driven dispatch: the reference probes key presence in the first
    * record (validator.py:82,90); we probe the schema once.
    */
  def autoSpecs(fieldNames: Seq[String]): Seq[ColumnSpec] =
    Seq(age, salary).filter(s => fieldNames.contains(s.name))
}
