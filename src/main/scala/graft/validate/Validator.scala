package graft.validate

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.model.{ColumnCheck, ColumnSpec, CorrReport, ValidationReport}

/** Statistical validation — the engine restatement of validator.py.
  *
  * Where the reference makes 4-5 full list passes per checked column
  * (min/max/mean/std each re-iterate, and std recomputes mean:
  * validator.py:13-14,22-25), the engine computes *every* statistic of
  * *every* checked column in ONE distributed aggregation job
  * (`HashAggregateExec`, partial + final, whole-stage codegen). At 100 TB
  * this is the difference between one scan and five.
  *
  * Edge-semantics shims (each mirrors a reference line):
  *  - mean of empty = 0.0            (validator.py:7)    → coalesce(avg, 0)
  *  - std of n<2 = 0.0               (validator.py:11-12) → coalesce(stddev_samp, 0)
  *  - corr of n<2 or zero denom = 0.0 (validator.py:46,52) → coalesce(nanvl(corr,0),0)
  *  - empty dataset ⇒ {valid:false, error:"Empty dataset"} (validator.py:76-77)
  */
object Validator {

  /** Sample standard deviation with the reference's n<2 ⇒ 0.0 shim. */
  def stdExpr(c: Column): Column = coalesce(nanvl(stddev_samp(c), lit(0.0)), lit(0.0))

  /** Mean with the reference's empty ⇒ 0.0 shim. */
  def meanExpr(c: Column): Column = coalesce(avg(c), lit(0.0))

  /** Pearson r with the reference's n<2 / zero-denominator ⇒ 0.0 shim
    * (validator.py:46,52). Formulated as covar/(σx·σy) with `try_divide`
    * because under ANSI mode (Spark 4 default) the built-in `corr` raises
    * DIVIDE_BY_ZERO on zero-variance input where the reference returns 0.0.
    */
  def corrExpr(x: Column, y: Column): Column =
    coalesce(
      nanvl(try_divide(covar_samp(x, y), stddev_samp(x) * stddev_samp(y)), lit(0.0)),
      lit(0.0))

  /** The four statistics + two range verdicts of
    * validate_column_distribution (validator.py:18-39) as aggregate
    * expressions producing a single struct column named after the checked
    * column. Validity: min ≥ expMin − range·tol ∧ max ≤ expMax + range·tol
    * (validator.py:27-29); mean/std are informational only.
    */
  def checkStruct(spec: ColumnSpec): Column = {
    val c = col(spec.name).cast("double")
    val rangeSize = spec.expectedMax - spec.expectedMin
    val aMin = min(c)
    val aMax = max(c)
    val minOk = aMin >= lit(spec.expectedMin - rangeSize * spec.tolerance)
    val maxOk = aMax <= lit(spec.expectedMax + rangeSize * spec.tolerance)
    struct(
      (minOk && maxOk).as("valid"),
      aMin.as("actual_min"),
      aMax.as("actual_max"),
      meanExpr(c).as("actual_mean"),
      stdExpr(c).as("actual_std"),
      minOk.as("min_ok"),
      maxOk.as("max_ok")).as(spec.name)
  }

  /** One-row DataFrame form of validate_dataset (validator.py:74-98) over
    * explicit specs: one struct column per check + record_count + overall
    * valid. Usable both in batch and under a streaming groupBy(window).
    * Empty input yields zero rows here; `validate` adds the reference's
    * empty-dataset report.
    */
  def reportDF(df: DataFrame, specs: Seq[ColumnSpec]): DataFrame = {
    require(specs.nonEmpty, "no columns to validate")
    val checkCols = specs.map(checkStruct)
    val agg = df.agg(checkCols.head, (checkCols.tail :+ count(lit(1)).as("record_count")): _*)
    val overallValid = specs.map(s => col(s.name)("valid")).reduce(_ && _)
    agg.select((col("record_count") +: specs.map(s => col(s.name)) :+ overallValid.as("valid")): _*)
  }

  /** Driver-side ValidationReport assembly — the full validate_dataset
    * semantics including the empty-dataset short-circuit and schema-driven
    * check dispatch (validator.py:74-98). One Spark job total.
    */
  def validate(df: DataFrame, specs: Seq[ColumnSpec]): ValidationReport = {
    val applicable = specs.filter(s => df.schema.fieldNames.contains(s.name))
    if (applicable.isEmpty) {
      // No checkable columns: mirror reference behavior of returning
      // valid=true with just a record count (no checks dict entries) —
      // but still detect emptiness first like validator.py:76-77.
      val n = df.count()
      return if (n == 0) ValidationReport(valid = false, Map.empty, 0L, Some("Empty dataset"))
      else ValidationReport(valid = true, Map.empty, n, None)
    }
    val row = reportDF(df, applicable).collect()(0)
    val n = row.getAs[Long]("record_count")
    if (n == 0L) return ValidationReport(valid = false, Map.empty, 0L, Some("Empty dataset"))
    val checks = applicable.map { s =>
      val r = row.getAs[org.apache.spark.sql.Row](s.name)
      s.name -> ColumnCheck(
        valid = r.getAs[Boolean]("valid"),
        actual_min = r.getAs[Double]("actual_min"),
        actual_max = r.getAs[Double]("actual_max"),
        actual_mean = r.getAs[Double]("actual_mean"),
        actual_std = r.getAs[Double]("actual_std"),
        min_ok = r.getAs[Boolean]("min_ok"),
        max_ok = r.getAs[Boolean]("max_ok"))
    }.toMap
    ValidationReport(checks.values.forall(_.valid), checks, n, None)
  }

  /** Schema-dispatched variant — validate_dataset's age/salary probing
    * (validator.py:82-95) against the real schema (§1.3 of SURVEY.md).
    */
  def validateAuto(df: DataFrame): ValidationReport =
    validate(df, ColumnSpec.autoSpecs(df.schema.fieldNames.toSeq))

  /** Schema check (the "schema ... checks" clause of the north star):
    * fixed expected StructType vs the frame's actual schema — missing
    * fields, unexpected extras, and type mismatches. Pure metadata, no
    * job.
    */
  /** Per-field schema verdicts (metadata-only — no job): one
    * (field, status) row per expected field (ok / missing /
    * type_mismatch) plus one `unexpected` row per extra actual field.
    * `validateSchema` aggregates the same comparison into one report.
    */
  def schemaFieldStatuses(
      df: DataFrame,
      expected: org.apache.spark.sql.types.StructType): Seq[(String, String)] = {
    val actual = df.schema.map(f => f.name -> f.dataType).toMap
    expected.fields.toSeq.map { f =>
      actual.get(f.name) match {
        case None => (f.name, "missing")
        case Some(t) if t == f.dataType => (f.name, "ok")
        case Some(_) => (f.name, "type_mismatch")
      }
    } ++ df.schema.map(_.name).filterNot(expected.fieldNames.contains)
      .map(_ -> "unexpected")
  }

  def validateSchema(
      df: DataFrame,
      expected: org.apache.spark.sql.types.StructType): ValidationReport = {
    val actual = df.schema.map(f => f.name -> f.dataType).toMap
    val exp = expected.map(f => f.name -> f.dataType).toMap
    val missing = exp.keySet -- actual.keySet
    val extra = actual.keySet -- exp.keySet
    val mismatched = exp.keySet.intersect(actual.keySet)
      .filter(n => exp(n) != actual(n))
    val ok = missing.isEmpty && extra.isEmpty && mismatched.isEmpty
    val err =
      if (ok) None
      else Some(Seq(
        if (missing.nonEmpty) s"missing: ${missing.toSeq.sorted.mkString(",")}" else "",
        if (extra.nonEmpty) s"unexpected: ${extra.toSeq.sorted.mkString(",")}" else "",
        if (mismatched.nonEmpty) s"type mismatch: ${mismatched.toSeq.sorted.mkString(",")}" else "")
        .filter(_.nonEmpty).mkString("; "))
    ValidationReport(ok, Map.empty, -1L, err)
  }

  /** validate_correlation_preserved (validator.py:55-71): r on the original
    * pair vs r on the synthetic pair; preserved iff |Δr| ≤ tolerance.
    * Two single-pass aggregations (one per dataset).
    */
  def correlationPreserved(
      orig: DataFrame, origX: String, origY: String,
      syn: DataFrame, synX: String, synY: String,
      tolerance: Double = 0.3): CorrReport = {
    val o = orig.agg(corrExpr(col(origX), col(origY)).as("r")).collect()(0).getDouble(0)
    val s = syn.agg(corrExpr(col(synX), col(synY)).as("r")).collect()(0).getDouble(0)
    CorrReport(math.abs(o - s) <= tolerance, o, s, math.abs(o - s))
  }
}
