package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.gen.DeterministicGen
import graft.lineage.DataLineage
import graft.model.ValidationReport
import graft.validate.Validator
import graft.watermark.Watermarker

/** The batch guardian pipeline — engine restatement of the reference's
  * `POST /generate` route (app.py:32-53): generate → (optional) watermark →
  * validate, with a lineage event per transform.
  *
  * Divergence mandated by checkpoint-resume determinism: the reference's
  * dataset id embeds wall-clock seconds (`f"{type}_{int(time.time())}"`,
  * app.py:35); the engine derives it from (type, seed) so the same spec
  * always yields the same id (BASELINE.json north_rule).
  */
object GuardianPipeline {

  final case class GenerateSpec(
      datasetType: String = "persons",
      count: Long = 100L,
      seed: Long = 42L,
      watermark: Option[String] = None)

  final case class GenerateResult(
      records: DataFrame,
      lineage: DataLineage,
      validation: ValidationReport)

  /** Unknown dataset type ⇒ error, mirroring the 400 at app.py:42. */
  def run(spark: SparkSession, spec: GenerateSpec): GenerateResult = {
    val lineage = new DataLineage(s"${spec.datasetType}_${spec.seed}")

    var records = spec.datasetType match {
      case "persons" => DeterministicGen.persons(spark, spec.count, spec.seed)
      case "transactions" => DeterministicGen.transactions(spark, spec.count, spec.seed)
      case other =>
        throw new IllegalArgumentException(s"Unknown dataset type: $other")
    }
    lineage.record("generate", 0L, spec.count,
      Map("type" -> spec.datasetType, "count" -> spec.count.toString))

    spec.watermark.filter(_.nonEmpty).foreach { wm =>
      records = Watermarker.embed(records, wm, carrier = "salary", keys = Seq("id"))
      lineage.record("watermark", spec.count, spec.count,
        Map("watermark_len" -> wm.length.toString))
    }

    val validation = Validator.validateAuto(records)
    lineage.record("validate", spec.count, spec.count,
      Map("valid" -> validation.valid.toString))

    GenerateResult(records, lineage, validation)
  }
}
