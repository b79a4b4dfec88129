package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.lineage.{DataLineage, Lineage}
import graft.pipeline.GuardianPipeline
import graft.pipeline.GuardianPipeline.GenerateSpec

/** Lineage-audit suite — ports tests/test_guardian.py:72-88 and the
  * API-pipeline tests (tests/test_guardian.py:94-106) against the batch
  * pipeline.
  */
class LineageSpec extends AnyFunSuite {

  test("lineage tracking accumulates events (tests/test_guardian.py:72-78)") {
    val l = new DataLineage("test-123")
    l.record("generate", 0, 100, Map("type" -> "persons"))
    l.record("watermark", 100, 100)
    assert(l.events.size == 2)
    assert(l.events(0).transform == "generate")
    assert(l.events(1).transform == "watermark")
    assert(l.events(0).output_count == 100)
  }

  test("lineage serialization round-trip (tests/test_guardian.py:80-88)") {
    val l = new DataLineage("test-456")
    l.record("generate", 0, 50)
    val json = l.toJson
    assert(json.contains("\"dataset_id\""))
    val restored = Lineage.fromJson(json)
    assert(restored.datasetId == "test-456")
    assert(restored.events.size == 1)
    assert(restored.events == l.events)
    assert(Lineage.fromJson(restored.toJson).events == l.events)
  }

  test("lineage timestamps are deterministic (logical clock, not wall clock)") {
    val a = new DataLineage("d"); val b = new DataLineage("d")
    Seq(a, b).foreach { l => l.record("x", 0, 1); l.record("y", 1, 1) }
    assert(a.toJson == b.toJson) // wall clock would make these differ
    assert(a.events.map(_.timestamp) == Seq(0.0, 1.0))
  }

  test("pipeline: generate returns n valid records (tests/test_guardian.py:94-99)") {
    val res = GuardianPipeline.run(SparkSpec.spark, GenerateSpec("persons", 10, 42))
    assert(res.records.count() == 10)
    assert(res.validation.valid)
    assert(res.lineage.events.map(_.transform) == Seq("generate", "validate"))
  }

  test("pipeline: generate with watermark records ≥2 lineage events (tests/test_guardian.py:101-106)") {
    val res = GuardianPipeline.run(
      SparkSpec.spark, GenerateSpec("persons", 20, 42, watermark = Some("HI")))
    assert(res.records.count() == 20)
    assert(res.lineage.events.size >= 2)
    assert(res.lineage.events.map(_.transform) == Seq("generate", "watermark", "validate"))
    // the embedded watermark round-trips
    val r = graft.watermark.Watermarker.verify(res.records, "HI", "salary", Seq("id"))
    assert(r.verified)
    // deterministic dataset id — no wall clock (vs app.py:35)
    assert(res.lineage.datasetId == "persons_42")
  }

  test("pipeline: unknown dataset type rejected (app.py:42)") {
    intercept[IllegalArgumentException] {
      GuardianPipeline.run(SparkSpec.spark, GenerateSpec("widgets", 5, 1))
    }
  }
}
