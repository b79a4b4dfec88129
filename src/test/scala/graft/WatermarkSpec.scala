package graft

import org.apache.spark.sql.functions._
import graft.gen.DeterministicGen
import graft.gen.DeterministicGen.TranscriptSpec
import graft.watermark.Watermarker

/** Watermark-verification suite — ports tests/test_guardian.py:53-70 plus
  * the reference's bit-level edge cases (odd-bit padding watermark.py:40,
  * whole-byte truncation watermark.py:61) and the transcript per-turn
  * variant's invariants.
  */
class WatermarkSpec extends SparkSpec {

  test("embed → extract round-trip (tests/test_guardian.py:53-58)") {
    val records = DeterministicGen.persons(spark, 20, seed = 42)
    val wm = "TEST"
    val watermarked = Watermarker.embed(records, wm, "salary", Seq("id"))
    val extracted = Watermarker.extract(watermarked, wm.length, "salary", Seq("id"))
    assert(extracted == wm)
  }

  test("verify (tests/test_guardian.py:60-65)") {
    val records = DeterministicGen.persons(spark, 20, seed = 42)
    val watermarked = Watermarker.embed(records, "WM01", "salary", Seq("id"))
    val r = Watermarker.verify(watermarked, "WM01", "salary", Seq("id"))
    assert(r.verified && r.extracted == "WM01" && r.expected == "WM01")
    val wrong = Watermarker.verify(watermarked, "WM02", "salary", Seq("id"))
    assert(!wrong.verified)
  }

  test("embed preserves record count and non-carrier columns (tests/test_guardian.py:67-70)") {
    val records = DeterministicGen.persons(spark, 10, seed = 42)
    val watermarked = Watermarker.embed(records, "AB", "salary", Seq("id"))
    assert(watermarked.count() == 10)
    assert(watermarked.columns.toSeq == records.columns.toSeq)
    // every column except the carrier is byte-identical
    val diff = records.drop("salary").exceptAll(watermarked.drop("salary")).count()
    assert(diff == 0)
  }

  test("embed changes carrier by ≤ 3 of its rounded value (watermark.py docstring)") {
    val records = DeterministicGen.persons(spark, 40, seed = 1)
    val watermarked = Watermarker.embed(records, "TESTWM!", "salary", Seq("id"))
    val joined = records.select(col("id"), col("salary").as("orig"))
      .join(watermarked.select(col("id"), col("salary").as("wm")), "id")
    val maxDelta = joined
      .agg(max(abs(bround(col("orig")) - col("wm")))).collect()(0).getDouble(0)
    assert(maxDelta <= 3.0)
  }

  test("rows beyond the bit stream are untouched (watermark.py:38)") {
    val records = DeterministicGen.persons(spark, 100, seed = 3)
    val wm = "AB" // 16 bits ⇒ first 8 rows by id
    val watermarked = Watermarker.embed(records, wm, "salary", Seq("id"))
    val untouched = records.filter(col("id") >= 8)
      .exceptAll(watermarked.filter(col("id") >= 8)).count()
    assert(untouched == 0)
  }

  test("odd trailing bit padded with 0; extraction truncates to whole bytes (watermark.py:40,61)") {
    // packBits mirrors the repack loop exactly
    val bits = Watermarker.bitsOf("A") // 01000001
    assert(bits.toSeq == Seq(0, 1, 0, 0, 0, 0, 0, 1))
    assert(Watermarker.packBits(bits.toIndexedSeq, 8) == "A")
    // 12 available bits, 16 requested ⇒ only 1 whole byte
    assert(Watermarker.packBits((bits ++ Array(1, 0, 1, 1)).toIndexedSeq, 16) == "A")
    // fewer rows than the payload needs ⇒ truncated extract
    val few = DeterministicGen.persons(spark, 6, seed = 4) // 12 bits capacity
    val watermarked = Watermarker.embed(few, "XY", "salary", Seq("id"))
    val extracted = Watermarker.extract(watermarked, 2, "salary", Seq("id"))
    assert(extracted == "X")
  }

  test("embed_bits uses round-half-even like Python round (watermark.py:7)") {
    import spark.implicits._
    val df = Seq((0L, 2.5), (1L, 3.5), (2L, -2.5)).toDF("id", "v")
    val out = df.select(col("id"),
      Watermarker.embedBitsExpr(col("v"), lit(0), lit(0)).as("e"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // Python: int(round(2.5))=2 → 2&~3=0 ; int(round(3.5))=4 ; int(round(-2.5))=-2 → -4
    assert(out(0L) == 0.0 && out(1L) == 4.0 && out(2L) == -4.0)
  }

  test("per-turn ts watermark: round-trip per conversation, text untouched") {
    val spec = TranscriptSpec(nConvs = 8, turnsPerConv = 20, seed = 13)
    val df = DeterministicGen.transcripts(spark, spec)
    val wm = "WM01" // 32 bits ⇒ needs 16 turns per conversation
    val embedded = Watermarker.embedTurnTs(df, wm)
    // per-turn text equality invariant (BASELINE.json input_hint)
    assert(embedded.select("conv_id", "turn_idx", "text")
      .exceptAll(df.select("conv_id", "turn_idx", "text")).count() == 0)
    // ts perturbed by ≤ 3 microseconds
    val delta = embedded.alias("e").join(df.alias("r"), Seq("conv_id", "turn_idx"))
      .agg(max(abs(unix_micros(col("e.ts")) - unix_micros(col("r.ts")))))
      .collect()(0).getLong(0)
    assert(delta <= 3L)
    // every conversation independently yields the watermark
    val verified = Watermarker.verifyTurnTsPerConv(embedded, wm)
    assert(verified.count() == 8)
    assert(verified.filter(col("verified")).count() == 8)
    // wrong expectation fails
    assert(Watermarker.verifyTurnTsPerConv(embedded, "XX99")
      .filter(col("verified")).count() == 0)
  }

  test("tamper detection: perturbing a single carrier flips verification") {
    // batch path: +1 on one early carrier value flips an embedded bit
    val records = DeterministicGen.persons(spark, 20, seed = 42)
    val watermarked = Watermarker.embed(records, "WM01", "salary", Seq("id"))
    val tampered = watermarked.withColumn("salary",
      when(col("id") === 0, col("salary") + 1).otherwise(col("salary")))
    assert(!Watermarker.verify(tampered, "WM01", "salary", Seq("id")).verified)

    // per-turn path: a 1µs nudge on ONE turn of ONE conversation breaks
    // only that conversation's verification
    val spec = TranscriptSpec(nConvs = 4, turnsPerConv = 20, seed = 13)
    val embedded = Watermarker.embedTurnTs(
      DeterministicGen.transcripts(spark, spec), "WM01")
    val tamperedTs = embedded.withColumn("ts",
      when(col("conv_id") === "conv-000000" && col("turn_idx") === 3,
        timestamp_micros(unix_micros(col("ts")) + 1)).otherwise(col("ts")))
    val v = Watermarker.verifyTurnTsPerConv(tamperedTs, "WM01")
    assert(v.filter(col("verified")).count() == 3)
    assert(v.filter(!col("verified")).select("conv_id").collect()
      .map(_.getString(0)).toSeq == Seq("conv-000000"))
  }

  test("per-turn extraction truncates for short conversations") {
    val spec = TranscriptSpec(nConvs = 3, turnsPerConv = 6, seed = 13) // 12 bits
    val df = DeterministicGen.transcripts(spark, spec)
    val embedded = Watermarker.embedTurnTs(df, "XY")
    val ex = Watermarker.extractTurnTsPerConv(embedded, 2).collect()
    assert(ex.length == 3)
    assert(ex.forall(_.getAs[String]("extracted") == "X"))
  }
}
