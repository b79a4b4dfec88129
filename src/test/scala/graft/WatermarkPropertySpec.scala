package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.apache.spark.sql.functions._
import graft.gen.DeterministicGen
import graft.gen.DeterministicGen.TranscriptSpec
import graft.watermark.Watermarker

/** ScalaCheck-generated property tests (SURVEY.md §5.2.2): ∀ printable-
  * ASCII watermarks and sufficiently large datasets —
  *  - embed → extract round-trips;
  *  - the carrier changes by ≤ 3 from its rounded value;
  *  - every non-carrier column is byte-identical;
  *  - per-turn transcript variant round-trips per conversation with
  *    `text` untouched;
  *  - under-capacity datasets truncate extraction to whole bytes.
  *
  * (Generators sampled with fixed seeds — the scalatest/scalacheck bridge
  * artifact is not in the offline cache.)
  */
class WatermarkPropertySpec extends SparkSpec {

  private val wmGen: Gen[String] =
    Gen.chooseNum(1, 10).flatMap(n => Gen.stringOfN(n, Gen.choose(' ', '~')))

  private def samples[T](g: Gen[T], n: Int): Seq[T] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))

  private lazy val carrier200 = DeterministicGen.persons(spark, 200, seed = 8)

  test("∀ watermark: batch embed → extract round-trip; bounded carrier delta; other columns identical") {
    samples(wmGen, 12).foreach { wm =>
      val watermarked = Watermarker.embed(carrier200, wm, "salary", Seq("id"))
      assert(Watermarker.extract(watermarked, wm.length, "salary", Seq("id")) == wm,
        s"round-trip failed for ${wm.map(_.toInt)}")
      val joined = carrier200.select(col("id"), bround(col("salary")).as("o"))
        .join(watermarked.select(col("id"), col("salary").as("w")), "id")
      assert(joined.agg(max(abs(col("o") - col("w")))).collect()(0).getDouble(0) <= 3.0)
      assert(carrier200.drop("salary")
        .exceptAll(watermarked.drop("salary")).count() == 0)
    }
  }

  test("∀ watermark: per-turn transcript round-trip per conversation, text equality") {
    val turns = DeterministicGen.transcripts(
      spark, TranscriptSpec(nConvs = 3, turnsPerConv = 40, seed = 9))
    samples(wmGen, 8).foreach { wm =>
      val embedded = Watermarker.embedTurnTs(turns, wm)
      assert(embedded.select("conv_id", "turn_idx", "text")
        .exceptAll(turns.select("conv_id", "turn_idx", "text")).count() == 0)
      val verified = Watermarker.verifyTurnTsPerConv(embedded, wm)
      assert(verified.filter(col("verified")).count() == 3,
        s"per-conv verify failed for ${wm.map(_.toInt)}")
    }
  }

  test("∀ non-ASCII watermark: verification fails — in the engine AND in the reference's own arithmetic") {
    // The reference sizes extraction by the CHARACTER count of the
    // expected string (watermark.py:73) while the embedded bit stream is
    // the UTF-8 BYTE stream (watermark.py:29-33) — for any multi-byte
    // payload both the reference and this engine (Watermarker.verify,
    // which mirrors it) extract too few bytes and fail verification.
    // This test PINS that divergence so an accidental "fix" on one side
    // breaks parity loudly instead of silently.
    val nonAsciiGen: Gen[String] = for {
      pre <- Gen.stringOfN(2, Gen.choose('A', 'Z'))
      nb <- Gen.oneOf('é', 'Ω', 'λ', 'ü', '中')
    } yield pre + nb
    samples(nonAsciiGen, 8).foreach { wm =>
      assert(wm.getBytes("UTF-8").length > wm.length, s"fixture must be multi-byte: $wm")
      val watermarked = Watermarker.embed(carrier200, wm, "salary", Seq("id"))
      val report = Watermarker.verify(watermarked, wm, "salary", Seq("id"))
      assert(!report.verified, s"multi-byte payload must fail verification: $wm")
      // the reference's arithmetic, restated: chars * 8 bits → whole bytes
      // of the UTF-8 stream = a strict PREFIX of the payload bytes, which
      // can never re-encode to the full expected string
      val prefixBytes = wm.getBytes("UTF-8").take(wm.length)
      assert(new String(prefixBytes.map(b => (b & 0xff).toChar)) != wm)
      // full-byte-length extraction DOES round-trip (the divergence is the
      // sizing, not the codec)
      val full = Watermarker.extract(
        watermarked, wm.getBytes("UTF-8").length, "salary", Seq("id"))
      assert(full.toCharArray.map(_.toInt & 0xff).toSeq ==
        wm.getBytes("UTF-8").map(_ & 0xff).toSeq)
    }
  }

  test("∀ dataset size below capacity: extraction truncates to whole recoverable bytes") {
    samples(Gen.chooseNum(0, 12), 13).distinct.foreach { n =>
      val few = DeterministicGen.persons(spark, n.toLong, seed = 3)
      val wm = "ABC" // needs 12 rows
      val watermarked = Watermarker.embed(few, wm, "salary", Seq("id"))
      val extracted = Watermarker.extract(watermarked, wm.length, "salary", Seq("id"))
      val wholeBytes = (n * 2) / 8 // 2 bits per row, whole bytes only
      assert(extracted == wm.take(math.min(wholeBytes, wm.length)), s"n=$n")
    }
  }
}
