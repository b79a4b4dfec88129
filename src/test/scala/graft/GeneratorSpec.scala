package graft

import graft.gen.DeterministicGen
import graft.gen.DeterministicGen.TranscriptSpec

/** Ported generator tests (tests/test_guardian.py:12-29) + the
  * parallelism-invariance contract that replaces Faker's sequential RNG.
  */
class GeneratorSpec extends SparkSpec {

  test("generate_persons: n rows with expected fields and domains") {
    // mirrors test_generate_persons (tests/test_guardian.py:12-18)
    val df = DeterministicGen.persons(spark, 10, seed = 42)
    assert(df.count() == 10)
    val fields = df.schema.fieldNames.toSet
    assert(Set("id", "name", "email", "age", "salary", "city", "country").subsetOf(fields))
    val rows = df.collect()
    assert(rows.forall { r =>
      val age = r.getAs[Int]("age"); val sal = r.getAs[Double]("salary")
      age >= 18 && age <= 90 && sal >= 30000.0 && sal <= 200000.0
    })
    // 2-decimal salary (generator.py:20)
    assert(rows.forall { r =>
      val s = r.getAs[Double]("salary"); (s * 100).round / 100.0 == s
    })
  }

  test("generate_transactions: n rows with expected fields") {
    // mirrors test_generate_transactions (tests/test_guardian.py:20-24)
    val df = DeterministicGen.transactions(spark, 5, seed = 42)
    assert(df.count() == 5)
    val fields = df.schema.fieldNames.toSet
    assert(Set("id", "amount", "currency", "timestamp", "merchant", "category").subsetOf(fields))
    val rows = df.collect()
    assert(rows.forall { r =>
      val a = r.getAs[Double]("amount")
      a >= 1.0 && a <= 10000.0 &&
        Set("USD", "EUR", "GBP", "JPY").contains(r.getAs[String]("currency"))
    })
  }

  test("deterministic under seed, invariant under parallelism") {
    // mirrors test_generate_persons_deterministic (tests/test_guardian.py:26-29),
    // strengthened: identical rows regardless of partitioning.
    val r1 = DeterministicGen.persons(spark, 5, seed = 99).collect().map(_.toString).sorted
    val r2 = DeterministicGen.persons(spark, 5, seed = 99).collect().map(_.toString).sorted
    assert(r1.sameElements(r2))
    val r3 = DeterministicGen.persons(spark, 5, seed = 99)
      .repartition(7).collect().map(_.toString).sorted
    assert(r1.sameElements(r3))
    // different seed ⇒ different data
    val r4 = DeterministicGen.persons(spark, 5, seed = 100).collect().map(_.toString).sorted
    assert(!r1.sameElements(r4))
  }

  test("transcripts: schema, contiguous turn_idx, monotone ts per conversation") {
    val spec = TranscriptSpec(nConvs = 10, turnsPerConv = 12, seed = 7)
    val df = DeterministicGen.transcripts(spark, spec)
    assert(df.count() == spec.totalTurns)
    assert(df.schema.fieldNames.toSeq ==
      Seq("conv_id", "turn_idx", "role", "text", "tool", "ts"))
    val byConv = df.collect().groupBy(_.getAs[String]("conv_id"))
    assert(byConv.size == 10)
    byConv.values.foreach { rows =>
      val sorted = rows.sortBy(_.getAs[Int]("turn_idx"))
      assert(sorted.map(_.getAs[Int]("turn_idx")).toSeq == (0 until 12))
      val ts = sorted.map(_.getAs[java.sql.Timestamp]("ts").getTime)
      assert(ts.zip(ts.tail).forall { case (a, b) => a < b }, "ts monotone in turn_idx")
    }
  }

  test("transcripts: hot-conversation skew knob") {
    val spec = TranscriptSpec(nConvs = 10, turnsPerConv = 5, hotConvs = 2, hotTurns = 50, seed = 7)
    val df = DeterministicGen.transcripts(spark, spec)
    assert(df.count() == 2 * 50 + 8 * 5)
    val counts = df.groupBy("conv_id").count().collect()
      .map(r => r.getAs[String]("conv_id") -> r.getAs[Long]("count")).toMap
    assert(counts("conv-000000") == 50 && counts("conv-000001") == 50)
    assert(counts("conv-000005") == 5)
  }

  test("transcripts: planted PII and duplicate replays") {
    val spec = TranscriptSpec(nConvs = 50, turnsPerConv = 20, piiPermille = 100, seed = 11)
    val df = DeterministicGen.transcripts(spark, spec)
    val nPii = df.filter(org.apache.spark.sql.functions.col("text")
      .rlike("\\d{3}-\\d{2}-\\d{4}")).count()
    assert(nPii > 0 && nPii < spec.totalTurns / 2)

    val dup = DeterministicGen.withDuplicates(df, dupPermille = 100, seed = 11)
    val total = dup.count()
    val distinct = dup.distinct().count()
    assert(total > distinct, "replay duplicates exist")
    assert(distinct == spec.totalTurns, "duplicates are exact row copies")
  }
}
