package graft

import org.apache.spark.sql.functions._
import graft.ops.TrainingDataOps

/** LexiconCounts must be count-identical to the four regexp_count passes
  * it replaces (which remain the DuckDB oracle formulation) — including
  * boundary cases: punctuation-adjacent words, words embedded in longer
  * tokens (no match), hyphen/underscore/digit boundaries, non-ASCII
  * neighbors, repeated words, empty strings.
  */
class LexiconScanSpec extends SparkSpec {
  import spark.implicits._

  private val samples = Seq(
    "the cat and the dog",
    "der hund und die katze",
    "le chat est la",
    "el perro y los gatos",
    "derder underdog the_word die7 zu",      // embedded ⇒ only 'zu' counts (de)
    "die, der. und! zu?",                    // punctuation boundaries
    "DIE DER the The",                       // already-lowered input contract
    "esté est une-les",                      // é extends the word run (Java \b is Unicode-aware) ⇒ 'esté' is NOT 'est'
    "y y y y y",                             // repeats
    "",
    " ",
    "no signal here at all xyz",
    "is it of to in and the that")

  test("single-pass lexicon counts == four regexp_count passes") {
    val df = samples.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
    // counts: new expression path
    val packed = graft.expressions.LexiconFunctions.lexiconCounts(lower(col("text")))
    val fast = df.select(
      col("id"),
      shiftright(packed, 48).bitwiseAND(lit(0xffffL)).as("de"),
      shiftright(packed, 32).bitwiseAND(lit(0xffffL)).as("fr"),
      shiftright(packed, 16).bitwiseAND(lit(0xffffL)).as("es"),
      packed.bitwiseAND(lit(0xffffL)).as("en")).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // counts: regex reference
    val slowDf = TrainingDataOps.langLexicons.foldLeft(df) { case (d, (lang, re)) =>
      d.withColumn(lang, regexp_count(lower(col("text")), lit(re)).cast("long"))
    }
    val slow = slowDf.select(col("id"), col("de"), col("fr"), col("es"), col("en"))
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    samples.indices.foreach { i =>
      assert(fast(i.toLong) == slow(i.toLong),
        s"sample '${samples(i)}': fast=${fast(i.toLong)} slow=${slow(i.toLong)}")
    }
  }

  test("langId == langIdRegex on the fixture corpus") {
    val df = samples.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val a = TrainingDataOps.langId(df).select("doc_id", "lang_guess").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val b = TrainingDataOps.langIdRegex(df).select("doc_id", "lang_guess").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(a == b)
  }
}
