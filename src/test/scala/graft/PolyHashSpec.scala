package graft

import org.apache.spark.sql.functions._
import graft.expressions.PolyHashFunctions._

/** The codegen'd PolyHash/TokenPolyHashes/SimHash16 expressions must be
  * value-identical to the round-1 higher-order-function formulations they
  * replace (which are also what the DuckDB oracle SQL still states) —
  * including the edge cases ADVICE r1 flagged: empty string, consecutive
  * spaces (empty tokens), trailing space, and non-ASCII code points.
  */
class PolyHashSpec extends SparkSpec {
  import spark.implicits._

  // The replaced round-1 formulations, verbatim.
  private def oldTokenHashSql(t: String): String =
    s"aggregate(sequence(1, length($t)), 0L, (acc, i) -> (acc * 31 + ascii(substring($t, i, 1))) % 1000000007L)"
  private val oldTokenHashes =
    expr(s"transform(split(text, ' '), t -> ${oldTokenHashSql("t")})")
  private val oldFingerprint = expr(oldTokenHashSql("text"))
  private val oldSimhash = expr(
    """aggregate(
      |  transform(sequence(0, 15), b ->
      |    CASE WHEN aggregate(hs, 0L,
      |           (acc, h) -> acc + CASE WHEN ((h >> b) & 1) = 1 THEN 1 ELSE -1 END) > 0
      |         THEN shiftleft(1L, b) ELSE 0L END),
      |  0L, (acc, x) -> acc + x)""".stripMargin)

  private val samples = Seq(
    "the quick brown fox jumps over the lazy dog",
    "",
    " ",
    "  double  spaces  ",
    "single",
    "trailing space ",
    " leading",
    "punctuation, and. marks! 123-45-6789",
    "unicode: héllo wörld çà ñ",
    "mixed ascii ünïcode tøkens",
    "a b c d e f g h i j k l m n o p",
    (1 to 200).map(i => s"tok$i").mkString(" "))

  private lazy val df = samples.zipWithIndex
    .map { case (t, i) => (i.toLong, t) }.toDF("id", "text")

  test("PolyHash matches the HOF char-code fold (incl. empty + unicode)") {
    val rows = df
      .select(col("id"), polyHash(col("text")).as("nw"), oldFingerprint.as("old"))
      .collect()
    rows.foreach(r =>
      assert(r.getLong(1) == r.getLong(2), s"id=${r.getLong(0)}"))
  }

  test("TokenPolyHashes matches split+fold per token (incl. empty tokens)") {
    val rows = df
      .select(col("id"), tokenPolyHashes(col("text")).as("nw"), oldTokenHashes.as("old"))
      .collect()
    rows.foreach { r =>
      assert(r.getSeq[Long](1) == r.getSeq[Long](2), s"id=${r.getLong(0)}")
    }
  }

  test("SimHash16 matches the 16-pass HOF aggregate") {
    val rows = df
      .withColumn("hs", tokenPolyHashes(col("text")))
      .select(col("id"), simHash16(col("hs")).as("nw"), oldSimhash.as("old"))
      .collect()
    rows.foreach(r =>
      assert(r.getLong(1) == r.getLong(2), s"id=${r.getLong(0)}"))
  }

  test("PolyHash known values (hand-computed polynomial)") {
    def ref(s: String): Long =
      s.codePoints().toArray.foldLeft(0L)((a, c) => (a * 31 + c) % 1000000007L)
    val got = df.select(col("text"), polyHash(col("text"))).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    samples.foreach(s => assert(got(s) == ref(s), s"sample '$s'"))
  }

  test("randomized parity vs JVM reference (fixed seed, mixed alphabets)") {
    val rnd = new scala.util.Random(20260816L)
    val alphabets = Seq(
      "abcdefghijklmnopqrstuvwxyz ",
      "abc   ",
      "aé⊕1 ",
      ('a' to 'z').mkString + "0123456789 .,!?@-")
    val strs = (1 to 200).map { _ =>
      val a = alphabets(rnd.nextInt(alphabets.length))
      val n = rnd.nextInt(80)
      (1 to n).map(_ => a(rnd.nextInt(a.length))).mkString
    }
    def refHash(s: String): Long =
      s.codePoints().toArray.foldLeft(0L)((acc, c) => (acc * 31 + c) % 1000000007L)
    def refTokens(s: String): Seq[Long] = {
      // split on single space, KEEPING empty tokens (split limit -1)
      s.split(" ", -1).toSeq.map(refHash)
    }
    val rows = strs.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
      .select(col("text"), polyHash(col("text")).as("h"),
        tokenPolyHashes(col("text")).as("hs"))
      .collect()
    rows.foreach { r =>
      val t = r.getString(0)
      assert(r.getLong(1) == refHash(t), s"polyHash('$t')")
      assert(r.getSeq[Long](2) == refTokens(t), s"tokenPolyHashes('$t')")
    }
  }

  test("expressions participate in whole-stage codegen") {
    // spark.range (not a local Seq, which folds to LocalTableScan)
    val d = spark.range(100).select(concat(lit("tok "), col("id")).as("text"))
    val plan = d.select(polyHash(col("text")), simHash16(tokenPolyHashes(col("text"))))
      .queryExecution.executedPlan.toString
    // "*(1)" marks operators fused into a WholeStageCodegen stage
    assert(plan.linesIterator.next().startsWith("*("), plan)
  }
}
