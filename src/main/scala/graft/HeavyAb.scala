package graft

import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Builder-side A/B: heavy-hitter extraction cost at a REALISTIC
  * vocabulary (the sf fixture's 31 distinct tokens cannot separate the
  * plans). Synthetic corpus: DOCS documents × 20 tokens; each position
  * is one of 30 heavy tokens with p = 0.3 (each heavy token ≈ 1% of the
  * corpus) and otherwise a position-unique tail token — so the
  * vocabulary is ~0.7 · 20 · DOCS distinct tokens, the regime where the
  * full-vocabulary shuffle hurts. Variants, interleaved rounds:
  *
  *   full — explode → groupBy(token) over the whole vocabulary (counts
  *          persisted so the total and the filter share one shuffle:
  *          the most charitable full-shuffle formulation);
  *   mg   — TrainingDataOps.heavyHitterTokens: Misra–Gries candidates
  *          + exact counts of candidates only (the tail never shuffles).
  *
  * Both must return the identical 30-token result (asserted per round).
  */
object HeavyAb {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val nDocs = sys.env.getOrElse("HEAVY_AB_DOCS", "1000000").toLong
    val rounds = sys.env.getOrElse("HEAVY_AB_ROUNDS", "3").toInt
    val minFreq = 0.005
    val spark = Bench.session(cpus)
    val dir = Bench.benchRoot.resolve("heavy-ab").toString
    val toks = 20
    spark.range(nDocs).select(
      concat_ws(" ", (0 until toks).map { k =>
        val pos = col("id") * toks + k
        when(pmod(xxhash64(pos), lit(1000L)) < 300,
          concat(lit("hh"), pmod(xxhash64(lit(k), col("id")), lit(30L))))
          .otherwise(concat(lit("t"), pos))
      }: _*).as("text"))
      .write.mode("overwrite").parquet(dir)
    val t = spark.read.parquet(dir)
    println(s"fixture: $nDocs docs x $toks tokens, cpus=$cpus")

    def tokens = t.select(explode(split(col("text"), " ")).as("token"))
      .filter(col("token") =!= "")

    def full(): Set[String] = {
      val counts = tokens.groupBy(col("token")).agg(count(lit(1)).as("cnt"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      try {
        val n = counts.agg(sum(col("cnt"))).head().getLong(0)
        counts.filter(col("cnt") >= math.ceil(minFreq * n).toLong)
          .collect().map(_.getString(0)).toSet
      } finally { counts.unpersist(blocking = true); () }
    }
    def mg(): Set[String] =
      graft.ops.TrainingDataOps.heavyHitterTokens(t, minFreq)
        .collect().map(_.getString(0)).toSet

    def time[A](name: String, run: () => A): A = {
      val t0 = System.nanoTime()
      val a = run()
      println(f"  $name%-4s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
      a
    }
    // warm-up (JIT + scan cache), then interleaved measured rounds
    val w1 = full(); val w2 = mg()
    require(w1 == w2 && w1.size == 30, s"variants disagree: ${w1.size} vs ${w2.size}")
    (1 to rounds).foreach { r =>
      println(s"round $r:")
      val a = time("full", () => full())
      val b = time("mg", () => mg())
      require(a == b, "variants disagree")
    }
    Bench.deleteRecursively(new java.io.File(dir))
    spark.stop()
  }
}
