package graft

import org.apache.spark.sql.functions._

/** Builder-side A/B: exact cross-corpus dedup with vs without the Bloom
  * pre-filter (TrainingDataOps.exactCrossDedup). The plain plan shuffles
  * the ENTIRE new corpus into the anti-join; the bloom plan shuffles only
  * the filter's positives (true dups + ~fpp of the rest), trading one
  * reference pass + a driver-held sketch for the bulk of the shuffle.
  * Fixture: BLOOM_AB_NEW new docs (default 2M) against BLOOM_AB_REF
  * reference docs (default 1M), 2% planted exact dups, both materialized
  * to parquet so each variant pays the same scan. Variants interleaved
  * per round; result counts asserted equal every round.
  */
object BloomAb {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val newN = sys.env.getOrElse("BLOOM_AB_NEW", "2000000").toLong
    val refN = sys.env.getOrElse("BLOOM_AB_REF", "1000000").toLong
    val rounds = sys.env.getOrElse("BLOOM_AB_ROUNDS", "3").toInt
    // document width drives the verdict: the pre-filter saves SHUFFLED
    // BYTES, so its win scales with row width (real corpora ship KB-size
    // docs through the anti-join; 20-byte rows make the bloom pure
    // overhead — measured, see BASELINE.md)
    val pad = sys.env.getOrElse("BLOOM_AB_PAD", "128").toInt
    val spark = Bench.session(cpus)
    val dirN = Bench.benchRoot.resolve("bloom-ab-new").toString
    val dirR = Bench.benchRoot.resolve("bloom-ab-ref").toString
    // body text is a pure function of bodyId (dup rows byte-identical)
    // and the padding is a per-body hash chain — INCOMPRESSIBLE, so the
    // shuffle really carries ~pad*20 bytes per row (a shared constant
    // filler compresses ~50:1 in the lz4 shuffle and silently deletes
    // the byte cost this A/B exists to measure)
    def body(bodyId: org.apache.spark.sql.Column) = concat(
      lit("document body "), bodyId, lit(" "),
      array_join(transform(sequence(lit(0), lit(pad)),
        i => xxhash64(bodyId * 1315423911L + i)), " "))
    spark.range(newN).select(col("id").as("doc_id"),
        body(when(pmod(col("id"), lit(50L)) === 0, pmod(col("id"), lit(refN)))
          .otherwise(col("id") + 3000000000L)).as("text"))
      .write.mode("overwrite").parquet(dirN)
    spark.range(refN).select((col("id") + 2000000000L).as("doc_id"),
        body(col("id")).as("text"))
      .write.mode("overwrite").parquet(dirR)
    val n = spark.read.parquet(dirN)
    val r = spark.read.parquet(dirR)
    // the regime that motivates the pre-filter is a reference KEY SET too
    // big to broadcast (its bloom is ~7x smaller than the 8-byte keys at
    // 1% fpp and lives on the driver, not in the plan): at this fixture's
    // 1M keys AQE would just broadcast the ref side and no shuffle of the
    // new corpus ever happens — so the A/B disables broadcast to measure
    // the shuffle-vs-prefilter trade the big-ref case actually faces.
    val noBroadcast = sys.env.getOrElse("BLOOM_AB_NO_BROADCAST", "1") == "1"
    if (noBroadcast) {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    }
    val meanB = n.agg(avg(length(col("text")))).collect()(0).getDouble(0)
    println(s"fixture: new=$newN ref=$refN cpus=$cpus ~${meanB.toInt} B/doc " +
      s"(2% planted dups, noBroadcast=$noBroadcast)")
    for (round <- 1 to rounds) {
      def time(name: String, bloomItems: Long): Long = {
        val t0 = System.nanoTime()
        val kept = graft.ops.TrainingDataOps
          .exactCrossDedup(n, r, bloomItems = bloomItems, fpp = 0.01)
          .count()
        println(f"  round $round $name%-6s ${(System.nanoTime() - t0) / 1e9}%6.2f s kept=$kept")
        kept
      }
      val plain = time("plain", 0L)
      val bloom = time("bloom", refN)
      require(plain == bloom, s"bloom changed the result: $plain vs $bloom")
    }
    spark.stop()
  }
}
