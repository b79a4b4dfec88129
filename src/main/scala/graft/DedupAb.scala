package graft

import org.apache.spark.sql.functions._

/** Builder-side A/B (round-3 verdict item 8): exact-dedup group-key cost
  * on LONG documents — the md5-digest key regressed at sf0.1's short
  * docs (digest CPU > shuffle-byte saving there); this measures the
  * regime the digest key was built for. Variants, interleaved rounds:
  *
  *   text  — groupBy(text): the shuffle carries the full document;
  *   md5   — groupBy(md5(text)): 16-byte digest, oracle-expressible;
  *   xx128 — groupBy(xxhash64(text), xxhash64(salt, text)): two 8-byte
  *           hashes (the streaming dedup's 128-bit key shape) — cheapest
  *           CPU, fixed width, collision 2^-128 pairwise; the production
  *           key at scale (md5 stays only where the DuckDB oracle needs
  *           the same function on both sides).
  *
  * Fixture: the sf documents table with text repeated DEDUP_AB_REPEAT
  * times (default 40 ⇒ ~9 KB/doc), 10% planted exact duplicates,
  * materialized to parquet so every variant pays the same scan.
  */
object DedupAb {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val rep = sys.env.getOrElse("DEDUP_AB_REPEAT", "40").toInt
    val rounds = sys.env.getOrElse("DEDUP_AB_ROUNDS", "3").toInt
    val mult = sys.env.getOrElse("DEDUP_AB_MULT", "20").toInt
    val spark = Bench.session(cpus)
    val dir = Bench.benchRoot.resolve("dedup-ab").toString
    // corpus multiplier: `mult` distinct-id copies, each with a distinct
    // per-copy suffix so replicas are NOT duplicates of each other
    val base = spark.read.parquet(s"$sf/documents.parquet")
      .crossJoin(spark.range(mult).select(col("id").as("__copy")))
      .select(
        (col("doc_id") * mult + col("__copy")).as("doc_id"),
        concat(expr(s"repeat(text, $rep)"), lit(" #"), col("__copy")).as("text"))
    // plant exact duplicates: docs with doc_id % 10 == 0 reuse the
    // previous doc's text (same content, different id)
    val prev = base.select((col("doc_id") + 1).as("doc_id"), col("text").as("__pt"))
    val docs = base.join(prev, Seq("doc_id"), "left")
      .select(col("doc_id"),
        when(pmod(col("doc_id"), lit(10)) === 0 && col("__pt").isNotNull, col("__pt"))
          .otherwise(col("text")).as("text"))
    docs.write.mode("overwrite").parquet(dir)
    val t = spark.read.parquet(dir)
    val nDocs = t.count()
    val bytes = t.agg(sum(length(col("text")))).collect()(0).getLong(0)
    println(s"fixture: $nDocs docs, ${bytes / nDocs} B/doc mean, cpus=$cpus")

    def time(name: String, run: () => Unit): Unit = {
      val t0 = System.nanoTime()
      run()
      println(f"  $name%-6s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
    }
    val variants: Seq[(String, () => Unit)] = Seq(
      "text" -> (() => t.groupBy(col("text"))
        .agg(min(col("doc_id")).as("doc_id"), count(lit(1)).as("n"))
        .write.mode("overwrite").format("noop").save()),
      "md5" -> (() => t.groupBy(md5(col("text").cast("binary")).as("__h"))
        .agg(min(col("doc_id")).as("doc_id"), count(lit(1)).as("n"))
        .write.mode("overwrite").format("noop").save()),
      "xx128" -> (() => t.groupBy(
          xxhash64(col("text")).as("__h1"),
          xxhash64(lit("g2"), col("text")).as("__h2"))
        .agg(min(col("doc_id")).as("doc_id"), count(lit(1)).as("n"))
        .write.mode("overwrite").format("noop").save()))
    // warm-up pass (JIT + scan cache), then interleaved measured rounds
    variants.foreach(_._2())
    (1 to rounds).foreach { r =>
      println(s"round $r:")
      variants.foreach { case (n, f) => time(n, f) }
    }
    Bench.deleteRecursively(new java.io.File(dir))
    spark.stop()
  }
}
