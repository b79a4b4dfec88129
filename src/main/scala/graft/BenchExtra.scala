package graft

/** Builder-side targeted benchmark (guide §1.4): times a SUBSET of
  * `SparkEntry.queries` with exactly the frozen Bench part-1 methodology
  * (same session config, same noop sink, same clearCache between
  * queries), repeated N times, reporting per-query min. Never used by the
  * driver — `graft.Bench` stays the recorded surface; this exists so a
  * single operator can be A/B'd in minutes instead of re-running all 67.
  *
  * Usage:
  *   SPARK_GRAFT_SF_DIR=... SPARK_GRAFT_CPUS=32 SPARK_GRAFT_EXTRA_RUNS=3 \
  *     sbt 'runMain graft.BenchExtra queryA queryB ...'
  */
object BenchExtra {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4").toInt
    val runs = sys.env.getOrElse("SPARK_GRAFT_EXTRA_RUNS", "3").toInt
    require(args.nonEmpty, "pass query names")
    val spark = Bench.session(cpus)
    // same warm-up as Bench part 1
    spark.read.parquet(s"$sfDir/region.parquet").count()
    spark.range(10).selectExpr("aggregate(sequence(0, 3), 0L, (a, x) -> a + x)").count()
    val best = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    for (r <- 1 to runs; name <- args) {
      val fn = SparkEntry.queries(name)
      val t0 = System.nanoTime()
      try fn(spark, sfDir).write.mode("overwrite").format("noop").save()
      catch { case e: Throwable => System.err.println(s"[extra] $name: $e") }
      finally spark.catalog.clearCache()
      val sec = (System.nanoTime() - t0) / 1e9
      System.err.println(f"[extra] run $r $name $sec%.3f s")
      best.updateWith(name)(p => Some(math.min(p.getOrElse(Double.MaxValue), sec)))
    }
    val qs = best.map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    println(s"""{"bench_extra":true,"runs":$runs,"queries_min":$qs}""")
    Bench.quiesceStreamingState()
    spark.stop()
  }
}
