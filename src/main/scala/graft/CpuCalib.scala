package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Calibration: pure-CPU Spark job (hash chain over range, no I/O, no
  * shuffle) at two parallelism levels — measures the parallel speedup the
  * sandbox VM itself can deliver, the upper bound for any pipeline's
  * scaling efficiency here.
  */
object CpuCalib {
  def run(cpus: Int, n: Long): Double = {
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      // warm
      spark.range(0, n / 10, 1, cpus * 4)
        .select(sum(xxhash64(xxhash64(xxhash64(col("id")))).bitwiseAND(lit(65535L)))).collect()
      val t0 = System.nanoTime()
      spark.range(0, n, 1, cpus * 4)
        .select(sum(xxhash64(xxhash64(xxhash64(xxhash64(xxhash64(col("id")))))).bitwiseAND(lit(65535L))))
        .collect()
      (System.nanoTime() - t0) / 1e9
    } finally spark.stop()
  }

  def main(args: Array[String]): Unit = {
    val n = 4000000000L
    val t8 = Seq.fill(2)(run(8, n)).min
    val t32 = Seq.fill(2)(run(32, n)).min
    println(f"pureCPU: local[8]=$t8%.2f s local[32]=$t32%.2f s speedup=${t8 / t32}%.2f eff=${t8 / t32 / 4}%.3f")
  }
}
