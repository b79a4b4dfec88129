package graft

import org.apache.spark.sql.functions._
import graft.expressions.WindowStatsAgg

/** Direct unit pin of WindowStatsAgg's window assignment against Spark's
  * own `window(ts, size, slide)` on seeded random rows — tumbling,
  * evenly-dividing slide, and a NON-dividing slide (the general
  * alignment arithmetic). The streaming-level stream≡batch tests cover
  * the end-to-end path; this isolates the expression.
  */
class WindowStatsAggSpec extends SparkSpec {
  import spark.implicits._

  private def fixture(seed: Long, n: Int) = {
    val rnd = new scala.util.Random(seed)
    val base = 1700000000000000L // 2023, micros
    val rows = (1 to n).map { _ =>
      val us = base + (rnd.nextLong(48L * 3600 * 1000000)) // 2 days
      (us, 1 + rnd.nextInt(5000), rnd.nextInt(10) == 0)
    }
    rows.toDF("us", "len", "pii")
      .select(timestamp_micros(col("us")).as("ts"), col("len"), col("pii"))
  }

  private def check(size: String, slide: Option[String], sizeUs: Long, slideUs: Long): Unit = {
    val df = fixture(size.length * 1000 + slideUs, 4000)
    val packed = df
      .agg(WindowStatsAgg.column(col("ts"), col("len"), col("pii"), sizeUs, slideUs).as("m"))
      .collect()(0)
      .getMap[Long, scala.collection.Seq[Long]](0)
      .map { case (ws, a) => ws -> a.toSeq }
    val w = slide.map(s => window(col("ts"), size, s)).getOrElse(window(col("ts"), size))
    val expected = df
      .groupBy(w.as("w"))
      .agg(
        count(lit(1)), min(col("len").cast("long")), max(col("len").cast("long")),
        sum(col("len").cast("long")),
        sum((col("len").cast("long") * col("len"))),
        sum(col("pii").cast("long")))
      .select(unix_micros(col("w.start")), col("*")).drop("w")
      .collect()
      .map(r => r.getLong(0) -> Seq(r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
      .toMap
    assert(packed.keySet == expected.keySet,
      s"window starts diverge ($size/$slide): ${(packed.keySet -- expected.keySet).take(3)} vs ${(expected.keySet -- packed.keySet).take(3)}")
    packed.foreach { case (ws, a) =>
      assert(a == expected(ws), s"stats diverge at window $ws: $a vs ${expected(ws)}")
    }
  }

  test("tumbling assignment equals Spark window()") {
    check("1 hour", None, 3600000000L, 3600000000L)
  }

  test("evenly-dividing slide equals Spark window(size, slide)") {
    check("1 hour", Some("15 minutes"), 3600000000L, 900000000L)
  }

  test("non-dividing slide equals Spark window(size, slide)") {
    check("50 minutes", Some("20 minutes"), 3000000000L, 1200000000L)
  }
}
