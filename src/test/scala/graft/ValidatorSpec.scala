package graft

import org.apache.spark.sql.functions._
import graft.gen.DeterministicGen
import graft.model.ColumnSpec
import graft.validate.Validator

/** Validation-report suite — ports tests/test_guardian.py:31-51 plus the
  * reference's edge semantics (empty dataset, n<2, zero variance).
  */
class ValidatorSpec extends SparkSpec {
  import spark.implicits._

  test("validate_dataset on generated persons: valid, record_count") {
    // mirrors test_validate_dataset_persons (tests/test_guardian.py:31-35)
    val records = DeterministicGen.persons(spark, 50, seed = 42)
    val report = Validator.validateAuto(records)
    assert(report.valid)
    assert(report.record_count == 50)
    assert(report.checks.keySet == Set("age", "salary"))
  }

  test("validate_column_distribution: in-range values pass") {
    // mirrors test_validate_column_distribution_valid (tests/test_guardian.py:37-40)
    val df = (10 until 80).map(_.toDouble).toDF("v")
    val r = Validator.validate(df, Seq(ColumnSpec("v", 0, 100)))
    assert(r.valid && r.checks("v").valid)
    assert(r.checks("v").actual_min == 10.0 && r.checks("v").actual_max == 79.0)
  }

  test("validate_column_distribution: out-of-range values fail") {
    // mirrors test_validate_column_distribution_invalid (tests/test_guardian.py:42-45)
    val df = Seq(1000.0, 2000.0, 3000.0).toDF("v")
    val r = Validator.validate(df, Seq(ColumnSpec("v", 0, 10, tolerance = 0.01)))
    assert(!r.valid && !r.checks("v").valid && !r.checks("v").max_ok)
    assert(r.checks("v").min_ok) // min 1000 ≥ 0 − 10·0.01
  }

  test("tolerance boundary math matches validator.py:27-29") {
    // range 100, tol 0.15 ⇒ min ok down to −15, max ok up to 115
    val ok = Validator.validate(Seq(-15.0, 115.0).toDF("v"), Seq(ColumnSpec("v", 0, 100)))
    assert(ok.valid)
    val lo = Validator.validate(Seq(-15.1).toDF("v"), Seq(ColumnSpec("v", 0, 100)))
    assert(!lo.valid && !lo.checks("v").min_ok)
    val hi = Validator.validate(Seq(115.1).toDF("v"), Seq(ColumnSpec("v", 0, 100)))
    assert(!hi.valid && !hi.checks("v").max_ok)
  }

  test("std: sample std-dev with n<2 ⇒ 0.0 (validator.py:10-15)") {
    val one = Seq(5.0).toDF("v").agg(Validator.stdExpr(col("v"))).collect()(0).getDouble(0)
    assert(one == 0.0)
    val s = Seq(2.0, 4.0, 4.0, 4.0, 5.0, 5.0, 7.0, 9.0).toDF("v")
      .agg(Validator.stdExpr(col("v"))).collect()(0).getDouble(0)
    assert(math.abs(s - 2.138089935299395) < 1e-12) // n−1 denominator
  }

  test("correlation: perfectly correlated ⇒ ~1.0 (tests/test_guardian.py:47-51)") {
    val df = Seq((1.0, 2.0), (2.0, 4.0), (3.0, 6.0), (4.0, 8.0), (5.0, 10.0)).toDF("x", "y")
    val c = df.agg(Validator.corrExpr(col("x"), col("y"))).collect()(0).getDouble(0)
    assert(math.abs(c - 1.0) < 0.001)
  }

  test("correlation edge shims: n<2 ⇒ 0.0, zero variance ⇒ 0.0 (validator.py:46,52)") {
    val single = Seq((1.0, 2.0)).toDF("x", "y")
      .agg(Validator.corrExpr(col("x"), col("y"))).collect()(0).getDouble(0)
    assert(single == 0.0)
    val flat = Seq((1.0, 2.0), (1.0, 3.0), (1.0, 4.0)).toDF("x", "y")
      .agg(Validator.corrExpr(col("x"), col("y"))).collect()(0).getDouble(0)
    assert(flat == 0.0)
  }

  test("empty dataset ⇒ invalid with error (validator.py:76-77)") {
    val empty = spark.emptyDataset[Double].toDF("salary")
    val r = Validator.validateAuto(empty)
    assert(!r.valid && r.error.contains("Empty dataset") && r.record_count == 0)
  }

  test("schema-driven dispatch: only present columns are checked (validator.py:82,90)") {
    val df = Seq((25, "x"), (90, "y")).toDF("age", "name")
    val r = Validator.validateAuto(df)
    assert(r.checks.keySet == Set("age"))
    assert(r.valid)
  }

  test("validation verdict is permutation-invariant") {
    val base = DeterministicGen.persons(spark, 200, seed = 5)
    val a = Validator.validateAuto(base)
    val b = Validator.validateAuto(base.orderBy(desc("salary")).repartition(13))
    // verdicts and counts are exactly invariant; mean/std only up to
    // floating-point re-association across partitions
    assert(a.valid == b.valid && a.record_count == b.record_count)
    assert(a.checks.keySet == b.checks.keySet)
    a.checks.foreach { case (k, ca) =>
      val cb = b.checks(k)
      assert(ca.valid == cb.valid && ca.min_ok == cb.min_ok && ca.max_ok == cb.max_ok)
      assert(ca.actual_min == cb.actual_min && ca.actual_max == cb.actual_max)
      assert(math.abs(ca.actual_mean - cb.actual_mean) < 1e-6)
      assert(math.abs(ca.actual_std - cb.actual_std) < 1e-6)
    }
  }

  test("correlation preserved report (validator.py:55-71)") {
    val orig = Seq((1.0, 2.0), (2.0, 4.0), (3.0, 6.1), (4.0, 8.2)).toDF("x", "y")
    val syn = Seq((1.0, 2.2), (2.0, 3.9), (3.0, 6.3), (4.0, 7.8)).toDF("x", "y")
    val r = Validator.correlationPreserved(orig, "x", "y", syn, "x", "y", tolerance = 0.3)
    assert(r.preserved && r.delta <= 0.3)
    assert(math.abs(r.original_correlation - r.synthetic_correlation) == r.delta)
    // anti-correlated synthetic breaks preservation
    val bad = Seq((1.0, 8.0), (2.0, 6.0), (3.0, 4.0), (4.0, 2.0)).toDF("x", "y")
    val r2 = Validator.correlationPreserved(orig, "x", "y", bad, "x", "y", tolerance = 0.3)
    assert(!r2.preserved)
  }
}
