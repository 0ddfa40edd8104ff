package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.TextOps

/** Native Catalyst expressions (graft.functions): parity with the pure
  * twins and UDF-free plan shape. */
class FunctionsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("graft_rolling_fingerprint: native expression == pure-Scala twin, UDF-free plan") {
    GraftExtensions.register(spark)
    GraftExtensions.register(spark) // idempotent re-registration

    val samples = Seq(
      "", "a", "short", "x" * 31, "y" * 32,
      "the quick brown fox jumps over the lazy dog and keeps on running",
      "ünïcode π≈3.14159 — non-ascii content with symbols ™",
      ("word " * 40).trim)
    val df = samples.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")

    for (k <- Seq(4, 32)) {
      val native = df.select(col("id"),
          expr(s"graft_rolling_fingerprint(text, $k)").as("rfp"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      samples.zipWithIndex.foreach { case (t, i) =>
        assert(native(i.toLong) == TextOps.rollingFingerprint(t, k),
          s"mismatch for sample $i at k=$k")
      }
    }

    // the plan must carry the native expression, not a ScalaUDF
    val plan = df.select(expr("graft_rolling_fingerprint(text, 32)"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("UDF"), s"native expression compiled to a UDF:\n$plan")
    assert(plan.contains("graft_rolling_fingerprint"))
  }

  test("graft_rolling_fingerprint: type and arity errors are analysis-time") {
    GraftExtensions.register(spark)
    val df = Seq((1L, "x")).toDF("id", "text")
    intercept[Exception] {
      df.select(expr("graft_rolling_fingerprint(id, 4)")).collect()
    }
    intercept[Exception] {
      df.select(expr("graft_rolling_fingerprint(text)")).collect()
    }
  }
}
