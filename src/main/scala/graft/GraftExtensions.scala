package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier

/** SparkSessionExtensions injector for the engine's native Catalyst
  * functions — load with
  * `.config("spark.sql.extensions", "graft.GraftExtensions")`, or register
  * on a live session via [[GraftExtensions.register]].
  * Currently: `graft_rolling_fingerprint(text, k)` (a doGenCode
  * expression — whole-stage-codegen'd, no UDF closure on the hot path). */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("graft_rolling_fingerprint"),
      functions.RollingFingerprint.info,
      functions.RollingFingerprint.builder _))
  }
}

object GraftExtensions {
  /** Idempotent live-session registration (for sessions built without the
    * spark.sql.extensions config — e.g. the driver's Verify/Bench mains). */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("graft_rolling_fingerprint"),
      functions.RollingFingerprint.info,
      functions.RollingFingerprint.builder _)
}
