package graft

import org.apache.spark.sql.SparkSession

object TestSpark {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      // keep the politeness top-k hash-based with many hosts per task
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "8000000")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
