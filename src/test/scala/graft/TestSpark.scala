package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for all suites (forked test JVM). */
object TestSpark {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[8]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    // Same known-benign flood silencing as the bench harness (r19,
    // verdict item 8): the bounded global windows (banded ranks,
    // llm.Stats) fire a WindowExec "No Partition Defined" warning per
    // operator execution — thousands of lines that drown the driver's
    // bounded test-output tail. Known-bounded by construction;
    // test-harness-level only.
    Bench.quietKnownLogFloods()
    s
  }
  val sfDir = "/root/testdata/sf0.001"
}
