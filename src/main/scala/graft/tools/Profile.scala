package graft.tools

import org.apache.spark.sql.SparkSession

/** Ad-hoc profiling entry: time one named query N times and print the
  * formatted physical plan (dev tool; not part of the driver contract). */
object Profile {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val reps = if (args.length > 2) args(2).toInt else 3
    val spark = SparkSession.builder()
      .master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fn = graft.SparkEntry.queries(name)
    for (i <- 1 to reps) {
      val t0 = System.nanoTime()
      val n = fn(spark, dir).count()
      println(f"[profile] $name run $i: ${(System.nanoTime() - t0) / 1e9}%.2fs rows=$n")
    }
    if (args.length > 3 && args(3) == "explain")
      fn(spark, dir).explain("formatted")
    spark.stop()
  }
}
