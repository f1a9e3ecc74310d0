package graft.tools

import org.apache.spark.sql.SparkSession

/** Perf-diagnosis main: split a gate query's wall time into plan-build
  * vs execution, print the formatted physical plan. Usage:
  *   runMain graft.tools.PlanProbe <sfDir> <queryName> [passes]
  * Each pass builds a FRESH DataFrame (reusing one re-times shuffle
  * reuse, not the query — the Bench lesson). */
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0); val name = args(1)
    val passes = if (args.length > 2) args(2).toInt else 3
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .appName("graft-probe")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val q = graft.Queries.all.find(_.name == name)
      .getOrElse(sys.error(s"unknown query $name"))
    for (i <- 1 to passes) {
      val t0 = System.nanoTime()
      val df = q.run(spark, dir)
      val t1 = System.nanoTime()
      df.queryExecution.executedPlan
      val t2 = System.nanoTime()
      df.queryExecution.toRdd.count()
      val t3 = System.nanoTime()
      println(f"pass $i: build ${(t1 - t0) / 1e9}%.3f s  " +
        f"plan ${(t2 - t1) / 1e9}%.3f s  exec ${(t3 - t2) / 1e9}%.3f s")
    }
    println(q.run(spark, dir).queryExecution.explainString(
      org.apache.spark.sql.execution.SimpleMode))
    spark.stop()
  }
}
