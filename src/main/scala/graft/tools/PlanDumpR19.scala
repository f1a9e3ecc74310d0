package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-19 plan capture: writes `plans/r19/<query>_<tag>.txt` with the
  * `explain("formatted")` output of each named query, for the
  * before/after evidence the optimization round commits. For the
  * loan-pattern dedup operators (which materialize eagerly inside the
  * query function, so the returned frame's plan is just a cache scan)
  * the dump is the INTERNAL lazy plan (`materialize = false`). Usage:
  *   runMain graft.tools.PlanDumpR19 <sfDir> <tag> <query>[,query...]
  * Dev tool — not part of the driver contract. */
object PlanDumpR19 {
  def main(args: Array[String]): Unit = {
    val dir = args(0); val tag = args(1)
    val names = args(2).split(",").map(_.trim).filter(_.nonEmpty)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", s"${64L * 1024 * 1024}")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.sources.Tables
    def t(n: String): DataFrame = Tables.load(spark, dir, n)

    /** Internal lazy frames for the loan-pattern operators; every other
      * query dumps the frame it returns. */
    def internal(name: String): Option[(String, DataFrame)] = name match {
      case "q278_set_sim_join" => Some((
        "internal lazy plan: Dedup.setSimJoinPairs(documents, doc_id, text, 0.5, materialize = false)",
        graft.llm.Dedup.setSimJoinPairs(t("documents"), "doc_id", "text",
          threshold = 0.5, materialize = false)))
      case "q262_bbit_minhash" => Some((
        "internal lazy plan: Dedup.bbitJaccardEst(documents, doc_id, text, materialize = false)",
        graft.llm.Dedup.bbitJaccardEst(t("documents"), "doc_id", "text",
          materialize = false)))
      case "q256_blocked_dedup" => Some((
        "internal lazy plan: Dedup.blockedDedupPairs(documents, doc_id, text, materialize = false)",
        graft.llm.Dedup.blockedDedupPairs(t("documents"), "doc_id", "text",
          materialize = false)))
      case _ => None
    }

    new java.io.File("plans/r19").mkdirs()
    for (name <- names) {
      val (note, df) = internal(name).getOrElse(
        ("returned frame", graft.Queries.queries(name)(spark, dir)))
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      val w = new java.io.PrintWriter(
        new java.io.File(s"plans/r19/${name}_$tag.txt"), "UTF-8")
      try {
        w.println(s"# $name ($tag) — $note")
        w.println(s"# sfDir=$dir  cpus=${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}")
        w.println(txt)
      } finally w.close()
      println(s"wrote plans/r19/${name}_$tag.txt")
    }
    spark.stop()
  }
}
