package graft
import org.apache.spark.sql.{SparkSession, DataFrame}

import graft.catalog.MetricQueryRequest
import graft.planner.MetricPlanner
import graft.catalog.DefaultRegistry

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `entry` runs the flagship minimum slice (SURVEY.md §7.2 slice 0)
  * through the semantic-layer planner; `queries`/`oracleSql` expose the
  * full operator inventory (graft.Queries) for the DuckDB correctness
  * gate.
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    new MetricPlanner(DefaultRegistry.registry).compile(
      spark, "/root/testdata/sf0.001",
      MetricQueryRequest(metrics = Seq("revenue"), savedQuery = Some("revenue_by_month"))).df

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Queries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Queries.oracleSql
}
