package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** dbt-style generic data tests (unique / not_null / accepted_values /
  * relationships) as engine aggregates — the schema-test surface a
  * dbt project declares per model in YAML, re-expressed as one result
  * frame per run: (tbl, chk, target, failures, pass).
  *
  * Failure semantics match dbt's generic tests exactly:
  *  - not_null: COUNT of rows where the column is null;
  *  - unique: COUNT of VALUES occurring more than once (dbt counts the
  *    group-by-having-count>1 rows, not the excess rows);
  *  - accepted_values: COUNT of rows whose non-null value is outside
  *    the allowed set (nulls are not_null's concern, as in dbt);
  *  - relationships: COUNT of child rows whose non-null key has no
  *    parent (referential orphans).
  *
  * 100 TB shape: not_null + accepted_values for ANY number of columns
  * fold into ONE aggregate scan of the table ([[tableChecks]] —
  * conditional sums, map-side combinable, grouping key none); unique
  * is one hash aggregate on the key (reduce input = distinct count);
  * relationships is one LEFT ANTI join on the key — broadcast when the
  * parent key set is small, co-partitioned otherwise, and only the two
  * key columns move. Severity thresholds (dbt's warn/error) are the
  * caller's cut on `failures`; `pass` is the strict failures == 0.
  */
object DataChecks {

  private val schemaCols = Seq("tbl", "chk", "target", "failures")

  private def finish(df: DataFrame): DataFrame =
    df.withColumn("pass", col("failures") === 0L)

  /** All not_null and accepted_values checks for one table in a SINGLE
    * aggregate pass: one conditional sum per check, zero shuffles
    * beyond the scalar partial-agg combine. */
  def tableChecks(df: DataFrame, table: String,
      notNullCols: Seq[String] = Nil,
      accepted: Map[String, Seq[String]] = Map.empty): DataFrame = {
    require(notNullCols.nonEmpty || accepted.nonEmpty, "no checks given")
    val aggs =
      notNullCols.map(c =>
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"nn__$c")) ++
      accepted.toSeq.map { case (c, vs) =>
        sum(when(col(c).isNotNull && !col(c).isin(vs: _*), 1L).otherwise(0L))
          .as(s"av__$c")
      }
    val row = df.agg(aggs.head, aggs.tail: _*)
    val melted =
      notNullCols.map(c => struct(lit(table).as("tbl"), lit("not_null").as("chk"),
        lit(c).as("target"), coalesce(col(s"nn__$c"), lit(0L)).as("failures"))) ++
      accepted.keys.toSeq.map(c => struct(lit(table).as("tbl"),
        lit("accepted_values").as("chk"), lit(c).as("target"),
        coalesce(col(s"av__$c"), lit(0L)).as("failures")))
    finish(row.select(explode(array(melted: _*)).as("r"))
      .select(schemaCols.map(c => col(s"r.$c")): _*))
  }

  /** unique: values of the (possibly composite) key occurring more
    * than once. One hash aggregate on the key. */
  def unique(df: DataFrame, table: String, cols: Seq[String]): DataFrame = {
    val dups = df.groupBy(cols.map(col): _*)
      .agg(count(lit(1)).as("__n")).filter(col("__n") > 1)
      .agg(count(lit(1)).as("failures"))
    finish(dups.select(lit(table).as("tbl"), lit("unique").as("chk"),
      lit(cols.mkString(",")).as("target"),
      coalesce(col("failures"), lit(0L)).as("failures")))
  }

  /** relationships: child rows whose non-null key has no parent. One
    * left-anti join carrying only the key columns. */
  def relationships(child: DataFrame, childTable: String, childCol: String,
      parent: DataFrame, parentCol: String): DataFrame = {
    val orphans = child.select(col(childCol)).filter(col(childCol).isNotNull)
      .join(parent.select(col(parentCol)).distinct(),
        col(childCol) === col(parentCol), "left_anti")
      .agg(count(lit(1)).as("failures"))
    finish(orphans.select(lit(childTable).as("tbl"),
      lit("relationships").as("chk"),
      lit(s"$childCol -> $parentCol").as("target"),
      coalesce(col("failures"), lit(0L)).as("failures")))
  }

  /** One suite run: union of per-check frames, ordered for stable
    * reporting. Each input frame computes independently (its own
    * scan/join); nothing here adds movement. */
  def suite(checks: Seq[DataFrame]): DataFrame = {
    require(checks.nonEmpty, "empty check suite")
    checks.reduce(_.unionByName(_)).orderBy("tbl", "chk", "target")
  }

  /** dbt source freshness: compare MAX(loaded-at) to an explicit
    * `asOf` (dbt uses the invocation time; passing it in keeps runs
    * replayable) against warn/error staleness windows. A footer-only
    * MAX on a block-sorted or partitioned table — the same O(metadata)
    * read as the ingest watermark. Returns one row:
    * (tbl, max_loaded_at, lag_seconds, status ∈ pass|warn|error). */
  def freshness(df: DataFrame, table: String, loadedAtCol: String,
      asOf: Column, warnAfterSec: Long, errorAfterSec: Long): DataFrame = {
    require(warnAfterSec <= errorAfterSec, "warn window must be <= error window")
    df.agg(max(col(loadedAtCol)).as("max_loaded_at"))
      .select(lit(table).as("tbl"), col("max_loaded_at"),
        (asOf.cast("timestamp").cast("long") -
          col("max_loaded_at").cast("long")).as("lag_seconds"))
      .withColumn("status",
        when(col("max_loaded_at").isNull || col("lag_seconds") > errorAfterSec,
          "error")
          .when(col("lag_seconds") > warnAfterSec, "warn")
          .otherwise("pass"))
  }
}
