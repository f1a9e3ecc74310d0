package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Keyed table diff — the audit operator behind every migration /
  * backfill / SCD review: classify each key as added, removed, or
  * changed between two versions of a table.
  */
object TableDiff {

  /** Per-key status between `before` and `after`: `added` (key only
    * in after), `removed` (only in before), `changed` (present in
    * both, any SHARED non-key column differs — null-safe, so
    * null↔value transitions count as changes), `unchanged` (kept
    * only when `includeUnchanged`). Columns present in only one
    * side are ignored (schema evolution is not a row change).
    *
    * Scale shape: ONE key-keyed full-outer join; change detection is
    * a narrow projection of null-safe comparisons — no hashing, no
    * string casts, engine-exact on every type. */
  def diff(before: DataFrame, after: DataFrame, keyCols: Seq[String],
      includeUnchanged: Boolean = false): DataFrame = {
    require(keyCols.nonEmpty, "need at least one key column")
    val common = before.columns.filter(after.columns.contains(_)).toSeq
    require(keyCols.forall(common.contains),
      s"key columns ${keyCols.mkString(",")} must exist on both sides")
    val valCols = common.filterNot(keyCols.contains)
    val b = before
      .select((keyCols.map(col) :+ lit(true).as("__in_b")) ++
        valCols.map(c => col(c).as(s"__b_$c")): _*)
    val a = after
      .select((keyCols.map(col) :+ lit(true).as("__in_a")) ++
        valCols.map(c => col(c).as(s"__a_$c")): _*)
    val changed = valCols
      .map(c => !(col(s"__b_$c") <=> col(s"__a_$c")))
      .reduceOption(_ || _).getOrElse(lit(false))
    val status = when(col("__in_b").isNull, lit("added"))
      .when(col("__in_a").isNull, lit("removed"))
      .when(changed, lit("changed"))
      .otherwise(lit("unchanged"))
    val out = b.join(a, keyCols, "full_outer")
      .select(keyCols.map(col) :+ status.as("status"): _*)
    if (includeUnchanged) out
    else out.filter(col("status") =!= "unchanged")
  }
}
