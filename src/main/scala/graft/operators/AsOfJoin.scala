package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Point-in-time (as-of) join — an operator Spark lacks natively.
  *
  * Built by composition (preference (a) of the custom-operator ladder):
  * tag left/right rows, union them, and take per key the last non-null
  * right payload at-or-before each left row's time via a single
  * running window. Cost: ONE shuffle on the join key + one sorted
  * window pass — no range explode, no per-row subquery, no driver
  * loop; this is the shape that survives 100 TB (a billion left rows
  * shuffle once, exactly like a regular join on the same key).
  *
  * Right rows must be unique per (key, time) — pre-aggregate otherwise
  * (ties would make the winner nondeterministic).
  */
object AsOfJoin {

  /** For each left row: columns of `left` plus `rightPayload` columns
    * from the latest right row with rightTime <= leftTime on the same
    * key. Inner semantics: left rows with no prior right row are
    * dropped (use the returned frame's complement for the anti set). */
  def asOf(left: DataFrame, leftKey: String, leftTime: String,
      right: DataFrame, rightKey: String, rightTime: String,
      rightPayload: Seq[String]): DataFrame = {
    val payloadType = org.apache.spark.sql.types.StructType(
      rightPayload.map(c => right.schema(c)))
    val leftRowType = org.apache.spark.sql.types.StructType(
      left.schema.fields)

    val lAligned = left.select(
      col(leftKey).cast("long").as("__k"), col(leftTime).as("__t"),
      lit(1).as("__tag"),
      struct(left.columns.map(col).toSeq: _*).as("__lrow"),
      lit(null).cast(payloadType).as("__payload"))
    val rAligned = right.select(
      col(rightKey).cast("long").as("__k"), col(rightTime).as("__t"),
      lit(0).as("__tag"),
      lit(null).cast(leftRowType).as("__lrow"),
      struct(rightPayload.map(col): _*).as("__payload"))

    // right rows sort BEFORE left rows at equal time (tag 0 < 1), so
    // the inequality is inclusive: rightTime <= leftTime.
    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__t"), col("__tag"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    lAligned.unionAll(rAligned)
      .withColumn("__match", last(col("__payload"), ignoreNulls = true).over(w))
      .filter(col("__tag") === 1 && col("__match").isNotNull)
      .select(col("__lrow.*") +: rightPayload.map(c => col(s"__match.$c")): _*)
  }
}
