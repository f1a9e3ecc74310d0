package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Interval (range) join — `left.time ∈ [right.start, right.end]`,
  * optionally with an extra equi-key. Spark plans a raw range
  * predicate as a broadcast-nested-loop or cartesian join: O(|L|·|R|)
  * comparisons and, at 100 TB, a non-starter. The classic scalable
  * shape is BUCKETIZATION: quantize time into fixed-width buckets,
  * explode each right interval to the buckets it covers, equi-join on
  * (key, bucket), then apply the exact range filter. The join becomes
  * a hash shuffle on (key, bucket); work is proportional to true
  * candidate volume (pairs sharing a bucket), not |L|·|R|. Each left
  * row lives in exactly ONE bucket, so a (left, right) pair meets at
  * most once — no post-join dedup needed.
  *
  * Pick `bucketWidth` ≈ the typical interval length: wider buckets cut
  * the explode factor, narrower buckets cut false candidates; both
  * extremes degrade gracefully, never incorrectly. */
object RangeJoin {

  /** `left` rows matched to every `right` interval containing their
    * instant (inclusive bounds), on an equi-key. Times are epoch
    * seconds (cast timestamps with unix_timestamp first).
    *
    * Output: left columns + `rightPayload` columns, inner semantics. */
  def intervalJoin(
      left: DataFrame, leftKey: String, leftTimeSec: String,
      right: DataFrame, rightKey: String, startSec: String, endSec: String,
      rightPayload: Seq[String], bucketWidthSec: Long): DataFrame = {
    val lb = left.withColumn("__bucket",
      floor(col(leftTimeSec) / bucketWidthSec))
    val rb = right
      .withColumn("__bucket",
        explode(sequence(floor(col(startSec) / bucketWidthSec),
          floor(col(endSec) / bucketWidthSec))))
      .select((Seq(col(rightKey).as("__rk"), col("__bucket"),
        col(startSec).as("__start"), col(endSec).as("__end")) ++
        rightPayload.map(col)): _*)
    lb.join(rb,
      lb(leftKey) === rb("__rk") && lb("__bucket") === rb("__bucket") &&
        lb(leftTimeSec) >= rb("__start") && lb(leftTimeSec) <= rb("__end"))
      .select(left.columns.map(lb(_)) ++ rightPayload.map(rb(_)): _*)
  }
}
