package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) data layout for multi-dimensional file
  * skipping — the write-time clustering move (Delta Lake `OPTIMIZE
  * ZORDER BY`, public algorithm: Morton 1966) that makes predicates on
  * ANY of the clustered columns prune files at read time.
  *
  * Why it matters at 100 TB: a sort on one column gives tight per-file
  * min/max ranges for that column only — a filter on any other column
  * reads every file. Interleaving the bits of several columns' ranks
  * gives every file a tight range on ALL clustered dimensions at once,
  * so parquet footer min/max (and any catalog file-stats index) skip
  * the complement of a point/range predicate on any clustered column.
  * Pruning happens before I/O; the win grows linearly with data size.
  *
  * Shape: ONE stats pass (min/max per column — or caller-provided
  * bounds, e.g. from table metadata), then a single range
  * repartition + within-partition sort on the interleaved key. The
  * z-value itself is a pure `Column` composition (shifts/masks), fully
  * codegen'd, zero extra shuffle beyond the one the clustered write
  * inherently needs.
  */
object ZOrderLayout {

  /** Morton-interleave the low `bits` bits of pre-normalized
    * non-negative long columns: result bit (b*n + c) = bit b of
    * column c. Total bits must fit a long. */
  def interleave(norm: Seq[Column], bits: Int): Column = {
    require(norm.nonEmpty && norm.size * bits <= 63,
      s"${norm.size} cols x $bits bits must be <= 63")
    val n = norm.size
    val terms = for {
      b <- 0 until bits
      c <- 0 until n
    } yield shiftleft(shiftright(norm(c), b).bitwiseAND(lit(1L)), b * n + c)
    terms.reduce(_.bitwiseOR(_))
  }

  /** Normalize a numeric column into [0, 2^bits) given bounds.
    * Values outside [lo, hi] clamp to the range edges — bounds may
    * come from stale table stats without corrupting the curve. */
  def normalize(c: Column, lo: Double, hi: Double, bits: Int): Column = {
    val span = math.max(hi - lo, java.lang.Double.MIN_NORMAL)
    val maxV = (1L << bits) - 1
    least(greatest(
      floor((c.cast("double") - lo) / span * maxV).cast("long"),
      lit(0L)), lit(maxV))
  }

  /** Z-value for `cols` with bounds discovered in one aggregation
    * pass. Returns (zColumn, bounds) so callers can reuse/record the
    * bounds (at scale these come from table-level stats, not a scan).
    */
  def zvalueWithStats(df: DataFrame, cols: Seq[String],
      bits: Int = 16): (Column, Map[String, (Double, Double)]) = {
    val aggs = cols.flatMap(c =>
      Seq(min(col(c).cast("double")).as(s"${c}__lo"),
        max(col(c).cast("double")).as(s"${c}__hi")))
    val row = df.agg(aggs.head, aggs.tail: _*).collect()(0)
    val bounds = cols.map(c => c ->
      (row.getAs[Double](s"${c}__lo"), row.getAs[Double](s"${c}__hi"))).toMap
    val z = interleave(
      cols.map(c => normalize(col(c), bounds(c)._1, bounds(c)._2, bits)), bits)
    (z, bounds)
  }

  /** Cluster-write: range-repartition on the z-value into
    * `numFiles` output files, sort within each partition, write
    * parquet. Each file then covers a compact z-range — a compact
    * hyper-rectangle-ish region of the clustered dimensions — so its
    * footer min/max are tight on every clustered column. */
  def clusteredWrite(df: DataFrame, cols: Seq[String], path: String,
      numFiles: Int, bits: Int = 16): Map[String, (Double, Double)] = {
    val (z, bounds) = zvalueWithStats(df, cols, bits)
    df.withColumn("__z", z)
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(path)
    bounds
  }

  /** Clustering-quality report: per-file min/max span of each
    * clustered column, normalized by the global span — the fraction
    * of the value domain a file covers, i.e. the expected fraction of
    * files a uniform point predicate on that column must read. A
    * random layout scores ~1.0 per dimension; a single-column sort
    * scores ~1/numFiles on that column and ~1.0 elsewhere; z-order
    * scores well below 1 on every clustered column simultaneously. */
  def layoutQuality(df: DataFrame, cols: Seq[String]): DataFrame = {
    val fileAggs = cols.flatMap(c => Seq(
      min(col(c).cast("double")).as(s"${c}__lo"),
      max(col(c).cast("double")).as(s"${c}__hi")))
    val globalAggs = cols.flatMap(c => Seq(
      min(col(c).cast("double")).as(s"${c}__glo"),
      max(col(c).cast("double")).as(s"${c}__ghi")))
    val perFile = df.withColumn("__file", input_file_name())
      .groupBy("__file")
      .agg(fileAggs.head, fileAggs.tail: _*)
    val globals = df.agg(globalAggs.head, globalAggs.tail: _*)
    perFile.crossJoin(broadcast(globals))
      .select(col("__file") +: cols.map(c =>
        ((col(s"${c}__hi") - col(s"${c}__lo")) /
          greatest(col(s"${c}__ghi") - col(s"${c}__glo"),
            lit(java.lang.Double.MIN_NORMAL)))
          .as(s"${c}__span_frac")): _*)
  }
}
