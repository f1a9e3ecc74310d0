package graft.planner

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Incremental metric maintenance: mergeable partial-aggregate state.
  *
  * The reference recomputes every metric from the full fact table on a
  * 15-minute cron (helix-flow/dags/omni/transactions_dag.py:66 re-runs
  * the whole SELECT each tick). At 100 TB that is an O(history) scan
  * per refresh. The standard warehouse answer is a materialized
  * aggregate maintained incrementally: keep per-(dims, grain) PARTIAL
  * states that form a commutative monoid, fold each new delta batch
  * into the state, and finalize only at read time. Refresh cost becomes
  * O(delta) + a merge shuffle of STATE size (= group cardinality, not
  * row count); the daily fact partition is scanned exactly once ever.
  *
  * Representable measures are the mergeable five of the metric surface
  * (M1): sum / count / avg (derived) / min / max. Percentile metrics
  * are NOT exactly mergeable — the engine keeps those on the recompute
  * path (q123), or approximately as [[Hist]] histogram partials here.
  * Distinct counts merge as HLL sketch partials (union/estimate only)
  * or as [[graft.llm.KmvSketch]] bottom-k partials — same state-table
  * shape, and KMV state additionally answers OVERLAP questions between
  * any two state rows or state tables ("users active in BOTH periods")
  * via `KmvSketch.intersectEstimate`, with no raw-data access.
  *
  * Determinism (oracle- and AQE-safe): the sum partial is an exact
  * DECIMAL(30,6) — associative, so ANY merge order (batch boundaries,
  * shuffle order, AQE re-plans) yields bit-identical state; avg is
  * finalized as one IEEE double division at render. This mirrors
  * [[graft.functions.GraftFunctions.dsum]]/davg.
  *
  * State-column convention (merge is schema-derivable, so a state
  * parquet table read back cold still merges): for measure `m`,
  * columns `m__psum` DECIMAL(38,6) (inputs cast to DECIMAL(30,6); the
  * sum keeps Spark's widened precision, and merges pin it — never
  * narrow back, an overflowing narrow is NULL under non-ANSI),
  * `m__pcnt` BIGINT, `m__pmin`, `m__pmax` (source type). Any column
  * without the `__p` infix is a grouping dimension.
  */
object MetricState {

  /** A measure to maintain: output name + input expression (SQL). */
  final case class Measure(name: String, expr: String)

  /** A percentile measure: maintained as a fixed-width histogram
    * partial over [lo, hi) — [[graft.llm.HistogramSketch]]'s counters
    * carried as `histBins` per-bucket count columns in the state row,
    * merged by plain addition, finalized with the same left-edge /
    * ceil(p·n) read-out contract. `lo`/`hi` must stay constant across
    * batches (a domain change is a state rebuild, as with any
    * fixed-width sketch). */
  final case class Hist(name: String, expr: String, lo: Double, hi: Double,
      ps: Seq[(String, Double)] = Seq(("p50", 0.5), ("p95", 0.95)))

  /** Bucket count for histogram partials: error ≤ (hi−lo)/32 per
    * estimate, 32 longs of state per (dims, measure). */
  val histBins = 32

  private val scale = 6

  private def partialCols(m: Measure): Seq[Column] = {
    val e = expr(m.expr)
    Seq(
      sum(e.cast(DecimalType(30, scale))).as(s"${m.name}__psum"),
      count(e).as(s"${m.name}__pcnt"),
      min(e).as(s"${m.name}__pmin"),
      max(e).as(s"${m.name}__pmax"))
  }

  /** Aggregate a delta batch into partial state: one partial+final hash
    * aggregate on the dims — the only scan this batch will ever get.
    * `distincts` adds mergeable APPROXIMATE distinct counts as HLL
    * sketch partials (`m__phll` BINARY; Apache DataSketches via
    * Spark's hll_sketch_agg): exact distinct is the one aggregate with
    * no bounded mergeable state, and the sketch union is the standard
    * trade — estimate error ~1/sqrt(2^lgK), state bytes fixed. */
  def buildState(delta: DataFrame, dims: Seq[String],
      measures: Seq[Measure], distincts: Seq[Measure] = Nil,
      hists: Seq[Hist] = Nil, kmvDistincts: Seq[Measure] = Nil): DataFrame = {
    val aggs = measures.flatMap(partialCols) ++ distincts.map(m =>
      hll_sketch_agg(expr(m.expr)).as(s"${m.name}__phll")) ++
      kmvDistincts.map(m => graft.llm.KmvSketch.kmvAgg(
        graft.llm.KmvSketch.hash60(expr(m.expr))).as(s"${m.name}__pkmv")) ++
      hists.flatMap { h =>
        val b = graft.llm.HistogramSketch.bucketOf(
          expr(h.expr), h.lo, h.hi, histBins)
        (0 until histBins).map(i =>
          sum(when(b === i, 1L).otherwise(0L)).as(f"${h.name}__ph$i%02d"))
      }
    require(aggs.nonEmpty, "at least one measure, distinct or hist required")
    delta.groupBy(dims.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** Merge state frames (prior state ∪ new-batch states) by re-folding
    * the monoid: sum of sums, sum of counts, min of mins, max of maxes.
    * Measure/dim structure is derived from the schema, so this works on
    * state tables read back from parquet. The shuffle moves state rows
    * (group cardinality), never fact rows. */
  def mergeStates(states: Seq[DataFrame]): DataFrame = {
    require(states.nonEmpty, "mergeStates needs at least one state frame")
    val u = states.reduce(_.unionByName(_))
    val dims = u.schema.fieldNames.filterNot(_.contains("__p")).toSeq
    val histCol = "__ph\\d+$".r
    val aggs = u.schema.fieldNames.filter(_.contains("__p")).toSeq.map { c =>
      if (c.endsWith("__psum"))
        // pin the sum to the WIDEST decimal, never the input column's
        // type: a state table whose __psum landed as DECIMAL(30,6)
        // (older writer, external tool) would otherwise have the
        // widened DECIMAL(38,6) sum cast back down — under non-ANSI
        // semantics an overflowing cast returns NULL, silently
        // corrupting the merged state instead of failing
        sum(col(c)).cast(DecimalType(38, scale)).as(c)
      else {
        val agg =
          if (c.endsWith("__pcnt")) sum(col(c))
          else if (c.endsWith("__pmin")) min(col(c))
          else if (c.endsWith("__phll")) hll_union_agg(col(c))
          else if (c.endsWith("__pkmv")) graft.llm.KmvSketch.kmvMergeAgg(col(c))
          else if (histCol.findFirstIn(c).isDefined) sum(col(c))
          else max(col(c))
        agg.cast(u.schema(c).dataType).as(c)
      }
    }
    u.groupBy(dims.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** Finalize state into metric values: sum→double, count, min, max,
    * avg = exact-decimal sum ÷ count (single IEEE division — the davg
    * contract). Groups whose count is 0 (all-null measure) render
    * null sum/avg, matching a direct aggregate over the raw rows. */
  def render(state: DataFrame): DataFrame = render(state, Nil)

  /** Finalize with percentile read-outs for the given [[Hist]]
    * measures (the lo/hi/ps configuration is not recoverable from the
    * state schema, so callers re-supply it — as with any sketch, the
    * build parameters are part of the table contract). The estimate is
    * [[graft.llm.HistogramSketch]]'s exactly: left edge of the first
    * bucket whose cumulative count reaches ceil(p·n). */
  def render(state: DataFrame, hists: Seq[Hist]): DataFrame = {
    val dims = state.schema.fieldNames.filterNot(_.contains("__p")).toSeq
    val ms = state.schema.fieldNames.filter(_.endsWith("__psum")).toSeq
      .map(_.stripSuffix("__psum"))
    val ds = state.schema.fieldNames.filter(_.endsWith("__phll")).toSeq
      .map(_.stripSuffix("__phll"))
    val cols = dims.map(col) ++ ms.flatMap { m =>
      val psum = col(s"${m}__psum"); val pcnt = col(s"${m}__pcnt")
      Seq(
        when(pcnt > 0, psum.cast("double")).as(s"${m}_sum"),
        pcnt.as(s"${m}_count"),
        col(s"${m}__pmin").as(s"${m}_min"),
        col(s"${m}__pmax").as(s"${m}_max"),
        when(pcnt > 0, psum.cast("double") / pcnt).as(s"${m}_avg"))
    } ++ ds.map(m =>
      hll_sketch_estimate(col(s"${m}__phll")).as(s"${m}_approx_distinct")) ++
      state.schema.fieldNames.filter(_.endsWith("__pkmv")).toSeq
        .map(_.stripSuffix("__pkmv")).map(m =>
          graft.llm.KmvSketch.estimate(col(s"${m}__pkmv"))
            .as(s"${m}_kmv_distinct")) ++
      hists.flatMap { h =>
        val phs = (0 until histBins).map(i => col(f"${h.name}__ph$i%02d"))
        val n = phs.reduce(_ + _)
        val width = (h.hi - h.lo) / histBins
        h.ps.map { case (pname, p) =>
          val target = ceil(lit(p) * n)
          val cums = phs.scanLeft(lit(0L): Column)(_ + _).drop(1)
          // n = 0 (all-null group): every cum >= the zero target, so
          // the first bucket's left edge (h.lo) would render — a
          // fabricated value. A percentile of nothing is NULL.
          when(n > 0, coalesce(cums.zipWithIndex.map { case (cum, i) =>
            when(cum >= target, lit(h.lo) + lit(width) * lit(i))
          }: _*)).as(s"${h.name}_$pname")
        }
      }
    state.select(cols: _*)
  }

  /** DuckDB-oracle SQL for [[render]] over the RAW rows — the
    * full-recompute equivalent an incremental refresh must equal.
    * Keep in lockstep with buildState/render. */
  def renderSql(table: String, dims: Seq[String], measures: Seq[Measure],
      where: String = "TRUE"): String = {
    val items = measures.map { m =>
      val e = m.expr
      s"""CAST(SUM(CAST(($e) AS DECIMAL(30,$scale))) AS DOUBLE) AS ${m.name}_sum,
         |  CAST(COUNT($e) AS BIGINT) AS ${m.name}_count,
         |  MIN($e) AS ${m.name}_min, MAX($e) AS ${m.name}_max,
         |  CAST(SUM(CAST(($e) AS DECIMAL(30,$scale))) AS DOUBLE) / COUNT($e) AS ${m.name}_avg"""
        .stripMargin
    }.mkString(",\n  ")
    s"""SELECT ${dims.mkString(", ")},
       |  $items
       |FROM $table WHERE $where
       |GROUP BY ${dims.mkString(", ")}
       |ORDER BY ${dims.mkString(", ")}""".stripMargin
  }
}
