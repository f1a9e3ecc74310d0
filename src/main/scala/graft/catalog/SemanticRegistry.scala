package graft.catalog

/** Semantic layer: models, dimensions, entities, metrics, saved queries.
  *
  * Mirrors the reference's MetricFlow surface — metrics × dimensions ×
  * time-range × where × order × limit (dbt_query.py:55-96) resolved
  * against semantic models exposing dimensions
  * (dbt_query2.py:36-57, `semantic_manifest.semantic_models`) — as a
  * plain Scala registry; compilation to DataFrames lives in
  * [[graft.planner.MetricPlanner]]. This is deliberately NOT a Catalyst
  * extension: the semantic layer is an API above SQL, so a plain planner
  * emitting declarative DataFrame ops lets Catalyst do all optimization.
  */

/** A dimension exposed by a semantic model.
  * `expr` is a SQL expression in the portable Spark∩DuckDB subset
  * (plain column references for almost all dims). Time dimensions
  * support granularity suffixes `name__day|week|month|year`
  * (reference: `granularity_free_qualified_name`, dbt_query.py:167). */
final case class Dimension(name: String, expr: String, isTime: Boolean = false)

/** A semantic model over a physical table.
  * @param key      primary entity key column
  * @param small    dimension table known to be broadcast-safe at scale
  *                 (region/nation stay tiny at 100 TB; orders does not)
  */
final case class SemanticModel(
    name: String,
    table: String,
    key: String,
    dimensions: Seq[Dimension] = Nil,
    small: Boolean = false)

/** Foreign-key link: `fromModel.fromCol == toModel.key`. */
final case class JoinLink(fromModel: String, fromCol: String, toModel: String)

/** A named measure over a fact model. `aggSql` is in the portable SQL
  * subset so the same text compiles via Spark `expr()` and runs on the
  * DuckDB oracle. Distributed double sums go through the exact-decimal
  * pattern (see [[graft.functions.GraftFunctions.dsum]]). */
/** @param filterSql MetricFlow's metric-level `filter:` — a row
  *   predicate applied to THIS metric's input rows only (other metrics
  *   in the same request see the unfiltered fact). Mixing metrics with
  *   different filters compiles to one aggregate subquery per filter
  *   group FULL-OUTER-joined on the group-by keys — exactly the SQL
  *   MetricFlow emits, and at scale each subquery is its own partial
  *   aggregate so no filter ever widens another metric's scan. */
final case class Metric(
    name: String,
    model: String,
    aggSql: String,
    timeDim: Option[String] = None,
    description: String = "",
    filterSql: Option[String] = None)

/** A time-offset input of a derived metric (MetricFlow's
  * `offset_window`): `alias` names, inside the derived metric's
  * expression, the value of base metric `input` from `n` `grain`s
  * EARLIER on the query's time axis (e.g. last month's revenue for a
  * month-over-month growth metric). Compiles to a grain-cardinality
  * self-join of the aggregate — never a second pass over the fact. */
final case class OffsetInput(alias: String, input: String, n: Int, grain: String) {
  require(Set("minute", "hour", "day", "week", "month", "quarter", "year")(grain),
    s"bad offset grain: $grain")
  require(n > 0, s"offset must be positive: $n")
}

/** A metric defined over OTHER metrics (MetricFlow's derived/ratio
  * metrics): `exprSql` references the input metric names as columns
  * (e.g. `revenue / order_count`). Inputs must share a fact model; the
  * planner aggregates the inputs once and derives this column on the
  * aggregated frame — never a second pass over the fact.
  * `offsetInputs` adds time-shifted aliases (see [[OffsetInput]]);
  * a query using them must group by a time dimension at the offset's
  * granularity. */
final case class DerivedMetric(
    name: String,
    inputs: Seq[String],
    exprSql: String,
    description: String = "",
    offsetInputs: Seq[OffsetInput] = Nil)

/** A conversion metric (MetricFlow's fifth metric type): of the BASE
  * events (rows of `model` matching `baseFilterSql`), how many are
  * followed by a CONVERSION event (row matching `conversionFilterSql`)
  * for the SAME entity within `windowDays` after the base event's
  * time. Deterministic attribution: a base event either converted or
  * didn't (≥1 conversion in its window counts once), so the counts are
  * order-free and oracle-reproducible. `calculation` picks the output:
  * `conversions` (count of converted base events) or
  * `conversion_rate` (converted / base, one IEEE division). */
final case class ConversionMetric(
    name: String,
    model: String,
    entity: String,
    timeDim: String,
    baseFilterSql: String,
    conversionFilterSql: String,
    windowDays: Int,
    calculation: String,
    description: String = "") {
  require(Set("conversions", "conversion_rate")(calculation),
    s"bad conversion calculation: $calculation")
  require(windowDays > 0, s"window must be positive: $windowDays")
}

/** Declarative metric query request — field-for-field mirror of the
  * reference's MetricFlowQueryRequest (dbt_query.py:77-86).
  * `orderBy` uses the MetricFlow `-name` = descending convention
  * (dbt_query.py:62). */
final case class MetricQueryRequest(
    metrics: Seq[String],
    groupBy: Seq[String] = Nil,
    where: Option[String] = None,
    startTime: Option[String] = None,
    endTime: Option[String] = None,
    orderBy: Seq[String] = Nil,
    limit: Option[Int] = None,
    savedQuery: Option[String] = None)

final class SemanticRegistry(
    val models: Seq[SemanticModel],
    val links: Seq[JoinLink],
    val metrics: Seq[Metric],
    val savedQueries: Map[String, MetricQueryRequest] = Map.empty,
    val derivedMetrics: Seq[DerivedMetric] = Nil,
    val conversionMetrics: Seq[ConversionMetric] = Nil) {

  val modelByName: Map[String, SemanticModel] = models.map(m => m.name -> m).toMap
  val metricByName: Map[String, Metric] = metrics.map(m => m.name -> m).toMap
  val derivedByName: Map[String, DerivedMetric] =
    derivedMetrics.map(m => m.name -> m).toMap
  val conversionByName: Map[String, ConversionMetric] =
    conversionMetrics.map(m => m.name -> m).toMap

  def isDerived(name: String): Boolean = derivedByName.contains(name)

  /** Requested metric names → the base metrics that must be aggregated
    * (inputs of derived metrics expanded, order-stable, distinct). */
  def baseMetricsFor(requested: Seq[String]): Seq[String] =
    requested.flatMap { n =>
      derivedByName.get(n).map(_.inputs).getOrElse(Seq(n))
    }.distinct

  /** dimension name -> owning model. The reference assumes dimension
    * names are unique across semantic models (comment at
    * dbt_query2.py:58); we make that assumption explicit and fail fast
    * at construction instead of silently mis-resolving. */
  val dimensionOwner: Map[String, String] = {
    val pairs = for (m <- models; d <- m.dimensions) yield d.name -> m.name
    val dups = pairs.groupBy(_._1).filter(_._2.size > 1).keys
    require(dups.isEmpty, s"dimension names must be unique across models: ${dups.mkString(",")}")
    pairs.toMap
  }

  val dimensionByName: Map[String, Dimension] =
    (for (m <- models; d <- m.dimensions) yield d.name -> d).toMap

  def metric(name: String): Metric =
    metricByName.getOrElse(name, sys.error(s"unknown metric: $name"))

  /** Accompanying dimensions for a metric = all dimensions of its fact
    * model plus every model reachable over join links
    * (parity with dbt_query2.py:52-58's same-model gathering, widened
    * to the star). */
  def dimensionsForMetric(metricName: String): Seq[Dimension] = {
    val reach = reachableModels(metric(metricName).model)
    for (mn <- reach; d <- modelByName(mn).dimensions) yield d
  }

  /** Models reachable from `start` over join links (BFS, stable order). */
  def reachableModels(start: String): Seq[String] = {
    val out = scala.collection.mutable.LinkedHashSet(start)
    var frontier = Seq(start)
    while (frontier.nonEmpty) {
      frontier = for {
        f <- frontier
        l <- links if l.fromModel == f && !out.contains(l.toModel)
      } yield { out += l.toModel; l.toModel }
    }
    out.toSeq
  }

  /** Join path (sequence of links) from fact model to target model. */
  def joinPath(from: String, to: String): Seq[JoinLink] = {
    if (from == to) return Nil
    // BFS keeping parent pointers
    val parent = scala.collection.mutable.Map[String, JoinLink]()
    val seen = scala.collection.mutable.Set(from)
    var frontier = Seq(from)
    while (frontier.nonEmpty && !seen.contains(to)) {
      frontier = for {
        f <- frontier
        l <- links if l.fromModel == f && !seen.contains(l.toModel)
      } yield { parent(l.toModel) = l; seen += l.toModel; l.toModel }
    }
    require(seen.contains(to), s"no join path $from -> $to")
    // walk back
    val path = scala.collection.mutable.ListBuffer[JoinLink]()
    var cur = to
    while (cur != from) { val l = parent(cur); path.prepend(l); cur = l.fromModel }
    path.toSeq
  }
}

object SemanticRegistry {
  /** Load a registry from a declarative YAML/JSON manifest file — see
    * [[ManifestLoader]] and manifests/semantic_manifest.yml. */
  def fromFile(path: String): SemanticRegistry = ManifestLoader.load(path)
}

/** Default registry over the driver-provided star schema
  * (/root/repo/FIXTURES.md §B). */
object DefaultRegistry {
  import graft.functions.GraftFunctions.dsumSql

  val registry: SemanticRegistry = new SemanticRegistry(
    models = Seq(
      SemanticModel("lineitem", "lineitem", "l_orderkey", Seq(
        Dimension("l_returnflag", "l_returnflag"),
        Dimension("l_linestatus", "l_linestatus"),
        Dimension("l_shipdate", "l_shipdate", isTime = true))),
      SemanticModel("orders", "orders", "o_orderkey", Seq(
        Dimension("o_orderdate", "o_orderdate", isTime = true),
        Dimension("o_orderpriority", "o_orderpriority"),
        Dimension("o_orderstatus", "o_orderstatus"))),
      // `small = true` ONLY for fixed-cardinality dims: nation/region
      // stay 25/5 rows at any scale factor, so an unconditional
      // broadcast hint is always right. customer/part/supplier GROW
      // with the data — at 100 TB they are not broadcastable, so they
      // carry no hint and Spark's size-based auto-broadcast / AQE
      // decides per deployment (they still broadcast at test SFs).
      SemanticModel("customer", "customer", "c_custkey", Seq(
        Dimension("c_mktsegment", "c_mktsegment"))),
      SemanticModel("nation", "nation", "n_nationkey", Seq(
        Dimension("n_name", "n_name")), small = true),
      SemanticModel("region", "region", "r_regionkey", Seq(
        Dimension("r_name", "r_name")), small = true),
      SemanticModel("part", "part", "p_partkey", Seq(
        Dimension("p_brand", "p_brand"),
        Dimension("p_type", "p_type"))),
      SemanticModel("supplier", "supplier", "s_suppkey", Seq(
        Dimension("s_name", "s_name"))),
      SemanticModel("events", "events", "event_id", Seq(
        Dimension("event_type", "event_type"),
        Dimension("ts", "ts", isTime = true)))),
    links = Seq(
      JoinLink("lineitem", "l_orderkey", "orders"),
      JoinLink("lineitem", "l_partkey", "part"),
      JoinLink("lineitem", "l_suppkey", "supplier"),
      JoinLink("orders", "o_custkey", "customer"),
      JoinLink("customer", "c_nationkey", "nation"),
      JoinLink("nation", "n_regionkey", "region")),
    metrics = Seq(
      Metric("revenue", "lineitem",
        dsumSql("l_extendedprice * (1 - l_discount)"),
        timeDim = Some("l_shipdate"),
        description = "sum of discounted extended price"),
      Metric("total_qty", "lineitem", dsumSql("l_quantity", 2),
        timeDim = Some("l_shipdate"),
        description = "total quantity shipped"),
      Metric("order_count", "lineitem", "COUNT(DISTINCT l_orderkey)",
        timeDim = Some("l_shipdate"),
        description = "distinct orders touched"),
      Metric("event_value", "events", dsumSql("value", 2),
        timeDim = Some("ts"),
        description = "sum of event values"),
      // percentile measures (MetricFlow agg types `percentile`/
      // `median`): percentile_disc — the SQL-standard ordered-set
      // aggregate that PICKS an element rather than interpolating, so
      // Spark and DuckDB agree bit-exactly (percentile_cont's
      // interpolation arithmetic is not guaranteed identical across
      // engines)
      Metric("median_event_value", "events",
        "CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY value) AS DOUBLE)",
        timeDim = Some("ts"),
        description = "median event value (percentile measure)"),
      Metric("p90_event_value", "events",
        "CAST(percentile_disc(0.9) WITHIN GROUP (ORDER BY value) AS DOUBLE)",
        timeDim = Some("ts"),
        description = "90th-percentile event value (percentile measure)"),
      // metric-level filters (MetricFlow `filter:`): the predicate
      // scopes THIS metric's input rows only
      Metric("returned_revenue", "lineitem",
        dsumSql("l_extendedprice * (1 - l_discount)"),
        timeDim = Some("l_shipdate"),
        description = "revenue on returned lineitems only",
        filterSql = Some("l_returnflag = 'R'")),
      Metric("urgent_revenue", "lineitem",
        dsumSql("l_extendedprice * (1 - l_discount)"),
        timeDim = Some("l_shipdate"),
        description = "revenue on urgent-priority orders (filter joins orders in)",
        filterSql = Some("o_orderpriority = '1-URGENT'"))),
    savedQueries = Map(
      // The flagship minimum slice (SURVEY.md §7.2 slice 0).
      "revenue_by_month" -> MetricQueryRequest(
        metrics = Seq("revenue"),
        groupBy = Seq("o_orderdate__month"),
        where = Some("o_orderpriority IN ('1-URGENT','2-HIGH')"),
        startTime = Some("1995-01-01"), endTime = Some("1996-12-31"),
        orderBy = Seq("-revenue"), limit = Some(10)),
      // a CROSS-MODEL saved query: two facts on the shared metric_time
      // axis — resolves through the same saved-query surface as the
      // single-model one (MetricFlow saved queries are fact-agnostic)
      "weekly_revenue_vs_events" -> MetricQueryRequest(
        metrics = Seq("revenue", "event_value"),
        groupBy = Seq("metric_time__week"),
        startTime = Some("1997-06-01"), endTime = Some("1997-09-30"))),
    derivedMetrics = Seq(
      // ratio metric: both inputs exact by construction (decimal sum /
      // exact distinct count), one IEEE division at the end — portable
      DerivedMetric("avg_order_value", Seq("revenue", "order_count"),
        "revenue / order_count",
        description = "revenue per distinct order (ratio metric)"),
      // offset metric (MetricFlow offset_window): growth vs the prior
      // month's revenue — numerator and denominator both exact-decimal
      // sums, one IEEE division; NULL on the first month (no prior)
      DerivedMetric("revenue_mom_growth", Seq("revenue"),
        "(revenue - revenue_prev_month) / revenue_prev_month",
        description = "month-over-month revenue growth (offset metric)",
        offsetInputs = Seq(OffsetInput("revenue_prev_month", "revenue", 1, "month")))),
    conversionMetrics = Seq(
      // conversion metrics (MetricFlow's fifth metric type): view →
      // purchase for the same user within a day of the view
      ConversionMetric("view_to_purchase_count", "events", "user_id", "ts",
        "event_type = 'view'", "event_type = 'purchase'",
        windowDays = 1, calculation = "conversions",
        description = "views followed by a purchase within a day"),
      ConversionMetric("view_to_purchase_rate", "events", "user_id", "ts",
        "event_type = 'view'", "event_type = 'purchase'",
        windowDays = 1, calculation = "conversion_rate",
        description = "share of views converting to a purchase within a day")))
}
