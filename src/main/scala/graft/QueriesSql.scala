package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType

import graft.Queries.Q
import graft.functions.GraftFunctions._
import graft.sources.Tables
import graft.sql.StatementRunner

/** Inventory batch 3: the remaining SQL-surface families the t2 gate
  * checks — scalar string/date/conditional functions, sessionization,
  * top-n per group, exact-decimal statistics, multi-statement scripts,
  * key-range scans. Determinism rules as in [[Queries]]. */
object QueriesSql {

  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(spark, dir, name)

  /** S2/S3: multi-statement script through the statement-runner shell;
    * transaction control is a warned no-op; the final SELECT is the
    * result (oracle = the equivalent flattened query). */
  private val q33 = Q("q33_sql_script",
    (s, dir) => {
      Tables.registerAll(s, dir)
      StatementRunner.execute(s,
        """BEGIN;
          |-- staged view over; the splitter must not break on this comment
          |CREATE OR REPLACE TEMP VIEW rich_cust AS
          |  SELECT c_custkey, c_mktsegment, c_acctbal FROM customer
          |  WHERE c_acctbal > 1000;
          |SELECT c_mktsegment, COUNT(*) AS n_cust,
          |       CAST(SUM(CAST(c_acctbal AS DECIMAL(30,2))) AS DOUBLE) AS sum_bal
          |FROM rich_cust GROUP BY c_mktsegment ORDER BY c_mktsegment;
          |COMMIT;""".stripMargin,
        fetch = true).fetched.get
    },
    Some(s"""
      SELECT c_mktsegment, COUNT(*) AS n_cust,
             ${dsumSql("c_acctbal", 2)} AS sum_bal
      FROM customer WHERE c_acctbal > 1000
      GROUP BY c_mktsegment ORDER BY c_mktsegment"""))

  /** S5: key-interval range scan (omni_rpc_client.py:64-69) — the
    * predicate reaches the parquet scan (partition pruning on a
    * block-partitioned layout at scale). */
  private val q34 = Q("q34_range_scan",
    (s, dir) => t(s, dir, "events")
      .filter(col("event_id").between(1000, 2000))
      .select(col("event_id"), col("event_type"), col("value"))
      .orderBy("event_id"),
    Some("""
      SELECT event_id, event_type, value FROM events
      WHERE event_id BETWEEN 1000 AND 2000 ORDER BY event_id"""))

  /** Scalar string family: upper/lower/trim/lpad/replace/locate/
    * concat/substr/length — all codegen'd built-ins. */
  private val q35 = Q("q35_scalar_strings",
    (s, dir) => t(s, dir, "customer")
      .select(col("c_custkey"),
        upper(col("c_name")).as("uname"),
        length(col("c_name")).cast("long").as("name_len"),
        lpad(col("c_custkey").cast("string"), 10, "0").as("padded"),
        regexp_replace(col("c_name"), "Customer", "Cust").as("shortname"),
        instr(col("c_name"), "#").cast("long").as("hash_pos"),
        substring(col("c_name"), 10, 9).as("id_digits"),
        concat_ws("-", col("c_mktsegment"), col("c_custkey")).as("seg_key"))
      .orderBy("c_custkey"),
    Some("""
      SELECT c_custkey,
             upper(c_name) AS uname,
             CAST(length(c_name) AS BIGINT) AS name_len,
             lpad(c_custkey::VARCHAR, 10, '0') AS padded,
             replace(c_name, 'Customer', 'Cust') AS shortname,
             CAST(strpos(c_name, '#') AS BIGINT) AS hash_pos,
             substring(c_name, 10, 9) AS id_digits,
             concat_ws('-', c_mktsegment, c_custkey) AS seg_key
      FROM customer ORDER BY c_custkey"""))

  /** Scalar date/time family: year/month/day, ISO weekday, date
    * arithmetic, datediff, quarter-trunc. */
  private val q36 = Q("q36_scalar_dates",
    (s, dir) => t(s, dir, "orders")
      .select(col("o_orderkey"),
        year(col("o_orderdate")).cast("long").as("y"),
        month(col("o_orderdate")).cast("long").as("m"),
        dayofmonth(col("o_orderdate")).cast("long").as("d"),
        weekday(col("o_orderdate")).cast("long").as("dow_mon0"),
        date_add(col("o_orderdate").cast("date"), 30).as("due_date"),
        datediff(lit("1998-01-01").cast("date"),
          col("o_orderdate").cast("date")).cast("long").as("age_days"),
        date_format(date_trunc("quarter", col("o_orderdate")), "yyyy-MM-dd")
          .as("quarter_start"))
      .orderBy("o_orderkey"),
    Some("""
      SELECT o_orderkey,
             CAST(year(o_orderdate) AS BIGINT) AS y,
             CAST(month(o_orderdate) AS BIGINT) AS m,
             CAST(day(o_orderdate) AS BIGINT) AS d,
             CAST(isodow(o_orderdate) - 1 AS BIGINT) AS dow_mon0,
             CAST(o_orderdate + INTERVAL 30 DAY AS DATE) AS due_date,
             CAST(datediff('day', CAST(o_orderdate AS DATE), DATE '1998-01-01')
                  AS BIGINT) AS age_days,
             strftime(date_trunc('quarter', o_orderdate), '%Y-%m-%d')
               AS quarter_start
      FROM orders ORDER BY o_orderkey"""))

  /** Conditional family: CASE / COALESCE / NULLIF / IF / greatest /
    * least, with arithmetic. */
  private val q37 = Q("q37_conditionals",
    (s, dir) => t(s, dir, "lineitem")
      .select(col("l_orderkey"), col("l_linenumber"),
        when(col("l_quantity") >= 30, "bulk")
          .when(col("l_quantity") >= 10, "mid")
          .otherwise("small").as("size_class"),
        coalesce(nullif(col("l_returnflag"), lit("N")), lit("none"))
          .as("flag_or_none"),
        greatest(col("l_tax"), col("l_discount")).as("max_rate"),
        least(col("l_tax"), col("l_discount")).as("min_rate"),
        (col("l_extendedprice") * when(col("l_discount") > 0.05, lit(1) - col("l_discount"))
          .otherwise(lit(1.0))).as("eff_price"))
      .orderBy("l_orderkey", "l_linenumber"),
    Some("""
      SELECT l_orderkey, l_linenumber,
             CASE WHEN l_quantity >= 30 THEN 'bulk'
                  WHEN l_quantity >= 10 THEN 'mid'
                  ELSE 'small' END AS size_class,
             COALESCE(NULLIF(l_returnflag, 'N'), 'none') AS flag_or_none,
             greatest(l_tax, l_discount) AS max_rate,
             least(l_tax, l_discount) AS min_rate,
             l_extendedprice * (CASE WHEN l_discount > 0.05
               THEN 1 - l_discount ELSE 1.0 END) AS eff_price
      FROM lineitem ORDER BY l_orderkey, l_linenumber"""))

  /** Sessionization via gap detection: a new session starts after a
    * > 30-minute silence per user; session id = running count of
    * session starts (two windows, one shuffle on user_id). */
  private val q38 = Q("q38_sessionize",
    (s, dir) => {
      val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      t(s, dir, "events")
        .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
        .withColumn("is_start",
          when(col("prev_ts").isNull ||
            unix_timestamp(col("ts")) - unix_timestamp(col("prev_ts")) > 1800, 1L)
            .otherwise(0L))
        .withColumn("session_seq",
          sum(col("is_start")).over(byUser.rowsBetween(Window.unboundedPreceding, 0)))
        .groupBy(col("user_id"), col("session_seq"))
        .agg(count(lit(1)).as("n_events"),
          dsum(col("value"), 2).as("session_value"))
        .orderBy("user_id", "session_seq")
    },
    Some(s"""
      WITH marked AS (
        SELECT user_id, value, ts, event_id,
               CASE WHEN lag(ts) OVER w IS NULL
                      OR CAST(floor(epoch(ts)) AS BIGINT)
                         - CAST(floor(epoch(lag(ts) OVER w)) AS BIGINT) > 1800
                    THEN 1 ELSE 0 END AS is_start
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      sessioned AS (
        SELECT user_id, value,
               SUM(is_start) OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_seq
        FROM marked)
      SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq,
             COUNT(*) AS n_events, ${dsumSql("value", 2)} AS session_value
      FROM sessioned GROUP BY user_id, session_seq
      ORDER BY user_id, session_seq"""))

  /** Top-N per group (rank window + filter — the distributed top-k per
    * key shape). */
  private val q40 = Q("q40_topn_per_group",
    (s, dir) => {
      val w = Window.partitionBy(col("c_mktsegment"))
        .orderBy(col("c_acctbal").desc, col("c_custkey").asc)
      t(s, dir, "customer")
        .withColumn("rnk", row_number().over(w).cast("long"))
        .filter(col("rnk") <= 3)
        .select(col("c_mktsegment"), col("rnk"), col("c_custkey"), col("c_acctbal"))
        .orderBy("c_mktsegment", "rnk")
    },
    Some("""
      SELECT c_mktsegment, rnk, c_custkey, c_acctbal FROM (
        SELECT c_mktsegment, c_custkey, c_acctbal,
               row_number() OVER (PARTITION BY c_mktsegment
                 ORDER BY c_acctbal DESC, c_custkey ASC) AS rnk
        FROM customer)
      WHERE rnk <= 3 ORDER BY c_mktsegment, rnk"""))

  /** Statistics family with deterministic formulations: variance and
    * stddev from exact decimal power sums (Welford/merge-based built-ins
    * are shuffle-order-dependent in their last ulps; at 1000 executors
    * that's run-to-run drift — these are not). */
  private val q41 = Q("q41_stats",
    (s, dir) => {
      val x = col("l_quantity")
      val sx = sum(x.cast(DecimalType(30, 2))).cast("double")
      val sxx = sum((x * x).cast(DecimalType(30, 4))).cast("double")
      val n = count(lit(1)).cast("double")
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n_rows"),
          (sx / n).as("mean_qty"),
          ((sxx - sx * sx / n) / (n - 1)).as("var_qty"),
          sqrt((sxx - sx * sx / n) / (n - 1)).as("stddev_qty"))
        .orderBy("l_returnflag")
    },
    Some("""
      SELECT l_returnflag, COUNT(*) AS n_rows,
             (CAST(SUM(CAST(l_quantity AS DECIMAL(30,2))) AS DOUBLE)
              / CAST(COUNT(*) AS DOUBLE)) AS mean_qty,
             ((CAST(SUM(CAST(l_quantity * l_quantity AS DECIMAL(30,4))) AS DOUBLE)
               - CAST(SUM(CAST(l_quantity AS DECIMAL(30,2))) AS DOUBLE)
                 * CAST(SUM(CAST(l_quantity AS DECIMAL(30,2))) AS DOUBLE)
                 / CAST(COUNT(*) AS DOUBLE))
              / (CAST(COUNT(*) AS DOUBLE) - 1)) AS var_qty,
             sqrt((CAST(SUM(CAST(l_quantity * l_quantity AS DECIMAL(30,4))) AS DOUBLE)
               - CAST(SUM(CAST(l_quantity AS DECIMAL(30,2))) AS DOUBLE)
                 * CAST(SUM(CAST(l_quantity AS DECIMAL(30,2))) AS DOUBLE)
                 / CAST(COUNT(*) AS DOUBLE))
              / (CAST(COUNT(*) AS DOUBLE) - 1)) AS stddev_qty
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""))

  /** Anti/semi join family (EXISTS / NOT EXISTS): customers with and
    * without urgent orders. */
  private val q42 = Q("q42_semi_anti",
    (s, dir) => {
      val cust = t(s, dir, "customer")
      val urgent = t(s, dir, "orders").filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_custkey"))
      val withU = cust.join(urgent, cust("c_custkey") === urgent("o_custkey"), "left_semi")
        .select(lit("has_urgent").as("bucket"), col("c_custkey"))
      val withoutU = cust.join(urgent, cust("c_custkey") === urgent("o_custkey"), "left_anti")
        .select(lit("no_urgent").as("bucket"), col("c_custkey"))
      withU.unionAll(withoutU).orderBy("bucket", "c_custkey")
    },
    Some("""
      SELECT 'has_urgent' AS bucket, c_custkey FROM customer
      WHERE EXISTS (SELECT 1 FROM orders
                    WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
      UNION ALL
      SELECT 'no_urgent' AS bucket, c_custkey FROM customer
      WHERE NOT EXISTS (SELECT 1 FROM orders
                        WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
      ORDER BY bucket, c_custkey"""))

  /** As-of (point-in-time) join — an operator Spark lacks; composed in
    * graft.operators.AsOfJoin as one key-shuffle + one window pass.
    * Each non-error event picks up the latest error marker at-or-before
    * its timestamp for the same user; oracle uses DuckDB's native
    * ASOF JOIN. */
  private val q43 = Q("q43_asof_join",
    (s, dir) => {
      val ev = t(s, dir, "events")
      val markers = ev.filter(col("event_type") === "error")
        .groupBy(col("user_id").as("m_user"), col("ts").as("m_ts"))
        .agg(max(col("event_id")).as("marker_id"))
      val left = ev.filter(col("event_type") =!= "error")
        .select(col("event_id"), col("user_id"), col("ts"))
      graft.operators.AsOfJoin.asOf(left, "user_id", "ts",
        markers, "m_user", "m_ts", Seq("marker_id"))
        .select(col("event_id"), col("user_id"), col("marker_id"))
        .orderBy("event_id")
    },
    Some("""
      WITH m AS (SELECT user_id AS m_user, ts AS m_ts, max(event_id) AS marker_id
                 FROM events WHERE event_type = 'error' GROUP BY 1, 2),
      l AS (SELECT event_id, user_id, ts FROM events WHERE event_type <> 'error')
      SELECT l.event_id, l.user_id, m.marker_id
      FROM l ASOF JOIN m ON l.user_id = m.m_user AND l.ts >= m.m_ts
      ORDER BY l.event_id"""))

  /** The SAME point-in-time semantics through the native operator tier
    * (graft.plans.AsOfJoinNative: custom LogicalPlan + SparkStrategy +
    * merge SparkPlan) — one key shuffle per side, single forward merge
    * pass, O(1) buffered state per partition. Oracle identical in
    * shape to q43's (DuckDB native ASOF JOIN). */
  private val q61 = Q("q61_asof_native",
    (s, dir) => {
      val ev = t(s, dir, "events")
      val markers = ev.filter(col("event_type") === "error")
        .groupBy(col("user_id").as("m_user"), col("ts").as("m_ts"))
        .agg(max(col("event_id")).as("marker_id"))
      val left = ev.filter(col("event_type") =!= "error")
        .select(col("event_id"), col("user_id"), col("ts"))
      graft.plans.AsOfJoinNative.asOf(left, "user_id", "ts",
        markers, "m_user", "m_ts", Seq("marker_id"))
        .select(col("event_id"), col("user_id"), col("marker_id"))
        .orderBy("event_id")
    },
    Some("""
      WITH m AS (SELECT user_id AS m_user, ts AS m_ts, max(event_id) AS marker_id
                 FROM events WHERE event_type = 'error' GROUP BY 1, 2),
      l AS (SELECT event_id, user_id, ts FROM events WHERE event_type <> 'error')
      SELECT l.event_id, l.user_id, m.marker_id
      FROM l ASOF JOIN m ON l.user_id = m.m_user AND l.ts >= m.m_ts
      ORDER BY l.event_id"""))

  /** Math scalar family — restricted to operations with IEEE-defined
    * exact results (sqrt, abs, ceil/floor, sign, modulo, multiply).
    * Deliberately excluded from oracle checking: exp/ln/pow (libm
    * last-ulp divergence) and round(double, d) (Spark rounds the
    * shortest decimal rendering HALF_UP, DuckDB rounds numerically —
    * they disagree on boundary values). */
  private val q45 = Q("q45_scalar_math",
    (s, dir) => t(s, dir, "lineitem")
      .select(col("l_orderkey"), col("l_linenumber"),
        abs(col("l_discount") - 0.05).as("disc_dev"),
        ceil(col("l_quantity") / 7.0).cast("long").as("ceil7"),
        floor(col("l_quantity") / 7.0).cast("long").as("floor7"),
        sqrt(col("l_extendedprice")).as("sqrt_price"),
        signum(col("l_discount") - 0.05).cast("int").as("disc_sign"),
        (col("l_orderkey") % 7).as("okey_mod7"),
        (col("l_tax") * col("l_tax")).as("tax_sq"))
      .orderBy("l_orderkey", "l_linenumber"),
    Some("""
      SELECT l_orderkey, l_linenumber,
             abs(l_discount - 0.05) AS disc_dev,
             CAST(ceil(l_quantity / 7.0) AS BIGINT) AS ceil7,
             CAST(floor(l_quantity / 7.0) AS BIGINT) AS floor7,
             sqrt(l_extendedprice) AS sqrt_price,
             CAST(sign(l_discount - 0.05) AS INTEGER) AS disc_sign,
             l_orderkey % 7 AS okey_mod7,
             l_tax * l_tax AS tax_sq
      FROM lineitem ORDER BY l_orderkey, l_linenumber"""))

  /** Array aggregation: collect_list is accumulation-order-dependent,
    * so portable results REQUIRE sorting the collected array — the same
    * discipline a 1000-executor run needs for reproducibility. */
  private val q47 = Q("q47_collect_sorted",
    (s, dir) => t(s, dir, "events")
      .filter(col("user_id") < 10)
      .groupBy(col("user_id"))
      .agg(concat_ws(",", sort_array(collect_set(col("event_type"))))
        .as("types_seen"),
        count(lit(1)).as("n_events"))
      .orderBy("user_id"),
    Some("""
      SELECT user_id,
             array_to_string(list_sort(list(DISTINCT event_type)), ',')
               AS types_seen,
             COUNT(*) AS n_events
      FROM events WHERE user_id < 10
      GROUP BY user_id ORDER BY user_id"""))

  /** Pivot (conditional aggregation): Spark's .pivot API; oracle uses
    * the equivalent portable CASE formulation. */
  private val q48 = Q("q48_pivot",
    (s, dir) => t(s, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .pivot("l_linestatus", Seq("F", "O"))
      .agg(dsum(col("l_quantity"), 2))
      .withColumnRenamed("F", "qty_f").withColumnRenamed("O", "qty_o")
      .orderBy("l_returnflag"),
    Some(s"""
      SELECT l_returnflag,
             ${dsumSql("CASE WHEN l_linestatus = 'F' THEN l_quantity END", 2)}
               AS qty_f,
             ${dsumSql("CASE WHEN l_linestatus = 'O' THEN l_quantity END", 2)}
               AS qty_o
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""))

  /** Weekly time granularity through the semantic planner (ISO-Monday
    * truncation agrees across engines). */
  private val q49Req = graft.catalog.MetricQueryRequest(
    metrics = Seq("total_qty"), groupBy = Seq("l_shipdate__week"),
    startTime = Some("1996-01-01"), endTime = Some("1996-03-31"))
  private val q49 = Q("q49_weekly_granularity",
    (s, dir) => new graft.planner.MetricPlanner(graft.catalog.DefaultRegistry.registry)
      .compile(s, dir, q49Req).df,
    Some(new graft.planner.MetricPlanner(graft.catalog.DefaultRegistry.registry)
      .renderSql(q49Req, withDescriptions = false)))

  /** Sub-day grain through the metric layer (MetricFlow exposes
    * hour/minute granularity; the reference's event pipelines run on a
    * 15-minute cadence): metric_time__hour buckets stay TIMESTAMPs —
    * the day-grain DATE cast would collapse a day's 24 buckets into
    * one. Oracle = the planner's own rendered SQL (M9), as for q2/q49. */
  private val q117Req = graft.catalog.MetricQueryRequest(
    metrics = Seq("event_value"), groupBy = Seq("metric_time__hour"),
    startTime = Some("2024-01-02"), endTime = Some("2024-01-09"))
  private val q117 = Q("q117_hourly_metric",
    (s, dir) => new graft.planner.MetricPlanner(graft.catalog.DefaultRegistry.registry)
      .compile(s, dir, q117Req).df,
    Some(new graft.planner.MetricPlanner(graft.catalog.DefaultRegistry.registry)
      .renderSql(q117Req, withDescriptions = false)))

  /** Percentile measures through the metric layer (MetricFlow agg
    * types `percentile`/`median`): percentile_disc ordered-set
    * aggregates pick an element — bit-exact on both engines — grouped
    * by a categorical dim. Oracle = rendered SQL (M9). */
  private val q123Req = graft.catalog.MetricQueryRequest(
    metrics = Seq("median_event_value", "p90_event_value"),
    groupBy = Seq("event_type"), orderBy = Seq("event_type"))
  private val q123 = Q("q123_percentile_metric",
    (s, dir) => new graft.planner.MetricPlanner(graft.catalog.DefaultRegistry.registry)
      .compile(s, dir, q123Req).df,
    Some(new graft.planner.MetricPlanner(graft.catalog.DefaultRegistry.registry)
      .renderSql(q123Req, withDescriptions = false)))

  /** Exact interpolated quantiles (percentile ≡ quantile_cont — both
    * engines use linear interpolation on the sorted values). Exact
    * percentile's aggregation state is a value→count map per (group,
    * agg-expression): asking for p25/p75 as two separate aggregates
    * builds, serializes, and merges the extendedprice map TWICE, so
    * both quantiles come from ONE `percentile(x, array(...))` state.
    * Decimals are cast to double before the map (interpolation happens
    * on doubles regardless — value-identical, measured) so the state
    * keys are cheap primitives, not Decimal objects. 2.05→1.36 s at
    * sf0.1; at 100 TB the halved state is also half the shuffle. */
  private val q50 = Q("q50_quantiles",
    (s, dir) => t(s, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(expr("percentile(CAST(l_quantity AS DOUBLE), 0.5)").as("median_qty"),
        expr("percentile(CAST(l_extendedprice AS DOUBLE), array(0.25, 0.75))")
          .as("pp"))
      .select(col("l_returnflag"), col("median_qty"),
        col("pp")(0).as("price_p25"), col("pp")(1).as("price_p75"))
      .orderBy("l_returnflag"),
    Some("""
      SELECT l_returnflag,
             quantile_cont(l_quantity, 0.5) AS median_qty,
             quantile_cont(l_extendedprice, 0.25) AS price_p25,
             quantile_cont(l_extendedprice, 0.75) AS price_p75
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""))

  /** Correlated scalar subquery — Catalyst decorrelates it into a join
    * (the classic rewrite the reference's warehouse supplied). The SAME
    * portable SQL text runs on Spark (via registered views) and DuckDB. */
  private val q53Sql = """
      SELECT o_orderkey, o_totalprice
      FROM orders
      WHERE o_totalprice > 3 * (
        SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(30,2))) AS DOUBLE)
               / COUNT(*)
        FROM lineitem WHERE l_orderkey = o_orderkey)
      ORDER BY o_orderkey"""
  private val q53 = Q("q53_correlated_subquery",
    (s, dir) => { Tables.registerAll(s, dir); s.sql(q53Sql) },
    Some(q53Sql))

  /** IN / NOT IN subqueries — a different Catalyst rewrite than
    * EXISTS (q42): null-aware anti join. Identical SQL text on both
    * engines (NOT IN guarded non-null by construction). */
  private val q54Sql = """
      SELECT 'in_building' AS bucket, o_orderkey FROM orders
      WHERE o_custkey IN (SELECT c_custkey FROM customer
                          WHERE c_mktsegment = 'BUILDING')
      UNION ALL
      SELECT 'not_in_building' AS bucket, o_orderkey FROM orders
      WHERE o_custkey NOT IN (SELECT c_custkey FROM customer
                              WHERE c_mktsegment = 'BUILDING')
      ORDER BY bucket, o_orderkey"""
  private val q54 = Q("q54_in_subquery",
    (s, dir) => { Tables.registerAll(s, dir); s.sql(q54Sql) },
    Some(q54Sql))

  /** RANGE-frame window: event-value sum over a sliding 1-hour
    * time-range frame per user (value-based frame, not row-based). */
  private val q55 = Q("q55_range_frame",
    (s, dir) => {
      Tables.registerAll(s, dir)
      s.sql(q55Sql)
    },
    Some(q55Sql))
  private lazy val q55Sql = s"""
      SELECT event_id, user_id,
             CAST(SUM(CAST(value AS DECIMAL(30,2))) OVER (
               PARTITION BY user_id ORDER BY ts
               RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
               AS DOUBLE) AS hour_value
      FROM events
      ORDER BY event_id"""

  /** Rank-family window functions (complements q9's
    * row_number/lag/running-sum): rank, dense_rank, ntile,
    * percent_rank, cume_dist, first_value — all on one unique-ordered
    * window (event_id tie-break → every rank deterministic), one
    * shuffle. Value-function frame pinned explicitly (full partition)
    * so both engines agree. */
  private val q62Sql = """
      SELECT event_id, user_id,
             rank() OVER w AS rnk,
             dense_rank() OVER w AS drnk,
             ntile(4) OVER w AS quartile,
             percent_rank() OVER w AS prank,
             cume_dist() OVER w AS cdist,
             first_value(event_id) OVER (PARTITION BY user_id
               ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
               AS first_event
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
      ORDER BY event_id"""
  private val q62 = Q("q62_window_ranks",
    (s, dir) => {
      Tables.registerAll(s, dir)
      s.sql(q62Sql)
        .withColumn("rnk", col("rnk").cast("long"))
        .withColumn("drnk", col("drnk").cast("long"))
        .withColumn("quartile", col("quartile").cast("long"))
        .orderBy("event_id")
    },
    Some(q62Sql))

  /** Full CUBE over two dimensions with GROUPING level labels (the
    * remaining member of the grouping-sets family next to q8's ROLLUP
    * and q16's per-dim sets). Level-first ordering keeps NULL
    * grouping placeholders out of the sort comparison (Spark NULLS
    * FIRST vs DuckDB NULLS LAST). */
  private val q63 = Q("q63_cube",
    (s, dir) => t(s, dir, "lineitem")
      .cube(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n_rows"),
        dsum(col("l_quantity"), 2).as("sum_qty"),
        (grouping(col("l_returnflag")) * 2 + grouping(col("l_linestatus")))
          .cast("int").as("lvl"))
      .orderBy(col("lvl"), col("l_returnflag"), col("l_linestatus")),
    Some(s"""
      SELECT l_returnflag, l_linestatus, COUNT(*) AS n_rows,
             ${dsumSql("l_quantity", 2)} AS sum_qty,
             CAST(GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus)
                  AS INTEGER) AS lvl
      FROM lineitem
      GROUP BY CUBE(l_returnflag, l_linestatus)
      ORDER BY lvl, l_returnflag, l_linestatus"""))

  /** Array scalar family over tokenized text: size, sorted slice,
    * distinct count, membership — the list-manipulation surface a
    * document pipeline leans on (Spark arrays ≡ DuckDB lists; 1-based
    * slicing on both). */
  private val q64 = Q("q64_array_ops",
    (s, dir) => {
      val toks = split(trim(lower(col("text"))), "\\s+")
      t(s, dir, "documents").select(
        col("doc_id"),
        size(toks).cast("long").as("n_toks"),
        array_join(slice(sort_array(toks), 1, 5), ",").as("first5_sorted"),
        size(array_distinct(toks)).cast("long").as("n_distinct"),
        array_contains(toks, "the").as("has_the"),
        element_at(toks, 1).as("first_tok"),
        element_at(toks, -1).as("last_tok"))
        .orderBy("doc_id")
    },
    Some("""
      SELECT doc_id,
             CAST(len(toks) AS BIGINT) AS n_toks,
             array_to_string(list_sort(toks)[1:5], ',') AS first5_sorted,
             CAST(len(list_distinct(toks)) AS BIGINT) AS n_distinct,
             list_contains(toks, 'the') AS has_the,
             toks[1] AS first_tok,
             toks[-1] AS last_tok
      FROM (SELECT doc_id,
              regexp_split_to_array(trim(lower(text)), '\s+') AS toks
            FROM documents)
      ORDER BY doc_id"""))

  /** Arg-min/arg-max aggregation (min_by/max_by ≡ DuckDB
    * arg_min/arg_max): latest/earliest attribute per group in ONE hash
    * aggregate — the scalable replacement for the self-join-on-max or
    * window-filter formulations. Ordering key (event_id) unique →
    * deterministic. */
  private val q65 = Q("q65_arg_minmax",
    (s, dir) => t(s, dir, "events")
      .groupBy(col("user_id"))
      .agg(max_by(col("event_type"), col("event_id")).as("last_type"),
        min_by(col("event_type"), col("event_id")).as("first_type"),
        max(col("event_id")).as("last_id"),
        count(lit(1)).as("n_events"))
      .orderBy("user_id"),
    Some("""
      SELECT user_id,
             arg_max(event_type, event_id) AS last_type,
             arg_min(event_type, event_id) AS first_type,
             MAX(event_id) AS last_id,
             COUNT(*) AS n_events
      FROM events GROUP BY user_id ORDER BY user_id"""))

  /** Interval (range) join via the bucketized operator
    * (graft.operators.RangeJoin): each error event opens a 1-hour
    * window; non-error events of the same user inside the window
    * attach to it. The oracle is the plain BETWEEN join — the
    * bucketization must be semantically invisible. */
  private val q66 = Q("q66_range_join",
    (s, dir) => {
      val ev = t(s, dir, "events")
      val errors = ev.filter(col("event_type") === "error")
        .select(col("event_id").as("err_id"), col("user_id").as("err_user"),
          unix_timestamp(col("ts")).as("w_start"))
        .withColumn("w_end", col("w_start") + 3600)
      val nonerr = ev.filter(col("event_type") =!= "error")
        .select(col("event_id"), col("user_id"), unix_timestamp(col("ts")).as("tsec"))
      graft.operators.RangeJoin.intervalJoin(
        nonerr, "user_id", "tsec",
        errors, "err_user", "w_start", "w_end",
        Seq("err_id"), bucketWidthSec = 3600)
        .groupBy(col("err_id"))
        .agg(count(lit(1)).as("n_events"), max(col("event_id")).as("last_event"))
        .orderBy("err_id")
    },
    Some("""
      WITH err AS (SELECT event_id AS err_id, user_id,
                          epoch(ts)::BIGINT AS st
                   FROM events WHERE event_type = 'error'),
      ne AS (SELECT event_id, user_id, epoch(ts)::BIGINT AS t
             FROM events WHERE event_type <> 'error')
      SELECT err_id, COUNT(*) AS n_events, MAX(event_id) AS last_event
      FROM err JOIN ne ON ne.user_id = err.user_id
                      AND ne.t >= err.st AND ne.t <= err.st + 3600
      GROUP BY err_id ORDER BY err_id"""))

  /** Bag-semantics set operations (ALL variants — the multiset
    * complement of q10's DISTINCT trio): INTERSECT ALL / EXCEPT ALL
    * plan as Catalyst's count-based rewrites; exercised on order
    * priorities so duplicates actually matter. */
  private val q67 = Q("q67_setops_all",
    (s, dir) => {
      val hi = t(s, dir, "orders").filter(col("o_totalprice") > 150000)
        .select(col("o_orderpriority"))
      val ur = t(s, dir, "orders").filter(col("o_orderstatus") === "O")
        .select(col("o_orderpriority"))
      hi.intersectAll(ur).groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n")).select(lit("intersect_all").as("op"),
          col("o_orderpriority"), col("n"))
        .unionAll(hi.exceptAll(ur).groupBy(col("o_orderpriority"))
          .agg(count(lit(1)).as("n")).select(lit("except_all").as("op"),
            col("o_orderpriority"), col("n")))
        .orderBy("op", "o_orderpriority")
    },
    Some("""
      WITH hi AS (SELECT o_orderpriority FROM orders WHERE o_totalprice > 150000),
      ur AS (SELECT o_orderpriority FROM orders WHERE o_orderstatus = 'O')
      SELECT 'intersect_all' AS op, o_orderpriority, COUNT(*) AS n
      FROM (SELECT * FROM hi INTERSECT ALL SELECT * FROM ur) GROUP BY 2
      UNION ALL
      SELECT 'except_all' AS op, o_orderpriority, COUNT(*) AS n
      FROM (SELECT * FROM hi EXCEPT ALL SELECT * FROM ur) GROUP BY 2
      ORDER BY op, o_orderpriority"""))

  /** Regex group extraction + match counting (the structured-scrape
    * member of the text family): pull the customer number and segment
    * prefix out with capture groups. */
  private val q68 = Q("q68_regexp_extract",
    (s, dir) => t(s, dir, "customer")
      .select(col("c_custkey"),
        regexp_extract(col("c_name"), "Customer#(\\d+)", 1).as("cust_digits"),
        regexp_extract(col("c_mktsegment"), "^([A-Z]{3})", 1).as("seg3"),
        size(regexp_extract_all(lower(col("c_mktsegment")), lit("[aeiou]+"), lit(0)))
          .cast("long").as("n_vowel_runs"))
      .orderBy("c_custkey"),
    Some("""
      SELECT c_custkey,
             regexp_extract(c_name, 'Customer#(\d+)', 1) AS cust_digits,
             regexp_extract(c_mktsegment, '^([A-Z]{3})', 1) AS seg3,
             CAST(len(regexp_extract_all(lower(c_mktsegment), '[aeiou]+')) AS BIGINT)
               AS n_vowel_runs
      FROM customer ORDER BY c_custkey"""))

  /** Hot-key-safe salted aggregation (operators.SkewJoin): the
    * two-phase decimal sum must be bit-identical to the single-phase
    * oracle aggregate regardless of salt scatter — the skew toolkit's
    * correctness contract, oracle-enforced. */
  private val q72 = Q("q72_salted_agg",
    (s, dir) => graft.operators.SkewJoin.saltedDecimalSum(
      t(s, dir, "events"), "user_id", "value", col("event_id"), factor = 8)
      .orderBy("user_id"),
    Some(s"""
      SELECT user_id, ${dsumSql("value", 2)} AS sum_value
      FROM events GROUP BY user_id ORDER BY user_id"""))

  /** TPC-H Q3 shape (shipping priority): three-way fact join with
    * per-side date filters, revenue top-10 — the canonical multi-join
    * analytics query, identical SQL text on both engines. */
  private val q73Sql = s"""
      SELECT l_orderkey,
             ${dsumSql("l_extendedprice * (1 - l_discount)")} AS revenue,
             CAST(o_orderdate AS DATE) AS order_date
      FROM customer
      JOIN orders ON c_custkey = o_custkey
      JOIN lineitem ON l_orderkey = o_orderkey
      WHERE c_mktsegment = 'BUILDING'
        AND o_orderdate < TIMESTAMP '1995-03-15 00:00:00'
        AND l_shipdate > TIMESTAMP '1995-03-15 00:00:00'
      GROUP BY l_orderkey, o_orderdate
      ORDER BY revenue DESC, l_orderkey LIMIT 10"""
  private val q73 = Q("q73_tpch_q3_shape",
    (s, dir) => { Tables.registerAll(s, dir); s.sql(q73Sql) },
    Some(q73Sql))

  /** TPC-H Q5 shape (local supplier volume): six-way star with the
    * local-supplier correlation (customer and supplier in the SAME
    * nation), grouped by nation. */
  private val q74Sql = s"""
      SELECT n_name,
             ${dsumSql("l_extendedprice * (1 - l_discount)")} AS revenue
      FROM customer
      JOIN orders ON c_custkey = o_custkey
      JOIN lineitem ON l_orderkey = o_orderkey
      JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      JOIN nation ON c_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      WHERE r_name = 'ASIA'
        AND o_orderdate >= TIMESTAMP '1994-01-01 00:00:00'
        AND o_orderdate < TIMESTAMP '1996-01-01 00:00:00'
      GROUP BY n_name
      ORDER BY revenue DESC, n_name"""
  private val q74 = Q("q74_tpch_q5_shape",
    (s, dir) => { Tables.registerAll(s, dir); s.sql(q74Sql) },
    Some(q74Sql))

  /** TPC-H Q7 shape (volume shipping): the double-aliased dimension —
    * nation joined TWICE (supplier side and customer side) with a
    * symmetric pair predicate, yearly revenue per direction. Exercises
    * self-aliased dimension joins, which the planner's single-owner
    * dimension model can't express — this is the raw-SQL tier. */
  private val q82Sql = s"""
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             CAST(EXTRACT(YEAR FROM l_shipdate) AS BIGINT) AS l_year,
             ${dsumSql("l_extendedprice * (1 - l_discount)")} AS revenue
      FROM supplier
      JOIN lineitem ON s_suppkey = l_suppkey
      JOIN orders ON o_orderkey = l_orderkey
      JOIN customer ON c_custkey = o_custkey
      JOIN nation n1 ON s_nationkey = n1.n_nationkey
      JOIN nation n2 ON c_nationkey = n2.n_nationkey
      WHERE n1.n_name IN ('NATION_1','NATION_2','NATION_3','NATION_4')
        AND n2.n_name IN ('NATION_1','NATION_2','NATION_3','NATION_4')
        AND n1.n_name <> n2.n_name
        AND l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
        AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
      GROUP BY n1.n_name, n2.n_name, EXTRACT(YEAR FROM l_shipdate)
      ORDER BY supp_nation, cust_nation, l_year"""
  private val q82 = Q("q82_tpch_q7_shape",
    (s, dir) => { Tables.registerAll(s, dir); s.sql(q82Sql) },
    Some(q82Sql))

  /** TPC-H Q10 shape (returned items): customer-grain revenue ranking
    * over a returnflag slice, top 20 — fact→dim aggregation with a
    * post-agg ordered limit (TakeOrdered at scale). */
  private val q83Sql = s"""
      SELECT c_custkey, c_name,
             ${dsumSql("l_extendedprice * (1 - l_discount)")} AS revenue,
             CAST(COUNT(*) AS BIGINT) AS n_items
      FROM customer
      JOIN orders ON c_custkey = o_custkey
      JOIN lineitem ON l_orderkey = o_orderkey
      WHERE o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
        AND o_orderdate < TIMESTAMP '1995-07-01 00:00:00'
        AND l_returnflag = 'R'
      GROUP BY c_custkey, c_name
      ORDER BY revenue DESC, c_custkey LIMIT 20"""
  private val q83 = Q("q83_tpch_q10_shape",
    (s, dir) => { Tables.registerAll(s, dir); s.sql(q83Sql) },
    Some(q83Sql))

  /** TPC-H Q14 shape (promo revenue share): conditional aggregation
    * ratio — two exact decimal sums over the same scan, one IEEE
    * division at the end (order-independent, engine-portable). */
  private val q84Sql = s"""
      SELECT 100.0 * ${dsumSql(
        "CASE WHEN p_type = 'PROMO' THEN l_extendedprice * (1 - l_discount) ELSE 0 END")}
             / ${dsumSql("l_extendedprice * (1 - l_discount)")} AS promo_share,
             CAST(COUNT(*) AS BIGINT) AS n_items
      FROM lineitem
      JOIN part ON p_partkey = l_partkey
      WHERE l_shipdate >= TIMESTAMP '1995-09-01 00:00:00'
        AND l_shipdate < TIMESTAMP '1995-10-01 00:00:00'"""
  private val q84 = Q("q84_tpch_q14_shape",
    (s, dir) => { Tables.registerAll(s, dir); s.sql(q84Sql) },
    Some(q84Sql))

  /** TPC-H Q19 shape (discounted revenue, disjunctive predicates):
    * brand × quantity-band OR-of-ANDs — the scan-level predicate mix
    * that proves pushdown of disjunctions into one parquet pass. */
  private val q85Sql = s"""
      SELECT ${dsumSql("l_extendedprice * (1 - l_discount)")} AS revenue,
             CAST(COUNT(*) AS BIGINT) AS n_items
      FROM lineitem
      JOIN part ON p_partkey = l_partkey
      WHERE (p_brand = 'Brand#1' AND l_quantity BETWEEN 1 AND 11
             AND p_size BETWEEN 1 AND 5)
         OR (p_brand = 'Brand#2' AND l_quantity BETWEEN 10 AND 20
             AND p_size BETWEEN 1 AND 10)
         OR (p_brand = 'Brand#3' AND l_quantity BETWEEN 20 AND 30
             AND p_size BETWEEN 1 AND 15)"""
  private val q85 = Q("q85_tpch_q19_shape",
    (s, dir) => { Tables.registerAll(s, dir); s.sql(q85Sql) },
    Some(q85Sql))

  /** Window-function breadth: lead/lag/ntile/first_value/last_value
    * over per-user event sequences — one shuffle on the partition key,
    * identical SQL text on both engines. (Ranks are q62; this covers
    * the offset/navigation family.) */
  private val q87Sql = """
      SELECT user_id, event_id,
             CAST(unix_timestamp(ts) AS BIGINT) AS ts_epoch,
             CAST(LAG(event_id) OVER w AS BIGINT) AS prev_event,
             CAST(LEAD(event_id) OVER w AS BIGINT) AS next_event,
             CAST(NTILE(4) OVER w AS BIGINT) AS quartile,
             CAST(FIRST_VALUE(event_id) OVER w AS BIGINT) AS first_event,
             CAST(LAST_VALUE(event_id) OVER
               (PARTITION BY user_id ORDER BY ts, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
               AS BIGINT) AS last_event
      FROM events
      WHERE user_id < 50
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
      ORDER BY user_id, ts_epoch, event_id"""
  private val q87 = Q("q87_window_offsets",
    (s, dir) => { Tables.registerAll(s, dir); s.sql(q87Sql) },
    // DuckDB epoch() keeps sub-second fraction and CAST rounds, while
    // Spark unix_timestamp truncates — floor() aligns them exactly
    Some(q87Sql.replace("unix_timestamp(ts)", "floor(epoch(ts))")))

  /** TPC-H Q11 shape (important stock): HAVING against a scalar
    * subquery over the same fact — group sums compared to a global
    * fraction. Both sums exact-decimal, so the boundary compare is
    * deterministic on both engines. */
  private val q93Sql = s"""
      SELECT n_name, ${dsumSql("s_acctbal", 2)} AS total_bal
      FROM supplier JOIN nation ON s_nationkey = n_nationkey
      GROUP BY n_name
      HAVING ${dsumSql("s_acctbal", 2)} >
        (SELECT ${dsumSql("s_acctbal", 2)} * 0.04 FROM supplier)
      ORDER BY total_bal DESC, n_name"""
  private val q93 = Q("q93_tpch_q11_shape",
    (s, dir) => { Tables.registerAll(s, dir); s.sql(q93Sql) },
    Some(q93Sql))

  /** TPC-H Q16 shape (parts/supplier relationship): multi-attribute
    * grouping with COUNT(DISTINCT) and a negated predicate. */
  private val q94Sql = """
      SELECT p_brand, p_type, p_size,
             CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
      FROM part JOIN lineitem ON p_partkey = l_partkey
      WHERE p_brand <> 'Brand#1' AND p_size IN (1, 4, 9, 16, 25)
      GROUP BY p_brand, p_type, p_size
      ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
      LIMIT 20"""
  private val q94 = Q("q94_tpch_q16_shape",
    (s, dir) => { Tables.registerAll(s, dir); s.sql(q94Sql) },
    Some(q94Sql))

  /** TPC-H Q18 shape (large-volume customers): IN over a grouped
    * HAVING subquery on the fact — the aggregate-then-semijoin plan. */
  private val q95Sql = s"""
      SELECT c_name, o_orderkey, CAST(o_orderdate AS DATE) AS order_date,
             ${dsumSql("l_quantity", 2)} AS total_qty
      FROM customer
      JOIN orders ON c_custkey = o_custkey
      JOIN lineitem ON o_orderkey = l_orderkey
      WHERE o_orderkey IN (
        SELECT l_orderkey FROM lineitem
        GROUP BY l_orderkey
        HAVING ${dsumSql("l_quantity", 2)} > 200)
      GROUP BY c_name, o_orderkey, o_orderdate
      ORDER BY total_qty DESC, o_orderkey
      LIMIT 20"""
  private val q95 = Q("q95_tpch_q18_shape",
    (s, dir) => { Tables.registerAll(s, dir); s.sql(q95Sql) },
    Some(q95Sql))

  /** TPC-H Q22 shape (global sales opportunity): scalar-average
    * subquery predicate + NOT EXISTS anti-join, grouped counts. The
    * average is exact-decimal-sum / count, so the threshold compare is
    * bit-identical on both engines. */
  private val q96Sql = s"""
      SELECT c_mktsegment,
             CAST(COUNT(*) AS BIGINT) AS numcust,
             ${dsumSql("c_acctbal", 2)} AS totacctbal
      FROM customer c
      WHERE c_acctbal > (
          SELECT ${dsumSql("c_acctbal", 2)} / COUNT(*)
          FROM customer WHERE c_acctbal > 0.0)
        AND NOT EXISTS (
          SELECT 1 FROM orders
          WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
      GROUP BY c_mktsegment
      ORDER BY c_mktsegment"""
  private val q96 = Q("q96_tpch_q22_shape",
    (s, dir) => { Tables.registerAll(s, dir); s.sql(q96Sql) },
    Some(q96Sql))

  /** TPC-H Q15 shape (top supplier): a revenue CTE referenced TWICE —
    * once as the join input, once under a scalar MAX — the classic
    * reused-aggregate plan (Spark caches the exchange, DuckDB the CTE).
    * The revenue sum is exact-decimal, so the MAX boundary compare is
    * deterministic on both engines. */
  private val q99Sql = s"""
      WITH rev AS (
        SELECT l_suppkey, ${dsumSql("l_extendedprice * (1 - l_discount)")} AS total_rev
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
        GROUP BY l_suppkey)
      SELECT s_suppkey, s_name, total_rev
      FROM supplier JOIN rev ON s_suppkey = l_suppkey
      WHERE total_rev = (SELECT MAX(total_rev) FROM rev)
      ORDER BY s_suppkey"""
  private val q99 = Q("q99_tpch_q15_shape",
    (s, dir) => { Tables.registerAll(s, dir); s.sql(q99Sql) },
    Some(q99Sql))

  /** TPC-H Q21 shape (suppliers who kept orders waiting): correlated
    * EXISTS + NOT EXISTS self-joins on the fact — compiles to a
    * semi-join and an anti-join on l_orderkey, both co-keyed with the
    * main join so at scale they share one shuffle key. "Late" is
    * adapted to this schema as shipped >60 days after the order date;
    * the NOT EXISTS correlates on the OUTER query's o_orderdate (same
    * order, so the same date both engines). */
  private val q100Sql = """
      SELECT s_name, CAST(COUNT(*) AS BIGINT) AS numwait
      FROM supplier
      JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
      JOIN orders ON o_orderkey = l1.l_orderkey
      WHERE o_orderstatus = 'F'
        AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
        AND EXISTS (
          SELECT 1 FROM lineitem l2
          WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
        AND NOT EXISTS (
          SELECT 1 FROM lineitem l3
          WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
            AND l3.l_shipdate > o_orderdate + INTERVAL 60 DAY)
      GROUP BY s_name
      ORDER BY numwait DESC, s_name
      LIMIT 100"""
  private val q100 = Q("q100_tpch_q21_shape",
    (s, dir) => { Tables.registerAll(s, dir); s.sql(q100Sql) },
    Some(q100Sql))

  /** Unpivot/melt (the inverse of q48's pivot): wide per-flag measure
    * columns to long (flag, measure, value) rows via Dataset.unpivot —
    * constant-factor row expansion AFTER aggregation, so the melt runs
    * at group cardinality, never fact cardinality. */
  private val q91 = Q("q91_unpivot",
    (s, dir) => t(s, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(dsum(col("l_quantity"), 2).as("sum_qty"),
        dsum(col("l_extendedprice"), 2).as("sum_price"),
        dsum(col("l_discount"), 2).as("sum_disc"))
      .unpivot(Array(col("l_returnflag")),
        Array(col("sum_qty"), col("sum_price"), col("sum_disc")),
        "measure", "value")
      .orderBy("l_returnflag", "measure"),
    Some(s"""
      WITH agg AS (
        SELECT l_returnflag,
               ${dsumSql("l_quantity", 2)} AS sum_qty,
               ${dsumSql("l_extendedprice", 2)} AS sum_price,
               ${dsumSql("l_discount", 2)} AS sum_disc
        FROM lineitem GROUP BY l_returnflag)
      SELECT l_returnflag, 'sum_qty' AS measure, sum_qty AS value FROM agg
      UNION ALL
      SELECT l_returnflag, 'sum_price', sum_price FROM agg
      UNION ALL
      SELECT l_returnflag, 'sum_disc', sum_disc FROM agg
      ORDER BY l_returnflag, measure"""))

  /** Time-spine gap filling (the MetricFlow join-to-time-spine
    * semantics): month buckets with NO fact rows still appear, with
    * zero revenue — a generated month spine LEFT-joined to the
    * aggregate. The spine bounds are fixed by the query's time range,
    * so the generate/join is deterministic and engine-portable. */
  private val q77Sql = s"""
      WITH spine AS (
        SELECT CAST(m AS DATE) AS month
        FROM (SELECT unnest(generate_series(TIMESTAMP '1995-01-01',
                     TIMESTAMP '1995-12-01', INTERVAL 1 MONTH)) AS m)),
      agg AS (
        SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
               ${dsumSql("o_totalprice", 2)} AS revenue,
               COUNT(*) AS n_orders
        FROM orders
        WHERE o_orderpriority = '1-URGENT'
          AND o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
          AND o_orderdate < TIMESTAMP '1996-01-01 00:00:00'
        GROUP BY 1)
      SELECT s.month, COALESCE(a.revenue, 0.0) AS revenue,
             COALESCE(a.n_orders, 0) AS n_orders
      FROM spine s LEFT JOIN agg a ON s.month = a.month
      ORDER BY s.month"""
  private val q77 = Q("q77_time_spine",
    (s, dir) => {
      Tables.registerAll(s, dir)
      // the ONLY dialect split in the suite: spine explosion is
      // `unnest(generate_series(...))` in DuckDB, `explode(sequence(...))`
      // in Spark — same arity, same values
      s.sql(q77Sql.replace("unnest(generate_series(", "explode(sequence("))
    },
    Some(q77Sql))

  /** Percent-of-total metric (window over the aggregate — the metric
    * layer's share-of-whole pattern): revenue share per priority from
    * ONE aggregation pass + one windowed division. */
  private val q78Sql = s"""
      SELECT o_orderpriority,
             revenue,
             revenue / SUM(revenue) OVER () AS revenue_share
      FROM (SELECT o_orderpriority,
                   ${dsumSql("o_totalprice", 2)} AS revenue
            FROM orders GROUP BY 1)
      ORDER BY o_orderpriority"""
  private val q78 = Q("q78_pct_of_total",
    (s, dir) => { Tables.registerAll(s, dir); s.sql(q78Sql) },
    Some(q78Sql))

  /** Cumulative metric (MetricFlow's running-total metric type):
    * month-grain revenue plus its running cumulative sum and a
    * 3-month trailing window — both from one aggregation pass and
    * ordered windows over the 10-row monthly frame. The cumulative
    * sums stay in DECIMAL through the window and cast to double at
    * the edge (window order is total, so this is deterministic). */
  private val q79Sql = s"""
      SELECT month,
             CAST(rev AS DOUBLE) AS revenue,
             CAST(SUM(rev) OVER (ORDER BY month
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
               AS revenue_cumulative,
             CAST(SUM(rev) OVER (ORDER BY month
               ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE)
               AS revenue_trailing_3m
      FROM (SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
                   SUM(CAST(o_totalprice AS DECIMAL(30,2))) AS rev
            FROM orders
            WHERE o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
              AND o_orderdate < TIMESTAMP '1995-11-01 00:00:00'
            GROUP BY 1)
      ORDER BY month"""
  private val q79 = Q("q79_cumulative_metric",
    (s, dir) => { Tables.registerAll(s, dir); s.sql(q79Sql) },
    Some(q79Sql))

  /** TPC-H Q2 shape (minimum-cost supplier): the correlated scalar
    * MIN subquery over a multi-join, with the costing CTE referenced
    * twice. The schema has no partsupp, so the part↔supplier relation
    * and unit cost derive from lineitem (min observed unit price per
    * part+supplier) — same plan shape: aggregate CTE, 4-dim join,
    * per-part correlated MIN with the same dimension chain inside.
    * unit_cost is a double division computed identically on both
    * engines, so the equality against the correlated MIN is exact. */
  private val q101Sql = """
      WITH cost AS (
        SELECT l_partkey, l_suppkey, MIN(l_extendedprice / l_quantity) AS unit_cost
        FROM lineitem GROUP BY l_partkey, l_suppkey)
      SELECT s_acctbal, s_name, n_name, p_partkey, p_type, unit_cost
      FROM part
      JOIN cost ON p_partkey = l_partkey
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation ON s_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      WHERE p_size <= 15 AND p_type = 'STANDARD' AND r_name = 'EUROPE'
        AND unit_cost = (
          SELECT MIN(c2.unit_cost)
          FROM cost c2
          JOIN supplier s2 ON c2.l_suppkey = s2.s_suppkey
          JOIN nation n2 ON s2.s_nationkey = n2.n_nationkey
          JOIN region r2 ON n2.n_regionkey = r2.r_regionkey
          WHERE c2.l_partkey = p_partkey AND r2.r_name = 'EUROPE')
      ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
      LIMIT 100"""
  private val q101 = Q("q101_tpch_q2_shape",
    (s, dir) => { Tables.registerAll(s, dir); s.sql(q101Sql) },
    Some(q101Sql))

  /** TPC-H Q4 shape (order priority checking): correlated EXISTS
    * against the fact with a date-arithmetic predicate, grouped
    * priority counts. "Late line" is adapted to this schema as
    * shipped >30 days after the order date (no commit/receipt dates). */
  private val q102Sql = """
      SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
      FROM orders
      WHERE o_orderdate >= TIMESTAMP '1995-07-01 00:00:00'
        AND o_orderdate < TIMESTAMP '1995-10-01 00:00:00'
        AND EXISTS (
          SELECT 1 FROM lineitem
          WHERE l_orderkey = o_orderkey
            AND l_shipdate > o_orderdate + INTERVAL 30 DAY)
      GROUP BY o_orderpriority ORDER BY o_orderpriority"""
  private val q102 = Q("q102_tpch_q4_shape",
    (s, dir) => { Tables.registerAll(s, dir); s.sql(q102Sql) },
    Some(q102Sql))

  /** TPC-H Q6 shape (forecast revenue change): the pure scan-filter-
    * aggregate — no join at all; the filters must all reach the
    * parquet scan and the single decimal sum rides the scan. */
  private val q103Sql = s"""
      SELECT ${dsumSql("l_extendedprice * l_discount")} AS revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
        AND l_shipdate < TIMESTAMP '1996-01-01 00:00:00'
        AND l_discount BETWEEN 0.05 AND 0.07
        AND l_quantity < 24"""
  private val q103 = Q("q103_tpch_q6_shape",
    (s, dir) => { Tables.registerAll(s, dir); s.sql(q103Sql) },
    Some(q103Sql))

  /** TPC-H Q8 shape (national market share): the 8-table star with a
    * conditional-share aggregate — SUM(CASE)/SUM over the same group.
    * Both sums accumulate in DECIMAL and the share is one double
    * division of two bit-identical operands, so the ratio is exact on
    * both engines. */
  private val q104Sql = """
      WITH flat AS (
        SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS o_year,
               CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,6)) AS volume,
               n2.n_name AS supp_nation
        FROM part
        JOIN lineitem ON p_partkey = l_partkey
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation n1 ON c_nationkey = n1.n_nationkey
        JOIN region ON n1.n_regionkey = r_regionkey
        JOIN nation n2 ON s_nationkey = n2.n_nationkey
        WHERE r_name = 'ASIA' AND p_type = 'PROMO'
          AND o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
          AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00')
      SELECT o_year,
             CAST(SUM(CASE WHEN supp_nation = 'NATION_4' THEN volume
                           ELSE CAST(0 AS DECIMAL(30,6)) END) AS DOUBLE)
               / CAST(SUM(volume) AS DOUBLE) AS mkt_share
      FROM flat GROUP BY o_year ORDER BY o_year"""
  private val q104 = Q("q104_tpch_q8_shape",
    (s, dir) => { Tables.registerAll(s, dir); s.sql(q104Sql) },
    Some(q104Sql))

  /** TPC-H Q9 shape (product type profit): LIKE-filtered part join
    * with a profit expression mixing fact and dimension measures,
    * grouped by supplier nation × year. p_retailprice stands in for
    * ps_supplycost (no partsupp in this schema). */
  private val q105Sql = s"""
      SELECT n_name, o_year, ${dsumSql("amount")} AS sum_profit
      FROM (SELECT n_name,
                   CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS o_year,
                   l_extendedprice * (1 - l_discount)
                     - p_retailprice * 0.1 * l_quantity AS amount
            FROM part
            JOIN lineitem ON p_partkey = l_partkey
            JOIN supplier ON s_suppkey = l_suppkey
            JOIN orders ON o_orderkey = l_orderkey
            JOIN nation ON s_nationkey = n_nationkey
            WHERE p_name LIKE '%bolt%')
      GROUP BY n_name, o_year
      ORDER BY n_name, o_year DESC"""
  private val q105 = Q("q105_tpch_q9_shape",
    (s, dir) => { Tables.registerAll(s, dir); s.sql(q105Sql) },
    Some(q105Sql))

  /** TPC-H Q12 shape (shipping modes and priority): dual conditional
    * counts per category. l_shipmode doesn't exist in this schema, so
    * the category is a derived ship-latency bucket (same CASE-bucket +
    * SUM(CASE) plan shape). */
  private val q106Sql = """
      SELECT ship_bucket,
             CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                           THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
             CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                           THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
      FROM (SELECT o_orderpriority,
                   CASE WHEN l_shipdate < o_orderdate + INTERVAL 7 DAY THEN 'WEEK'
                        WHEN l_shipdate < o_orderdate + INTERVAL 30 DAY THEN 'MONTH'
                        ELSE 'SLOW' END AS ship_bucket
            FROM orders JOIN lineitem ON o_orderkey = l_orderkey
            WHERE l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
              AND l_shipdate < TIMESTAMP '1996-01-01 00:00:00')
      GROUP BY ship_bucket ORDER BY ship_bucket"""
  private val q106 = Q("q106_tpch_q12_shape",
    (s, dir) => { Tables.registerAll(s, dir); s.sql(q106Sql) },
    Some(q106Sql))

  /** TPC-H Q13 shape (customer order-count distribution): LEFT OUTER
    * join with an extra ON-clause filter (customers with zero
    * qualifying orders must survive with count 0), then a second
    * aggregation over the first — the histogram-of-counts plan. */
  private val q107Sql = """
      SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
      FROM (SELECT c_custkey, CAST(COUNT(o_orderkey) AS BIGINT) AS c_count
            FROM customer LEFT JOIN orders
              ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
            GROUP BY c_custkey)
      GROUP BY c_count
      ORDER BY custdist DESC, c_count DESC"""
  private val q107 = Q("q107_tpch_q13_shape",
    (s, dir) => { Tables.registerAll(s, dir); s.sql(q107Sql) },
    Some(q107Sql))

  /** TPC-H Q17 shape (small-quantity-order revenue): per-part
    * correlated average threshold — the aggregate-correlated scalar
    * subquery. The average is exact-decimal-sum / count so the
    * threshold compare is bit-identical on both engines; the outer
    * sum divides by 7.0 in DOUBLE (never decimal ÷ int, whose scale
    * rules differ across engines). */
  private val q108Sql = s"""
      SELECT ${dsumSql("l_extendedprice", 4)} / 7.0 AS avg_yearly
      FROM lineitem JOIN part ON p_partkey = l_partkey
      WHERE p_brand = 'Brand#13' AND p_type = 'MEDIUM'
        AND l_quantity < (
          SELECT 0.2 * (CAST(SUM(CAST(l_quantity AS DECIMAL(30,2))) AS DOUBLE)
                          / COUNT(*))
          FROM lineitem l2 WHERE l2.l_partkey = p_partkey)"""
  private val q108 = Q("q108_tpch_q17_shape",
    (s, dir) => { Tables.registerAll(s, dir); s.sql(q108Sql) },
    Some(q108Sql))

  /** TPC-H Q20 shape (potential part promotion): the nested-IN chain —
    * suppliers IN (grouped-HAVING over lineitem restricted to parts IN
    * (LIKE-filtered part)) — compiling to two stacked semi-joins over
    * the fact aggregate. */
  private val q109Sql = s"""
      SELECT s_name, s_acctbal
      FROM supplier JOIN nation ON s_nationkey = n_nationkey
      WHERE n_name IN ('NATION_1', 'NATION_2', 'NATION_3')
        AND s_suppkey IN (
          SELECT l_suppkey FROM lineitem
          WHERE l_partkey IN (
              SELECT p_partkey FROM part WHERE p_name LIKE 'red%')
            AND l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
            AND l_shipdate < TIMESTAMP '1996-01-01 00:00:00'
          GROUP BY l_suppkey
          HAVING ${dsumSql("l_quantity", 2)} > 100.0)
      ORDER BY s_name"""
  private val q109 = Q("q109_tpch_q20_shape",
    (s, dir) => { Tables.registerAll(s, dir); s.sql(q109Sql) },
    Some(q109Sql))

  /** CTAS materialization through the statement runner (the dbt TABLE
    * materialization the reference's project compiles to): the script
    * materializes an aggregate as a physical parquet table in a
    * session warehouse, then the next statement queries the TABLE —
    * reading the parquet back, not re-running the select. Oracle = the
    * flattened CTE equivalent. The outer sum re-aggregates the
    * materialized doubles; both engines sum the same 25 values through
    * the decimal pattern, so the hash is exact. */
  // One warehouse dir per JVM (CREATE OR REPLACE makes reruns idempotent);
  // a per-invocation dir would leak parquet under /tmp across the bench
  // harness's warmup + N timed runs. Cleaned up on JVM exit.
  private lazy val q112Warehouse: String = {
    val p = java.nio.file.Files.createTempDirectory("graft-wh")
    Runtime.getRuntime.addShutdownHook(new Thread(() =>
      try {
        import java.nio.file.{Files, Path}
        import java.util.Comparator
        Files.walk(p).sorted(Comparator.reverseOrder[Path]())
          .forEach(f => Files.deleteIfExists(f))
      } catch { case _: Exception => () }))
    p.toString
  }

  private val q112 = Q("q112_ctas_script",
    (s, dir) => {
      Tables.registerAll(s, dir)
      val wh = q112Warehouse
      StatementRunner.execute(s,
        s"""BEGIN;
           |CREATE OR REPLACE TABLE seg_rev AS
           |  SELECT c_mktsegment, o_orderpriority,
           |         ${dsumSql("o_totalprice", 2)} AS rev
           |  FROM customer JOIN orders ON c_custkey = o_custkey
           |  GROUP BY c_mktsegment, o_orderpriority;
           |SELECT c_mktsegment,
           |       CAST(COUNT(*) AS BIGINT) AS n_priorities,
           |       ${dsumSql("rev", 2)} AS total_rev
           |FROM seg_rev GROUP BY c_mktsegment ORDER BY c_mktsegment;
           |COMMIT;""".stripMargin,
        fetch = true, warehouse = Some(wh)).fetched.get
    },
    Some(s"""
      WITH seg_rev AS (
        SELECT c_mktsegment, o_orderpriority,
               ${dsumSql("o_totalprice", 2)} AS rev
        FROM customer JOIN orders ON c_custkey = o_custkey
        GROUP BY c_mktsegment, o_orderpriority)
      SELECT c_mktsegment,
             CAST(COUNT(*) AS BIGINT) AS n_priorities,
             ${dsumSql("rev", 2)} AS total_rev
      FROM seg_rev GROUP BY c_mktsegment ORDER BY c_mktsegment"""))

  /** The `session_window` SEMANTICS, hash-gated in batch mode (closes
    * the r16 verdict's "spec-tested but no CORRECTNESS row" rider on
    * [[graft.streaming.StreamingPipeline.sessionWindowAgg]]): the
    * exact operator the streaming path runs (watermark is analyzer-
    * eliminated in batch), oracled by the gaps-and-islands form.
    * Spark's merge rule is OVERLAP of [ts, ts+gap) windows, so a new
    * session starts at gap >= 30 min — one microsecond-exact `>=`
    * where q38's hand-rolled rule is `>` — and session_end is
    * last-event ts + gap. The gate emits boundaries and counts
    * (epoch seconds; the float value sum is q38's dsum territory). */
  private val q301 = Q("q301_session_window",
    (s, dir) => graft.streaming.StreamingPipeline.sessionWindowAgg(
        t(s, dir, "events"))
      .select(col("user_id"),
        unix_timestamp(col("session_start")).as("session_start_s"),
        unix_timestamp(col("session_end")).as("session_end_s"),
        col("n_events"))
      .orderBy("user_id", "session_start_s"),
    Some("""
      WITH marked AS (
        SELECT user_id, ts,
               CASE WHEN lag(ts) OVER w IS NULL
                      OR date_diff('microsecond', lag(ts) OVER w, ts)
                         >= 1800000000
                    THEN 1 ELSE 0 END AS is_start
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
      sess AS (
        SELECT user_id, ts,
               SUM(is_start) OVER (PARTITION BY user_id ORDER BY ts
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        FROM marked)
      SELECT user_id,
             CAST(floor(epoch(MIN(ts))) AS BIGINT) AS session_start_s,
             CAST(floor(epoch(MAX(ts))) AS BIGINT) + 1800 AS session_end_s,
             COUNT(*) AS n_events
      FROM sess GROUP BY user_id, sid
      ORDER BY user_id, session_start_s"""))

  val all: Seq[Q] = Seq(q33, q34, q35, q36, q37, q38, q40, q41, q42, q43,
    q45, q47, q48, q49, q50, q53, q54, q55, q61, q62, q63, q64, q65, q66,
    q67, q68, q72, q73, q74, q77, q78, q79, q82, q83, q84, q85, q87, q91,
    q93, q94, q95, q96, q99, q100,
    q101, q102, q103, q104, q105, q106, q107, q108, q109, q112, q117, q123,
    q301)
}
