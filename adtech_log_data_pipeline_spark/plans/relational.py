"""General analytics (TPC-H-style) query text, shared verbatim between the
Spark SQL implementation and the DuckDB oracle — both dialects parse the
same string; only epoch-ms extraction and integer division differ
(unix_millis/epoch_ms, div///).

Float-determinism pattern: the synthetic money columns are exact 2-decimal
values stored as doubles (verified: max deviation ~1e-9), so each factor is
first snapped to an exact bigint in fixed-point units (cents for money,
1e-2 for rates). All accumulation then happens in exact INTEGER arithmetic
— immune to partial-aggregation order AND codegen-friendly (bigint sums
stay inside WholeStageCodegen; wide-decimal sums fall out to
ObjectHashAggregate with BigDecimal boxing, which cost round 3 a 3-6x
regression on every revenue query). One final bigint->double divide, which
IEEE rounds identically everywhere, converts back.

Per-group overflow bounds (bigint max 9.2e18): 1-factor cent sums carry
~1e7/row -> safe to ~9e11 rows per group; 2-factor revenue sums carry
~1.05e9/row in 1e-4 units -> safe to ~8.8e9 rows per group (sf100 lineitem
is ~6e8 rows, 14x headroom at the CUBE grand total). Only the 3-factor
sum_charge product needs 1e-6 units (~1e11/row, unsafe past ~8e7 rows), so
that one column keeps the exact-decimal accumulator.
"""

from __future__ import annotations

# exact-decimal building blocks for the 3-factor charge column only
_PRICE = "cast(l_extendedprice as decimal(12,2))"
_DISC = "(1 - cast(l_discount as decimal(8,4)))"
_TAX = "(1 + cast(l_tax as decimal(8,4)))"


def _dsum(expr: str) -> str:
    """Exact decimal sum -> quantize to 2 decimals -> double, portably.

    The inner sum keeps the full product scale (exact decimal, immune to
    partial-agg order). Quantization is explicit arithmetic — floor(x*100 +
    0.5) — because engines disagree on both implicit conversions: decimal
    scale-down is HALF_UP in Spark but truncation in DuckDB, and casting a
    full-scale decimal (mantissa > 2^53) straight to double differs by 1 ulp
    (BigDecimal correct rounding vs int128 divide). Here every step is exact
    integer arithmetic until one final bigint->double divide, which IEEE
    rounds identically everywhere. SLOW PATH (ObjectHashAggregate): reserved
    for the 3-factor product where bigint units would overflow per-group."""
    return f"(cast(cast(floor(sum({expr}) * 100 + 0.5) as bigint) as double) / 100)"


def _cents(col: str) -> str:
    """Exact bigint cents from a 2-decimal-exact double column (the *100
    may be off by ~1e-7 in binary, so round via floor(x+0.5))."""
    return f"cast(floor({col} * 100 + 0.5) as bigint)"


def _idiv(dialect: str) -> str:
    # integer division spelling: both truncate==floor for the nonnegative
    # sums used here
    return "div" if dialect == "spark" else "//"


def _csum(col: str) -> str:
    """1-factor money sum: accumulate exact bigint cents (codegen hash agg),
    one final exact bigint->double divide. Bit-identical to _dsum on
    2-decimal-exact inputs."""
    return f"(cast(sum({_cents(col)}) as double) / 100)"


def _revenue(dialect: str, p: str = "") -> str:
    """2-factor revenue sum(price * (1-disc)) in exact 1e-4 bigint units,
    then HALF_UP to cents: floor(S*100 + 0.5) == (S_e4 + 50) intdiv 100 for
    the nonnegative sums here. Same quantization contract as _dsum."""
    e4 = f"{_cents(p + 'l_extendedprice')} * (100 - {_cents(p + 'l_discount')})"
    return (
        f"(cast((sum({e4}) + 50) {_idiv(dialect)} 100 as double) / 100)"
    )


def _ms(expr: str, dialect: str) -> str:
    if dialect == "spark":
        return f"unix_millis(cast({expr} as timestamp_ltz))"
    return f"epoch_ms({expr})"


def pricing_summary_sql(dialect: str) -> str:
    """TPC-H Q1-style pricing summary: scan -> filter -> 2-key hash agg."""
    return f"""
        SELECT l_returnflag, l_linestatus,
               {_csum('l_quantity')} AS sum_qty,
               {_csum('l_extendedprice')} AS sum_base_price,
               {_revenue(dialect)} AS sum_disc_price,
               {_dsum(f'{_PRICE} * {_DISC} * {_TAX}')} AS sum_charge,
               {_csum('l_quantity')} / count(*) AS avg_qty,
               {_csum('l_extendedprice')} / count(*) AS avg_price,
               cast(count(*) as bigint) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        GROUP BY l_returnflag, l_linestatus
        """


def top_revenue_orders_sql(dialect: str) -> str:
    """TPC-H Q3-style: 3-way join + agg + deterministic top-10."""
    return f"""
        SELECT o.o_orderkey,
               {_revenue(dialect, 'l.')} AS revenue,
               {_ms('o.o_orderdate', dialect)} AS order_date_ms
        FROM customer c
        JOIN orders o ON c.c_custkey = o.o_custkey
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        WHERE c.c_mktsegment = 'BUILDING' AND o.o_orderstatus <> 'F'
        GROUP BY o.o_orderkey, o.o_orderdate
        ORDER BY revenue DESC, o_orderkey
        LIMIT 10
        """


def nation_revenue_sql(dialect: str) -> str:
    """TPC-H Q5-style star join through region/nation with
    supplier-customer co-nationality."""
    return f"""
        SELECT n.n_name,
               {_revenue(dialect, 'l.')} AS revenue
        FROM customer c
        JOIN orders o ON c.c_custkey = o.o_custkey
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
        JOIN nation n ON s.s_nationkey = n.n_nationkey
        JOIN region r ON n.n_regionkey = r.r_regionkey
        WHERE r.r_name IN ('ASIA', 'AMERICA')
        GROUP BY n.n_name
        """


def sessionized_events_sql(dialect: str) -> str:
    """Sessionization via window functions: a 30-minute inactivity gap
    starts a new session (lag + conditional running sum). Ordering is fully
    deterministic — (ts_ms, event_id) — so the running sum is stable."""
    ts = _ms("ts", dialect)
    return f"""
        WITH gaps AS (
          SELECT user_id, event_id, {ts} AS ts_ms,
                 CASE WHEN {ts}
                           - lag({ts}) OVER (PARTITION BY user_id
                                             ORDER BY {ts}, event_id)
                           > 1800000
                      THEN 1 ELSE 0 END AS new_session
          FROM events
        ),
        sess AS (
          SELECT user_id, ts_ms,
                 sum(new_session) OVER (PARTITION BY user_id ORDER BY ts_ms, event_id
                                        ROWS UNBOUNDED PRECEDING) AS session_id
          FROM gaps
        )
        SELECT user_id,
               cast(count(DISTINCT session_id) AS INT) AS n_sessions,
               cast(count(*) AS BIGINT) AS n_events,
               cast(max(ts_ms) - min(ts_ms) AS BIGINT) AS span_ms
        FROM sess
        GROUP BY user_id
        """


def scd2_intervals_sql(dialect: str) -> str:
    """SCD2 change-history build: collapse each user's event stream into
    type-2 validity intervals — a new version starts whenever the
    event_type CHANGES (gaps-and-islands via lag + conditional running
    sum; contrast sessionized_events, whose islands are time-gaps).
    valid_to_ms is the next version's valid_from_ms, NULL on the open
    (current) version. Ordering is fully deterministic — (ts_ms,
    event_id) — so version numbering is stable under any shuffle.

    Scale shape: both windows partition by user_id — ONE shuffle keyed
    on the entity, reused across lag, running sum, the interval
    aggregate and the lead; no self-join (the naive SCD2 build joins
    each row to its successor)."""
    ts = _ms("ts", dialect)
    return f"""
        WITH chg AS (
          SELECT user_id, event_type, event_id, {ts} AS ts_ms,
                 CASE WHEN lag(event_type)
                           OVER (PARTITION BY user_id ORDER BY {ts}, event_id)
                           IS DISTINCT FROM event_type
                      THEN 1 ELSE 0 END AS is_change
          FROM events
        ),
        ver AS (
          SELECT user_id, event_type, ts_ms,
                 sum(is_change) OVER (PARTITION BY user_id
                                      ORDER BY ts_ms, event_id
                                      ROWS UNBOUNDED PRECEDING) AS version
          FROM chg
        ),
        iv AS (
          SELECT user_id, event_type, cast(version AS INT) AS version,
                 cast(min(ts_ms) AS BIGINT) AS valid_from_ms,
                 cast(count(*) AS BIGINT) AS n_events
          FROM ver GROUP BY user_id, event_type, version
        )
        SELECT user_id, event_type, version, valid_from_ms,
               lead(valid_from_ms) OVER (PARTITION BY user_id
                                         ORDER BY version) AS valid_to_ms,
               n_events
        FROM iv
        """


def pit_purchase_state_sql(dialect: str) -> str:
    """Point-in-time (temporal) join — the leakage-safe dimension lookup:
    each purchase event resolved against the SCD2 validity interval that
    was CURRENT at its timestamp (ts in [valid_from, valid_to)), i.e.
    'what state was this user in when they bought'. The pattern every
    training-feature backfill needs to avoid time travel; pairs with
    rolling_user_features (which bounds a window, this one bounds a
    version).

    Scale shape: the join is EQUI-keyed on user_id with the interval
    range as a residual predicate — an entity-keyed shuffle join where
    the per-user multiplicity is that user's version count, never a
    cartesian; exactly one interval survives per probe row (law-tested).
    The SCD2 side is the already-gated scd2_intervals relation inlined
    as a subquery (same SQL, both dialects)."""
    ts = _ms("ts", dialect)
    return f"""
        WITH scd AS (SELECT * FROM ({scd2_intervals_sql(dialect)}) scd_src),
        probe AS (
          SELECT event_id, user_id, {ts} AS ts_ms
          FROM events WHERE event_type = 'purchase')
        SELECT p.event_id, p.user_id, cast(p.ts_ms as bigint) AS ts_ms,
               s.version, s.event_type AS state_type,
               s.valid_from_ms, s.n_events AS state_n_events
        FROM probe p
        JOIN scd s
          ON p.user_id = s.user_id
         AND p.ts_ms >= s.valid_from_ms
         AND (s.valid_to_ms IS NULL OR p.ts_ms < s.valid_to_ms)
        """


def rolling_user_features_sql(dialect: str) -> str:
    """Per-event rolling training features: for every event, the count
    and spend of the SAME user's events in the preceding hour
    (value-based RANGE frame, current-timestamp peers excluded so the
    result is invariant to within-timestamp ordering) plus the
    time-since-previous-event lag. The classic leakage-safe feature
    shape: each row sees strictly-earlier data only.

    Scale shape: all three windows partition by user_id — one shuffle
    keyed on the entity; the RANGE frame is a sliding two-pointer over
    each partition (no self-join, no per-row re-scan). Spend accumulates
    in exact bigint cents."""
    ts = _ms("ts", dialect)
    cents = _cents("value")
    frame = (
        "PARTITION BY user_id ORDER BY ts_ms"
        " RANGE BETWEEN 3600000 PRECEDING AND 1 PRECEDING"
    )
    return f"""
        WITH e AS (
          SELECT user_id, event_id, {ts} AS ts_ms, {cents} AS v_cents
          FROM events
        )
        SELECT user_id, event_id, ts_ms,
               cast(count(*) OVER ({frame}) AS BIGINT) AS n_prev_1h,
               cast(coalesce(sum(v_cents) OVER ({frame}), 0) AS BIGINT)
                 AS cents_prev_1h,
               ts_ms - lag(ts_ms) OVER (PARTITION BY user_id
                                        ORDER BY ts_ms, event_id)
                 AS ms_since_prev
        FROM e
        """


def retention_cohorts_sql(dialect: str) -> str:
    """Weekly retention triangle: users grouped by first-activity epoch
    week (cohort), counted as retained in every later week they appear.
    All bucketing is exact integer division on epoch millis — no date
    functions, no timezone or calendar-week engine differences.

    Scale shape: first-event time comes from an unbounded min() window
    over the user partition — NOT a self-join back onto an aggregate
    (the join form costs 4 exchanges; this costs 2: the (user, cohort,
    week) DISTINCT reuses the window's user_id hash partitioning because
    user_id is a subset of its grouping keys, leaving only the tiny
    final (cohort, week) aggregation shuffle)."""
    ts = _ms("ts", dialect)
    d = _idiv(dialect)
    wk = 604800000  # 7 * 24 * 3600 * 1000
    return f"""
        WITH e AS (
          SELECT user_id, {ts} AS ts_ms,
                 min({ts}) OVER (PARTITION BY user_id) AS first_ms
          FROM events
        ),
        a AS (
          SELECT DISTINCT user_id,
                 cast(first_ms {d} {wk} AS BIGINT) AS cohort_week,
                 cast((ts_ms - first_ms) {d} {wk} AS BIGINT) AS week_k
          FROM e
        )
        SELECT cohort_week, week_k, cast(count(*) AS BIGINT) AS n_users
        FROM a GROUP BY cohort_week, week_k
        """


def hourly_activity_sql(dialect: str) -> str:
    """Hour-of-day x event-type activity heatmap with exact bigint-cents
    spend. Hour comes from integer epoch-milli arithmetic ((ms div 1h)
    mod 24) — UTC by construction, identical in every engine."""
    ts = _ms("ts", dialect)
    d = _idiv(dialect)
    return f"""
        SELECT cast(({ts} {d} 3600000) % 24 AS INT) AS hour_utc,
               event_type,
               cast(count(*) AS BIGINT) AS n_events,
               {_csum('value')} AS sum_value
        FROM events
        GROUP BY 1, 2
        """


def top_orders_per_customer_sql(dialect: str) -> str:
    """Top-K per group via ranked window, deterministic tiebreak."""
    return """
        SELECT o_custkey, o_orderkey, rk FROM (
          SELECT o_custkey, o_orderkey,
                 row_number() OVER (PARTITION BY o_custkey
                                    ORDER BY o_totalprice DESC, o_orderkey) AS rk
          FROM orders)
        WHERE rk <= 3
        """


def revenue_cube_sql(dialect: str) -> str:
    """CUBE over (returnflag, linestatus): all 2^2 grouping combinations in
    one pass — Spark expands grouping sets inside a single hash aggregate.
    Group-marker NULLs are disambiguated by grouping_id (both dialects)."""
    return f"""
        SELECT l_returnflag, l_linestatus,
               grouping_id(l_returnflag, l_linestatus) AS gid,
               {_revenue(dialect)} AS revenue,
               cast(count(*) as bigint) AS n_items
        FROM lineitem
        GROUP BY CUBE (l_returnflag, l_linestatus)
        """


def asof_last_signup_sql(dialect: str) -> str:
    """As-of lookup: for every purchase event, the most recent prior signup
    of the same user (running conditional max over the event-time order) —
    the window formulation of an as-of join. At scale with two separate
    tables this becomes union-by-key + the same window, so the pattern
    holds without a range-join primitive."""
    ts = _ms("ts", dialect)
    return f"""
        WITH ordered AS (
          SELECT user_id, event_id, event_type, {ts} AS ts_ms,
                 max(CASE WHEN event_type = 'signup' THEN {ts} END)
                   OVER (PARTITION BY user_id ORDER BY {ts}, event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                   AS last_signup_ms
          FROM events
        )
        SELECT user_id, event_id, ts_ms,
               last_signup_ms,
               CAST(ts_ms - last_signup_ms AS BIGINT) AS ms_since_signup
        FROM ordered WHERE event_type = 'purchase'
        """


def order_priority_sql(dialect: str) -> str:
    """TPC-H Q4 shape: EXISTS correlated subquery -> semi join; counts
    orders with at least one late-shipped line item, per priority."""
    return """
        SELECT o_orderpriority, cast(count(*) as bigint) AS n_orders
        FROM orders o
        WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND o.o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
          AND EXISTS (SELECT 1 FROM lineitem l
                      WHERE l.l_orderkey = o.o_orderkey
                        AND l.l_shipdate > o.o_orderdate)
        GROUP BY o_orderpriority
        """


def returned_customers_sql(dialect: str) -> str:
    """TPC-H Q10 shape: revenue lost to returns per customer, top 20."""
    return f"""
        SELECT c.c_custkey, c.c_name, n.n_name,
               {_revenue(dialect, 'l.')} AS revenue
        FROM customer c
        JOIN orders o ON c.c_custkey = o.o_custkey
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        WHERE l.l_returnflag = 'R'
        GROUP BY c.c_custkey, c.c_name, n.n_name
        ORDER BY revenue DESC, c_custkey
        LIMIT 20
        """


def customer_order_distribution_sql(dialect: str) -> str:
    """TPC-H Q13 shape: LEFT OUTER join preserved through a double
    aggregation — per-customer order counts, then the histogram of those
    counts (customers with zero orders land in bucket 0 via the outer
    join, the part an inner join silently drops)."""
    return """
        SELECT c_count, cast(count(*) as bigint) AS custdist
        FROM (
          SELECT c.c_custkey, cast(count(o.o_orderkey) as int) AS c_count
          FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
          GROUP BY c.c_custkey)
        GROUP BY c_count
        """


def monthly_revenue_trend_sql(dialect: str) -> str:
    """Time-series window shape: monthly revenue with month-over-month
    delta via lag() over the (year, month) order — one hash agg then one
    1-partition window over ~tens of rows (the agg output, NOT the fact
    table, so the single-partition window is scale-safe)."""
    return f"""
        WITH m AS (
          SELECT cast(year(o_orderdate) as int) AS y,
                 cast(month(o_orderdate) as int) AS mo,
                 {_csum('o_totalprice')} AS revenue
          FROM orders
          GROUP BY cast(year(o_orderdate) as int), cast(month(o_orderdate) as int))
        SELECT y, mo, revenue,
               revenue - lag(revenue) OVER (ORDER BY y, mo) AS delta
        FROM m
        """


def brand_supplier_stats_sql(dialect: str) -> str:
    """TPC-H Q16 shape: distinct-supplier counts per part brand/size with
    a NOT IN exclusion subquery (suppliers in deficit) — exercises the
    null-aware anti-join path on the exclusion and distinct aggregation
    over a join."""
    return """
        SELECT p.p_brand, cast(p.p_size as int) AS p_size,
               cast(count(DISTINCT l.l_suppkey) as bigint) AS supplier_cnt
        FROM part p
        JOIN lineitem l ON l.l_partkey = p.p_partkey
        WHERE l.l_suppkey NOT IN (
              SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
        GROUP BY p.p_brand, p.p_size
        """


def quiet_returners_sql(dialect: str) -> str:
    """Set-op shape (EXCEPT): customers who placed a 1996 order but had no
    1996-shipped return — distinct-set semantics on both sides, the set
    operator the reference never needed but an analytics engine must
    have."""
    return """
        SELECT o_custkey AS custkey FROM orders
        WHERE year(o_orderdate) = 1996
        EXCEPT
        SELECT o.o_custkey FROM orders o
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        WHERE l.l_returnflag = 'R' AND year(l.l_shipdate) = 1996
        """


def sliding_window_counts_sql(dialect: str) -> str:
    """Sliding event-time windows IN BATCH (1h length, 15min slide): each
    event lands in exactly 4 windows, generated map-side (explode/unnest —
    no shuffle until the final hash agg). The window membership is the
    identical integer floor arithmetic Spark's streaming window() uses,
    stated explicitly so both dialects compute the same window starts."""
    ts = _ms("ts", dialect)
    if dialect == "spark":
        gen = "LATERAL VIEW explode(sequence(0, 3)) g AS k"
        idiv = "t div 900000"  # Spark spells integer division `div`
    else:
        gen = ", unnest(range(4)) AS g(k)"
        idiv = "t // 900000"
    return f"""
        WITH e AS (SELECT {ts} AS t, event_type FROM events),
        w AS (
          SELECT (({idiv}) - k) * 900000 AS window_start_ms, event_type
          FROM e {gen}
        )
        SELECT window_start_ms, event_type,
               cast(count(*) as bigint) AS n_events
        FROM w
        GROUP BY window_start_ms, event_type
        """


def conversion_funnel_sql(dialect: str) -> str:
    """Ordered conversion funnel: signup -> first click AFTER the signup ->
    first purchase AFTER that click, per user; output is the stage
    population counts. Each stage is a conditional min over the previous
    stage's anchor — three hash aggregates and two broadcast-sized joins,
    never a per-user sort of raw events."""
    ts = _ms("ts", dialect)
    return f"""
        WITH e AS (SELECT user_id, event_type, {ts} AS t FROM events),
        s AS (
          SELECT user_id, min(CASE WHEN event_type = 'signup' THEN t END) AS t_signup
          FROM e GROUP BY user_id
        ),
        c AS (
          SELECT e.user_id, min(t) AS t_click
          FROM e JOIN s ON e.user_id = s.user_id
          WHERE e.event_type = 'click' AND s.t_signup IS NOT NULL
                AND e.t > s.t_signup
          GROUP BY e.user_id
        ),
        p AS (
          SELECT e.user_id, min(t) AS t_purchase
          FROM e JOIN c ON e.user_id = c.user_id
          WHERE e.event_type = 'purchase' AND e.t > c.t_click
          GROUP BY e.user_id
        )
        SELECT
          cast((SELECT count(*) FROM s WHERE t_signup IS NOT NULL) as bigint) AS n_signup,
          cast((SELECT count(*) FROM c) as bigint) AS n_click_after_signup,
          cast((SELECT count(*) FROM p) as bigint) AS n_purchase_after_click
        """


def discounted_revenue_sql(dialect: str) -> str:
    """TPC-H Q19 shape: a disjunction of conjunctive bands across a join —
    exercises OR-of-ANDs predicate handling (the part-only clauses
    evaluate on the build side, the mixed part+lineitem clauses post-join)
    with the exact-cents revenue contract on the surviving sliver."""
    return f"""
        SELECT cast(count(*) as bigint) AS n_items,
               {_revenue(dialect, 'l.')} AS revenue
        FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
        WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 15
               AND l.l_quantity BETWEEN 1 AND 11)
           OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 25
               AND l.l_quantity BETWEEN 10 AND 20)
           OR (p.p_type = 'PROMO' AND p.p_size BETWEEN 1 AND 35
               AND l.l_quantity BETWEEN 20 AND 30)
        """


def small_quantity_revenue_sql(dialect: str) -> str:
    """TPC-H Q17 shape: correlated scalar-aggregate subquery — line items
    under half their part's average order quantity, rolled up per brand.
    Both engines decorrelate this to a per-part aggregate joined back to
    the fact; the avg is one double divide of exact small-integer sums,
    so the comparison is deterministic under any aggregation order."""
    return f"""
        SELECT p.p_brand, cast(count(*) as bigint) AS n_small,
               {_csum('l.l_extendedprice')} AS total_price
        FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
        WHERE l.l_quantity < (
              SELECT 0.5 * avg(l2.l_quantity) FROM lineitem l2
              WHERE l2.l_partkey = l.l_partkey)
        GROUP BY p.p_brand
        """


def waiting_suppliers_sql(dialect: str) -> str:
    """TPC-H Q21 shape: double correlation — EXISTS (another supplier also
    touched the order) AND NOT EXISTS (any OTHER supplier shipped late) on
    the same fact, i.e. suppliers solely responsible for an order's
    lateness. Planners turn this into a semi join plus a null-tolerant
    anti join against two differently-filtered reads of lineitem; "late"
    is shipdate > orderdate + 60 days (this schema has no
    receipt/commit dates)."""
    return """
        SELECT s.s_name, cast(count(*) as bigint) AS numwait
        FROM supplier s
        JOIN lineitem l1 ON s.s_suppkey = l1.l_suppkey
        JOIN orders o ON o.o_orderkey = l1.l_orderkey
        WHERE l1.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
          AND EXISTS (SELECT 1 FROM lineitem l2
                      WHERE l2.l_orderkey = l1.l_orderkey
                        AND l2.l_suppkey <> l1.l_suppkey)
          AND NOT EXISTS (SELECT 1 FROM lineitem l3
                          WHERE l3.l_orderkey = l1.l_orderkey
                            AND l3.l_suppkey <> l1.l_suppkey
                            AND l3.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
        GROUP BY s.s_name
        """


def forecast_revenue_sql(dialect: str) -> str:
    """TPC-H Q6 shape: single-scan revenue forecast — every predicate
    (year band, discount band, quantity ceiling) pushes to the parquet
    scan; the answer is one map-side-combined agg row. The discount band
    compares exact integer cents (not floats), revenue = price x discount
    in exact 1e-4 units rounded HALF_UP to cents."""
    c = _cents("l_discount")
    return f"""
        SELECT cast((sum({_cents('l_extendedprice')} * {c}) + 50)
                    {_idiv(dialect)} 100 as bigint) AS revenue_cents,
               cast(count(*) as bigint) AS n_items
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
          AND {c} BETWEEN 5 AND 7
          AND l_quantity < 24
        """


def volume_shipping_sql(dialect: str) -> str:
    """TPC-H Q7 shape: bidirectional two-nation trade volume by year —
    the 6-way join (fact + orders + both dimension chains) with a
    disjunctive nation-pair predicate the optimizer must keep above the
    joins; nations/suppliers/customers broadcast at any scale."""
    return f"""
        SELECT supp_nation, cust_nation, l_year,
               cast((sum(e4) + 50) {_idiv(dialect)} 100 as bigint)
                 AS revenue_cents,
               cast(count(*) as bigint) AS n_items
        FROM (
          SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
                 cast(year(l.l_shipdate) as int) AS l_year,
                 {_cents('l.l_extendedprice')}
                   * (100 - {_cents('l.l_discount')}) AS e4
          FROM supplier s
          JOIN lineitem l ON s.s_suppkey = l.l_suppkey
          JOIN orders o ON o.o_orderkey = l.l_orderkey
          JOIN customer c ON c.c_custkey = o.o_custkey
          JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
          JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
          WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
                 OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
            AND l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
            AND l.l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
        ) shipping
        GROUP BY supp_nation, cust_nation, l_year
        """


def market_share_sql(dialect: str) -> str:
    """TPC-H Q8 shape: one nation's share of a region's market for a part
    type, per order year — conditional-sum ratio over a 7-way join (two
    nation roles: the customer's region gates the market, the supplier's
    nation is the share numerator). Share is integer ppm over exact e4
    volumes; nullif guards an empty-market year."""
    return f"""
        SELECT o_year,
               cast((sum(CASE WHEN supp_nation = 'NATION_1' THEN e4
                              ELSE 0 END) * 1000000)
                    {_idiv(dialect)} nullif(sum(e4), 0) as bigint)
                 AS mkt_share_ppm,
               cast(count(*) as bigint) AS n_items
        FROM (
          SELECT cast(year(o.o_orderdate) as int) AS o_year,
                 n2.n_name AS supp_nation,
                 {_cents('l.l_extendedprice')}
                   * (100 - {_cents('l.l_discount')}) AS e4
          FROM part p
          JOIN lineitem l ON p.p_partkey = l.l_partkey
          JOIN supplier s ON s.s_suppkey = l.l_suppkey
          JOIN orders o ON o.o_orderkey = l.l_orderkey
          JOIN customer c ON c.c_custkey = o.o_custkey
          JOIN nation n1 ON c.c_nationkey = n1.n_nationkey
          JOIN region r ON n1.n_regionkey = r.r_regionkey
          JOIN nation n2 ON s.s_nationkey = n2.n_nationkey
          WHERE r.r_name = 'ASIA' AND p.p_type = 'PROMO'
        ) all_nations
        GROUP BY o_year
        """


def promo_revenue_share_sql(dialect: str) -> str:
    """TPC-H Q14 shape: promo revenue share per ship month — the
    conditional-aggregate ratio over a fact-dimension join; integer ppm
    over exact e4 revenue."""
    return f"""
        SELECT cast(year(l.l_shipdate) as int) AS y,
               cast(month(l.l_shipdate) as int) AS mo,
               cast((sum(CASE WHEN p.p_type = 'PROMO'
                              THEN {_cents('l.l_extendedprice')}
                                   * (100 - {_cents('l.l_discount')})
                              ELSE 0 END) * 1000000)
                    {_idiv(dialect)}
                    nullif(sum({_cents('l.l_extendedprice')}
                               * (100 - {_cents('l.l_discount')})), 0)
                 as bigint) AS promo_ppm,
               cast(count(*) as bigint) AS n_items
        FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        WHERE l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l.l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
        GROUP BY cast(year(l.l_shipdate) as int),
                 cast(month(l.l_shipdate) as int)
        """


def large_volume_customers_sql(dialect: str) -> str:
    """TPC-H Q18 shape: customers behind bulk orders — a grouped HAVING
    over the fact feeding a semi join back onto the order/customer
    detail. Quantities are exact centi-units; the HAVING threshold (250
    units) binds ~1-2% of orders on this corpus."""
    return f"""
        SELECT c.c_name, c.c_custkey, o.o_orderkey,
               cast(year(o.o_orderdate) as int) AS o_year,
               {_cents('o.o_totalprice')} AS totalprice_cents,
               big.sum_qty_centi
        FROM (
          SELECT l_orderkey,
                 cast(sum({_cents('l_quantity')}) as bigint) AS sum_qty_centi
          FROM lineitem GROUP BY l_orderkey
          HAVING sum({_cents('l_quantity')}) > 25000
        ) big
        JOIN orders o ON o.o_orderkey = big.l_orderkey
        JOIN customer c ON c.c_custkey = o.o_custkey
        """


def idle_rich_customers_sql(dialect: str) -> str:
    """TPC-H Q22 shape adapted to this schema (no c_phone country codes):
    above-average-balance customers with NO recent orders — the scalar
    average subquery feeding a null-tolerant NOT EXISTS anti join, then
    one segment aggregate. Balances are exact cents."""
    return f"""
        SELECT c.c_mktsegment,
               cast(count(*) as bigint) AS numcust,
               cast(sum({_cents('c.c_acctbal')}) as bigint) AS totacctbal_cents
        FROM customer c
        WHERE {_cents('c.c_acctbal')} > (
                -- floor() first: DuckDB ROUNDS double->bigint casts while
                -- Spark truncates; floor makes both exact-equal
                SELECT cast(floor(avg({_cents('c2.c_acctbal')})) as bigint)
                FROM customer c2 WHERE c2.c_acctbal > 0)
          AND NOT EXISTS (
                SELECT 1 FROM orders o
                WHERE o.o_custkey = c.c_custkey
                  AND o.o_orderdate >= TIMESTAMP '1999-01-01 00:00:00')
        GROUP BY c.c_mktsegment
        """


def top_supplier_revenue_sql(dialect: str) -> str:
    """TPC-H Q15 shape: revenue per supplier over one quarter, keep the
    supplier(s) AT the maximum — the scalar-subquery-over-aggregated-view
    pattern (Q15's CREATE VIEW + max() correlation, decorrelated to one
    agg reused twice). Revenue stays exact bigint cents end-to-end, so
    the max-equality keeps genuine ties and never compares floats."""
    return f"""
        WITH rev AS (
          SELECT l_suppkey AS suppkey,
                 (sum({_cents('l_extendedprice')}
                      * (100 - {_cents('l_discount')})) + 50)
                   {_idiv(dialect)} 100 AS rev_cents
          FROM lineitem
          WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
            AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
          GROUP BY l_suppkey)
        SELECT s.s_suppkey, s.s_name,
               cast(rev.rev_cents as bigint) AS total_revenue_cents
        FROM supplier s JOIN rev ON s.s_suppkey = rev.suppkey
        WHERE rev.rev_cents = (SELECT max(rev_cents) FROM rev)
        """


def part_share_suppliers_sql(dialect: str) -> str:
    """TPC-H Q20 shape adapted to this schema (no partsupp table):
    suppliers who shipped MORE THAN 30% of a part's total 1996 volume
    where the part has >= 2 suppliers — the nested correlated aggregate
    (per-group total vs per-member contribution), decorrelated to two
    stacked hash aggs + one co-keyed join. Quantities are exact
    centi-units; the share test is pure integer cross-multiplication."""
    return f"""
        WITH per AS (
          SELECT l_partkey AS partkey, l_suppkey AS suppkey,
                 sum(cast(floor(l_quantity * 100 + 0.5) as bigint)) AS q_sup
          FROM lineitem
          WHERE year(l_shipdate) = 1996
          GROUP BY l_partkey, l_suppkey),
        tot AS (SELECT partkey, sum(q_sup) AS q_tot,
                       count(*) AS n_sups
                FROM per GROUP BY partkey)
        SELECT p.partkey, p.suppkey,
               cast(p.q_sup as bigint) AS qty_centi,
               cast(t.q_tot as bigint) AS part_total_centi,
               cast((p.q_sup * 1000000) {_idiv(dialect)} t.q_tot as bigint)
                 AS share_ppm
        FROM per p JOIN tot t ON p.partkey = t.partkey
        WHERE p.q_sup * 10 > t.q_tot * 3 AND t.n_sups >= 2
        """


def revenue_rollup_sql(dialect: str) -> str:
    """ROLLUP over the (year, month) time hierarchy: month rows, year
    subtotals, and the grand total from ONE aggregation pass — the
    partial-hierarchy grouping-sets shape (CUBE's asymmetric sibling;
    revenue_cube covers the full lattice). grouping_id disambiguates
    subtotal rows from genuine NULL groups."""
    return f"""
        SELECT cast(year(o_orderdate) as int) AS y,
               cast(month(o_orderdate) as int) AS mo,
               grouping_id(cast(year(o_orderdate) as int),
                           cast(month(o_orderdate) as int)) AS gid,
               {_csum('o_totalprice')} AS revenue,
               cast(count(*) as bigint) AS n_orders
        FROM orders
        GROUP BY ROLLUP (cast(year(o_orderdate) as int),
                         cast(month(o_orderdate) as int))
        """


def repeat_customers_sql(dialect: str) -> str:
    """Set-op shape (INTERSECT): customers active in BOTH 1995 and 1996 —
    the distinct-set intersection semantics that complete the set-operator
    family (quiet_returners covers EXCEPT). Planners rewrite this as a
    distinct + left-semi join; neither year's scan materializes a distinct
    set driver-side."""
    return """
        SELECT o_custkey AS custkey FROM orders
        WHERE year(o_orderdate) = 1995
        INTERSECT
        SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996
        """


def top_parts_per_brand_sql(dialect: str) -> str:
    """Grouped top-k with TIES: the 3 highest-revenue rank VALUES per
    brand via dense_rank — tied parts all surface (row_number top-k, the
    top_orders_per_customer shape, would arbitrarily break them). Revenue
    is exact integer cents so rank ties are genuine value ties, not float
    artifacts."""
    return f"""
        WITH pr AS (
          SELECT p.p_brand, p.p_partkey,
                 {_revenue(dialect, 'l.')} AS revenue
          FROM part p JOIN lineitem l ON l.l_partkey = p.p_partkey
          GROUP BY p.p_brand, p.p_partkey)
        SELECT p_brand, p_partkey, revenue,
               cast(r as int) AS rnk
        FROM (SELECT *, dense_rank() OVER (PARTITION BY p_brand
                                           ORDER BY revenue DESC) AS r
              FROM pr)
        WHERE r <= 3
        """


def props_json_stats_sql(dialect: str) -> str:
    """Semi-structured extraction: pull the integer field out of the
    events ``props`` JSON column and aggregate per event type — the
    no-UDF JSON path (Spark's get_json_object stays inside codegen;
    schema-on-read without touching the parquet schema). Null-tolerant:
    a row whose props lacks ``k`` (or fails to parse) counts in n_events
    but not n_with_k, identically in both engines."""
    k = (
        "CAST(get_json_object(props, '$.k') AS INT)"
        if dialect == "spark"
        else "CAST(json_extract_string(props, '$.k') AS INT)"
    )
    return f"""
        WITH p AS (SELECT event_type, {k} AS k FROM events)
        SELECT event_type,
               cast(count(*) AS BIGINT) AS n_events,
               cast(count(k) AS BIGINT) AS n_with_k,
               cast(sum(k) AS BIGINT) AS sum_k,
               cast(min(k) AS INT) AS min_k,
               cast(max(k) AS INT) AS max_k
        FROM p GROUP BY event_type
        """


def frequent_part_pairs_sql(dialect: str) -> str:
    """Market-basket co-occurrence mining: the 20 part pairs most often
    bought together in one order (the support-count core of frequent-
    itemset mining, size-2 itemsets). Ties break deterministically on the
    part keys.

    Scale shape: the pair generation is a SELF-JOIN CO-KEYED ON THE
    ORDER — fan-out is sum over orders of C(k,2) with k = distinct parts
    per order, i.e. bounded by basket size (TPC-H baskets are ~4 rows),
    never all-pairs over the catalog. The top-20 is ORDER BY + LIMIT —
    Spark plans TakeOrderedAndProject (per-partition heaps, no global
    sort, no single-partition window); the rank column is attached AFTER
    the limit, a window over 20 rows."""
    return """
        WITH bask AS (
          SELECT l_orderkey AS ok, l_partkey AS pk
          FROM lineitem GROUP BY l_orderkey, l_partkey),
        pairs AS (
          SELECT a.pk AS part_1, b.pk AS part_2,
                 count(*) AS n_orders
          FROM bask a JOIN bask b ON a.ok = b.ok AND a.pk < b.pk
          GROUP BY a.pk, b.pk),
        top AS (
          SELECT part_1, part_2, n_orders FROM pairs
          ORDER BY n_orders DESC, part_1, part_2 LIMIT 20)
        SELECT part_1, part_2, cast(n_orders as bigint) AS n_orders,
               cast(row_number() OVER
                      (ORDER BY n_orders DESC, part_1, part_2) as int)
                 AS rnk
        FROM top
        """


def hourly_gapfill_sql(dialect: str) -> str:
    """Time-series resample with gap filling: per event type, the count of
    events in EVERY hour of the observed range — absent hours emitted as
    explicit zeros (the dense grid a forecasting/monitoring consumer
    needs; a plain GROUP BY silently skips empty buckets). Hours are
    integer epoch-hour buckets (ms div 3600000) — timezone-free.

    Scale shape: the grid is generated from a 1-row min/max aggregate
    cross-joined (broadcast) with the distinct type list, exploded
    map-side — grid size = n_hours x n_types, independent of the fact row
    count; the fact side collapses to (hour, type) counts BEFORE the
    left join onto the grid, so the join is grid-sized, not event-sized."""
    ts = _ms("ts", dialect)
    idiv = _idiv(dialect)
    if dialect == "spark":
        gen = "LATERAL VIEW explode(sequence(h_lo, h_hi)) g AS h"
    else:
        gen = ", unnest(generate_series(h_lo, h_hi)) AS g(h)"
    return f"""
        WITH e AS (
          SELECT ({ts}) {idiv} 3600000 AS h, event_type
          FROM events WHERE event_type IS NOT NULL),
        bounds AS (SELECT min(h) AS h_lo, max(h) AS h_hi FROM e),
        types AS (SELECT DISTINCT event_type FROM e),
        grid AS (
          SELECT event_type, h FROM types CROSS JOIN bounds {gen}),
        c AS (SELECT h, event_type, count(*) AS n FROM e
              GROUP BY h, event_type)
        SELECT grid.event_type, cast(grid.h as bigint) AS epoch_hour,
               cast(coalesce(c.n, 0) as bigint) AS n_events
        FROM grid LEFT JOIN c
          ON grid.h = c.h AND grid.event_type = c.event_type
        """


def user_value_outliers_sql(dialect: str) -> str:
    """Robust anomaly screen: per event type, users whose total event
    value sits far from the crowd by the MEDIAN/MAD rule (robust z-score
    — outliers cannot drag the center the way a mean/stddev screen
    lets them). Values accumulate in exact integer micros; both medians
    are the rank-picked LOWER median (element at rank (n+1) div 2), and
    the z-score is integer cross-multiplied milli-units — bit-exact
    across engines, no float quantile estimate anywhere.

    Scale shape: user totals are one hash agg; each median is a window
    sort PARTITIONED by event type (distributed, spillable — the same
    rank-pick pattern as length_percentiles, never a collect-to-buffer
    percentile aggregate); the two 1-row-per-type relations broadcast
    back onto the user totals. Flags |x - med| >= 3.5 * MAD
    (z_milli >= 3500), the conventional MAD-screen cutoff."""
    idiv = _idiv(dialect)
    return f"""
        WITH t AS (
          SELECT event_type, user_id,
                 sum(cast(floor(value * 1000000 + 0.5) as bigint))
                   AS total_micros
          FROM events
          WHERE event_type IS NOT NULL AND user_id IS NOT NULL
            AND value IS NOT NULL
          GROUP BY event_type, user_id),
        r1 AS (
          SELECT event_type, total_micros,
                 row_number() OVER (PARTITION BY event_type
                                    ORDER BY total_micros, user_id) AS rn,
                 count(*) OVER (PARTITION BY event_type) AS n
          FROM t),
        med AS (
          SELECT event_type, total_micros AS med_micros
          FROM r1 WHERE rn = (n + 1) {idiv} 2),
        d AS (
          SELECT t.event_type, t.user_id, t.total_micros,
                 med.med_micros,
                 abs(t.total_micros - med.med_micros) AS adev
          FROM t JOIN med ON t.event_type = med.event_type),
        r2 AS (
          SELECT event_type, adev,
                 row_number() OVER (PARTITION BY event_type
                                    ORDER BY adev, user_id) AS rn,
                 count(*) OVER (PARTITION BY event_type) AS n
          FROM d),
        mad AS (
          SELECT event_type, adev AS mad_micros
          FROM r2 WHERE rn = (n + 1) {idiv} 2)
        SELECT d.event_type, d.user_id,
               cast(d.total_micros as bigint) AS total_micros,
               cast(d.med_micros as bigint) AS med_micros,
               cast(mad.mad_micros as bigint) AS mad_micros,
               cast((d.adev * 1000) {idiv}
                    (CASE WHEN mad.mad_micros < 1 THEN 1
                          ELSE mad.mad_micros END) as bigint) AS z_milli
        FROM d JOIN mad ON d.event_type = mad.event_type
        WHERE (d.adev * 1000) {idiv}
              (CASE WHEN mad.mad_micros < 1 THEN 1
                    ELSE mad.mad_micros END) >= 3500
        """


def wide_order_facts_sql(dialect: str) -> str:
    """Feature-store denormalization: one WIDE row per order — customer /
    nation / region attributes joined in, lineitem detail collapsed to
    per-order aggregates — the flattened training-table export that
    downstream consumers read without re-joining the star. Revenue is
    exact bigint cents; the output is capped to a deterministic top-N by
    (order total, key) so the gate row stays bounded while the shape
    (3 broadcast dims + 1 co-keyed fact-fact join + per-order agg) is
    the real export plan.

    Scale shape: lineitem collapses FIRST (hash agg keyed on the
    orderkey), then joins orders co-keyed on that same key; customer,
    nation and region attach as broadcast dimension joins. The cap is
    ORDER BY + LIMIT (TakeOrdered, no global sort)."""
    return f"""
        WITH li AS (
          SELECT l_orderkey AS ok,
                 count(*) AS n_lines,
                 sum({_cents('l_extendedprice')}) AS gross_cents,
                 sum(cast(floor(l_quantity * 100 + 0.5) as bigint))
                   AS qty_centi,
                 sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
                   AS n_returned
          FROM lineitem GROUP BY l_orderkey)
        SELECT o.o_orderkey, o.o_orderstatus,
               c.c_custkey, c.c_mktsegment,
               n.n_name AS nation, r.r_name AS region,
               cast(li.n_lines as int) AS n_lines,
               cast(li.gross_cents as bigint) AS gross_cents,
               cast(li.qty_centi as bigint) AS qty_centi,
               cast(li.n_returned as int) AS n_returned
        FROM orders o
        JOIN li ON li.ok = o.o_orderkey
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN nation n ON n.n_nationkey = c.c_nationkey
        JOIN region r ON r.r_regionkey = n.n_regionkey
        ORDER BY li.gross_cents DESC, o.o_orderkey
        LIMIT 500
        """


def customer_spend_rank_sql(dialect: str) -> str:
    """Rank-family window breadth: per nation, the top-10 customers by
    lifetime spend with rank, dense_rank, percent_rank and cume_dist.
    The tie-break on custkey makes the order total, so the two rational
    statistics are each ONE IEEE division of exact small integers —
    bit-identical across engines (the same single-divide convention as
    the KMV estimator).

    Scale shape: one customer hash agg, then one nation-keyed window
    sort shared by all four rank functions; the rank <= 10 filter
    triggers WindowGroupLimit (per-partition top-k below the
    exchange)."""
    return f"""
        WITH spend AS (
          SELECT c.c_nationkey AS nk, c.c_custkey AS ck,
                 sum({_cents('o.o_totalprice')}) AS cents
          FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
          GROUP BY c.c_nationkey, c.c_custkey),
        ranked AS (
          SELECT nk, ck, cents,
                 rank() OVER (PARTITION BY nk ORDER BY cents DESC, ck)
                   AS rnk,
                 dense_rank() OVER (PARTITION BY nk
                                    ORDER BY cents DESC, ck) AS drnk,
                 percent_rank() OVER (PARTITION BY nk
                                      ORDER BY cents DESC, ck) AS prk,
                 cume_dist() OVER (PARTITION BY nk
                                   ORDER BY cents DESC, ck) AS cd
          FROM spend)
        SELECT cast(nk as bigint) AS nationkey, ck AS custkey,
               cast(cents as bigint) AS spend_cents,
               cast(rnk as int) AS rnk, cast(drnk as int) AS dense_rnk,
               prk AS pct_rank, cd AS cume_dist
        FROM ranked WHERE rnk <= 10
        """


def segment_trend_sql(dialect: str) -> str:
    """Per-segment trend line: the ordinary-least-squares slope of daily
    event value over time, per event type — "is this segment growing?" as
    a number. The whole regression is EXACT RATIONAL arithmetic: days are
    integer epoch-day buckets re-based to each segment's first day (keeps
    x small), daily values are exact bigint cents, and the slope is the
    classic closed form (n*Sxy - Sx*Sy) / (n*Sxx - Sx^2) carried as exact
    bigint numerator/denominator with one final milli-quantized integer
    divide — no float accumulation, so both engines agree bit-for-bit.
    Negative slopes divide as -(|num| div den): Spark's div truncates
    toward zero while DuckDB's // floors, so the sign is factored out
    explicitly to make both engines truncate identically.

    Scale shape: one (type, day) hash agg collapses the facts; the
    regression sums are a second tiny hash agg over segment x day rows;
    the min-day rebase is a window over that same tiny relation. Bounds:
    x <= date range in days, y <= per-day cents — n*Sxy stays orders of
    magnitude inside bigint for years of data."""
    ts = _ms("ts", dialect)
    idiv = _idiv(dialect)
    return f"""
        WITH daily AS (
          SELECT event_type,
                 ({ts}) {idiv} 86400000 AS day,
                 sum(cast(floor(value * 100 + 0.5) as bigint)) AS cents
          FROM events
          WHERE event_type IS NOT NULL AND value IS NOT NULL
          GROUP BY event_type, ({ts}) {idiv} 86400000),
        based AS (
          SELECT event_type, cents,
                 day - min(day) OVER (PARTITION BY event_type) AS x
          FROM daily),
        s AS (
          SELECT event_type,
                 count(*) AS n,
                 sum(x) AS sx, sum(cents) AS sy,
                 sum(x * cents) AS sxy, sum(x * x) AS sxx
          FROM based GROUP BY event_type)
        SELECT event_type,
               cast(n as int) AS n_days,
               cast(sy as bigint) AS total_cents,
               cast((n * sxy - sx * sy) as bigint) AS slope_num,
               cast((n * sxx - sx * sx) as bigint) AS slope_den,
               cast(CASE WHEN n * sxx - sx * sx = 0 THEN 0
                         WHEN n * sxy - sx * sy < 0
                         THEN -((1000 * (sx * sy - n * sxy))
                                {idiv} (n * sxx - sx * sx))
                         ELSE (1000 * (n * sxy - sx * sy))
                              {idiv} (n * sxx - sx * sx) END as bigint)
                 AS slope_milli_cents_per_day
        FROM s
        """


def type_transitions_sql(dialect: str) -> str:
    """First-order Markov transition matrix over each user's event-type
    sequence: (prev_type, next_type, count, row-normalized probability in
    ppm) — the behavioral-model summary (what follows what) that funnel
    and next-event-prediction features are built from. Ordering is total
    — (ts_ms, event_id) — so the lag is deterministic; probabilities are
    integer cross-multiplied ppm.

    Scale shape: one window shuffle keyed on user (the lag), one hash
    agg on the (prev, next) pair — a bounded type-domain-squared result;
    the normalizing window runs over that tiny aggregate, not the
    facts."""
    ts = _ms("ts", dialect)
    idiv = _idiv(dialect)
    return f"""
        WITH e AS (
          SELECT user_id, event_type, {ts} AS t, event_id
          FROM events
          WHERE event_type IS NOT NULL AND user_id IS NOT NULL),
        tr AS (
          SELECT lag(event_type) OVER (PARTITION BY user_id
                                       ORDER BY t, event_id) AS prev_type,
                 event_type AS next_type
          FROM e),
        c AS (
          SELECT prev_type, next_type, count(*) AS n
          FROM tr WHERE prev_type IS NOT NULL
          GROUP BY prev_type, next_type)
        SELECT prev_type, next_type,
               cast(n as bigint) AS n_transitions,
               cast((n * 1000000) {idiv}
                    sum(n) OVER (PARTITION BY prev_type) as bigint)
                 AS prob_ppm
        FROM c
        """


def cohort_ltv_sql(dialect: str) -> str:
    """Cohort lifetime-value matrix: customers grouped by first-order
    month (the cohort), revenue summed per (cohort, months-since-first) —
    the LTV curve layout (retention_cohorts counts members; this weights
    by money). Month index is pure integer year*12+month arithmetic;
    revenue stays exact bigint cents.

    Scale shape: the first-order month is ONE hash agg keyed on customer,
    joined back co-keyed on the same customer key (no window, no
    self-join of the fact table), then one (cohort, age) hash agg."""
    return f"""
        WITH om AS (
          SELECT o_custkey AS ck,
                 cast(year(o_orderdate) * 12 + month(o_orderdate) - 1
                      as bigint) AS m,
                 {_cents('o_totalprice')} AS cents
          FROM orders),
        fo AS (SELECT ck, min(m) AS cohort_m FROM om GROUP BY ck)
        SELECT cast(fo.cohort_m as bigint) AS cohort_month,
               cast(om.m - fo.cohort_m as bigint) AS months_since,
               cast(count(*) as bigint) AS n_orders,
               cast(count(DISTINCT om.ck) as bigint) AS n_customers,
               cast(sum(om.cents) as bigint) AS revenue_cents
        FROM om JOIN fo ON om.ck = fo.ck
        GROUP BY fo.cohort_m, om.m - fo.cohort_m
        """


def value_deciles_sql(dialect: str) -> str:
    """Equi-depth binning: per event type, NTILE(10) decile boundaries of
    the event value — the feature-binning / histogram-equalization step
    of a training pipeline (contrast length_histogram's fixed log2 bins:
    equi-depth adapts the edges to the distribution). Values quantize to
    exact integer micros and the tile order is total — (micros,
    event_id) — so tile assignment is deterministic and both engines
    agree bit-for-bit.

    Scale shape: one window sort partitioned by event type (distributed,
    spillable — the same rank-pick family as length_percentiles) feeding
    one hash agg; nothing is collected."""
    return """
        WITH v AS (
          SELECT event_type, event_id,
                 cast(floor(value * 1000000 + 0.5) as bigint) AS micros
          FROM events
          WHERE event_type IS NOT NULL AND value IS NOT NULL),
        d AS (
          SELECT event_type, micros,
                 ntile(10) OVER (PARTITION BY event_type
                                 ORDER BY micros, event_id) AS decile
          FROM v)
        SELECT event_type, cast(decile as int) AS decile,
               cast(count(*) as bigint) AS n_rows,
               cast(min(micros) as bigint) AS lo_micros,
               cast(max(micros) as bigint) AS hi_micros
        FROM d GROUP BY event_type, decile
        """


def fk_integrity_audit_sql(dialect: str) -> str:
    """Referential-integrity audit over every foreign-key edge of the
    star schema: one row per edge with the child row count and the count
    of ORPHANS (child keys with no parent row) — the load-time data-quality
    gate a warehouse runs before trusting a snapshot (same fail-loud
    philosophy as the reference's corruption tripwires,
    D/CorruptedDataException.java:6-25, restated as a report instead of an
    abort so the blast radius is observable).

    Scale shape: each edge is one LEFT JOIN + conditional count. The five
    dimension-side edges broadcast (nation/region/customer/supplier/part
    are all orders-of-magnitude smaller than the fact); the single
    fact-to-fact edge (lineitem->orders) is a co-keyed shuffle join on the
    orderkey both tables are naturally clustered by. NULL child keys are
    counted separately (n_null_keys) — a NULL FK is "unknown", not an
    orphan, and folding the two together hides which invariant broke."""
    edges = [
        ("lineitem.l_orderkey->orders", "lineitem", "l_orderkey",
         "orders", "o_orderkey"),
        ("lineitem.l_partkey->part", "lineitem", "l_partkey",
         "part", "p_partkey"),
        ("lineitem.l_suppkey->supplier", "lineitem", "l_suppkey",
         "supplier", "s_suppkey"),
        ("orders.o_custkey->customer", "orders", "o_custkey",
         "customer", "c_custkey"),
        ("customer.c_nationkey->nation", "customer", "c_nationkey",
         "nation", "n_nationkey"),
        ("supplier.s_nationkey->nation", "supplier", "s_nationkey",
         "nation", "n_nationkey"),
        ("nation.n_regionkey->region", "nation", "n_regionkey",
         "region", "r_regionkey"),
    ]
    parts = []
    for name, child, ck, parent, pk in edges:
        parts.append(f"""
        SELECT '{name}' AS fk_edge,
               cast(count(*) AS BIGINT) AS n_child_rows,
               cast(sum(CASE WHEN c.{ck} IS NOT NULL AND p.{pk} IS NULL
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_orphans,
               cast(sum(CASE WHEN c.{ck} IS NULL THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_null_keys
        FROM {child} c LEFT JOIN {parent} p ON c.{ck} = p.{pk}""")
    return " UNION ALL ".join(parts)


def activity_streaks_sql(dialect: str) -> str:
    """Gaps-and-islands: per user, the longest run of CONSECUTIVE active
    calendar days (UTC epoch days — integer arithmetic, no timezone or
    date-type portability surface), plus active-day and streak counts.
    The classic day - row_number() anchor trick: within a user, every
    maximal run of consecutive days shares one anchor value, so islands
    fall out of a plain GROUP BY — no iterative logic, no self-join.
    Scale shape: ONE shuffle on user_id; the row_number window and both
    aggregations ride the same partitioning."""
    ms = _ms("ts", dialect)
    return f"""
WITH d AS (
  SELECT DISTINCT user_id,
         CAST({ms} AS BIGINT) {_idiv(dialect)} 86400000 AS day
  FROM events WHERE user_id IS NOT NULL),
anchored AS (
  SELECT user_id, day,
         day - row_number() OVER (PARTITION BY user_id ORDER BY day)
           AS anchor
  FROM d),
islands AS (
  SELECT user_id, anchor, CAST(count(*) AS BIGINT) AS len
  FROM anchored GROUP BY user_id, anchor)
SELECT user_id,
       CAST(max(len) AS BIGINT) AS longest_streak_days,
       CAST(sum(len) AS BIGINT) AS n_active_days,
       CAST(count(*) AS BIGINT) AS n_streaks
FROM islands GROUP BY user_id
"""


def penny_allocation_sql(dialect: str) -> str:
    """Exact penny allocation (largest-remainder / Hamilton proration):
    each order's o_totalprice is distributed across its line items
    proportionally to quantity so the allocated CENTS sum exactly to the
    order total — the classic finance-engineering rounding problem where
    naive per-row rounding drifts by a cent per row.

    Method, all exact integers: base_i = floor(T * w_i / W); the
    leftover R = T - sum(base) (0 <= R < n) goes one cent each to the R
    rows with the largest remainder (T * w_i) mod W, ties -> smallest
    l_linenumber, then smallest quantity (the synthetic lineitem has
    DUPLICATE (orderkey, linenumber) pairs, so ln alone is not a total
    order; rows still tied after (rem, ln, w) are bit-identical, so
    either one taking the extra cent yields the same output multiset).
    Scale shape: ONE shuffle on the order key; both windows (rank,
    order-sum) ride the same partitioning. The conservation law
    (per-order allocated == total) is what the gate hash proves on
    every order.

    Overflow: T ~ 1e7 cents, w_i <= 50, W <= ~350 — T*w fits bigint with
    ~10 orders of magnitude to spare. All quantities are positive, so
    truncating integer division IS floor in both dialects."""
    return f"""
WITH li AS (
  SELECT l_orderkey AS orderkey, l_linenumber AS ln,
         CAST(l_quantity AS BIGINT) AS w
  FROM lineitem),
o AS (
  SELECT o_orderkey AS orderkey,
         CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS total_cents
  FROM orders),
t AS (
  SELECT li.orderkey, li.ln, li.w, o.total_cents,
         sum(li.w) OVER (PARTITION BY li.orderkey) AS w_tot
  FROM li JOIN o ON li.orderkey = o.orderkey),
b AS (
  SELECT orderkey, ln, w, total_cents, w_tot,
         CAST((total_cents * w) {_idiv(dialect)} w_tot AS BIGINT)
           AS base_cents,
         (total_cents * w) % w_tot AS rem
  FROM t),
r AS (
  SELECT *,
         row_number() OVER (PARTITION BY orderkey
                            ORDER BY rem DESC, ln, w) AS rk,
         total_cents - sum(base_cents) OVER (PARTITION BY orderkey)
           AS leftover
  FROM b)
SELECT orderkey, CAST(ln AS INT) AS ln,
       CAST(base_cents + CASE WHEN rk <= leftover THEN 1 ELSE 0 END
            AS BIGINT) AS alloc_cents
FROM r
"""


def weighted_median_price_sql(dialect: str) -> str:
    """Quantity-weighted median line price per ship month — the weighted
    percentile shape (exact, no approx sketch): the smallest price whose
    cumulative quantity reaches half the month's total.

    Determinism: the cumulative window uses a RANGE frame, so every tie
    group's rows all carry the GROUP-BOUNDARY cumulative sum — the picked
    price depends only on boundaries, never on intra-tie row order, under
    any partial ordering either engine produces. All arithmetic is exact
    bigint (cents x integer quantities). Scale shape: ONE shuffle on the
    month key; the per-month sort is the rank-pick idiom
    (length_percentiles) with weights."""
    return f"""
WITH t AS (
  SELECT CAST(year(l_shipdate) AS INT) AS y,
         CAST(month(l_shipdate) AS INT) AS mo,
         {_cents("l_extendedprice")} AS price_cents,
         CAST(l_quantity AS BIGINT) AS qty
  FROM lineitem),
c AS (
  SELECT y, mo, price_cents, qty,
         sum(qty) OVER (PARTITION BY y, mo ORDER BY price_cents
                        RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS cum,
         sum(qty) OVER (PARTITION BY y, mo) AS tot
  FROM t)
SELECT y, mo,
       CAST(max(tot) AS BIGINT) AS total_qty,
       CAST(min(CASE WHEN 2 * cum >= tot THEN price_cents END) AS BIGINT)
         AS wmedian_price_cents
FROM c
GROUP BY y, mo
"""


RELATIONAL_SQL = {
    "weighted_median_price": (weighted_median_price_sql, ["lineitem"]),
    "penny_allocation": (penny_allocation_sql, ["lineitem", "orders"]),
    "activity_streaks": (activity_streaks_sql, ["events"]),
    "props_json_stats": (props_json_stats_sql, ["events"]),
    "pricing_summary": (pricing_summary_sql, ["lineitem"]),
    "top_revenue_orders": (top_revenue_orders_sql, ["customer", "orders", "lineitem"]),
    "nation_revenue": (
        nation_revenue_sql,
        ["customer", "orders", "lineitem", "supplier", "nation", "region"],
    ),
    "sessionized_events": (sessionized_events_sql, ["events"]),
    "scd2_intervals": (scd2_intervals_sql, ["events"]),
    "pit_purchase_state": (pit_purchase_state_sql, ["events"]),
    "rolling_user_features": (rolling_user_features_sql, ["events"]),
    "retention_cohorts": (retention_cohorts_sql, ["events"]),
    "hourly_activity": (hourly_activity_sql, ["events"]),
    "top_orders_per_customer": (top_orders_per_customer_sql, ["orders"]),
    "revenue_cube": (revenue_cube_sql, ["lineitem"]),
    "asof_last_signup": (asof_last_signup_sql, ["events"]),
    "order_priority": (order_priority_sql, ["orders", "lineitem"]),
    "returned_customers": (returned_customers_sql, ["customer", "orders", "lineitem", "nation"]),
    "customer_order_distribution": (customer_order_distribution_sql, ["customer", "orders"]),
    "monthly_revenue_trend": (monthly_revenue_trend_sql, ["orders"]),
    "brand_supplier_stats": (brand_supplier_stats_sql, ["part", "lineitem", "supplier"]),
    "quiet_returners": (quiet_returners_sql, ["orders", "lineitem"]),
    "sliding_window_counts": (sliding_window_counts_sql, ["events"]),
    "discounted_revenue": (discounted_revenue_sql, ["lineitem", "part"]),
    "small_quantity_revenue": (small_quantity_revenue_sql, ["lineitem", "part"]),
    "waiting_suppliers": (waiting_suppliers_sql, ["supplier", "lineitem", "orders"]),
    "top_supplier_revenue": (top_supplier_revenue_sql, ["supplier", "lineitem"]),
    "part_share_suppliers": (part_share_suppliers_sql, ["lineitem"]),
    "forecast_revenue": (forecast_revenue_sql, ["lineitem"]),
    "volume_shipping": (
        volume_shipping_sql,
        ["supplier", "lineitem", "orders", "customer", "nation"],
    ),
    "market_share": (
        market_share_sql,
        ["part", "lineitem", "supplier", "orders", "customer", "nation", "region"],
    ),
    "promo_revenue_share": (promo_revenue_share_sql, ["lineitem", "part"]),
    "large_volume_customers": (
        large_volume_customers_sql,
        ["lineitem", "orders", "customer"],
    ),
    "idle_rich_customers": (idle_rich_customers_sql, ["customer", "orders"]),
    "revenue_rollup": (revenue_rollup_sql, ["orders"]),
    "repeat_customers": (repeat_customers_sql, ["orders"]),
    "top_parts_per_brand": (top_parts_per_brand_sql, ["part", "lineitem"]),
    "conversion_funnel": (conversion_funnel_sql, ["events"]),
    "fk_integrity_audit": (
        fk_integrity_audit_sql,
        ["region", "nation", "customer", "supplier", "part", "orders", "lineitem"],
    ),
    "frequent_part_pairs": (frequent_part_pairs_sql, ["lineitem"]),
    "value_deciles": (value_deciles_sql, ["events"]),
    "type_transitions": (type_transitions_sql, ["events"]),
    "segment_trend": (segment_trend_sql, ["events"]),
    "wide_order_facts": (
        wide_order_facts_sql,
        ["region", "nation", "customer", "orders", "lineitem"],
    ),
    "customer_spend_rank": (customer_spend_rank_sql, ["customer", "orders"]),
    "cohort_ltv": (cohort_ltv_sql, ["orders"]),
    "hourly_gapfill": (hourly_gapfill_sql, ["events"]),
    "user_value_outliers": (user_value_outliers_sql, ["events"]),
}
