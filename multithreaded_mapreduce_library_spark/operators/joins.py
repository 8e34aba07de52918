"""Join operator inventory — absent from the reference entirely
(SURVEY.md §2.2: "joins: ABSENT — no join of any kind"); users of the
reference would hand-roll reduce-side joins in Mapper/Reducer code. Here
every variant is declarative so Catalyst picks the physical strategy:

- broadcast-hash for the small dims (region/nation/supplier — explicitly
  hinted, and under autoBroadcastJoinThreshold anyway);
- sort-merge (with AQE skew splitting) for fact-fact joins at scale;
- shuffled-hash where hinted.

At 100 TB the fact-fact joins shuffle on the join key once; dims never
shuffle (broadcast). No driver-side collects anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from multithreaded_mapreduce_library_spark.functions import duck_money_sum, money_sum
from multithreaded_mapreduce_library_spark.registry import register
from multithreaded_mapreduce_library_spark.sources import bucketed_table, load_table


@register(
    "join_broadcast",
    oracle=f"""
SELECT r_name, n_name,
       count(*) AS n_customers,
       {duck_money_sum('c_acctbal', 'sum_acctbal')}
FROM customer
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name, n_name
""",
    tags=("join", "broadcast", "aggregation"),
    doc="Star-schema rollup through two broadcast joins (no shuffle of the fact side).",
)
def join_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            F.count("*").alias("n_customers"),
            money_sum("c_acctbal", "sum_acctbal"),
        )
    )


@register(
    "join_large",
    oracle="""
SELECT o_orderpriority,
       count(*) AS n_items,
       (sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5) AS BIGINT)) / 100) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
GROUP BY o_orderpriority
""",
    tags=("join", "sort-merge", "aggregation"),
    doc=(
        "Fact-fact equi-join (lineitem ⋈ orders). Sort-merge at scale; both "
        "sides shuffle once on the join key, AQE handles skew."
    ),
)
def join_large(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_items"),
            money_sum(revenue, "revenue"),
        )
    )


@register(
    "join_bucketed",
    oracle=f"""
SELECT o_orderpriority,
       count(*) AS n_items,
       {duck_money_sum('l_quantity', 'sum_qty')}
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
GROUP BY o_orderpriority
""",
    tags=("join", "bucketed", "co-located"),
    doc=(
        "Co-located fact-fact join off bucketed tables: lineitem and orders "
        "are stored bucketed on the orderkey (same bucket count), so the "
        "sort-merge join reads both sides already distributed on the join "
        "key — zero exchanges at the join (asserted in tests/test_plans.py; "
        "the only shuffle left is the tiny final agg on o_orderpriority). "
        "This is the shuffle-once-at-ingest layout a 100 TB fact table "
        "joined repeatedly on the same key should have; the oracle is the "
        "plain join — bucketing is layout, not semantics."
    ),
)
def join_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = bucketed_table(spark, sf_dir, "lineitem", "l_orderkey")
    o = bucketed_table(spark, sf_dir, "orders", "o_orderkey")
    # hint("merge") pins sort-merge so the co-location is demonstrable even
    # when the orders side is broadcast-sized at test SFs.
    return (
        li.hint("merge")
        .join(o.hint("merge"), li.l_orderkey == o.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n_items"), money_sum("l_quantity", "sum_qty"))
    )


@register(
    "join_left",
    oracle="""
SELECT n_events, count(*) AS n_customers FROM (
  SELECT c_custkey, count(event_id) AS n_events
  FROM customer LEFT JOIN events ON user_id = c_custkey
  GROUP BY c_custkey
) GROUP BY n_events
""",
    tags=("join", "outer"),
    doc=(
        "Left outer join preserving customers with zero events (count(col) "
        "skips the null-extended rows), then an event-count histogram."
    ),
)
def join_left(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    e = load_table(spark, sf_dir, "events")
    per_cust = (
        c.join(e, e.user_id == c.c_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("event_id").alias("n_events"))
    )
    return per_cust.groupBy("n_events").agg(F.count("*").alias("n_customers"))


@register(
    "join_right",
    oracle="""
SELECT p_brand, count(l_orderkey) AS n_lineitems
FROM lineitem RIGHT JOIN part ON l_partkey = p_partkey
GROUP BY p_brand
""",
    tags=("join", "outer"),
)
def join_right(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right outer join keeping parts with no lineitems."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    return (
        li.join(p, li.l_partkey == p.p_partkey, "right")
        .groupBy("p_brand")
        .agg(F.count("l_orderkey").alias("n_lineitems"))
    )


@register(
    "join_full",
    oracle="""
SELECT coalesce(ck, sk) AS nationkey,
       (ck IS NOT NULL) AS has_customers,
       (sk IS NOT NULL) AS has_suppliers
FROM (SELECT DISTINCT c_nationkey AS ck FROM customer)
FULL OUTER JOIN (SELECT DISTINCT s_nationkey AS sk FROM supplier) ON ck = sk
""",
    tags=("join", "outer"),
)
def join_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer join over asymmetric key sets (null-extended both ways)."""
    ck = load_table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("ck")).distinct()
    sk = load_table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("sk")).distinct()
    return ck.join(sk, ck.ck == sk.sk, "full").select(
        F.coalesce("ck", "sk").alias("nationkey"),
        F.col("ck").isNotNull().alias("has_customers"),
        F.col("sk").isNotNull().alias("has_suppliers"),
    )


@register(
    "join_semi",
    oracle="""
SELECT c_custkey, c_name
FROM customer c
WHERE EXISTS (SELECT 1 FROM events e WHERE e.user_id = c.c_custkey)
""",
    tags=("join", "semi"),
)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left semi join (EXISTS): customers with at least one event."""
    c = load_table(spark, sf_dir, "customer")
    e = load_table(spark, sf_dir, "events")
    return c.join(e, e.user_id == c.c_custkey, "left_semi").select("c_custkey", "c_name")


@register(
    "join_anti",
    oracle="""
SELECT c_custkey
FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM events e WHERE e.user_id = c.c_custkey)
""",
    tags=("join", "anti"),
)
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left anti join (NOT EXISTS): customers with no events."""
    c = load_table(spark, sf_dir, "customer")
    e = load_table(spark, sf_dir, "events")
    return c.join(e, e.user_id == c.c_custkey, "left_anti").select("c_custkey")


@register(
    "join_cross",
    oracle="""
SELECT r_name, o_orderstatus AS status, count(*) AS one
FROM region CROSS JOIN (SELECT DISTINCT o_orderstatus FROM orders)
GROUP BY r_name, o_orderstatus
""",
    tags=("join", "cross"),
)
def join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cartesian product of two tiny inputs (both broadcast-sized)."""
    r = load_table(spark, sf_dir, "region").select("r_name")
    st = load_table(spark, sf_dir, "orders").select(F.col("o_orderstatus").alias("status")).distinct()
    return r.crossJoin(st).groupBy("r_name", "status").agg(F.count("*").alias("one"))


@register(
    "join_range",
    oracle=f"""
SELECT p_brand,
       count(*) AS n_matches,
       {duck_money_sum('l_quantity', 'sum_qty')}
FROM lineitem
JOIN part ON l_partkey = p_partkey
         AND l_quantity BETWEEN p_size / 10.0 AND p_size
GROUP BY p_brand
""",
    tags=("join", "range", "theta"),
    doc=(
        "Equi-join with a range residual predicate (theta join). The equi "
        "component keys the shuffle so the range check is evaluated "
        "post-match — no nested-loop blowup at scale."
    ),
)
def join_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    cond = (
        (li.l_partkey == p.p_partkey)
        & (li.l_quantity >= p.p_size / 10.0)
        & (li.l_quantity <= p.p_size)
    )
    return (
        li.join(p, cond)
        .groupBy("p_brand")
        .agg(F.count("*").alias("n_matches"), money_sum("l_quantity", "sum_qty"))
    )


# ONE oracle for both as-of formulations (join_asof's join+argmax and
# join_asof_window's carry-forward window): sharing the constant is what
# actually enforces the "identical results, different plan" claim.
_ASOF_ORACLE = """
SELECT p.event_id, p.user_id,
       strftime(p.ts, '%Y-%m-%d %H:%M:%S.%f') AS purchase_ts,
       strftime(max(c.ts), '%Y-%m-%d %H:%M:%S.%f') AS last_click_ts,
       count(*) AS n_prior_clicks
FROM events p
JOIN events c ON c.user_id = p.user_id AND c.event_type = 'click' AND c.ts <= p.ts
WHERE p.event_type = 'purchase'
GROUP BY p.event_id, p.user_id, p.ts
"""


@register(
    "join_asof",
    oracle=_ASOF_ORACLE,
    tags=("join", "asof"),
    doc=(
        "As-of join: latest click at-or-before each purchase, per user. "
        "Composed from an equi-join on the partition key (user) plus a "
        "time-bound residual and an argmax aggregate — the key-partitioned "
        "shuffle keeps it scalable; for very deep histories the same op is "
        "expressible per-user via applyInPandas merge_asof."
    ),
)
def join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    p = e.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", F.col("ts").alias("p_ts")
    )
    c = e.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"), F.col("ts").alias("c_ts")
    )
    return (
        p.join(c, (p.user_id == c.c_user) & (c.c_ts <= p.p_ts))
        .groupBy("event_id", "user_id", "p_ts")
        .agg(
            F.max("c_ts").alias("max_c_ts"),
            F.count("*").alias("n_prior_clicks"),
        )
        .select(
            "event_id",
            "user_id",
            F.date_format("p_ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("purchase_ts"),
            F.date_format("max_c_ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("last_click_ts"),
            "n_prior_clicks",
        )
    )


@register(
    "join_shuffle_hash",
    oracle=f"""
SELECT s_name,
       count(*) AS n_items,
       {duck_money_sum('l_quantity', 'sum_qty')}
FROM lineitem
JOIN supplier ON l_suppkey = s_suppkey
GROUP BY s_name
""",
    tags=("join", "shuffle-hash", "hint"),
)
def join_shuffle_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shuffled-hash join via hint (no sort needed — wins when one side is
    much smaller per partition but too big to broadcast)."""
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier").hint("shuffle_hash")
    return (
        li.join(s, li.l_suppkey == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.count("*").alias("n_items"), money_sum("l_quantity", "sum_qty"))
    )


@register(
    "shipping_priority",
    oracle="""
SELECT l_orderkey,
       (sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5) AS BIGINT)) / 100) AS revenue,
       strftime(o_orderdate, '%Y-%m-%d') AS order_date,
       o_orderpriority
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-03-15'
  AND l_shipdate > TIMESTAMP '1998-03-15'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey
LIMIT 10
""",
    tags=("join", "flagship", "tpch-shape"),
    doc=(
        "TPC-H Q3 shape (shipping priority): selective dim filter -> "
        "3-table join -> grouped revenue -> global top-10. Catalyst pushes "
        "both date filters to the scans, the customer filter prunes before "
        "the join, and the limit runs as TakeOrderedAndProject."
    ),
)
def shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderdate") < "1998-03-15")
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > "1998-03-15")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, li.l_orderkey == o.o_orderkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(money_sum(revenue, "revenue"))
        .select(
            "l_orderkey",
            "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date"),
            "o_orderpriority",
        )
        .orderBy(F.col("revenue").desc(), "l_orderkey")
        .limit(10)
    )


@register(
    "local_supplier_volume",
    oracle="""
SELECT n_name,
       (sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5) AS BIGINT)) / 100) AS revenue,
       count(*) AS n_items
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND s_nationkey = c_nationkey
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
GROUP BY n_name
""",
    tags=("join", "flagship", "tpch-shape"),
    doc=(
        "TPC-H Q5 shape (local supplier volume): six-table join with a "
        "same-nation residual (supplier and customer in one nation), "
        "region-filtered. Dims broadcast; the two fact tables shuffle once "
        "each on the join keys."
    ),
)
def local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, F.col("l_orderkey") == o.o_orderkey)
        .join(
            F.broadcast(s),
            (F.col("l_suppkey") == s.s_suppkey) & (s.s_nationkey == c.c_nationkey),
        )
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(money_sum(revenue, "revenue"), F.count("*").alias("n_items"))
    )


N_JOIN_SALTS = 8


@register(
    "join_skew_salted",
    oracle="""
WITH dim AS (SELECT l_returnflag AS rf, count(*) AS flag_total FROM lineitem GROUP BY 1)
SELECT l_returnflag, count(*) AS n_items, min(flag_total) AS flag_total
FROM lineitem JOIN dim ON l_returnflag = rf
GROUP BY l_returnflag
""",
    tags=("join", "skew", "salting"),
    doc=(
        "Salted join on a maximally skewed key (3 distinct values over the "
        "whole fact table): the dim side is replicated across "
        f"{N_JOIN_SALTS} salts and the fact side salts on a row-local "
        "column, spreading each hot key over N tasks. Oracle is the plain "
        "join — salting is semantics-preserving. This is the manual "
        "fallback when AQE skew-join splitting can't apply (e.g. "
        "aggregation-feeding joins)."
    ),
)
def join_skew_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    # salt from a row-local id: any per-row value works — it only spreads
    # rows of one hot key across N_JOIN_SALTS join tasks
    fact = li.select("l_returnflag").withColumn(
        "salt", F.pmod(F.monotonically_increasing_id(), F.lit(N_JOIN_SALTS)).cast("int")
    )
    dim = li.groupBy(F.col("l_returnflag").alias("rf")).agg(
        F.count("*").alias("flag_total")
    )
    salts = spark.range(N_JOIN_SALTS).select(F.col("id").cast("int").alias("dsalt"))
    dim_salted = dim.crossJoin(salts)
    joined = fact.join(
        dim_salted,
        (fact.l_returnflag == dim_salted.rf) & (F.col("salt") == F.col("dsalt")),
    )
    return joined.groupBy("l_returnflag").agg(
        F.count("*").alias("n_items"), F.min("flag_total").alias("flag_total")
    )


@register(
    "join_theta",
    oracle="""
SELECT r_name, count(*) AS n_pairs, min(n_name) AS first_nation
FROM region JOIN nation ON length(n_name) > length(r_name)
GROUP BY r_name
""",
    tags=("join", "theta", "nlj"),
    doc=(
        "Pure-inequality theta join (no equi component): every (region, "
        "nation) pair where the nation name is strictly longer. With no "
        "key to hash on, the ONLY correct physical strategy is a nested-"
        "loop join — acceptable exactly because both sides are broadcast-"
        "sized dimensions. This is the deliberate counterexample to the "
        "no-NLJ rule the fact-table plans assert: at 100 TB a pure theta "
        "join between facts must be rewritten (banding/bucketing the "
        "inequality into an equi key) — the engine demonstrates that "
        "rewrite in join_range and join_asof."
    ),
)
def join_theta(spark: SparkSession, sf_dir: str) -> DataFrame:
    r = load_table(spark, sf_dir, "region").select("r_name")
    n = load_table(spark, sf_dir, "nation").select("n_name")
    return (
        r.join(F.broadcast(n), F.length(n.n_name) > F.length(r.r_name))
        .groupBy("r_name")
        .agg(F.count("*").alias("n_pairs"), F.min("n_name").alias("first_nation"))
    )


@register(
    "join_asof_window",
    # Same semantics and SAME oracle as join_asof — deliberately: this is
    # the carry-forward formulation of the as-of join, and sharing the
    # oracle proves the two plans compute identical results.
    oracle=_ASOF_ORACLE,
    tags=("join", "asof", "window"),
    doc=(
        "The SCALE-RIGHT as-of join: instead of joining every purchase "
        "against all its prior clicks (per-key fanout = clicks x "
        "purchases per user, the shape join_asof demonstrates), carry "
        "the last click forward with one ordered window pass — "
        "last(click_ts) IGNORE NULLS + a running click count over "
        "(user, ts) order, then keep purchase rows. Identical results "
        "(same oracle as join_asof, hash-checked), but the plan is ONE "
        "window exchange on user_id with NO join node and O(events) "
        "work — at 100 TB this is the difference between a quadratic "
        "per-user blowup on heavy users and a linear scan "
        "(plan-asserted in tests/test_plans.py)."
    ),
)
def join_asof_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "ts"
    )
    # Tie handling: the oracle's condition is c.ts <= p.ts, which INCLUDES
    # a click at exactly the purchase's timestamp — so at equal ts the
    # window order must place clicks BEFORE purchases or the current-row
    # frame would miss a same-ts click with a larger event_id ('click' <
    # 'purchase' lexically, so ordering by event_type does it); event_id
    # last keeps the total order deterministic.
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_type", "event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    click_ts = F.when(F.col("event_type") == "click", F.col("ts"))
    carried = e.select(
        "event_id",
        "user_id",
        "event_type",
        "ts",
        F.last(click_ts, ignorenulls=True).over(w).alias("last_click_ts"),
        F.count(click_ts).over(w).alias("n_prior_clicks"),
    )
    return (
        carried.filter(
            (F.col("event_type") == "purchase") & F.col("last_click_ts").isNotNull()
        )
        .select(
            "event_id",
            "user_id",
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("purchase_ts"),
            F.date_format("last_click_ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias(
                "last_click_ts"
            ),
            "n_prior_clicks",
        )
    )


# ---------------------------------------------------------------------------
# nearest-event as-of join (both directions, bounded tolerance)
# ---------------------------------------------------------------------------

ASOF_NEAREST_TOL_US = 3_600_000_000  # 1 hour


@register(
    "join_asof_nearest",
    oracle=f"""
WITH p AS (SELECT * FROM events WHERE event_type = 'purchase'),
c AS (SELECT * FROM events WHERE event_type = 'click'),
j AS (
  SELECT p.event_id, p.user_id, p.ts AS pts, c.ts AS cts,
         abs(date_diff('microsecond', c.ts, p.ts)) AS adt,
         row_number() OVER (
           PARTITION BY p.event_id
           ORDER BY abs(date_diff('microsecond', c.ts, p.ts)), c.ts, c.event_id
         ) AS rn
  FROM p JOIN c ON p.user_id = c.user_id
  WHERE abs(date_diff('microsecond', c.ts, p.ts)) <= {ASOF_NEAREST_TOL_US}
)
SELECT event_id, user_id,
       strftime(pts, '%Y-%m-%d %H:%M:%S.%f') AS purchase_ts,
       strftime(cts, '%Y-%m-%d %H:%M:%S.%f') AS click_ts,
       CAST(adt AS BIGINT) AS dt_us
FROM j WHERE rn = 1
""",
    tags=("join", "asof", "nearest", "window"),
    doc=(
        "Nearest-neighbor-in-time join: each purchase matches its "
        "closest click in EITHER direction within a 1-hour tolerance "
        "(ties prefer the earlier click — the oracle's (|dt|, ts, id) "
        "ranking). The oracle states the quadratic per-user join + "
        "rank; the Spark plan is the linear two-window rewrite that "
        "completes the as-of family (backward: join_asof_window): "
        "carry the last click backward AND the first click forward "
        "over one (user, ts) ordering, then pick the nearer side with "
        "integer-microsecond arithmetic. Shuffle story: ONE window "
        "exchange on user_id (both frames share the sort), NO join "
        "node, O(events) work — per-user click x purchase fanout never "
        "materializes (plan-asserted)."
    ),
)
def join_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "ts"
    )
    # clicks sort before purchases at equal ts ('click' < 'purchase'), so
    # the backward frame sees a same-ts click (dt 0) — matching the
    # oracle's <= tolerance semantics; event_id keeps the order total.
    back = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_type", "event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    fwd = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_type", "event_id")
        .rowsBetween(W.currentRow, W.unboundedFollowing)
    )
    click_ts = F.when(F.col("event_type") == "click", F.col("ts"))
    carried = e.select(
        "event_id",
        "user_id",
        "event_type",
        "ts",
        F.last(click_ts, ignorenulls=True).over(back).alias("prev_ts"),
        F.first(click_ts, ignorenulls=True).over(fwd).alias("next_ts"),
    ).filter(F.col("event_type") == "purchase")
    us = lambda c: F.unix_micros(F.col(c))  # noqa: E731
    prev_dt = us("ts") - us("prev_ts")  # >= 0 (frame is backward)
    next_dt = us("next_ts") - us("ts")  # >= 0 (frame is forward)
    # nearer side wins; exact tie prefers the earlier (backward) click
    pick_prev = F.col("prev_ts").isNotNull() & (
        F.col("next_ts").isNull() | (prev_dt <= next_dt)
    )
    chosen = carried.select(
        "event_id",
        "user_id",
        "ts",
        F.when(pick_prev, F.col("prev_ts")).otherwise(F.col("next_ts")).alias("cts"),
        F.when(pick_prev, prev_dt).otherwise(next_dt).alias("dt_us"),
    ).filter(F.col("cts").isNotNull() & (F.col("dt_us") <= ASOF_NEAREST_TOL_US))
    return chosen.select(
        "event_id",
        "user_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("purchase_ts"),
        F.date_format("cts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("click_ts"),
        "dt_us",
    )
