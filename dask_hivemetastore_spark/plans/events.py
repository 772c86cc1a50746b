"""Event-table operators: batch windows with streaming shape (SURVEY.md §2-I),
JSON/date scalar functions (§2-H), and the range / as-of joins (§2-C C6-C7).

The reference has no streaming surface at all — Dask DataFrame is batch — so
batch semantics are the parity target; ``streaming/`` holds the Structured
Streaming variants of the same ops.

``events.ts`` arrives µs-truncated TIMESTAMP_NTZ from the catalog (identical
to what the DuckDB oracle sees; SURVEY.md §7.6) regardless of the parquet
layout; operators needing integer µs derive them with ``unix_micros(ts)``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..operators.asof import asof_join
from .registry import query

_TS_FMT = "yyyy-MM-dd HH:mm:ss"


@query(
    "events_tumbling_1h",
    oracle="""
    SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour_start,
           COUNT(*)                       AS n_events,
           COUNT(DISTINCT user_id)        AS n_users,
           ROUND(SUM(value), 2)           AS total_value
    FROM events WHERE ts IS NOT NULL GROUP BY 1
    """,
)
def events_tumbling_1h(spark: SparkSession, sf_dir: str) -> DataFrame:
    """I1 tumbling hourly aggregate.

    Implemented with ``F.window`` (the Structured-Streaming-native operator,
    usable in batch) rather than date_trunc, certifying the streaming-shaped
    path; for a 1-hour tumble the two lower to the same hash aggregate.
    """
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(
            F.count("*").alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            F.date_format(F.col("w.start"), _TS_FMT).alias("hour_start"),
            "n_events",
            "n_users",
            "total_value",
        )
    )


@query(
    "events_sliding",
    oracle="""
    SELECT strftime(time_bucket(INTERVAL '15 minutes', ts) - to_minutes(15 * k),
                    '%Y-%m-%d %H:%M:%S')  AS window_start,
           COUNT(*)                        AS n_events,
           ROUND(SUM(value), 2)            AS total_value
    FROM events CROSS JOIN (VALUES (0), (1), (2), (3)) AS offsets(k)
    WHERE ts IS NOT NULL
    GROUP BY 1
    """,
)
def events_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """I2 sliding window (1 h window, 15 min slide): every event lands in
    exactly 4 windows. The oracle expands the same assignment manually
    (window starts are the four 15-minute marks in (ts-1h, ts])."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour", "15 minutes").alias("w"))
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 2).alias("total_value"))
        .select(
            F.date_format(F.col("w.start"), _TS_FMT).alias("window_start"),
            "n_events",
            "total_value",
        )
    )


@query(
    "events_sessionize",
    oracle="""
    WITH flagged AS (
        SELECT user_id, ts, value,
               CASE WHEN LAG(ts) OVER w IS NULL
                         OR ts - LAG(ts) OVER w > INTERVAL '30 minutes'
                    THEN 1 ELSE 0 END AS new_sess
        FROM events WHERE ts IS NOT NULL
        WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC)
    ), sess AS (
        SELECT *, SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts ASC
                                      ROWS UNBOUNDED PRECEDING) AS sid
        FROM flagged
    )
    SELECT user_id,
           strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
           COUNT(*)                               AS n_events,
           ROUND(SUM(value), 2)                   AS total_value
    FROM sess GROUP BY user_id, sid
    """,
)
def events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """I3 session windows (30 min inactivity gap) via ``F.session_window``.

    Boundary semantics (pinned by the hostile-events corpus, r8): Spark's
    session windows MERGE when the next event lands exactly at
    last_ts + gap — touching windows coalesce — so a new session starts
    only when the gap is STRICTLY greater than the threshold. The
    gaps-and-islands oracle uses ``>`` accordingly (an earlier ``>=``
    version diverged on an exactly-30-minute pair). Works identically in
    Structured Streaming with a watermark (streaming/ has the variant).
    """
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id", F.session_window("ts", "30 minutes").alias("w"))
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 2).alias("total_value"))
        .select(
            "user_id",
            F.date_format(F.col("w.start"), _TS_FMT).alias("session_start"),
            "n_events",
            "total_value",
        )
    )


@query(
    "json_extract_props",
    oracle="""
    SELECT TRY_CAST((CASE WHEN json_valid(props) THEN props ->> '$.k' END)
                    AS INTEGER) % 10 AS k_bucket,
           COUNT(*)             AS n,
           ROUND(AVG(value), 6) AS avg_value
    FROM events GROUP BY 1
    """,
)
def json_extract_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H-json: ``get_json_object`` over the props JSON column.

    Dirty-input contract (pinned by the hostile-events corpus, r8):
    malformed JSON, absent keys, and non-integer values (nested objects,
    arrays, JSON null) all yield a NULL bucket — ``try_cast``, because a
    nested value extracts as its JSON text and a plain cast would THROW
    under Spark 4 ANSI. The oracle mirrors every case with DuckDB's
    ``json_valid`` guard + ``->>`` + ``TRY_CAST`` (probed identical on
    all 13 hostile props shapes, including duplicate keys — both engines
    take the FIRST occurrence — and string-typed numbers, which both
    unquote then cast)."""
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").try_cast("int")
    return ev.groupBy((k % 10).alias("k_bucket")).agg(
        F.count("*").alias("n"), F.round(F.avg("value"), 6).alias("avg_value")
    )


@query(
    "events_date_parts",
    oracle="""
    SELECT strftime(ts, '%Y-%m-%d')   AS day,
           EXTRACT(hour FROM ts)      AS hr,
           COUNT(*)                   AS n
    FROM events
    WHERE EXTRACT(dow FROM ts) NOT IN (0, 6)
    GROUP BY 1, 2
    """,
)
def events_date_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H-date: date_format / hour / weekday extraction.

    Day-of-week conventions differ across engines (Spark ``dayofweek`` is
    1=Sunday; DuckDB ``dow`` is 0=Sunday) — normalized here explicitly.
    """
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.where(~F.dayofweek("ts").isin(1, 7))  # 1=Sun, 7=Sat in Spark
        .groupBy(
            F.date_format("ts", "yyyy-MM-dd").alias("day"),
            F.hour("ts").cast("long").alias("hr"),
        )
        .agg(F.count("*").alias("n"))
    )


@query(
    "range_join_events",
    oracle="""
    SELECT p.event_id                         AS purchase_id,
           COUNT(e.event_id)                  AS n_follow,
           COALESCE(ROUND(SUM(e.value), 2), 0) AS follow_value
    FROM events p
    LEFT JOIN events e
      ON e.user_id = p.user_id
     AND e.ts > p.ts
     AND e.ts <= p.ts + INTERVAL '5 minutes'
    WHERE p.event_type = 'purchase'
    GROUP BY p.event_id
    """,
)
def range_join_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C6 range join: activity within 5 minutes after each purchase.

    The equi-key (user_id) makes this a shuffled hash join with the range
    predicates evaluated as join filters — the scalable plan. A pure
    inequality join (no equi-key) would degrade to BroadcastNestedLoop;
    bucketizing time is the 100 TB fallback (SURVEY.md §2-C C6).
    """
    ev = load_table(spark, sf_dir, "events")
    p = ev.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("p_ts"),
    )
    e = ev.select(
        F.col("event_id").alias("e_id"), F.col("user_id").alias("e_user"),
        F.col("ts").alias("e_ts"), F.col("value").alias("e_value"),
    )
    cond = (
        (p.p_user == e.e_user)
        & (e.e_ts > p.p_ts)
        & (e.e_ts <= F.col("p_ts") + F.expr("INTERVAL '5' MINUTE"))
    )
    return (
        p.join(e, cond, "left")
        .groupBy("purchase_id")
        .agg(
            F.count("e_id").alias("n_follow"),
            F.coalesce(F.round(F.sum("e_value"), 2), F.lit(0.0)).alias("follow_value"),
        )
    )


@query(
    "range_join_banded",
    oracle="""
    SELECT p.event_id                          AS purchase_id,
           COUNT(e.event_id)                   AS n_any_user,
           COALESCE(ROUND(SUM(e.value), 2), 0) AS value_any_user
    FROM events p
    LEFT JOIN events e
      ON e.ts > p.ts AND e.ts <= p.ts + INTERVAL '5 minutes'
    WHERE p.event_type = 'purchase'
    GROUP BY p.event_id
    """,
)
def range_join_banded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C6 banded range join: ALL activity (any user — deliberately NO
    equi-key) within 5 minutes after each purchase. A naive inequality
    join here planks to BroadcastNestedLoopJoin (O(n·m) + whole-side
    broadcast); :mod:`..operators.rangejoin` bands time into 300 s buckets
    so the overlap becomes an equi-join on the bucket id with the exact
    range predicate as a post-filter — same answer (the DuckDB oracle IS
    the naive theta join), shuffled-join plan (pinned in
    tests/test_plans.py: no nested loop, no cartesian)."""
    from ..operators.rangejoin import point_in_interval_join

    ev = load_table(spark, sf_dir, "events")
    p = ev.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("p_ts"),
        (F.col("ts") + F.expr("INTERVAL '5' MINUTE")).alias("p_end"),
    )
    e = ev.select(
        F.col("event_id").alias("e_id"),
        F.col("ts").alias("e_ts"),
        F.col("value").alias("e_value"),
    )
    joined = point_in_interval_join(
        p, e, start_col="p_ts", end_col="p_end", point_col="e_ts",
        bucket_seconds=300, how="left",
    )
    return joined.groupBy("purchase_id").agg(
        F.count("e_id").alias("n_any_user"),
        F.coalesce(F.round(F.sum("e_value"), 2), F.lit(0.0)).alias(
            "value_any_user"
        ),
    )


@query(
    "interval_overlap_pairs",
    oracle="""
    WITH p AS (SELECT event_id AS id, ts AS s,
                      ts + INTERVAL '5 minutes' AS e
               FROM events WHERE event_type = 'purchase')
    SELECT a.id AS a_id, b.id AS b_id,
           CAST(floor(epoch(least(a.e, b.e) - greatest(a.s, b.s)))
                AS BIGINT) AS overlap_sec
    FROM p a JOIN p b
      ON a.id < b.id AND a.s <= b.e AND b.s <= a.e
    """,
)
def interval_overlap_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C6 interval×interval overlap, no equi-key: pairs of purchases (any
    users) whose 5-minute windows overlap, with the floored overlap
    seconds. Uses :func:`..operators.rangejoin.interval_overlap_join` —
    both windows band onto 300 s buckets, the pair matches ONLY in the
    bucket of ``greatest(starts)`` (each pair exactly once, no distinct),
    and the oracle is the naive theta self-join, so the hash match
    certifies the banded rewrite emits precisely the overlap set."""
    from ..operators.rangejoin import interval_overlap_join

    ev = load_table(spark, sf_dir, "events")
    p = ev.where(F.col("event_type") == "purchase")
    a = p.select(
        F.col("event_id").alias("a_id"),
        F.col("ts").alias("a_s"),
        (F.col("ts") + F.expr("INTERVAL '5' MINUTE")).alias("a_e"),
    )
    b = p.select(
        F.col("event_id").alias("b_id"),
        F.col("ts").alias("b_s"),
        (F.col("ts") + F.expr("INTERVAL '5' MINUTE")).alias("b_e"),
    )
    joined = interval_overlap_join(
        a, b, "a_s", "a_e", "b_s", "b_e", bucket_seconds=300
    )
    # DayTimeInterval → long = floored seconds, the exact-µs path certified
    # by interval_user_span (double-epoch subtraction can floor-flip)
    overlap = F.least("a_e", "b_e") - F.greatest("a_s", "b_s")
    return joined.where(F.col("a_id") < F.col("b_id")).select(
        "a_id", "b_id", overlap.cast("long").alias("overlap_sec")
    )


@query(
    "interval_overlap_longtail",
    oracle="""
    WITH iv AS (
      SELECT user_id, CAST(ts AS DATE) AS d, MIN(ts) AS s, MAX(ts) AS e
      FROM events WHERE user_id % 10 = 0
      GROUP BY 1, 2
    )
    SELECT a.user_id, strftime(a.d, '%Y-%m-%d') AS day,
           CAST(COUNT(*) AS BIGINT) AS n_overlaps
    FROM iv a JOIN iv b
      ON a.s <= b.e AND b.s <= a.e
         AND NOT (a.user_id = b.user_id AND a.d = b.d)
    GROUP BY 1, 2
    """,
)
def interval_overlap_longtail(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C6 HIERARCHICAL banded overlap join (VERDICT r5 #3's fallback,
    driver-certified): per-user daily activity spans — first-to-last event
    per (user, day), lengths anywhere from 0 s to ~24 h — make a genuinely
    long-tailed interval table where single-level 300 s banding would
    explode a full-day span onto ~288 bucket rows. With
    ``max_buckets_per_interval=16`` each interval instead picks the
    finest of 3 granularities (300 s / 4 800 s / 76 800 s) at which it
    covers ≤ 17 buckets and explodes only there; pairs meet at exactly
    ``greatest`` of their levels in the anchor bucket, once. The oracle is
    the naive theta self-join, so the hash match certifies the multi-level
    rewrite is a pure plan transformation. Output: per interval, how many
    OTHER intervals overlap it (inner join — zero-overlap spans drop on
    both sides)."""
    from ..operators.rangejoin import interval_overlap_join

    ev = load_table(spark, sf_dir, "events").where(F.col("user_id") % 10 == 0)
    iv = ev.groupBy(
        "user_id", F.to_date("ts").alias("d")
    ).agg(F.min("ts").alias("s"), F.max("ts").alias("e"))
    a = iv.select(
        F.col("user_id").alias("a_u"), F.col("d").alias("a_d"),
        F.col("s").alias("a_s"), F.col("e").alias("a_e"),
    )
    b = iv.select(
        F.col("user_id").alias("b_u"), F.col("d").alias("b_d"),
        F.col("s").alias("b_s"), F.col("e").alias("b_e"),
    )
    joined = interval_overlap_join(
        a, b, "a_s", "a_e", "b_s", "b_e", bucket_seconds=300,
        max_buckets_per_interval=16, n_levels=3,
    )
    return (
        joined.where(
            ~((F.col("a_u") == F.col("b_u")) & (F.col("a_d") == F.col("b_d")))
        )
        .groupBy("a_u", "a_d")
        .agg(F.count("*").alias("n_overlaps"))
        .select(
            F.col("a_u").alias("user_id"),
            F.date_format("a_d", "yyyy-MM-dd").alias("day"),
            "n_overlaps",
        )
    )


@query(
    "range_join_longtail_points",
    oracle="""
    WITH iv AS (
      SELECT user_id AS iv_user, CAST(ts AS DATE) AS d,
             MIN(ts) AS s, MAX(ts) AS e
      FROM events WHERE user_id % 10 = 0 GROUP BY 1, 2
    ), p AS (
      SELECT ts AS pt, value AS pv
      FROM events WHERE event_type = 'purchase' AND user_id % 7 = 0
    )
    SELECT iv_user AS user_id, strftime(d, '%Y-%m-%d') AS day,
           CAST(COUNT(pt) AS BIGINT) AS n_purchases,
           ROUND(COALESCE(SUM(pv), 0), 2) AS purchase_value
    FROM iv LEFT JOIN p ON pt > s AND pt <= e
    GROUP BY 1, 2
    """,
)
def range_join_longtail_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C6 hierarchical banded POINT-in-interval join (the other half of
    VERDICT r5 #3's fallback, driver-certified alongside
    ``interval_overlap_longtail``): per-user daily activity spans (0 s to
    ~24 h — long-tailed vs the 300 s buckets) LEFT-joined with purchase
    events from an overlapping-but-different user slice. Each span picks
    its own coarsest-necessary banding level (≤ 17 bucket rows instead of
    up to 288); each point probes all 3 static levels (3 rows). LEFT
    semantics survive the banding — uncovered spans emit NULL-point rows
    which ``count(pt)`` ignores — and the oracle is the naive theta join,
    so the hash match certifies both the candidate generation and the
    left-join NULL accounting."""
    from ..operators.rangejoin import point_in_interval_join

    ev = load_table(spark, sf_dir, "events")
    iv = (
        ev.where(F.col("user_id") % 10 == 0)
        .groupBy(
            F.col("user_id").alias("iv_user"), F.to_date("ts").alias("d")
        )
        .agg(F.min("ts").alias("s"), F.max("ts").alias("e"))
    )
    p = ev.where(
        (F.col("event_type") == "purchase") & (F.col("user_id") % 7 == 0)
    ).select(F.col("ts").alias("pt"), F.col("value").alias("pv"))
    joined = point_in_interval_join(
        iv, p, "s", "e", "pt", bucket_seconds=300, how="left",
        max_buckets_per_interval=16, n_levels=3,
    )
    return (
        joined.groupBy("iv_user", "d")
        .agg(
            F.count("pt").alias("n_purchases"),
            F.round(F.coalesce(F.sum("pv"), F.lit(0.0)), 2).alias(
                "purchase_value"
            ),
        )
        .select(
            F.col("iv_user").alias("user_id"),
            F.date_format("d", "yyyy-MM-dd").alias("day"),
            "n_purchases",
            "purchase_value",
        )
    )


@query(
    "asof_join_events",
    oracle="""
    SELECT c.event_id,
           strftime(p.ts, '%Y-%m-%d %H:%M:%S.%f') AS asof_ts,
           p.value                                AS asof_value
    FROM (SELECT * FROM events WHERE event_type = 'click')    c
    ASOF LEFT JOIN
         (SELECT * FROM events WHERE event_type = 'purchase') p
      ON c.user_id = p.user_id AND c.ts >= p.ts
    """,
)
def asof_join_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C7 as-of join: each click ← most recent prior purchase per user
    (backward, inclusive). Oracle is DuckDB's native ASOF JOIN; ours is the
    union+window rewrite in :mod:`..operators.asof`."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type", "value"
    )
    clicks = ev.where(F.col("event_type") == "click")
    purchases = ev.where(F.col("event_type") == "purchase")
    joined = asof_join(clicks, purchases, ts="ts", by="user_id", value_cols=["value"])
    return joined.select(
        "event_id",
        F.date_format("asof_ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("asof_ts"),
        F.col("asof_value"),
    )


@query(
    "map_funcs_props",
    oracle="""
    WITH e AS (
        SELECT event_id AS i, props FROM events
        WHERE json_valid(props)
          AND len(json_keys(props)) = len(list_distinct(json_keys(props)))
    ),
    kv AS (
        SELECT e.i, u.k AS key, json_extract(e.props, u.k) AS value
        FROM e, UNNEST(json_keys(e.props)) AS u(k)
    ),
    bad AS (SELECT DISTINCT i FROM kv
            WHERE json_type(value) NOT IN ('UBIGINT', 'BIGINT', 'NULL')
               OR (json_type(value) <> 'NULL'
                   AND TRY_CAST(value AS BIGINT) IS NULL)),
    withk AS (
        SELECT g.key, TRY_CAST(g.value AS BIGINT) AS val,
               COUNT(*) OVER (PARTITION BY g.i) AS n_keys
        FROM kv g WHERE g.i NOT IN (SELECT i FROM bad)
    )
    SELECT key, COUNT(*) AS n, CAST(SUM(val) AS BIGINT) AS total,
           CAST(SUM(n_keys) AS BIGINT) AS key_obs
    FROM withk GROUP BY key
    """,
)
def map_funcs_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H-map family: ``from_json`` → ``map<string,bigint>``, then
    ``explode`` (map → key/value rows), ``map_keys``/``size``.

    Dirty-input contract (pinned by the hostile-events corpus, r8), with
    the oracle reproducing it case-for-case instead of the old
    single-key regex: invalid JSON → no map (no rows); any non-integer
    value (string, nested object, array — or an integer ABOVE int64,
    which DuckDB types as UBIGINT but Spark's bigint cannot hold, hence
    the oracle's TRY_CAST-to-BIGINT guard; r8 review) nulls the WHOLE
    map, not just that entry (``from_json``'s all-or-nothing typed
    parse); JSON null
    stays as a key with NULL value (counted in ``n``/``key_obs``,
    skipped by ``SUM``); DUPLICATE-KEY objects are rejected entirely —
    ``from_json`` alone silently keeps the last occurrence, which DuckDB
    1.0 cannot express, and the variant path (``try_parse_json``)
    rejects them too, so rejection is both the consistent engine
    contract and the oracle-expressible one (the ``json_object_keys``
    size guard below). On the clean fixture this reduces to the old
    one-row answer. The map-typed operator chain is absent in the
    reference (Dask has no map dtype; SURVEY.md §2-H "map: absent")."""
    ev = load_table(spark, sf_dir, "events")
    m0 = F.from_json("props", "map<string,bigint>")
    # reject duplicate-key objects. Subtlety (r8 probe): from_json KEEPS
    # duplicate keys physically — the map displays dict-collapsed in
    # Python but explode emits BOTH rows — so the guard compares raw key
    # occurrences against their distinct form. json_object_keys, not
    # map_keys(m0): same NULL/dup verdict on every probed shape but ~15%
    # cheaper (keys-only parse vs a second typed from_json; A/B r8).
    jok = F.json_object_keys("props")
    m = F.when(F.size(F.array_distinct(jok)) == F.size(jok), m0)
    exploded = ev.withColumn("m", m).select(
        F.explode(F.col("m")).alias("key", "val"),
        F.size(F.map_keys(F.col("m"))).alias("n_keys"),
    )
    return exploded.groupBy("key").agg(
        F.count("*").alias("n"),
        F.sum("val").alias("total"),
        F.sum("n_keys").alias("key_obs"),
    )


@query(
    "date_arithmetic",
    oracle="""
    SELECT o_orderkey,
           strftime(o_orderdate + INTERVAL 30 DAY, '%Y-%m-%d')    AS due_date,
           date_diff('day', o_orderdate, TIMESTAMP '2001-01-01')  AS days_to_ref,
           date_diff('month', o_orderdate, TIMESTAMP '2001-01-01') AS months_to_ref,
           strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS order_month,
           EXTRACT(quarter FROM o_orderdate)                      AS q
    FROM orders WHERE o_orderkey % 101 = 0
    """,
)
def date_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H-date arithmetic: interval add, day/month diffs, month truncation,
    quarter extraction. Month-diff conventions differ across engines
    (DuckDB date_diff('month') counts month *boundaries crossed*; Spark's
    months_between is fractional) — the Spark side reproduces the
    boundary-count form explicitly so the two agree."""
    orders = load_table(spark, sf_dir, "orders").where(F.col("o_orderkey") % 101 == 0)
    ref_y, ref_m = 2001, 1
    months_to_ref = (
        (F.lit(ref_y) - F.year("o_orderdate")) * 12 + (F.lit(ref_m) - F.month("o_orderdate"))
    ).cast("long")
    return orders.select(
        "o_orderkey",
        F.date_format(F.date_add(F.to_date("o_orderdate"), 30), "yyyy-MM-dd").alias("due_date"),
        F.datediff(F.lit("2001-01-01").cast("date"), F.to_date("o_orderdate"))
        .cast("long").alias("days_to_ref"),
        months_to_ref.alias("months_to_ref"),
        F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM-dd").alias("order_month"),
        F.quarter("o_orderdate").cast("long").alias("q"),
    )


@query(
    "asof_join_tolerance",
    oracle="""
    SELECT c.event_id,
           CASE WHEN c.ts - p.ts <= INTERVAL '10 minutes'
                THEN strftime(p.ts, '%Y-%m-%d %H:%M:%S.%f') END AS asof_ts,
           CASE WHEN c.ts - p.ts <= INTERVAL '10 minutes'
                THEN p.value END AS asof_value
    FROM (SELECT * FROM events WHERE event_type = 'click')    c
    ASOF LEFT JOIN
         (SELECT * FROM events WHERE event_type = 'purchase') p
      ON c.user_id = p.user_id AND c.ts >= p.ts
    """,
)
def asof_join_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C7 as-of join with tolerance (pandas ``merge_asof(tolerance=...)``):
    prior purchases farther back than 10 minutes are nulled. DuckDB's ASOF
    JOIN has no tolerance clause, so the oracle applies the same null-out
    as a CASE on the matched row — semantically identical because backward
    as-of picks the *greatest* prior ts (if that one is out of tolerance,
    every prior one is)."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type", "value"
    )
    clicks = ev.where(F.col("event_type") == "click")
    purchases = ev.where(F.col("event_type") == "purchase")
    joined = asof_join(
        clicks, purchases, ts="ts", by="user_id", value_cols=["value"],
        tolerance_seconds=600,
    )
    return joined.select(
        "event_id",
        F.date_format("asof_ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("asof_ts"),
        F.col("asof_value"),
    )


@query(
    "events_hourly_gapfill",
    oracle="""
    WITH b AS (SELECT date_trunc('hour', ts) AS h, COUNT(*) AS n
               FROM events WHERE event_type = 'purchase' GROUP BY 1),
    r AS (SELECT MIN(h) AS h0, MAX(h) AS h1 FROM b),
    g AS (SELECT unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS h FROM r)
    SELECT strftime(g.h, '%Y-%m-%d %H:%M:%S') AS hour_start,
           COALESCE(b.n, 0) AS n_events
    FROM g LEFT JOIN b USING (h)
    """,
)
def events_hourly_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series gap filling: a dense hourly spine (sequence over the
    observed [min, max] range, exploded) LEFT JOINed with the sparse
    aggregate, zeros for missing buckets — what every downstream charting
    or rate job needs after a bucketed aggregate.

    The spine generates from a 1-row bounds aggregate (broadcast), so the
    only data-sized operations are the bucket agg and a broadcast join of
    the aggregate against the spine — both safe at any scale; the spine's
    size is hours-of-history, not rows."""
    ev = load_table(spark, sf_dir, "events").where(
        F.col("event_type") == "purchase"
    )
    buckets = ev.groupBy(F.date_trunc("hour", "ts").alias("h")).agg(
        F.count("*").alias("n")
    )
    bounds = buckets.agg(F.min("h").alias("h0"), F.max("h").alias("h1"))
    spine = bounds.select(
        F.explode(
            F.sequence("h0", "h1", F.expr("INTERVAL 1 HOUR"))
        ).alias("h")
    )
    return (
        spine.join(buckets, "h", "left")
        .select(
            F.date_format("h", "yyyy-MM-dd HH:mm:ss").alias("hour_start"),
            F.coalesce("n", F.lit(0)).alias("n_events"),
        )
    )


@query(
    "funnel_signup_purchase",
    oracle="""
    WITH f AS (SELECT user_id,
                      MIN(CASE WHEN event_type = 'signup' THEN ts END)   AS t_signup,
                      MIN(CASE WHEN event_type = 'click' THEN ts END)    AS t_click,
                      MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS t_buy
               FROM events GROUP BY 1)
    SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
           CAST(SUM(CASE WHEN t_signup IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS n_signup,
           CAST(SUM(CASE WHEN t_click > t_signup THEN 1 ELSE 0 END) AS BIGINT)
               AS n_click_after,
           CAST(SUM(CASE WHEN t_click > t_signup AND t_buy > t_click
                         THEN 1 ELSE 0 END) AS BIGINT)
               AS n_funnel_complete
    FROM f
    """,
)
def funnel_signup_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Funnel analysis (signup → first click after signup → first purchase
    after that click): conditional-MIN pivot per user, then ordered-step
    comparisons — one shuffle on user_id, the stages fold into a single
    hash aggregate. NULL comparisons (user never clicked) are false in
    both engines, so the step predicates need no explicit null guards."""
    ev = load_table(spark, sf_dir, "events")

    def first_ts(etype: str):
        return F.min(F.when(F.col("event_type") == etype, F.col("ts")))

    f = ev.groupBy("user_id").agg(
        first_ts("signup").alias("t_signup"),
        first_ts("click").alias("t_click"),
        first_ts("purchase").alias("t_buy"),
    )
    step2 = F.col("t_click") > F.col("t_signup")
    step3 = step2 & (F.col("t_buy") > F.col("t_click"))
    return f.agg(
        F.count("*").alias("n_users"),
        F.sum(F.when(F.col("t_signup").isNotNull(), 1).otherwise(0)).alias("n_signup"),
        F.sum(F.when(step2, 1).otherwise(0)).alias("n_click_after"),
        F.sum(F.when(step3, 1).otherwise(0)).alias("n_funnel_complete"),
    )


@query(
    "scd2_user_event_intervals",
    oracle="""
    WITH o AS (SELECT user_id, ts, event_type,
                      LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                          AS next_ts
               FROM events WHERE user_id % 97 = 0)
    SELECT user_id,
           event_type,
           strftime(ts, '%Y-%m-%d %H:%M:%S') AS valid_from,
           COALESCE(strftime(next_ts, '%Y-%m-%d %H:%M:%S'), 'current')
               AS valid_to
    FROM o
    """,
)
def scd2_user_event_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD-type-2 interval building: each state change becomes a
    [valid_from, valid_to) row via LEAD over (entity, time) — the
    standard way a change log becomes a point-in-time-queryable dimension.
    One window shuffle on the entity key; the open interval gets a
    'current' sentinel. (event_id breaks ts ties deterministically on
    both sides.)"""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events").where(F.col("user_id") % 97 == 0)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        "user_id",
        "event_type",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("valid_from"),
        F.coalesce(
            F.date_format(F.lead("ts").over(w), "yyyy-MM-dd HH:mm:ss"),
            F.lit("current"),
        ).alias("valid_to"),
    )


@query(
    "variant_extract_props",
    oracle="""
    SELECT TRY_CAST((CASE WHEN json_valid(props)
                               AND len(json_keys(props)) =
                                   len(list_distinct(json_keys(props)))
                          THEN props ->> '$.k' END)
                    AS INTEGER) % 7 AS k_mod,
           COUNT(*)             AS n,
           ROUND(SUM(value), 6) AS sum_value
    FROM events GROUP BY 1
    """,
)
def variant_extract_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H-variant: the Spark 4 VARIANT path for semi-structured data —
    ``parse_json`` ingests the props JSON once into the binary Variant
    encoding, ``variant_get`` then extracts typed paths without re-parsing
    the string per access. At 100 TB this is the preferred layout for
    ragged JSON: parse once at ingest, store the variant column in
    parquet (shredded in Spark 4), and every downstream path access is a
    binary seek instead of a string parse (`get_json_object` re-parses per
    call — see ``json_extract_props`` for that legacy form).

    Dirty-input contract (pinned by the hostile-events corpus, r8): the
    ``try_`` forms, because plain ``parse_json`` THROWS on the first
    malformed row — a dead job at 100 TB. ``try_parse_json`` NULLs
    malformed JSON and — unlike ``get_json_object`` — rejects
    duplicate-key objects entirely; ``try_variant_get`` casts
    string-typed numbers and NULLs non-castable shapes. The oracle
    mirrors each case (``json_valid`` + a ``json_keys`` duplicate
    detector + ``->>`` + ``TRY_CAST``, probed identical on all 13
    hostile props shapes)."""
    ev = load_table(spark, sf_dir, "events")
    k = F.try_variant_get(F.try_parse_json("props"), "$.k", "int")
    return ev.groupBy((k % 7).alias("k_mod")).agg(
        F.count("*").alias("n"), F.round(F.sum("value"), 6).alias("sum_value")
    )


@query(
    "sessionize_dynamic_gap",
    oracle="""
    WITH g AS (
        SELECT user_id, ts, value,
               ts + CASE WHEN event_type = 'purchase'
                         THEN INTERVAL '45 minutes'
                         ELSE INTERVAL '15 minutes' END AS ends
        FROM events WHERE ts IS NOT NULL
    ), flagged AS (
        SELECT user_id, ts, value,
               CASE WHEN MAX(ends) OVER w IS NULL OR ts > MAX(ends) OVER w
                    THEN 1 ELSE 0 END AS new_sess
        FROM g
        WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
    ), sess AS (
        SELECT *, SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts ASC
                                      ROWS UNBOUNDED PRECEDING) AS sid
        FROM flagged
    )
    SELECT user_id,
           strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
           COUNT(*)             AS n_events,
           ROUND(SUM(value), 2) AS total_value
    FROM sess GROUP BY user_id, sid
    """,
)
def sessionize_dynamic_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """I3 session windows with a PER-EVENT gap (``session_window`` accepts a
    Column): purchases hold the session open 45 min, everything else 15 min
    — the "checkout keeps the visit alive" shape real clickstream
    sessionization needs. Each event contributes the interval
    [ts, ts + its own gap); Spark merges overlapping AND touching
    intervals per key (an event exactly at the running-max end still
    merges — same boundary rule the hostile-events corpus pinned for the
    fixed-gap form, r8), so a session closes only when the next event
    starts STRICTLY after the RUNNING MAX of prior ends — which is
    exactly what the gaps-and-islands oracle computes
    (``MAX(ends) OVER (... AND 1 PRECEDING)`` with ``>``; the fixed-gap
    oracle's simple LAG is not enough here, because a long-gap event can
    outlast several short-gap successors). Same single-shuffle plan as the
    fixed-gap form; works identically under Structured Streaming
    watermarks."""
    ev = load_table(spark, sf_dir, "events")
    gap = F.when(F.col("event_type") == "purchase", F.lit("45 minutes")).otherwise(
        F.lit("15 minutes")
    )
    return (
        ev.groupBy("user_id", F.session_window("ts", gap).alias("w"))
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            "user_id",
            F.date_format(F.col("w.start"), _TS_FMT).alias("session_start"),
            "n_events",
            "total_value",
        )
    )


@query(
    "interpolate_hourly_events",
    oracle="""
    WITH b AS (SELECT user_id, date_trunc('hour', ts) AS h, AVG(value) AS v
               FROM events WHERE event_type = 'purchase' AND user_id < 8
               GROUP BY 1, 2),
    r AS (SELECT user_id, MIN(h) AS h0, MAX(h) AS h1 FROM b GROUP BY 1),
    g AS (SELECT user_id, unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS h
          FROM r),
    j AS (SELECT g.user_id, g.h, b.v FROM g LEFT JOIN b USING (user_id, h)),
    w AS (SELECT user_id, h, v,
            last_value(v IGNORE NULLS) OVER pw AS pv,
            last_value(CASE WHEN v IS NOT NULL THEN h END IGNORE NULLS)
                OVER pw AS ph,
            first_value(v IGNORE NULLS) OVER nw AS nv,
            first_value(CASE WHEN v IS NOT NULL THEN h END IGNORE NULLS)
                OVER nw AS nh
          FROM j
          WINDOW pw AS (PARTITION BY user_id ORDER BY h
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                 nw AS (PARTITION BY user_id ORDER BY h
                        ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING))
    SELECT user_id,
           strftime(h, '%Y-%m-%d %H:%M:%S') AS hour_start,
           CAST(CASE WHEN v IS NOT NULL THEN 1 ELSE 0 END AS INT) AS observed,
           ROUND(CASE WHEN v IS NOT NULL THEN v
                 ELSE pv + (nv - pv) * date_diff('second', ph, h)
                           / date_diff('second', ph, nh) END + 1e-9, 6)
               AS v_interp
    FROM w
    """,
)
def interpolate_hourly_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series linear interpolation (pandas ``interpolate(method=
    'time')``, Dask-era resample+fill): bucket each user's purchase values
    hourly, densify to that user's own [first, last] hour, and fill every
    interior gap by time-weighted linear interpolation between the nearest
    observed neighbors.

    Per-user spines mean no edge extrapolation (first/last hour of every
    user is observed, so prev/next always exist for gaps). Scale shape:
    one bucket agg (partial+final), a per-user bounds agg whose exploded
    spine is hours-not-rows sized, and two frame-bounded window passes
    over data partitioned by user — all JVM-side, the same single shuffle
    key (user_id) reused by bucket agg, spine join, and windows, so AQE
    plans exactly one exchange of the data-sized side."""
    ev = load_table(spark, sf_dir, "events").where(
        (F.col("event_type") == "purchase") & (F.col("user_id") < 8)
    )
    b = ev.groupBy(
        "user_id", F.date_trunc("hour", "ts").alias("h")
    ).agg(F.avg("value").alias("v"))
    spine = (
        b.groupBy("user_id")
        .agg(F.min("h").alias("h0"), F.max("h").alias("h1"))
        .select(
            "user_id",
            F.explode(F.sequence("h0", "h1", F.expr("INTERVAL 1 HOUR"))).alias("h"),
        )
    )
    j = spine.join(b, ["user_id", "h"], "left")
    pw = (
        Window.partitionBy("user_id")
        .orderBy("h")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    nw = (
        Window.partitionBy("user_id")
        .orderBy("h")
        .rowsBetween(1, Window.unboundedFollowing)
    )
    obs_h = F.when(F.col("v").isNotNull(), F.col("h"))
    w = j.select(
        "user_id",
        "h",
        "v",
        F.last("v", ignorenulls=True).over(pw).alias("pv"),
        F.last(obs_h, ignorenulls=True).over(pw).alias("ph"),
        F.first("v", ignorenulls=True).over(nw).alias("nv"),
        F.first(obs_h, ignorenulls=True).over(nw).alias("nh"),
    )
    frac = F.expr("timestampdiff(SECOND, ph, h)") / F.expr(
        "timestampdiff(SECOND, ph, nh)"
    )
    return w.select(
        "user_id",
        F.date_format("h", "yyyy-MM-dd HH:mm:ss").alias("hour_start"),
        F.col("v").isNotNull().cast("int").alias("observed"),
        # the +1e-9 nudge (mirrored in the oracle) moves exact rational
        # interpolants off the round-half boundary at the 6th decimal —
        # gap fractions like k/16 otherwise produce …5×10⁻⁷ ties that the
        # two engines' low-bit float noise rounds in opposite directions
        F.round(
            F.when(F.col("v").isNotNull(), F.col("v")).otherwise(
                F.col("pv") + (F.col("nv") - F.col("pv")) * frac
            )
            + F.lit(1e-9),
            6,
        ).alias("v_interp"),
    )


# ------------------------------------------------- H-interval: day-time spans


@query(
    "interval_user_span",
    oracle="""
    SELECT user_id,
           CAST(floor(epoch(max(ts) - min(ts))) AS BIGINT) AS span_sec,
           CAST(min(ts) + INTERVAL 90 MINUTE <= max(ts) AS BIGINT) AS exceeds_90m
    FROM events GROUP BY user_id
    """,
)
def interval_user_span(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H-interval: ANSI DayTimeIntervalType arithmetic (SURVEY.md §1.2's one
    optional type row).

    Timestamp subtraction in Spark 4 yields ``INTERVAL DAY TO SECOND``; the
    span is kept *as an interval* through the plan (cast to long = floored
    total seconds only at the output boundary), and ``make_dt_interval``
    builds the 90-minute deadline added back to a timestamp — both directions
    of interval arithmetic. All JVM-side, codegen-friendly; no Python.
    """
    ev = load_table(spark, sf_dir, "events")
    agg = ev.groupBy("user_id").agg(
        F.min("ts").alias("min_ts"), F.max("ts").alias("max_ts")
    )
    span = F.col("max_ts") - F.col("min_ts")  # DayTimeIntervalType
    deadline = F.col("min_ts") + F.expr("make_dt_interval(0, 1, 30, 0)")
    return agg.select(
        "user_id",
        span.cast("long").alias("span_sec"),
        (deadline <= F.col("max_ts")).cast("long").alias("exceeds_90m"),
    )


@query(
    "interval_order_span_ym",
    oracle="""
    SELECT o_orderpriority,
           CAST((year(max(o_orderdate)) - year(min(o_orderdate))) * 12
                + (month(max(o_orderdate)) - month(min(o_orderdate)))
                AS BIGINT)                                        AS span_months,
           CAST(min(o_orderdate) + INTERVAL 18 MONTH <= max(o_orderdate)
                AS BIGINT)                                        AS exceeds_18m
    FROM orders GROUP BY o_orderpriority
    """,
)
def interval_order_span_ym(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H-interval: ANSI YearMonthIntervalType twin of ``interval_user_span``
    (SURVEY.md §1.2 lists BOTH interval types; round 4 exercised only
    day-time — VERDICT r4 "Next round #8").

    ``make_ym_interval(1, 6)`` builds an ``INTERVAL '1-6' YEAR TO MONTH``
    added back to a timestamp (month-add clamps to end-of-month identically
    in Spark and DuckDB), and the whole-month span is field arithmetic
    (``(year Δ)*12 + month Δ``) — deliberately NOT ``months_between``, whose
    fractional day-of-month semantics differ from DuckDB's month-boundary
    ``datediff``. All JVM-side, codegen-friendly; one aggregate exchange.
    """
    o = load_table(spark, sf_dir, "orders")
    agg = o.groupBy("o_orderpriority").agg(
        F.min("o_orderdate").alias("mn"), F.max("o_orderdate").alias("mx")
    )
    ym = F.expr("make_ym_interval(1, 6)")  # YearMonthIntervalType, 18 months
    span_months = (
        (F.year("mx") - F.year("mn")) * 12 + (F.month("mx") - F.month("mn"))
    ).cast("long")
    return agg.select(
        "o_orderpriority",
        span_months.alias("span_months"),
        ((F.col("mn") + ym) <= F.col("mx")).cast("long").alias("exceeds_18m"),
    )
