"""Event-time operators over the ``events`` table (SURVEY §2.B streaming row):
tumbling / sliding / session windows and the as-of join — implemented batch-first
(oracle-able) with the same semantics Structured Streaming gives incrementally
(see ``streaming/`` for the readStream versions).
"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from airflow_cms_inpatient_etl_spark.functions.exact import davg, dsum, oracle_davg
from airflow_cms_inpatient_etl_spark.queries.base import register
from airflow_cms_inpatient_etl_spark.sources.registry import load_table


@register(
    "events_tumbling_window",
    oracle="""
    SELECT TIME_BUCKET(INTERVAL '5 minutes', ts) AS window_start,
           TIME_BUCKET(INTERVAL '5 minutes', ts) + INTERVAL '5 minutes' AS window_end,
           event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(27,6))) AS DOUBLE) AS sum_value
    FROM events
    GROUP BY 1, 2, 3
    """,
)
def events_tumbling_window(spark, sf_dir):
    """Tumbling 5-minute event-time windows (``F.window``) — identical grouping
    to the streaming version with a watermark; both engines align buckets to the
    epoch-midnight 5-minute grid."""
    e = load_table(spark, sf_dir, "events")
    win = F.window("ts", "5 minutes")
    return (
        e.groupBy(win, "event_type")
        .agg(F.count(F.lit(1)).alias("n"), dsum("value", "sum_value"))
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "event_type",
            "n",
            "sum_value",
        )
    )


@register(
    "events_sliding_window",
    oracle="""
    WITH expanded AS (
        SELECT TIME_BUCKET(INTERVAL '5 minutes', ts) - (k * INTERVAL '5 minutes') AS window_start,
               value
        FROM events, (VALUES (0), (1)) AS offs(k)
    )
    SELECT window_start,
           window_start + INTERVAL '10 minutes' AS window_end,
           COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(27,6))) AS DOUBLE) AS sum_value
    FROM expanded
    GROUP BY 1, 2
    """,
)
def events_sliding_window(spark, sf_dir):
    """Sliding windows (10-minute length, 5-minute slide): each event lands in
    length/slide windows.  Spark's ``F.window(ts, len, slide)`` expands rows
    exactly like the oracle's offset cross-join."""
    e = load_table(spark, sf_dir, "events")
    win = F.window("ts", "10 minutes", "5 minutes")
    return (
        e.groupBy(win)
        .agg(F.count(F.lit(1)).alias("n"), dsum("value", "sum_value"))
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "n",
            "sum_value",
        )
    )


@register(
    "events_session_window",
    oracle="""
    WITH flagged AS (
        SELECT user_id, ts, value,
               CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                         > INTERVAL '30 minutes'
                    OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                    THEN 1 ELSE 0 END AS new_session
        FROM events
    ), numbered AS (
        SELECT user_id, ts, value,
               SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
        FROM flagged
    )
    SELECT user_id,
           MIN(ts) AS session_start,
           MAX(ts) + INTERVAL '30 minutes' AS session_end,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(27,6))) AS DOUBLE) AS sum_value
    FROM numbered
    GROUP BY user_id, session_id
    """,
)
def events_session_window(spark, sf_dir):
    """Sessionization with a 30-minute inactivity gap via ``session_window``
    (Spark's session end = last event + gap; the oracle reproduces that with
    the classic gaps-and-islands window construction)."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.session_window("ts", "30 minutes"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"), dsum("value", "sum_value"))
        .select(
            "user_id",
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
            "sum_value",
        )
    )


@register(
    "events_asof_last_click",
    oracle="""
    WITH purchases AS (
        SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
    ), clicks AS (
        SELECT DISTINCT user_id, ts AS click_ts FROM events WHERE event_type = 'click'
    )
    SELECT p.event_id, p.user_id, p.ts, c.click_ts AS last_click_ts
    FROM purchases p
    ASOF LEFT JOIN clicks c ON p.user_id = c.user_id AND p.ts >= c.click_ts
    """,
)
def events_asof_last_click(spark, sf_dir):
    """As-of join (Spark has no native one — SURVEY §2.B): for each purchase,
    the most recent click by the same user at-or-before the purchase time.

    Implemented as the union-and-carry-forward pattern: tag both sides, sort
    within user by (ts, side) with clicks first at equal timestamps, and carry
    the last click timestamp forward with ``last(ignorenulls)``.  One shuffle on
    user_id, no range explosion — this is the 100 TB-safe as-of strategy."""
    e = load_table(spark, sf_dir, "events")
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", F.lit(1).alias("side")
    )
    clicks = (
        e.filter(F.col("event_type") == "click")
        .select("user_id", "ts")
        .distinct()
        .select(F.lit(None).cast("bigint").alias("event_id"), "user_id", "ts", F.lit(0).alias("side"))
    )
    unioned = purchases.unionByName(clicks).withColumn(
        "click_ts", F.when(F.col("side") == 0, F.col("ts"))
    )
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "side", "event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return (
        unioned.withColumn("last_click_ts", F.last("click_ts", ignorenulls=True).over(w))
        .filter(F.col("side") == 1)
        .select("event_id", "user_id", "ts", "last_click_ts")
    )


@register(
    "events_dedup_within_window",
    oracle="""
    SELECT user_id, event_type,
           TIME_BUCKET(INTERVAL '5 minutes', ts) AS window_start,
           MIN(event_id) AS first_event_id,
           COUNT(*) AS n_dups
    FROM events
    GROUP BY 1, 2, 3
    """,
)
def events_dedup_within_window(spark, sf_dir):
    """Batch analog of ``dropDuplicatesWithinWatermark``: collapse repeats of
    (user, type) inside each 5-minute window to the first event."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy("user_id", "event_type", F.window("ts", "5 minutes"))
        .agg(F.min("event_id").alias("first_event_id"), F.count(F.lit(1)).alias("n_dups"))
        .select(
            "user_id",
            "event_type",
            F.col("window.start").alias("window_start"),
            "first_event_id",
            "n_dups",
        )
    )


@register(
    "events_funnel_conversion",
    oracle="""
    WITH v AS (
        SELECT user_id, MIN(ts) AS t1 FROM events
        WHERE event_type = 'view' GROUP BY user_id
    ),
    c AS (
        SELECT e.user_id, MIN(e.ts) AS t2
        FROM events e JOIN v ON e.user_id = v.user_id
        WHERE e.event_type = 'click' AND e.ts > v.t1
        GROUP BY e.user_id
    ),
    p AS (
        SELECT e.user_id, MIN(e.ts) AS t3
        FROM events e JOIN c ON e.user_id = c.user_id
        WHERE e.event_type = 'purchase' AND e.ts > c.t2
          AND e.ts <= c.t2 + INTERVAL 2 DAY
        GROUP BY e.user_id
    )
    SELECT '1_view' AS stage, (SELECT COUNT(*) FROM v) AS n_users
    UNION ALL
    SELECT '2_click_after_view', (SELECT COUNT(*) FROM c)
    UNION ALL
    SELECT '3_purchase_after_click', (SELECT COUNT(*) FROM p)
    """,
)
def events_funnel_conversion(spark, sf_dir):
    """Ordered, time-bounded funnel: users with a view, a click strictly
    after their first view, and a purchase within (0, 2 days] of that first
    qualifying click.  Each stage is an aggregate + equi-join back to the
    event stream (ordering and deadline constraints ride the join filter),
    so the whole funnel is three keyed shuffles regardless of corpus size —
    no per-user event sorting, no sessionization state."""
    e = load_table(spark, sf_dir, "events")
    v = (
        e.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    c = (
        e.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    p = (
        e.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(
            (F.col("ts") > F.col("t2"))
            & (F.col("ts") <= F.col("t2") + F.expr("INTERVAL 2 DAYS"))
        )
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    def stage(label, df):
        return df.agg(F.count(F.lit(1)).alias("n_users")).select(
            F.lit(label).alias("stage"), "n_users"
        )
    return stage("1_view", v).unionByName(stage("2_click_after_view", c)).unionByName(
        stage("3_purchase_after_click", p)
    )


@register(
    "events_gap_fill_hourly",
    oracle=f"""
    WITH b AS (
        SELECT user_id, TIME_BUCKET(INTERVAL '1 hour', ts) AS bucket_ts,
               {oracle_davg("value", "value_avg")}
        FROM events GROUP BY 1, 2
    ),
    spine AS (
        SELECT user_id,
               UNNEST(GENERATE_SERIES(MIN(bucket_ts), MAX(bucket_ts), INTERVAL 1 HOUR))
                   AS bucket_ts
        FROM b GROUP BY user_id
    )
    SELECT s.user_id, s.bucket_ts, b.value_avg,
           LAST_VALUE(b.value_avg IGNORE NULLS) OVER (
               PARTITION BY s.user_id ORDER BY s.bucket_ts
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled_value,
           b.value_avg IS NULL AS is_gap
    FROM spine s
    LEFT JOIN b ON s.user_id = b.user_id AND s.bucket_ts = b.bucket_ts
    """,
)
def events_gap_fill_hourly(spark, sf_dir):
    """Time-series regularization: resample each user's events to an hourly
    grid (order-independent decimal-exact hour averages), materialize the
    gap-free hour spine per user (sequence + explode — no cross join against
    a global calendar), and forward-fill gaps with the last observed value
    (``last(..., ignorenulls)`` over a running frame).  The spine is bounded
    per user by its own [min, max] activity, so the explode output is
    O(active-hours), and the only wide operations are the hour-bucket
    aggregate and the per-user window sort."""
    e = load_table(spark, sf_dir, "events")
    b = (
        e.groupBy("user_id", F.window("ts", "1 hour"))
        .agg(davg("value", "value_avg"))
        .select("user_id", F.col("window.start").alias("bucket_ts"), "value_avg")
    )
    spine = (
        b.groupBy("user_id")
        .agg(F.min("bucket_ts").alias("lo"), F.max("bucket_ts").alias("hi"))
        .select(
            "user_id",
            F.explode(F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR"))).alias("bucket_ts"),
        )
    )
    joined = spine.join(b, ["user_id", "bucket_ts"], "left")
    w = W.partitionBy("user_id").orderBy("bucket_ts").rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    return joined.select(
        "user_id",
        "bucket_ts",
        "value_avg",
        F.last("value_avg", ignorenulls=True).over(w).alias("filled_value"),
        F.col("value_avg").isNull().alias("is_gap"),
    )


@register(
    "events_interval_attribution",
    oracle="""
    SELECT c.event_id AS click_id,
           COUNT(*) AS n_views,
           CAST(SUM(CAST(v.value AS DECIMAL(27,6))) AS DOUBLE) AS sum_view_value
    FROM (SELECT event_id, ts FROM events WHERE event_type = 'click') c
    JOIN (SELECT ts, value FROM events WHERE event_type = 'view') v
      ON v.ts >= c.ts AND v.ts < c.ts + INTERVAL '5 minutes'
    GROUP BY c.event_id
    """,
)
def events_interval_attribution(spark, sf_dir):
    """Interval (range) join with NO equi-key, big side × big side: every view
    landing in the 5 minutes after each click, platform-wide (the attribution
    shape when the key linking the sides is unknown or deliberately absent).

    Catalyst would plan the raw theta join as BroadcastNestedLoopJoin —
    O(clicks·views), the non-equi scale killer.  ``binned_interval_join``
    rewrites it: both sides get a 5-minute time-bin key (clicks explode into
    the ≤2 bins their window overlaps), the join becomes a shuffle equi-join
    on the bin, and exact containment filters after — identical output, cost
    linear in rows × bin occupancy (tests/test_plans.py asserts the plan has
    no nested loop)."""
    from airflow_cms_inpatient_etl_spark.operators.joins import binned_interval_join

    e = load_table(spark, sf_dir, "events")
    window_us = 5 * 60 * 1_000_000
    clicks = e.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.unix_micros("ts").alias("lo"),
        (F.unix_micros("ts") + window_us).alias("hi"),
    )
    views = e.filter(F.col("event_type") == "view").select(
        F.unix_micros("ts").alias("v_us"), F.col("value").alias("view_value")
    )
    joined = binned_interval_join(views, clicks, "v_us", "lo", "hi", bin_width=window_us)
    return joined.groupBy("click_id").agg(
        F.count(F.lit(1)).alias("n_views"), dsum("view_value", "sum_view_value")
    )


# --------------------------------------------------------------------------- #
# events_ewma_kernel — exponential smoothing as a fixed dyadic FIR kernel      #
# --------------------------------------------------------------------------- #

_EWMA_TAPS = 8  # kernel length; weights 2^-j are IEEE-exact scalings


@register(
    "events_ewma_kernel",
    oracle=f"""
    WITH w AS (
        SELECT event_id, user_id, event_type, ts, value,
               {" + ".join(
                   f"CASE WHEN LAG(value, {j}) OVER win IS NULL THEN 0 ELSE 1 END"
                   for j in range(_EWMA_TAPS)
               )} AS n_taps,
               {" + ".join(
                   f"COALESCE(LAG(value, {j}) OVER win, 0.0) * {2.0 ** -j!r}"
                   for j in range(_EWMA_TAPS)
               )} AS ewma
        FROM events
        WINDOW win AS (PARTITION BY user_id, event_type ORDER BY ts, event_id)
    )
    SELECT event_id, user_id, event_type, ts, value, CAST(n_taps AS INT) AS n_taps, ewma
    FROM w
    """,
)
def events_ewma_kernel(spark, sf_dir):
    """Per-(user, event_type) exponential smoothing of ``value`` as an
    8-tap FIR kernel: ewma_t = Σ_j 2^-j · x_{{t-j}} over the ordered event
    stream (missing history contributes 0; ``n_taps`` reports how much
    history each row actually saw).  An 8-tap truncation of the recursive
    EWMA carries < 0.4 % of the kernel mass beyond the horizon while
    keeping the operator a pure WINDOW expression — one shuffle on the
    partition key, no recursion, trivially incrementalizable under
    Structured Streaming.  Dyadic weights (2^-j) make each product an
    IEEE exponent shift — EXACT — and the sum folds in fixed written
    order, so the smoothed doubles hash-match the oracle bit-for-bit."""
    e = load_table(spark, sf_dir, "events")
    win = W.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    lags = [F.lag("value", j).over(win) for j in range(_EWMA_TAPS)]
    n_taps = None
    ewma = None
    for j, lg in enumerate(lags):
        tap = F.when(lg.isNull(), 0).otherwise(1)
        term = F.coalesce(lg, F.lit(0.0)) * F.lit(2.0 ** -j)
        n_taps = tap if n_taps is None else n_taps + tap
        ewma = term if ewma is None else ewma + term
    return e.select(
        "event_id",
        "user_id",
        "event_type",
        "ts",
        "value",
        n_taps.cast("int").alias("n_taps"),
        ewma.alias("ewma"),
    )


# --------------------------------------------------------------------------- #
# events_anomaly_mad — robust outlier detection (median / MAD)                 #
# --------------------------------------------------------------------------- #


@register(
    "events_anomaly_mad",
    oracle="""
    WITH med AS (
        SELECT event_type, QUANTILE_CONT(value, 0.5) AS med
        FROM events GROUP BY event_type
    ),
    dev AS (
        SELECT e.event_id, e.event_type, e.value, m.med,
               ABS(e.value - m.med) AS dev
        FROM events e JOIN med m USING (event_type)
    ),
    mad AS (
        SELECT event_type, QUANTILE_CONT(dev, 0.5) AS mad
        FROM dev GROUP BY event_type
    )
    SELECT d.event_id, d.event_type, d.value, d.med, m.mad,
           CASE WHEN m.mad > 0 THEN d.dev / m.mad END AS robust_z,
           (d.dev > 3 * m.mad) AS is_outlier
    FROM dev d JOIN mad m USING (event_type)
    """,
)
def events_anomaly_mad(spark, sf_dir):
    """Robust per-type anomaly detection: median / median-absolute-deviation
    (the estimator that survives the outliers it is hunting — mean/stddev
    are dragged by the very rows they should flag).  Two grouped EXACT
    percentiles (the winsorize contract: both engines interpolate
    lower + (upper-lower)·f on the sorted values, bit-identical) and
    otherwise only IEEE +,-,×,÷,ABS — exactly-rounded operations, so the
    whole result hash-matches the oracle WITHOUT rounding.  Plan: two
    grouped-median shuffles over (event_type), each result a one-row-per-type
    table broadcast back onto the scan — the per-key state of an exact
    median is the sorted value list, which at 100 TB means swapping this
    aggregate for approx_percentile/t-digest per the documented
    exact-vs-approx pairing (agg_exact_percentiles ↔ approx_aggregates);
    the flag/score algebra is unchanged either way."""
    e = load_table(spark, sf_dir, "events")
    med = e.groupBy("event_type").agg(F.percentile("value", F.lit(0.5)).alias("med"))
    dev = e.join(F.broadcast(med), "event_type").select(
        "event_id",
        "event_type",
        "value",
        "med",
        F.abs(F.col("value") - F.col("med")).alias("dev"),
    )
    mad = dev.groupBy("event_type").agg(F.percentile("dev", F.lit(0.5)).alias("mad"))
    return dev.join(F.broadcast(mad), "event_type").select(
        "event_id",
        "event_type",
        "value",
        "med",
        "mad",
        F.when(F.col("mad") > 0, F.col("dev") / F.col("mad")).alias("robust_z"),
        (F.col("dev") > 3 * F.col("mad")).alias("is_outlier"),
    )


# --------------------------------------------------------------------------- #
# events_cusum_drift — change-point detection via exact CUSUM                  #
# --------------------------------------------------------------------------- #

_CUSUM_H = 250  # alarm threshold ~5 sigma (fixture sigma ~50)
_CUSUM_K = 25  # allowance ~sigma/2: detect sustained upward shifts > K units


@register(
    "events_cusum_drift",
    oracle=f"""
    WITH tgt AS (
        SELECT event_type,
               CAST(FLOOR(CAST(SUM(CAST(value AS DECIMAL(27,6))) AS DOUBLE) / COUNT(*))
                    AS BIGINT) + {_CUSUM_K} AS target
        FROM events GROUP BY event_type
    ),
    y AS (
        SELECT e.event_id, e.event_type, e.ts, e.value, t.target,
               CAST(e.value AS DECIMAL(27,6)) - t.target AS yd
        FROM events e JOIN tgt t USING (event_type)
    ),
    cp AS (
        SELECT event_id, event_type, ts, value, target,
               SUM(yd) OVER (PARTITION BY event_type ORDER BY ts, event_id
                             ROWS UNBOUNDED PRECEDING) AS cum
        FROM y
    ),
    c AS (
        SELECT *, MIN(cum) OVER (PARTITION BY event_type ORDER BY ts, event_id
                                 ROWS UNBOUNDED PRECEDING) AS runmin
        FROM cp
    )
    SELECT event_id, event_type, ts, value, target,
           CAST(cum - CASE WHEN runmin < 0 THEN runmin ELSE 0 END AS DOUBLE) AS cusum,
           ((cum - CASE WHEN runmin < 0 THEN runmin ELSE 0 END) > {_CUSUM_H}) AS drift_alarm
    FROM c
    """,
)
def events_cusum_drift(spark, sf_dir):
    """Per-type CUSUM drift detector — the change-point statistic every
    pipeline health monitor wants: s_t = max(0, s_(t-1) + (x_t − target)),
    alarm when s_t exceeds h.  The recurrence looks un-window-able, but it
    has a closed form: with prefix sums P_t of (x−target),
    s_t = P_t − min(0, min_(j≤t) P_j) — so two stacked window functions
    (running sum, then running min of it) replace the sequential scan, and
    the whole detector is one shuffle on the partition key with no
    iteration and no state.  Arithmetic is DECIMAL end-to-end (the per-type
    target is floored to an integer; deviations and prefix sums are exact
    decimals), so the statistic hash-matches the oracle bit-for-bit —
    running double sums would be segment-tree-order-dependent in other
    engines.  At 100 TB: per-type partitions sort independently; a single
    hot type shards by day first and stitches with the per-shard offset
    trick (global_rank_via_sharding's decomposition applied to prefix
    sums)."""
    from pyspark.sql import Window as W

    from airflow_cms_inpatient_etl_spark.functions.exact import davg, dec

    e = load_table(spark, sf_dir, "events")
    tgt = e.groupBy("event_type").agg(
        (F.floor(davg("value", "m")).cast("long") + _CUSUM_K).alias("target")
    )
    y = e.join(F.broadcast(tgt), "event_type").select(
        "event_id",
        "event_type",
        "ts",
        "value",
        "target",
        (dec("value") - F.col("target")).alias("yd"),
    )
    w = W.partitionBy("event_type").orderBy("ts", "event_id").rowsBetween(
        W.unboundedPreceding, 0
    )
    c = y.select(
        "event_id",
        "event_type",
        "ts",
        "value",
        "target",
        F.sum("yd").over(w).alias("cum"),
    ).withColumn("runmin", F.min("cum").over(w))
    # s_t = P_t − min(0, min_j P_j) is ≥ 0 by construction, so no outer
    # clamp is needed; the min(0, ·) is a pure-decimal CASE — GREATEST/LEAST
    # with a mixed int literal promotes through DOUBLE in other engines,
    # whose decimal→double path is not correctly rounded (×1e-6)
    cusum = F.col("cum") - F.when(F.col("runmin") < 0, F.col("runmin")).otherwise(
        F.lit(0)
    )
    return c.select(
        "event_id",
        "event_type",
        "ts",
        "value",
        "target",
        cusum.cast("double").alias("cusum"),
        (cusum > _CUSUM_H).alias("drift_alarm"),
    )


# --------------------------------------------------------------------------- #
# events_stl_daily — trend / seasonal / residual decomposition                 #
# --------------------------------------------------------------------------- #


@register(
    "events_stl_daily",
    oracle="""
    WITH daily AS (
        SELECT DATE_TRUNC('day', ts) AS day,
               CAST(SUM(CAST(CAST(value AS DECIMAL(14,2)) * 100 AS BIGINT)) AS BIGINT)
                 AS cents
        FROM events GROUP BY DATE_TRUNC('day', ts)
    ),
    trended AS (
        SELECT day, cents,
               CAST(SUM(cents) OVER (ORDER BY day
                    ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS BIGINT) AS sum7,
               COUNT(*) OVER (ORDER BY day
                    ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS w
        FROM daily
    ),
    detr AS (
        SELECT day, cents, sum7, DAYOFWEEK(day) AS dow
        FROM trended WHERE w = 7
    ),
    seas AS (
        SELECT dow,
               CAST(7 * SUM(cents) - SUM(sum7) AS DOUBLE)
                 / CAST(7 * COUNT(*) AS DOUBLE) AS seasonal
        FROM detr GROUP BY dow
    )
    SELECT d.day, d.cents,
           ROUND(CAST(d.sum7 AS DOUBLE) / 7, 6) AS trend,
           ROUND(s.seasonal, 6) AS seasonal,
           ROUND(d.cents - CAST(d.sum7 AS DOUBLE) / 7 - s.seasonal, 6) AS residual
    FROM detr d JOIN seas s ON s.dow = d.dow
    """,
)
def events_stl_daily(spark, sf_dir):
    """STL-style additive decomposition of the daily value series:
    trend = 7-day centered moving average, seasonal = mean detrended value
    per day-of-week, residual = the rest — the classic seasonal-trend
    screen run before any anomaly threshold (the MAD/CUSUM flags in this
    family assume de-seasonalized input; this query produces it).
    Exactness BY CONSTRUCTION, never a float re-sum (the
    events_dow_seasonality discipline): every aggregate is a bigint sum —
    trend = sum7/7 is ONE double division of an exact integer, and
    seasonal = mean_dow(cents − sum7/7) is algebraically rewritten to
    (7·Σcents − Σsum7)/(7·n), again exact bigints with a single terminal
    division.  An F.avg over doubles would instead accumulate in
    partial-aggregation order, which varies with partitioning and differs
    from DuckDB's scan order — only probabilistically stable under
    ROUND(..,6).  Edge days without a full 7-day window are EXCLUDED (a
    partial-frame mean silently mixes bandwidths — the classic
    decomposition artifact).  DOW parity: DAYOFWEEK is 1=Sunday..7 in both
    engines.  Plan: one day-keyed aggregate (map-side partial), one
    single-partition window over the ~|days| rows (calendar-bounded — at
    100 TB the day table is still tiny; the corpus-sized work all happened
    in the first aggregate), a 7-row seasonal broadcast join."""
    e = load_table(spark, sf_dir, "events")
    cents = (F.col("value").cast("decimal(14,2)") * 100).cast("long")
    daily = e.groupBy(F.date_trunc("day", "ts").alias("day")).agg(
        F.sum(cents).alias("cents")
    )
    w7 = W.orderBy("day").rowsBetween(-3, 3)
    trended = daily.select(
        "day",
        "cents",
        F.sum("cents").over(w7).alias("sum7"),
        F.count(F.lit(1)).over(w7).alias("w"),
    )
    detr = trended.filter(F.col("w") == 7).select(
        "day",
        "cents",
        "sum7",
        F.dayofweek("day").alias("dow"),
    )
    seas = detr.groupBy("dow").agg(
        (
            (F.lit(7) * F.sum("cents") - F.sum("sum7")).cast("double")
            / (F.lit(7) * F.count(F.lit(1))).cast("double")
        ).alias("seasonal")
    )
    trend = F.col("sum7").cast("double") / F.lit(7)
    return detr.join(F.broadcast(seas), "dow").select(
        "day",
        "cents",
        F.round(trend, 6).alias("trend"),
        F.round("seasonal", 6).alias("seasonal"),
        F.round(F.col("cents") - trend - F.col("seasonal"), 6).alias("residual"),
    )


# --------------------------------------------------------------------------- #
# events_peak_concurrency — sweep-line max overlap with a SHARDED prefix sum   #
# --------------------------------------------------------------------------- #

_CONC_MS = 5 * 60  # each event opens a half-open [ts, ts + 5 min) interval


@register(
    "events_peak_concurrency",
    oracle=f"""
    WITH bounds AS (
        SELECT event_type, ts AS t, 1 AS net FROM events
        UNION ALL
        SELECT event_type, ts + INTERVAL {_CONC_MS} SECOND, -1 FROM events
    ),
    g AS (
        SELECT event_type, t,
               CAST(SUM(net) AS BIGINT) AS net,
               CAST(COUNT(*) FILTER (WHERE net = 1) AS BIGINT) AS starts
        FROM bounds GROUP BY event_type, t
    ),
    run AS (
        SELECT event_type, t, starts,
               SUM(net) OVER (PARTITION BY event_type ORDER BY t
                              ROWS UNBOUNDED PRECEDING) AS running
        FROM g
    ),
    peak AS (
        SELECT event_type,
               CAST(MAX(running) AS BIGINT) AS peak_concurrency,
               CAST(SUM(starts) AS BIGINT) AS n_intervals
        FROM run GROUP BY event_type
    )
    SELECT r.event_type, p.n_intervals, p.peak_concurrency,
           MIN(r.t) AS peak_at
    FROM run r JOIN peak p
      ON r.event_type = p.event_type AND r.running = p.peak_concurrency
    GROUP BY r.event_type, p.n_intervals, p.peak_concurrency
    """,
)
def events_peak_concurrency(spark, sf_dir):
    """Peak concurrency per event type — the classic sweep line: each event
    opens a half-open [ts, ts+5 min) interval; +1/−1 boundary deltas are
    pre-aggregated per distinct instant (half-open semantics make the NET
    delta at an instant exact — closings and openings at the same t
    combine), a prefix sum walks the timeline, and the answer is the max
    with its FIRST attainment time (min t at the max — deterministic under
    ties).

    The scale move: the prefix sum is SHARDED, not a single-partition
    window — the `global_rank_via_sharding` identity applied to the time
    axis.  Boundaries shard by calendar month (data-independent key);
    each shard computes a LOCAL running sum in its own window partition,
    a shard-level aggregate (one tiny row per (type, month)) computes
    exclusive prefix OFFSETS, and running = local + broadcast offset.
    Prefix sums are associative integers, so the sharded composition is
    EXACTLY the global cumsum the single-window oracle computes — but no
    executor ever materializes the whole timeline, which is what a
    100 TB event log needs.  One corpus-sized shuffle (the per-instant
    pre-aggregation), one sharded window, dimension-sized everything
    else."""
    e = load_table(spark, sf_dir, "events")
    bounds = e.select(
        "event_type", F.col("ts").alias("t"), F.lit(1).alias("net")
    ).unionByName(
        e.select(
            "event_type",
            (F.col("ts") + F.expr(f"INTERVAL {_CONC_MS} SECONDS")).alias("t"),
            F.lit(-1).alias("net"),
        )
    )
    g = bounds.groupBy("event_type", "t").agg(
        F.sum("net").cast("long").alias("net"),
        F.sum(F.when(F.col("net") == 1, 1).otherwise(0)).cast("long").alias("starts"),
    )
    shard = (F.year("t") * 12 + F.month("t")).alias("shard")
    gs = g.withColumn("shard", shard)
    w_local = (
        W.partitionBy("event_type", "shard")
        .orderBy("t")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    local = gs.withColumn("loc", F.sum("net").over(w_local))
    shard_tot = gs.groupBy("event_type", "shard").agg(
        F.sum("net").alias("stot"), F.sum("starts").alias("sstarts")
    )
    w_sh = (
        W.partitionBy("event_type")
        .orderBy("shard")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    offsets = shard_tot.select(
        "event_type",
        "shard",
        F.coalesce(F.sum("stot").over(w_sh), F.lit(0)).alias("off"),
    )
    run = local.join(F.broadcast(offsets), ["event_type", "shard"]).select(
        "event_type", "t", "starts", (F.col("loc") + F.col("off")).alias("running")
    )
    peak = run.groupBy("event_type").agg(
        F.max("running").cast("long").alias("peak_concurrency"),
        F.sum("starts").cast("long").alias("n_intervals"),
    )
    return (
        run.join(
            F.broadcast(peak),
            (run.event_type == peak.event_type)
            & (run.running == peak.peak_concurrency),
        )
        .drop(peak.event_type)
        .groupBy("event_type", "n_intervals", "peak_concurrency")
        .agg(F.min("t").alias("peak_at"))
        .select("event_type", "n_intervals", "peak_concurrency", "peak_at")
    )


@register(
    "events_asof_nearest",
    oracle="""
    WITH purchases AS (
        SELECT event_id, user_id, ts, 1 AS side FROM events WHERE event_type = 'purchase'
    ),
    clicks AS (
        SELECT DISTINCT user_id, ts FROM events WHERE event_type = 'click'
    ),
    unioned AS (
        SELECT event_id, user_id, ts, side,
               CAST(NULL AS TIMESTAMP) AS click_ts
        FROM purchases
        UNION ALL
        SELECT CAST(NULL AS BIGINT), user_id, ts, 0, ts FROM clicks
    ),
    carried AS (
        SELECT event_id, user_id, ts, side,
               last_value(click_ts IGNORE NULLS) OVER (
                   PARTITION BY user_id ORDER BY ts, side, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS back_ts,
               first_value(click_ts IGNORE NULLS) OVER (
                   PARTITION BY user_id ORDER BY ts, side, event_id
                   ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS fwd_ts
        FROM unioned
    )
    SELECT event_id, user_id, ts,
           CASE WHEN back_ts IS NULL AND fwd_ts IS NULL THEN NULL
                WHEN fwd_ts IS NULL THEN back_ts
                WHEN back_ts IS NULL THEN fwd_ts
                WHEN epoch_us(ts) - epoch_us(back_ts)
                     <= epoch_us(fwd_ts) - epoch_us(ts) THEN back_ts
                ELSE fwd_ts END AS nearest_click_ts,
           CASE WHEN back_ts IS NULL AND fwd_ts IS NULL THEN NULL
                WHEN fwd_ts IS NULL THEN 'back'
                WHEN back_ts IS NULL THEN 'fwd'
                WHEN epoch_us(ts) - epoch_us(back_ts)
                     <= epoch_us(fwd_ts) - epoch_us(ts) THEN 'back'
                ELSE 'fwd' END AS direction,
           CASE WHEN back_ts IS NULL AND fwd_ts IS NULL THEN NULL
                WHEN fwd_ts IS NULL THEN epoch_us(ts) - epoch_us(back_ts)
                WHEN back_ts IS NULL THEN epoch_us(fwd_ts) - epoch_us(ts)
                ELSE LEAST(epoch_us(ts) - epoch_us(back_ts),
                           epoch_us(fwd_ts) - epoch_us(ts)) END AS gap_us
    FROM carried WHERE side = 1
    """,
)
def events_asof_nearest(spark, sf_dir):
    """NEAREST-direction as-of join — the ``direction='nearest'`` variant of
    ``events_asof_last_click`` (pd.merge_asof's third mode, which the
    backward-only carry cannot express): for each purchase, the closest
    click by the same user in EITHER direction, ties to the backward side
    (attribution convention).  Two carries over ONE user-partitioned sort
    — ``last(ignorenulls)`` forward-fills the latest click at-or-before,
    ``first(ignorenulls)`` over the mirrored frame back-fills the earliest
    click after — then an integer-microsecond comparison picks the side.
    A click at the exact purchase timestamp sorts before the purchase
    (side 0 first) and wins through the backward leg at gap 0.

    Scale: identical budget to the backward as-of — one shuffle on
    user_id, two window passes over the same sort (Spark executes both in
    ONE Window physical node since frames share the ordering), no range
    explosion, hot users bounded by their own event counts."""
    e = load_table(spark, sf_dir, "events")
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", F.lit(1).alias("side")
    )
    clicks = (
        e.filter(F.col("event_type") == "click")
        .select("user_id", "ts")
        .distinct()
        .select(
            F.lit(None).cast("bigint").alias("event_id"), "user_id", "ts", F.lit(0).alias("side")
        )
    )
    unioned = purchases.unionByName(clicks).withColumn(
        "click_ts", F.when(F.col("side") == 0, F.col("ts"))
    )
    order = [F.col("ts"), F.col("side"), F.col("event_id")]
    w_back = (
        W.partitionBy("user_id").orderBy(*order).rowsBetween(W.unboundedPreceding, 0)
    )
    w_fwd = (
        W.partitionBy("user_id").orderBy(*order).rowsBetween(0, W.unboundedFollowing)
    )
    carried = (
        unioned.withColumn("back_ts", F.last("click_ts", ignorenulls=True).over(w_back))
        .withColumn("fwd_ts", F.first("click_ts", ignorenulls=True).over(w_fwd))
        .filter(F.col("side") == 1)
    )
    back_gap = F.unix_micros("ts") - F.unix_micros("back_ts")
    fwd_gap = F.unix_micros("fwd_ts") - F.unix_micros("ts")
    both_null = F.col("back_ts").isNull() & F.col("fwd_ts").isNull()
    pick_back = F.col("fwd_ts").isNull() | (
        F.col("back_ts").isNotNull() & (back_gap <= fwd_gap)
    )
    return carried.select(
        "event_id",
        "user_id",
        "ts",
        F.when(both_null, F.lit(None).cast("timestamp"))
        .when(pick_back, F.col("back_ts"))
        .otherwise(F.col("fwd_ts"))
        .alias("nearest_click_ts"),
        F.when(both_null, F.lit(None).cast("string"))
        .when(pick_back, F.lit("back"))
        .otherwise(F.lit("fwd"))
        .alias("direction"),
        F.when(both_null, F.lit(None).cast("long"))
        .when(pick_back, back_gap)
        .otherwise(fwd_gap)
        .alias("gap_us"),
    )


@register(
    "events_attribution_multitouch",
    oracle="""
    WITH purchases AS (
        SELECT event_id AS purchase_id, user_id, ts AS p_ts
        FROM events WHERE event_type = 'purchase'
    ),
    clicks AS (
        SELECT event_id AS click_id, user_id, ts AS c_ts
        FROM events WHERE event_type = 'click'
    ),
    pairs AS (
        SELECT p.purchase_id, p.user_id, p.p_ts, c.click_id, c.c_ts
        FROM purchases p JOIN clicks c USING (user_id)
        WHERE c.c_ts <= p.p_ts
          AND c.c_ts > p.p_ts - INTERVAL '7 days'
    ),
    ranked AS (
        SELECT purchase_id, user_id, click_id,
               ROW_NUMBER() OVER (PARTITION BY purchase_id
                                  ORDER BY c_ts, click_id) AS pos,
               CAST(COUNT(*) OVER (PARTITION BY purchase_id) AS BIGINT) AS n_touch
        FROM pairs
    )
    SELECT purchase_id, user_id, click_id, CAST(pos AS BIGINT) AS pos, n_touch,
           CASE WHEN n_touch = 1 THEN 1.0
                WHEN n_touch = 2 THEN 0.5
                WHEN pos = 1 OR pos = n_touch THEN 0.4
                ELSE 0.2 / CAST(n_touch - 2 AS DOUBLE) END AS credit
    FROM ranked
    """,
)
def events_attribution_multitouch(spark, sf_dir):
    """Position-based (U-shaped / 40-20-40) multi-touch attribution — the
    family's completion next to first-touch (``events_asof_last_click``
    inverted), last-touch, and nearest: every click inside a purchase's
    7-day lookback gets credit — 40 % to the first touch, 40 % to the
    last, the middle 20 % split evenly (degenerate paths: a single touch
    takes 1.0, a pair splits 0.5/0.5).

    Per-(purchase, click) credit ROWS deliberately — summing a click's
    credit across purchases would be a float sum with nondeterministic
    order; the caller's rollup is one further aggregation, and every
    emitted credit is a single IEEE literal or division (engine-exact).

    Scale: the pair join is user-keyed equi (ONE shuffle each side) with
    the 7-day predicate applied inside the join — pair volume is bounded
    per user by activity x window, the attribution regime's natural
    bound (for adversarially hot users the (user, time-bucket) cogroup
    split of ``merge_asof_grouped`` applies unchanged); ranking windows
    partition by purchase_id — never wider than one lookback's clicks."""
    e = load_table(spark, sf_dir, "events")
    purchases = e.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), "user_id", F.col("ts").alias("p_ts")
    )
    clicks = e.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"), "user_id", F.col("ts").alias("c_ts")
    )
    pairs = purchases.join(clicks, "user_id").filter(
        (F.col("c_ts") <= F.col("p_ts"))
        & (F.col("c_ts") > F.col("p_ts") - F.expr("INTERVAL 7 DAYS"))
    )
    w_pos = W.partitionBy("purchase_id").orderBy("c_ts", "click_id")
    w_all = W.partitionBy("purchase_id")
    ranked = pairs.select(
        "purchase_id",
        "user_id",
        "click_id",
        F.row_number().over(w_pos).alias("pos"),
        F.count(F.lit(1)).over(w_all).cast("long").alias("n_touch"),
    )
    credit = (
        F.when(F.col("n_touch") == 1, F.lit(1.0))
        .when(F.col("n_touch") == 2, F.lit(0.5))
        .when((F.col("pos") == 1) | (F.col("pos") == F.col("n_touch")), F.lit(0.4))
        .otherwise(F.lit(0.2) / (F.col("n_touch") - 2).cast("double"))
    )
    return ranked.select(
        "purchase_id",
        "user_id",
        "click_id",
        F.col("pos").cast("long").alias("pos"),
        "n_touch",
        credit.alias("credit"),
    )


# --------------------------------------------------------------------------- #
# geo_grid_proximity_join — big-big spatial self-join via grid bucketing       #
# --------------------------------------------------------------------------- #
# The canonical spatial-join pattern (the bucketed side of every
# PostGIS/Sedona-style distance join): cell size = search radius, so any
# pair within R lives in the same or an adjacent cell — candidates are a
# hash EQUI-join on cell keys (9-cell neighborhood explode on one side),
# never a cross product, and the exact predicate runs post-join on integer
# micro-units.  Points are planted deterministically on a planar
# [0, 180e6) x [0, 360e6) grid (planar integers, not geodesy — great-circle
# math needs libm floats; the OPERATOR under test is the grid join).

_GEO_R = 2_000_000  # search radius in micro-units (= the cell size)
_GEO_LAT_MOD = 180_000_001
_GEO_LON_MOD = 360_000_001


@register(
    "geo_grid_proximity_join",
    oracle=f"""
    WITH pts AS (
        SELECT event_id AS id,
               (user_id * 7919 + event_id * 104729) % {_GEO_LAT_MOD} AS x,
               (user_id * 15485863 + event_id * 32452843) % {_GEO_LON_MOD} AS y
        FROM events
    ),
    home AS (
        SELECT id, x, y, x // {_GEO_R} AS cx, y // {_GEO_R} AS cy FROM pts
    ),
    probe AS (
        SELECT h.id, h.x, h.y, h.cx + dx.d AS px, h.cy + dy.d AS py
        FROM home h
        CROSS JOIN (VALUES (-1), (0), (1)) AS dx(d)
        CROSS JOIN (VALUES (-1), (0), (1)) AS dy(d)
    ),
    pairs AS (
        SELECT p.id AS a_id, h.id AS b_id
        FROM probe p
        JOIN home h ON h.cx = p.px AND h.cy = p.py
        WHERE p.id < h.id
          AND (p.x - h.x) * (p.x - h.x) + (p.y - h.y) * (p.y - h.y)
              <= CAST({_GEO_R} AS BIGINT) * {_GEO_R}
    ),
    ncount AS (
        SELECT id, CAST(COUNT(*) AS BIGINT) AS n FROM (
            SELECT a_id AS id FROM pairs UNION ALL SELECT b_id FROM pairs
        ) GROUP BY id
    )
    SELECT h.id, h.cx, h.cy, COALESCE(n.n, 0) AS n_neighbors
    FROM home h LEFT JOIN ncount n ON n.id = h.id
    """,
)
def geo_grid_proximity_join(spark, sf_dir):
    """Spatial proximity self-join on a planar integer grid — the
    bucketed distance-join pattern every spatial engine runs at scale:
    cell size equals the search radius R, each point probes its 3x3 cell
    neighborhood (map-side explode of the probe side ONLY), candidates
    meet in a plain hash equi-join on (cell_x, cell_y), and the exact
    predicate (squared integer distance <= R^2 — no sqrt, no floats)
    prunes post-join.  Every qualifying pair is found EXACTLY once (the
    home cell of the larger id is unique, and only the smaller id's probe
    explodes), so neighbor counts need no dedup.  Emits per-point
    (cell, n_neighbors) including isolated points.

    Scale: candidate volume is sum over cells of |probe cell| x |home
    cell| ~ 9 x density x N — linear in N at fixed DENSITY, never the N^2
    cross product.  Density is the knob: this fixture plants N points on
    a FIXED-area plane, so density (and the true pair count) grows with
    N — 368 neighbor-slots at sf0.001 -> 1.93M at sf0.1 — while the
    candidate volume stays 9 x density x N (~5.6M at sf0.1's ~6
    points/cell); a production corpus holds density roughly constant as
    it grows (more area, not more points per city block), and where it
    doesn't (urban-core hotspots) one cell goes quadratic in its own
    population — remedies are the salted-join pattern from
    `operators/joins.py` (shipped as `geo_hotspot_salted_join`) or
    quadtree cell refinement (`operators/spatial.py`).

    Scale contract (fixture plant): the planted coordinate
    `user_id*15485863 + event_id*32452843` must stay inside int64 —
    Spark wraps silently in non-ANSI mode while DuckDB raises, so past
    event_id ~ 2.8e11 (about sf 200,000 — five orders beyond the largest
    testdata scale) the fixture would diverge from the oracle without
    failing loudly.  Run with spark.sql.ansi.enabled=true to make the
    overflow loud, or pre-mod event_id before multiplying; the OPERATOR
    itself carries no such bound."""
    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id")
    pts = ev.select(
        F.col("event_id").alias("id"),
        ((F.col("user_id") * 7919 + F.col("event_id") * 104729) % _GEO_LAT_MOD).alias("x"),
        (
            (F.col("user_id") * 15485863 + F.col("event_id") * 32452843) % _GEO_LON_MOD
        ).alias("y"),
    )
    home = pts.select(
        "id",
        "x",
        "y",
        F.expr(f"x div {_GEO_R}").alias("cx"),
        F.expr(f"y div {_GEO_R}").alias("cy"),
    )
    from airflow_cms_inpatient_etl_spark.sources.registry import snapshot

    home = snapshot(home)  # probe explode, join build side and final left join
    offsets = F.expr("explode(arrays_zip(array(-1,-1,-1,0,0,0,1,1,1), array(-1,0,1,-1,0,1,-1,0,1)))")
    probe = home.select("id", "x", "y", "cx", "cy", offsets.alias("o")).select(
        "id",
        "x",
        "y",
        (F.col("cx") + F.col("o.0")).alias("px"),
        (F.col("cy") + F.col("o.1")).alias("py"),
    )
    h2 = home.select(
        F.col("id").alias("b_id"),
        F.col("x").alias("bx"),
        F.col("y").alias("by"),
        F.col("cx").alias("px"),
        F.col("cy").alias("py"),
    )
    dx = F.col("x") - F.col("bx")
    dy = F.col("y") - F.col("by")
    pairs = (
        probe.join(h2, ["px", "py"])
        .filter(
            (F.col("id") < F.col("b_id"))
            & (dx * dx + dy * dy <= F.lit(_GEO_R).cast("long") * _GEO_R)
        )
        .select(F.col("id").alias("a_id"), "b_id")
    )
    ncount = (
        pairs.select(F.col("a_id").alias("id"))
        .unionAll(pairs.select(F.col("b_id").alias("id")))
        .groupBy("id")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    return (
        home.select("id", "cx", "cy")
        .join(ncount, "id", "left")
        .select("id", "cx", "cy", F.coalesce("n", F.lit(0)).alias("n_neighbors"))
    )


# --------------------------------------------------------------------------- #
# geo hotspot remedies — salted and quadtree-refined proximity joins           #
# --------------------------------------------------------------------------- #
# `geo_grid_proximity_join` documents the flat grid's failure mode: an
# urban-core cell quadratic in its own population, all of it on one join
# task.  This fixture PLANTS that hotspot — 0.5% of all points collapse
# into one cell — and the two queries run the two remedies from
# `operators/spatial.py` against the SAME all-pairs-in-grid oracle: the
# hash matches prove both remedies emit exactly the flat join's answer.

_HOTGEO_R = 2_000_000
_HOTGEO_P = 16  # cell-population bound before a remedy kicks in
_HOTGEO_PLANT_SQL = """
        SELECT event_id AS id,
               CASE WHEN event_id % 200 = 0
                    THEN 90000000 + (user_id * 7919 + event_id * 104729) % 1800000
                    ELSE (user_id * 7919 + event_id * 104729) % 180000001 END AS x,
               CASE WHEN event_id % 200 = 0
                    THEN 180000000 + (user_id * 65537 + event_id * 30011) % 1800000
                    ELSE (user_id * 65537 + event_id * 30011) % 360000001 END AS y
        FROM events
"""

_HOTGEO_ORACLE = f"""
    WITH pts AS ({_HOTGEO_PLANT_SQL}),
    home AS (
        SELECT id, x, y, x // {_HOTGEO_R} AS cx, y // {_HOTGEO_R} AS cy FROM pts
    ),
    probe AS (
        SELECT h.id, h.x, h.y, h.cx + dx.d AS px, h.cy + dy.d AS py
        FROM home h
        CROSS JOIN (VALUES (-1), (0), (1)) AS dx(d)
        CROSS JOIN (VALUES (-1), (0), (1)) AS dy(d)
    ),
    pairs AS (
        SELECT p.id AS a_id, h.id AS b_id
        FROM probe p
        JOIN home h ON h.cx = p.px AND h.cy = p.py
        WHERE p.id < h.id
          AND (p.x - h.x) * (p.x - h.x) + (p.y - h.y) * (p.y - h.y)
              <= CAST({_HOTGEO_R} AS BIGINT) * {_HOTGEO_R}
    ),
    ncount AS (
        SELECT id, CAST(COUNT(*) AS BIGINT) AS n FROM (
            SELECT a_id AS id FROM pairs UNION ALL SELECT b_id FROM pairs
        ) GROUP BY id
    )
    SELECT h.id, h.cx, h.cy, COALESCE(n.n, 0) AS n_neighbors
    FROM home h LEFT JOIN ncount n ON n.id = h.id
"""


def _hotgeo_points(spark, sf_dir):
    """Planted hotspot point set: every 200th event lands inside ONE grid
    cell (spread 1.8e6 < R, anchored at a cell corner), the rest stay
    uniform over the plane — so that cell's population is ~80x the mean
    density at sf0.1.  Bounded multipliers: the largest planted product,
    event_id * 104729, stays inside int64 to event_id ~ 8.8e13 (about sf
    90,000,000) — no ANSI-mode caveat at any conceivable scale."""
    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id")
    hot = F.col("event_id") % 200 == 0
    return ev.select(
        F.col("event_id").alias("id"),
        F.when(
            hot,
            F.lit(90_000_000)
            + (F.col("user_id") * 7919 + F.col("event_id") * 104729) % 1_800_000,
        )
        .otherwise((F.col("user_id") * 7919 + F.col("event_id") * 104729) % 180_000_001)
        .alias("x"),
        F.when(
            hot,
            F.lit(180_000_000)
            + (F.col("user_id") * 65537 + F.col("event_id") * 30011) % 1_800_000,
        )
        .otherwise((F.col("user_id") * 65537 + F.col("event_id") * 30011) % 360_000_001)
        .alias("y"),
    )


@register("geo_hotspot_salted_join", oracle=_HOTGEO_ORACLE)
def geo_hotspot_salted_join(spark, sf_dir):
    """Proximity self-join on the PLANTED-HOTSPOT point set with the
    salting remedy (`operators/spatial.salted_proximity_pairs`): the hot
    cell's home side splits into s = ceil(pop/16) salt buckets, probes
    targeting it fan out s ways, and the per-task candidate volume drops
    s-fold while the pair set — the oracle is the plain all-candidates
    grid join — stays bit-identical.  The remedy self-activates from the
    cell census (broadcast hot-cell map); on a hotspot-free input the map
    is empty and the plan degenerates to the flat grid join.

    Scale: a crowd that is genuinely mutually-within-R has quadratic TRUE
    pairs — no plan shrinks the answer; what salting fixes is that the
    quadratic block lands on ONE task.  Per-task volume is bounded by
    ~(probe pop) * max_cell_pop regardless of how hot the cell gets."""
    from airflow_cms_inpatient_etl_spark.operators.spatial import (
        grid_points,
        neighbor_counts,
        salted_proximity_pairs,
    )

    pts = _hotgeo_points(spark, sf_dir)
    pairs = salted_proximity_pairs(pts, _HOTGEO_R, _HOTGEO_P)
    return neighbor_counts(grid_points(pts, _HOTGEO_R), pairs)


@register("geo_quadtree_refined_join", oracle=_HOTGEO_ORACLE)
def geo_quadtree_refined_join(spark, sf_dir):
    """The same planted-hotspot proximity join through the QUADTREE remedy
    (`operators/spatial.quadtree_proximity_pairs`): the hot cell's points
    re-bucket at half cell size and probes visit only the subcells whose
    box intersects their R-ball bounding box — cutting CANDIDATES (the
    far corners of the hot cell never meet), where salting only spreads
    them.  Same oracle as the salted query: two remedies, one fixpoint.
    Complementary at 100 TB: refine while the crowd is wider than R
    (pruning wins), salt the residual point-mass (parallelism wins);
    iterating the split on still-hot subcells is the same step again."""
    from airflow_cms_inpatient_etl_spark.operators.spatial import (
        grid_points,
        neighbor_counts,
        quadtree_proximity_pairs,
    )

    pts = _hotgeo_points(spark, sf_dir)
    pairs = quadtree_proximity_pairs(pts, _HOTGEO_R, _HOTGEO_P)
    return neighbor_counts(grid_points(pts, _HOTGEO_R), pairs)
