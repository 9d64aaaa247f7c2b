"""Event-stream (time-series) operators over the ``events`` table:
tumbling-window aggregation, sessionization, as-of join, JSON
extraction, and gap-filling against a calendar spine.

These are the batch twins of the streaming stage kinds in
``ankaflow_spark.streaming`` (same logical semantics; the streaming
versions add watermarks/state). Timestamps are compared via integer
epoch microseconds — no float time arithmetic — so the DuckDB oracle
matches exactly.
"""

from __future__ import annotations

from typing import Callable, Dict

from pyspark.sql import DataFrame, SparkSession

from .tables import load_tables

QUERIES: Dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: Dict[str, str] = {}

SESSION_GAP_MIN = 30
BUCKET_SEC = 300  # 5-minute tumbling windows


def query(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


# ---------------------------------------------------------------------------
# ts01 — tumbling-window aggregation (5-min buckets)
# ---------------------------------------------------------------------------
@query(
    "ts01_time_buckets",
    oracle=f"""
    SELECT
      make_timestamp(((epoch_us(ts) // 1000000) // {BUCKET_SEC}) * {BUCKET_SEC} * 1000000) AS bucket,
      event_type,
      COUNT(*) AS n_events,
      COUNT(DISTINCT user_id) AS n_users,
      CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
    FROM events
    GROUP BY 1, 2
    ORDER BY bucket, event_type
    """,
)
def ts01(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_tables(spark, sf_dir)
    return spark.sql(f"""
    SELECT
      timestamp_seconds(((unix_micros(ts) div 1000000) div {BUCKET_SEC}) * {BUCKET_SEC}) AS bucket,
      event_type,
      COUNT(*) AS n_events,
      COUNT(DISTINCT user_id) AS n_users,
      CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
    FROM events
    GROUP BY 1, 2
    ORDER BY bucket, event_type
    """)


# ---------------------------------------------------------------------------
# ts02 — sessionization: lag + gap>threshold -> cumulative session ids,
# then per-session stats. One shuffle on user_id; the window pattern
# scales linearly and is the standard batch sessionizer.
# ---------------------------------------------------------------------------
_SESSION_CORE = """
    WITH ordered AS (
      SELECT user_id, event_id, ts,
             LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
      FROM events
    ),
    flagged AS (
      SELECT user_id, event_id, ts,
             CASE WHEN prev_ts IS NULL
                  OR {epoch}(ts) - {epoch}(prev_ts) > {gap_us} THEN 1 ELSE 0 END AS new_session
      FROM ordered
    ),
    sessions AS (
      SELECT user_id, event_id, ts,
             SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_seq
      FROM flagged
    )
    SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq,
           COUNT(*) AS n_events,
           MIN(ts) AS session_start,
           MAX(ts) AS session_end,
           CAST(({epoch}(MAX(ts)) - {epoch}(MIN(ts))) / 1000000.0 AS DOUBLE) AS duration_sec
    FROM sessions
    GROUP BY user_id, session_seq
    ORDER BY user_id, session_seq
"""


@query(
    "ts02_sessionization",
    oracle=_SESSION_CORE.format(epoch="epoch_us", gap_us=SESSION_GAP_MIN * 60 * 1000000),
)
def ts02(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_tables(spark, sf_dir)
    return spark.sql(
        _SESSION_CORE.format(epoch="unix_micros", gap_us=SESSION_GAP_MIN * 60 * 1000000)
    )


# ---------------------------------------------------------------------------
# ts03 — as-of join: each purchase matched to the user's most recent
# prior click. Expressed as a running MAX(CASE) window over the merged
# stream — no point-in-time self-join, single shuffle on user_id.
# (A merge_asof-style applyInPandas variant lives in operators/asof.py.)
# ---------------------------------------------------------------------------
_ASOF_CORE = """
    WITH tagged AS (
      SELECT user_id, event_id, ts, event_type, value,
             MAX(CASE WHEN event_type = 'click' THEN ts END)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS last_click_ts
      FROM events
    )
    SELECT user_id, event_id, ts, value, last_click_ts,
           CAST(({epoch}(ts) - {epoch}(last_click_ts)) / 1000000.0 AS DOUBLE) AS sec_since_click
    FROM tagged
    WHERE event_type = 'purchase'
    ORDER BY user_id, event_id
"""


@query("ts03_asof_last_click", oracle=_ASOF_CORE.format(epoch="epoch_us"))
def ts03(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_tables(spark, sf_dir)
    return spark.sql(_ASOF_CORE.format(epoch="unix_micros"))


# ---------------------------------------------------------------------------
# ts04 — JSON property extraction + aggregation (events.props holds a
# JSON object; the reference keeps JSON as strings + extraction fns)
# ---------------------------------------------------------------------------
@query(
    "ts04_json_props",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
           MIN(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
           MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def ts04(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_tables(spark, sf_dir)
    return spark.sql("""
    SELECT event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(get_json_object(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
           MIN(CAST(get_json_object(props, '$.k') AS BIGINT)) AS min_k,
           MAX(CAST(get_json_object(props, '$.k') AS BIGINT)) AS max_k
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """)


# ---------------------------------------------------------------------------
# ts05 — gap-fill: left join a generated day spine against daily event
# counts; missing days appear with zeros (calendar-spine pattern).
# ---------------------------------------------------------------------------
@query(
    "ts05_gap_fill",
    oracle="""
    WITH bounds AS (
      SELECT CAST(date_trunc('day', MIN(ts)) AS DATE) AS d0,
             CAST(date_trunc('day', MAX(ts)) AS DATE) AS d1
      FROM events
    ),
    spine AS (
      SELECT UNNEST(generate_series(d0, d1, INTERVAL 1 DAY))::DATE AS day FROM bounds
    ),
    daily AS (
      SELECT CAST(date_trunc('day', ts) AS DATE) AS day, COUNT(*) AS n
      FROM events GROUP BY 1
    )
    SELECT spine.day, COALESCE(daily.n, 0) AS n_events
    FROM spine LEFT JOIN daily ON spine.day = daily.day
    ORDER BY spine.day
    """,
)
def ts05(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_tables(spark, sf_dir)
    return spark.sql("""
    WITH bounds AS (
      SELECT CAST(date_trunc('day', MIN(ts)) AS DATE) AS d0,
             CAST(date_trunc('day', MAX(ts)) AS DATE) AS d1
      FROM events
    ),
    spine AS (
      SELECT explode(sequence(d0, d1, INTERVAL 1 DAY)) AS day FROM bounds
    ),
    daily AS (
      SELECT CAST(date_trunc('day', ts) AS DATE) AS day, COUNT(*) AS n
      FROM events GROUP BY 1
    )
    SELECT spine.day, COALESCE(daily.n, 0) AS n_events
    FROM spine LEFT JOIN daily ON spine.day = daily.day
    ORDER BY spine.day
    """)


# ---------------------------------------------------------------------------
# ts06 — gap fill with LINEAR INTERPOLATION: per-user daily totals over
# a continuous day spine; missing days interpolate between the nearest
# observed neighbors (edges carry the nearest value). Two window passes
# (carry-back + carry-forward), no self-joins — linear at any scale.
# ---------------------------------------------------------------------------
def _interp_sql(spark_dialect: bool) -> str:
    if spark_dialect:
        spine = "SELECT explode(sequence(d0, d1)) AS day FROM bounds"
        ddiff = "datediff({a}, {b})"
        # Spark spells IGNORE NULLS after the argument list
        lastnn = "last_value({e}) IGNORE NULLS"
        firstnn = "first_value({e}) IGNORE NULLS"
    else:
        spine = "SELECT UNNEST(generate_series(d0, d1, INTERVAL 1 DAY))::DATE AS day FROM bounds"
        ddiff = "date_diff('day', {b}, {a})"
        lastnn = "last_value({e} IGNORE NULLS)"
        firstnn = "first_value({e} IGNORE NULLS)"
    d = lambda a, b: ddiff.format(a=a, b=b)
    return f"""
    WITH daily AS (
      SELECT user_id, CAST(date_trunc('day', ts) AS DATE) AS day,
             CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS v
      FROM events WHERE user_id < 20 GROUP BY 1, 2
    ),
    bounds AS (
      SELECT CAST(MIN(day) AS DATE) AS d0, CAST(MAX(day) AS DATE) AS d1 FROM daily
    ),
    spine AS ({spine}),
    grid AS (
      SELECT u.user_id, s.day, d.v
      FROM (SELECT DISTINCT user_id FROM daily) u
      CROSS JOIN spine s
      LEFT JOIN daily d ON d.user_id = u.user_id AND d.day = s.day
    ),
    ctx AS (
      SELECT user_id, day, v,
        {lastnn.format(e="v")} OVER (PARTITION BY user_id ORDER BY day
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
        {lastnn.format(e="CASE WHEN v IS NOT NULL THEN day END")}
          OVER (PARTITION BY user_id ORDER BY day
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pd,
        {firstnn.format(e="v")} OVER (PARTITION BY user_id ORDER BY day
          ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
        {firstnn.format(e="CASE WHEN v IS NOT NULL THEN day END")}
          OVER (PARTITION BY user_id ORDER BY day
          ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nd
      FROM grid
    )
    SELECT user_id, day,
      CASE
        WHEN v IS NOT NULL THEN v
        WHEN pv IS NULL THEN nv
        WHEN nv IS NULL THEN pv
        ELSE pv + (nv - pv) * (CAST({d("day", "pd")} AS DOUBLE) / {d("nd", "pd")})
      END AS value_filled,
      CASE WHEN v IS NULL THEN TRUE ELSE FALSE END AS interpolated
    FROM ctx
    ORDER BY user_id, day
    """


@query("ts06_interpolate", oracle=_interp_sql(False))
def ts06(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_tables(spark, sf_dir)
    return spark.sql(_interp_sql(True))


# ---------------------------------------------------------------------------
# ts07 — as-of join, Arrow/merge_asof strategy (operators/asof.py's
# cogrouped applyInPandas path) graded against a full value oracle.
# Same point-in-time question as ts03 but the INCLUSIVE variant
# (click_ts <= purchase_ts, pandas merge_asof backward semantics), so
# the oracle's window frame is RANGE UNBOUNDED PRECEDING..CURRENT ROW
# — all peers of the current timestamp included. Proves the pandas/
# Arrow hop computes exactly what the SQL spelling does; at scale this
# path shuffles both sides once on user_id and streams Arrow batches.
# ---------------------------------------------------------------------------
@query(
    "ts07_asof_pandas",
    oracle="""
    WITH tagged AS (
      SELECT user_id, event_id, ts, event_type, value,
             MAX(CASE WHEN event_type = 'click' THEN ts END)
               OVER (PARTITION BY user_id ORDER BY ts
                     RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_click_ts
      FROM events
    )
    SELECT user_id, event_id, ts, value, last_click_ts
    FROM tagged
    WHERE event_type = 'purchase'
    ORDER BY user_id, event_id
    """,
)
def ts07(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from .asof import asof_join_pandas

    t = load_tables(spark, sf_dir)
    events = t["events"]
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "user_id", "event_id", "ts", "value"
    )
    clicks = events.filter(F.col("event_type") == "click").select("user_id", "ts")
    out = asof_join_pandas(
        purchases, clicks, on="ts", by=["user_id"], carry_on="last_click_ts"
    )
    return out.select(
        "user_id", "event_id", "ts", "value", "last_click_ts"
    ).orderBy("user_id", "event_id")


# ---------------------------------------------------------------------------
# ts08 — hierarchical rollup cascade (continuous-aggregate pattern):
# minute buckets are aggregated ONCE from the raw stream, then hour and
# day resolutions re-aggregate the next-finer rollup instead of
# rescanning events. At 100 TB this is the TimescaleDB/Druid rollup
# shape: the raw scan happens exactly once, each coarser level works on
# data already reduced by orders of magnitude, and counts/decimal sums
# re-merge exactly (no double accumulation across levels).
# ---------------------------------------------------------------------------
def _rollup_cascade_oracle() -> str:
    """DuckDB oracle spelling; the Spark path lives in ts08 itself
    (it materializes the hourly level, which single-statement SQL
    cannot express without re-executing the chain per UNION branch)."""
    minute_idx = "(epoch_us(ts) // 1000000) // 60"
    idiv = "//"
    hour_ts = "make_timestamp(hour_idx * 3600 * 1000000)"
    day_ts = "make_timestamp(day_idx * 86400 * 1000000)"
    return f"""
    WITH minute AS (
      SELECT {minute_idx} AS min_idx, event_type,
             COUNT(*) AS n_events,
             SUM(CAST(value AS DECIMAL(18,6))) AS sum_value
      FROM events GROUP BY 1, 2
    ),
    hourly AS (
      SELECT min_idx {idiv} 60 AS hour_idx, event_type,
             CAST(SUM(n_events) AS BIGINT) AS n_events,
             SUM(sum_value) AS sum_value,
             COUNT(*) AS n_finer
      FROM minute GROUP BY 1, 2
    ),
    daily AS (
      SELECT hour_idx {idiv} 24 AS day_idx, event_type,
             CAST(SUM(n_events) AS BIGINT) AS n_events,
             SUM(sum_value) AS sum_value,
             COUNT(*) AS n_finer
      FROM hourly GROUP BY 1, 2
    )
    SELECT 'hour' AS resolution, {hour_ts} AS bucket, event_type,
           n_events, CAST(sum_value AS DOUBLE) AS total_value,
           CAST(n_finer AS BIGINT) AS n_finer_buckets
    FROM hourly
    UNION ALL
    SELECT 'day' AS resolution, {day_ts} AS bucket, event_type,
           n_events, CAST(sum_value AS DOUBLE) AS total_value,
           CAST(n_finer AS BIGINT) AS n_finer_buckets
    FROM daily
    ORDER BY resolution, bucket, event_type
    """


@query("ts08_rollup_cascade", oracle=_rollup_cascade_oracle())
def ts08(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Spark inlines CTEs, so the naive single-statement spelling executes
    # the minute->hourly chain once per UNION branch — TWO raw scans
    # (plan-audited). The hourly rollup is instead materialized
    # (localCheckpoint: thousands of rows at any corpus size — this is
    # the persisted continuous-aggregate table) so the raw stream is
    # scanned exactly once and the day level re-aggregates the hour
    # table, which is the entire point of the cascade.
    load_tables(spark, sf_dir)
    minute_idx = "(unix_micros(ts) div 1000000) div 60"
    hourly = spark.sql(f"""
      SELECT min_idx div 60 AS hour_idx, event_type,
             CAST(SUM(n_events) AS BIGINT) AS n_events,
             SUM(sum_value) AS sum_value,
             COUNT(*) AS n_finer
      FROM (
        SELECT {minute_idx} AS min_idx, event_type,
               COUNT(*) AS n_events,
               SUM(CAST(value AS DECIMAL(18,6))) AS sum_value
        FROM events GROUP BY 1, 2
      ) minute GROUP BY 1, 2
    """).localCheckpoint()
    hourly.createOrReplaceTempView("__ts08_hourly__")
    return spark.sql("""
    WITH daily AS (
      SELECT hour_idx div 24 AS day_idx, event_type,
             CAST(SUM(n_events) AS BIGINT) AS n_events,
             SUM(sum_value) AS sum_value,
             COUNT(*) AS n_finer
      FROM __ts08_hourly__ GROUP BY 1, 2
    )
    SELECT 'hour' AS resolution, timestamp_seconds(hour_idx * 3600) AS bucket,
           event_type, n_events, CAST(sum_value AS DOUBLE) AS total_value,
           CAST(n_finer AS BIGINT) AS n_finer_buckets
    FROM __ts08_hourly__
    UNION ALL
    SELECT 'day' AS resolution, timestamp_seconds(day_idx * 86400) AS bucket,
           event_type, n_events, CAST(sum_value AS DOUBLE) AS total_value,
           CAST(n_finer AS BIGINT) AS n_finer_buckets
    FROM daily
    ORDER BY resolution, bucket, event_type
    """)


# ---------------------------------------------------------------------------
# ts09 — OHLC downsampling (candlesticks): per day x event_type, the
# first/last value by (ts, event_id) plus high/low/volume. open/close
# come from deterministic window endpoints (never arg_min on a tied
# timestamp alone); the window's (day, event_type) exchange is reused
# by the following groupBy — one shuffle total, linear at any scale.
# Identical SQL in both dialects.
# ---------------------------------------------------------------------------
_OHLC_SQL = """
    WITH base AS (
      SELECT CAST(date_trunc('day', ts) AS DATE) AS day, event_type,
             value, ts, event_id
      FROM events
    ),
    w AS (
      SELECT day, event_type, value,
        FIRST_VALUE(value) OVER (PARTITION BY day, event_type
          ORDER BY ts, event_id) AS open_v,
        LAST_VALUE(value) OVER (PARTITION BY day, event_type
          ORDER BY ts, event_id
          ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS close_v
      FROM base
    )
    SELECT day, event_type,
           MIN(open_v) AS open, MAX(value) AS high,
           MIN(value) AS low, MIN(close_v) AS close,
           COUNT(*) AS n_trades,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS volume
    FROM w GROUP BY day, event_type
    ORDER BY day, event_type
    """


@query("ts09_ohlc", oracle=_OHLC_SQL)
def ts09(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_tables(spark, sf_dir)
    return spark.sql(_OHLC_SQL)


# ---------------------------------------------------------------------------
# ts10 — anomaly detection: per event_type minute totals z-scored
# against a trailing baseline of the previous 60 observed buckets.
# One window over the (already tiny) minute-rollup table — the raw scan
# happens once, the baseline never rescans events, linear at any scale.
# Float discipline: bucket totals quantize to exact cent BIGINTs
# (floor of a DECIMAL — both engines truncate identically); the frame's
# SUM/SUMSQ are integer-exact and < 2^53, so the mean/variance/z
# arithmetic is pure correctly-rounded IEEE with no libm calls except
# sqrt (exact) — bit-identical across engines.
# ---------------------------------------------------------------------------
ANOMALY_Z = 3.0
BASELINE_BUCKETS = 60


def _anomaly_sql(spark_dialect: bool) -> str:
    if spark_dialect:
        minute_idx = "(unix_micros(ts) div 1000000) div 60"
        bucket_ts = "timestamp_seconds(min_idx * 60)"
    else:
        minute_idx = "(epoch_us(ts) // 1000000) // 60"
        bucket_ts = "make_timestamp(min_idx * 60 * 1000000)"
    frame = f"ROWS BETWEEN {BASELINE_BUCKETS} PRECEDING AND 1 PRECEDING"
    return f"""
    WITH minute AS (
      SELECT {minute_idx} AS min_idx, event_type,
             CAST(floor(SUM(CAST(value AS DECIMAL(18,6))) * 100) AS BIGINT) AS tot_e2,
             COUNT(*) AS n_events
      FROM events GROUP BY 1, 2
    ),
    base AS (
      SELECT min_idx, event_type, tot_e2, n_events,
        CAST(SUM(tot_e2) OVER (PARTITION BY event_type ORDER BY min_idx
             {frame}) AS BIGINT) AS base_sum,
        CAST(SUM(tot_e2 * tot_e2) OVER (PARTITION BY event_type ORDER BY min_idx
             {frame}) AS BIGINT) AS base_sumsq,
        COUNT(*) OVER (PARTITION BY event_type ORDER BY min_idx
             {frame}) AS base_n
      FROM minute
    ),
    scored AS (
      SELECT min_idx, event_type, tot_e2, n_events, base_n,
        (CAST(tot_e2 AS DOUBLE) - CAST(base_sum AS DOUBLE) / base_n)
          / sqrt((CAST(base_sumsq AS DOUBLE)
                  - CAST(base_sum AS DOUBLE) * base_sum / base_n)
                 / (base_n - 1)) AS z
      FROM base
      WHERE base_n >= 30
    )
    SELECT {bucket_ts} AS bucket, event_type,
           CAST(tot_e2 AS DOUBLE) / 100 AS bucket_total,
           n_events, base_n, z
    FROM scored
    WHERE abs(z) > {ANOMALY_Z}
    ORDER BY event_type, bucket
    """


@query("ts10_anomaly_zscore", oracle=_anomaly_sql(False))
def ts10(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_tables(spark, sf_dir)
    return spark.sql(_anomaly_sql(True))


# ---------------------------------------------------------------------------
# ts11 — EWMA trend smoothing per event_type minute series (alpha=1/2
# over the last 10 observed buckets). Float discipline: bucket totals
# are exact cent BIGINTs (ts10's quantization); the EWMA numerator and
# denominator are INTEGER sums of lag-weighted terms (weights are
# powers of two, scaled by 2^9 so every term is a BIGINT), with a
# single correctly-rounded double division at the end — engine-
# identical with no tolerance. Ten LAG columns, not an ordered
# collect_list: window collect order is not contractual. One window
# over the (tiny) minute rollup — raw events scanned once.
# ---------------------------------------------------------------------------
EWMA_K = 10


def _ewma_sql(spark_dialect: bool) -> str:
    if spark_dialect:
        minute_idx = "(unix_micros(ts) div 1000000) div 60"
        bucket_ts = "timestamp_seconds(min_idx * 60)"
    else:
        minute_idx = "(epoch_us(ts) // 1000000) // 60"
        bucket_ts = "make_timestamp(min_idx * 60 * 1000000)"
    lags = ",\n        ".join(
        f"LAG(tot_e2, {j}) OVER (PARTITION BY event_type ORDER BY min_idx) AS l{j}"
        for j in range(1, EWMA_K)
    )
    num = " + ".join(
        [f"tot_e2 * {2 ** (EWMA_K - 1)}"]
        + [f"COALESCE(l{j}, 0) * {2 ** (EWMA_K - 1 - j)}" for j in range(1, EWMA_K)]
    )
    den = " + ".join(
        [f"{2 ** (EWMA_K - 1)}"]
        + [
            f"CASE WHEN l{j} IS NOT NULL THEN {2 ** (EWMA_K - 1 - j)} ELSE 0 END"
            for j in range(1, EWMA_K)
        ]
    )
    return f"""
    WITH minute AS (
      SELECT {minute_idx} AS min_idx, event_type,
             CAST(floor(SUM(CAST(value AS DECIMAL(18,6))) * 100) AS BIGINT) AS tot_e2
      FROM events GROUP BY 1, 2
    ),
    lagged AS (
      SELECT min_idx, event_type, tot_e2,
        {lags}
      FROM minute
    )
    SELECT {bucket_ts} AS bucket, event_type,
           CAST(tot_e2 AS DOUBLE) / 100 AS bucket_total,
           CAST({num} AS DOUBLE) / ({den}) / 100 AS ewma
    FROM lagged
    ORDER BY event_type, bucket
    """


@query("ts11_ewma_smoothing", oracle=_ewma_sql(False))
def ts11(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_tables(spark, sf_dir)
    return spark.sql(_ewma_sql(True))


# ---------------------------------------------------------------------------
# ts12 — weekly seasonality profile: the (day-of-week x hour) traffic
# matrix per event_type. One groupBy over integer-derived calendar
# keys (dayofweek follows ISO Monday=1 in both spellings below);
# decimal sums emitted as double. Pure single-shuffle aggregation.
# ---------------------------------------------------------------------------
def _dow_hour_sql(spark_dialect: bool) -> str:
    if spark_dialect:
        # Spark dayofweek(): Sunday=1 .. Saturday=7 -> remap to ISO Mon=1
        dow = "CAST(((dayofweek(ts) + 5) % 7) + 1 AS BIGINT)"
        hour = "CAST(hour(ts) AS BIGINT)"
    else:
        dow = "CAST(isodow(ts) AS BIGINT)"
        hour = "CAST(hour(ts) AS BIGINT)"
    return f"""
    SELECT {dow} AS iso_dow, {hour} AS hour, event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
    FROM events
    GROUP BY 1, 2, 3
    ORDER BY iso_dow, hour, event_type
    """


@query("ts12_dow_hour_profile", oracle=_dow_hour_sql(False))
def ts12(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_tables(spark, sf_dir)
    return spark.sql(_dow_hour_sql(True))


# ---------------------------------------------------------------------------
# ts13 — cohort retention matrix: the classic product-analytics shape.
# Each user joins the cohort of their first-activity week (the testdata
# spans one month, so weekly cohorts exercise a real matrix); the matrix
# counts distinct active users per (cohort, week-offset) and derives
# retention against the offset-0 cohort size via a window (no second
# join, no re-scan). Plan notes: one scan of events feeds BOTH the
# cohort aggregation and the distinct-activity set; the cohort table is
# |users| rows so AQE broadcasts it into the activity join; counts are
# integers and the retention ratio divides two exact BIGINTs once in
# IEEE doubles — bit-identical across engines and partition counts.
# At 100 TB the same plan holds: everything partitions by user_id until
# the final (cohort, offset) rollup, which is |months|^2 rows.
# ---------------------------------------------------------------------------
_COHORT_SQL = """
    WITH ev AS (
      SELECT user_id, CAST(date_trunc('week', ts) AS TIMESTAMP) AS am FROM events
    ),
    cohort AS (
      SELECT user_id, MIN(am) AS cm FROM ev GROUP BY user_id
    ),
    active AS (
      SELECT DISTINCT user_id, am FROM ev
    ),
    ret AS (
      SELECT c.cm AS cohort_week,
             CAST(date_diff('day', c.cm, a.am) / 7 AS BIGINT) AS week_offset,
             COUNT(DISTINCT a.user_id) AS n_active
      FROM active a JOIN cohort c ON a.user_id = c.user_id
      GROUP BY 1, 2
    )
    SELECT cohort_week, week_offset, n_active,
           MAX(CASE WHEN week_offset = 0 THEN n_active END)
             OVER (PARTITION BY cohort_week) AS cohort_size,
           CAST(n_active AS DOUBLE)
             / CAST(MAX(CASE WHEN week_offset = 0 THEN n_active END)
                    OVER (PARTITION BY cohort_week) AS DOUBLE) AS retention
    FROM ret
    ORDER BY cohort_week, week_offset
    """


@query("ts13_cohort_retention", oracle=_COHORT_SQL)
def ts13(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    t = load_tables(spark, sf_dir)
    ev = t["events"].select("user_id", F.date_trunc("week", F.col("ts")).alias("am"))
    cohort = ev.groupBy("user_id").agg(F.min("am").alias("cm"))
    active = ev.distinct()
    offset = (F.datediff(F.col("am"), F.col("cm")) / F.lit(7)).cast("bigint")
    ret = (
        active.join(cohort, "user_id")
        .groupBy(F.col("cm").alias("cohort_week"), offset.alias("week_offset"))
        .agg(F.countDistinct("user_id").alias("n_active"))
    )
    w = W.partitionBy("cohort_week")
    size = F.max(F.when(F.col("week_offset") == 0, F.col("n_active"))).over(w)
    return (
        ret.withColumn("cohort_size", size)
        .withColumn(
            "retention",
            F.col("n_active").cast("double") / F.col("cohort_size").cast("double"),
        )
        .orderBy("cohort_week", "week_offset")
    )


# ---------------------------------------------------------------------------
# ts14 — funnel conversion (view -> click -> purchase): strictly-ordered
# per-user step times. Step N's timestamp is the MIN event time AFTER
# the user's step-N-1 time, so each stage is a per-user aggregation
# joined to the (small) survivor set of the previous stage — work
# shrinks monotonically down the funnel, and every join is on user_id
# (broadcast-able survivor side at any scale). Inter-step latency
# aggregates integer epoch-second diffs (exact BIGINT sums) and divides
# once, so avg hours is bit-identical across engines.
# ---------------------------------------------------------------------------
_FUNNEL_SQL = """
    WITH v AS (
      SELECT user_id, MIN(ts) AS t1 FROM events WHERE event_type = 'view' GROUP BY user_id
    ),
    c AS (
      SELECT e.user_id, MIN(e.ts) AS t2
      FROM events e JOIN v ON v.user_id = e.user_id
      WHERE e.event_type = 'click' AND e.ts > v.t1
      GROUP BY e.user_id
    ),
    p AS (
      SELECT e.user_id, MIN(e.ts) AS t3
      FROM events e JOIN c ON c.user_id = e.user_id
      WHERE e.event_type = 'purchase' AND e.ts > c.t2
      GROUP BY e.user_id
    )
    SELECT * FROM (
      SELECT 1 AS step, 'view' AS step_name, COUNT(*) AS n_users,
             CAST(NULL AS DOUBLE) AS avg_hours_from_prev
      FROM v
      UNION ALL
      SELECT 2, 'click', COUNT(*),
             CAST(SUM(epoch_us(c.t2) - epoch_us(v.t1)) AS DOUBLE)
               / COUNT(*) / 3600000000.0
      FROM c JOIN v ON v.user_id = c.user_id
      UNION ALL
      SELECT 3, 'purchase', COUNT(*),
             CAST(SUM(epoch_us(p.t3) - epoch_us(c.t2)) AS DOUBLE)
               / COUNT(*) / 3600000000.0
      FROM p JOIN c ON c.user_id = p.user_id
    ) f
    ORDER BY step
    """


@query("ts14_funnel", oracle=_FUNNEL_SQL)
def ts14(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    t = load_tables(spark, sf_dir)
    ev = t["events"].select("user_id", "event_type", "ts")
    # each survivor set is consumed 2-3x downstream (next step's build +
    # the step summaries); Spark re-executes a DataFrame subtree per
    # reference just like an inlined CTE (PERF.md r27), so the inline
    # form re-scanned events 9x. Checkpointing the |users|-row survivor
    # sets pins raw-table work at exactly three DISJOINT type-slice
    # scans (event_type pushes down to the scan, so together they read
    # each row group's type partition once).
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
        .localCheckpoint(eager=True)
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
        .localCheckpoint(eager=True)
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
        .localCheckpoint(eager=True)
    )

    def _lat(later, earlier):
        d = F.unix_micros(later) - F.unix_micros(earlier)
        return (F.sum(d).cast("double") / F.count("*") / F.lit(3600000000.0)).alias(
            "avg_hours_from_prev"
        )

    s1 = v.agg(
        F.lit(1).cast("int").alias("step"),
        F.lit("view").alias("step_name"),
        F.count("*").alias("n_users"),
        F.lit(None).cast("double").alias("avg_hours_from_prev"),
    )
    s2 = c.join(v, "user_id").agg(
        F.lit(2).cast("int").alias("step"),
        F.lit("click").alias("step_name"),
        F.count("*").alias("n_users"),
        _lat(F.col("t2"), F.col("t1")),
    )
    s3 = p.join(c, "user_id").agg(
        F.lit(3).cast("int").alias("step"),
        F.lit("purchase").alias("step_name"),
        F.count("*").alias("n_users"),
        _lat(F.col("t3"), F.col("t2")),
    )
    return s1.unionAll(s2).unionAll(s3).orderBy("step")


# ---------------------------------------------------------------------------
# ts15 — time-RANGE window frame: per-user trailing 1-hour event count
# and value sum for EVERY event (RANGE BETWEEN <interval> PRECEDING,
# not ROWS — frame membership is decided by timestamp distance, so
# bursts and gaps produce different frame sizes row to row). This is
# the rate-limiter / rolling-exposure shape. Plan: one shuffle on
# user_id, one sort per partition — the window never re-scans. The
# frame bound orders by integer epoch seconds (identical in both
# engines); value sums accumulate in DECIMAL.
# ---------------------------------------------------------------------------
def _range_window_sql(spark_dialect: bool) -> str:
    es = "unix_micros(ts) DIV 1000000" if spark_dialect else "epoch_us(ts) // 1000000"
    return f"""
    SELECT user_id, ts,
           COUNT(*) OVER w AS n_last_hour,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) OVER w AS DOUBLE) AS value_last_hour
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY {es}
                 RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
    ORDER BY user_id, ts
    """


@query("ts15_range_window", oracle=_range_window_sql(False))
def ts15(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_tables(spark, sf_dir)
    return spark.sql(_range_window_sql(True))


# ---------------------------------------------------------------------------
# ts16 — period-over-period deltas: daily activity per event type with
# LAG-based absolute and percent change. The rollup is one shuffle on
# (event_type, day); the LAG window reuses that partitioning (PARTITION
# BY event_type ORDER BY day), so no extra exchange. Percent change
# divides two exact values once in IEEE doubles (counts are BIGINTs,
# totals are decimal-summed doubles) — bit-identical across engines.
# ---------------------------------------------------------------------------
_POP_SQL = """
    WITH daily AS (
      SELECT event_type, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
             COUNT(*) AS n_events,
             CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
      FROM events
      GROUP BY event_type, CAST(date_trunc('day', ts) AS TIMESTAMP)
    )
    SELECT event_type, day, n_events, total_value,
           lag(n_events) OVER w AS prev_n,
           CAST(n_events - lag(n_events) OVER w AS DOUBLE)
             / lag(n_events) OVER w AS n_pct_change,
           (total_value - lag(total_value) OVER w) / lag(total_value) OVER w
             AS value_pct_change
    FROM daily
    WINDOW w AS (PARTITION BY event_type ORDER BY day)
    ORDER BY event_type, day
    """


@query("ts16_period_over_period", oracle=_POP_SQL)
def ts16(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_tables(spark, sf_dir)
    return spark.sql(_POP_SQL)


# ---------------------------------------------------------------------------
# ts17 — sliding (hopping) windows: 10-minute windows every 5 minutes,
# so each event lands in exactly 2 overlapping windows. The Spark side
# uses the NATIVE sliding window() — Catalyst expands it to a bounded
# explode + hash aggregation (state-of-the-art for hopping aggs); the
# oracle reconstructs the same membership arithmetic with an explicit
# 2-offset series. Counts are integers; value sums decimal-exact.
# ---------------------------------------------------------------------------
_SLIDING_ORACLE_SQL = """
    SELECT
      make_timestamp((((epoch_us(ts) // 1000000 - k.k * 300) // 600) * 600 + k.k * 300)
                     * 1000000) AS window_start,
      COUNT(*) AS n_events,
      CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
    FROM events CROSS JOIN (SELECT unnest(range(0, 2)) AS k) k
    GROUP BY 1
    ORDER BY window_start
    """


@query("ts17_sliding_windows", oracle=_SLIDING_ORACLE_SQL)
def ts17(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    t = load_tables(spark, sf_dir)
    return (
        t["events"]
        .groupBy(F.window("ts", "10 minutes", "5 minutes").alias("w"))
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("total_value"),
        )
        .select(F.col("w.start").alias("window_start"), "n_events", "total_value")
        .orderBy("window_start")
    )


# ---------------------------------------------------------------------------
# ts18 — per-user behavioral feature vector (the feature-store pattern):
# one pass over events produces the canonical ML feature table — event-
# type counts (conditional aggregation, no pivot shuffle), recency
# bounds, active-day count, total spend and mean inter-event gap. One
# shuffle on user_id; every feature is an integer count, an exact
# decimal sum, or a once-divided ratio of exact integers, so the whole
# vector grades cell-exact. At 100 TB this is the daily feature-build
# job: map-side combinable, partitioned by the entity key.
# ---------------------------------------------------------------------------
def _user_features_sql(spark_dialect: bool) -> str:
    eus = "unix_micros" if spark_dialect else "epoch_us"
    day = (
        "CAST(date_trunc('day', ts) AS TIMESTAMP)"  # identical in both
    )
    return f"""
    SELECT user_id,
           COUNT(*) AS n_events,
           COUNT(CASE WHEN event_type = 'view' THEN 1 END) AS n_views,
           COUNT(CASE WHEN event_type = 'click' THEN 1 END) AS n_clicks,
           COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS n_purchases,
           COUNT(CASE WHEN event_type = 'error' THEN 1 END) AS n_errors,
           COUNT(DISTINCT {day}) AS active_days,
           MIN(ts) AS first_seen,
           MAX(ts) AS last_seen,
           CAST(SUM(CASE WHEN event_type = 'purchase'
                    THEN CAST(value AS DECIMAL(18,6)) ELSE 0 END) AS DOUBLE) AS total_spend,
           CAST({eus}(MAX(ts)) - {eus}(MIN(ts)) AS DOUBLE)
             / (COUNT(*) - 1) / 60000000.0 AS avg_gap_minutes
    FROM events
    GROUP BY user_id
    HAVING COUNT(*) > 1
    ORDER BY user_id
    """


@query("ts18_user_features", oracle=_user_features_sql(False))
def ts18(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_tables(spark, sf_dir)
    return spark.sql(_user_features_sql(True))


# ---------------------------------------------------------------------------
# ts19 — NATIVE session windows: Spark's session_window(ts, gap)
# declares gap-based sessionization as a grouping expression — the
# declarative twin of ts02's lag/cumsum islands (kept as the portable
# SQL spelling) and st04's stateful streaming sessionizer. One shuffle
# on (user, session); merge of overlapping windows happens inside the
# aggregation. The oracle recomputes the same islands with window
# functions — session bounds are MIN/MAX event times per island, which
# is exactly what session_window's start/end collapse to for a closed
# session set.
# ---------------------------------------------------------------------------
_SESSION_WINDOW_ORACLE = """
    WITH marked AS (
      SELECT user_id, ts, value,
             CASE WHEN lag(ts) OVER w IS NULL
                    OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
                  THEN 1 ELSE 0 END AS new_s
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ),
    sess AS (
      SELECT user_id, ts, value,
             SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
                              ROWS UNBOUNDED PRECEDING) AS sid
      FROM marked
    )
    SELECT user_id, MIN(ts) AS session_start,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
    FROM sess
    GROUP BY user_id, sid
    ORDER BY user_id, session_start
    """


@query("ts19_native_session_window", oracle=_SESSION_WINDOW_ORACLE)
def ts19(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    t = load_tables(spark, sf_dir)
    return (
        t["events"]
        .groupBy("user_id", F.session_window("ts", "30 minutes").alias("sw"))
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("total_value"),
            F.min("ts").alias("session_start"),
        )
        .select("user_id", "session_start", "n_events", "total_value")
        .orderBy("user_id", "session_start")
    )


# ---------------------------------------------------------------------------
# ts20 — behavioral trajectory similarity (the distributed top-k
# trajectory-search shape, cf. REPOSE ICDE'21 in PAPERS.md): each user's
# journey is the ordered string of event-type initials; a small query
# cohort (user_id < 3) ranks all other users by edit distance between
# journeys. Work = |queries| x |users| levenshtein calls — never
# all-pairs — and the journey table builds in one pass with an
# order-deterministic position-sorted fold. levenshtein is built into
# both engines with identical integer semantics, and ties break on
# user_id, so the ranking grades cell-exact.
# ---------------------------------------------------------------------------
_TRAJ_QUERIES = 3
_TRAJ_TOPK = 5


def _trajectory_sql(spark_dialect: bool) -> str:
    if spark_dialect:
        journey = """
      SELECT user_id,
             concat_ws('', transform(
               array_sort(collect_list(struct(ts, event_id, substring(event_type, 1, 1) AS c))),
               s -> s.c)) AS journey
      FROM events GROUP BY user_id
        """
    else:
        journey = """
      SELECT user_id,
             string_agg(substring(event_type, 1, 1), '' ORDER BY ts, event_id) AS journey
      FROM events GROUP BY user_id
        """
    return f"""
    WITH j AS ({journey})
    SELECT query_user, user_id AS similar_user, edit_dist, rn AS rank FROM (
      SELECT q.user_id AS query_user, c.user_id,
             levenshtein(q.journey, c.journey) AS edit_dist,
             row_number() OVER (
               PARTITION BY q.user_id
               ORDER BY levenshtein(q.journey, c.journey), c.user_id
             ) AS rn
      FROM j q JOIN j c ON c.user_id <> q.user_id
      WHERE q.user_id < {_TRAJ_QUERIES}
    ) r WHERE rn <= {_TRAJ_TOPK}
    ORDER BY query_user, rank
    """


@query("ts20_trajectory_similarity", oracle=_trajectory_sql(False))
def ts20(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_tables(spark, sf_dir)
    return spark.sql(_trajectory_sql(True))


# ---------------------------------------------------------------------------
# ts21 — weekly growth accounting (the product-analytics standard:
# every active user classifies each week as NEW / RETAINED /
# RESURRECTED, and CHURNED(w) = active(w-1) - retained(w)). One
# distinct (user, week) pass, per-user LAG for the previous active
# week, one weekly rollup, then a tiny weekly self-join for churn
# (materialized once Spark-side — |weeks| rows, so the join is
# broadcast and the events table is scanned exactly once). All counts
# are integers — cell-exact cross-engine by construction.
# ---------------------------------------------------------------------------
_GROWTH_WEEKLY_SQL = """
    WITH au AS (
      -- CAST: DuckDB's date_trunc('week') yields DATE; Spark yields TIMESTAMP
      SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS TIMESTAMP) AS wk FROM events
    ),
    lagd AS (
      SELECT user_id, wk,
             MIN(wk) OVER (PARTITION BY user_id) AS first_wk,
             LAG(wk) OVER (PARTITION BY user_id ORDER BY wk) AS prev_wk
      FROM au
    ),
    cls AS (
      SELECT wk, user_id,
             CASE WHEN wk = first_wk THEN 'new'
                  WHEN prev_wk = wk - INTERVAL 7 DAY THEN 'retained'
                  ELSE 'resurrected' END AS status
      FROM lagd
    ),
    weekly AS (
      SELECT wk, COUNT(*) AS n_active,
             COUNT(CASE WHEN status = 'new' THEN 1 END) AS n_new,
             COUNT(CASE WHEN status = 'retained' THEN 1 END) AS n_retained,
             COUNT(CASE WHEN status = 'resurrected' THEN 1 END) AS n_resurrected
      FROM cls GROUP BY wk
    )
    SELECT w.wk AS week_start, w.n_active, w.n_new, w.n_retained, w.n_resurrected,
           COALESCE(p.n_active, 0) - w.n_retained AS n_churned
    FROM weekly w LEFT JOIN weekly p ON p.wk = w.wk - INTERVAL 7 DAY
    ORDER BY week_start
    """


@query("ts21_growth_accounting", oracle=_GROWTH_WEEKLY_SQL)
def ts21(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window as W

    t = load_tables(spark, sf_dir)
    au = t["events"].select(
        "user_id", F.date_trunc("week", "ts").alias("wk")
    ).distinct()
    lagd = au.select(
        "user_id",
        "wk",
        F.min("wk").over(W.partitionBy("user_id")).alias("first_wk"),
        F.lag("wk").over(W.partitionBy("user_id").orderBy("wk")).alias("prev_wk"),
    )
    status = (
        F.when(F.col("wk") == F.col("first_wk"), "new")
        .when(F.col("prev_wk") == F.col("wk") - F.expr("INTERVAL 7 DAY"), "retained")
        .otherwise("resurrected")
    )
    weekly = (
        lagd.withColumn("status", status)
        .groupBy("wk")
        .agg(
            F.count("*").alias("n_active"),
            F.count(F.when(F.col("status") == "new", 1)).alias("n_new"),
            F.count(F.when(F.col("status") == "retained", 1)).alias("n_retained"),
            F.count(F.when(F.col("status") == "resurrected", 1)).alias("n_resurrected"),
        )
        .localCheckpoint(eager=True)  # |weeks| rows; the churn self-join below
        # consumes it twice — one events scan total
    )
    prev = weekly.select(
        (F.col("wk") + F.expr("INTERVAL 7 DAY")).alias("wk"),
        F.col("n_active").alias("prev_active"),
    )
    return (
        weekly.join(F.broadcast(prev), "wk", "left")
        .select(
            F.col("wk").alias("week_start"),
            "n_active",
            "n_new",
            "n_retained",
            "n_resurrected",
            (F.coalesce(F.col("prev_active"), F.lit(0)) - F.col("n_retained")).alias(
                "n_churned"
            ),
        )
        .orderBy("week_start")
    )


# ---------------------------------------------------------------------------
# ts22 — RFM segmentation (recency / frequency / monetary quintiles),
# the classic CRM scoring rollup. One events pass builds the per-user
# profile (monetary as exact DECIMAL); quintiles are QUANTIZED
# equal-count bins — the scale-safe spelling. A global NTILE window
# (the r5 spelling) funnels the entire per-user relation (billions of
# rows at 100 TB) through one partition; instead each metric maps to an
# integer cell on a LOG2-OCTAVE grid (floor(log2(u+1)) picks the
# octave, 64 linear sub-cells inside it — a comparison ladder of
# BIGINT literals, no floats, so both engines agree bit-exactly and a
# heavy-tailed metric (monetary/frequency classically are) compresses
# logarithmically instead of collapsing the bulk into one cell the way
# an equal-width grid does under one extreme outlier). The
# CONSTANT-size cell histogram (<= 64*63 cells) yields the four
# 20/40/60/80% boundary cells (Spark: one collect_list+aggregate()
# fold — no window at all; the DuckDB oracle mirrors the identical
# boundary rule with a tiny window, correctness-only), and the 1..5
# score is a comparison against the broadcast boundary row.
# All-integer end to end (monetary in e4 fixed point), so both engines
# agree cell-exactly at any parallelism. Ties share a bin (pandas-qcut
# semantics — the deterministic tie rule).
# ---------------------------------------------------------------------------
_RFM_SUB = 64  # linear sub-cells per log2 octave (<= 63 octaves -> < 4096 cells)


def _log_cell(u: str, idiv: str) -> str:
    """Exact integer log-grid cell for a non-negative BIGINT expression.

    cell = k * 64 + sub where k = floor(log2(u+1)) and sub linearly
    subdivides the octave [2^k, 2^(k+1)) into <= 64 sub-cells. Emitted
    as a CASE comparison ladder over power-of-two literals: pure BIGINT
    compares + one subtract/shift per branch — deterministic and
    identical in Spark and DuckDB (no libm log, no ULP drift), and
    monotone in u so quantile boundaries derived from the cell
    histogram respect value order.
    """
    S = _RFM_SUB
    u1 = f"({u} + 1)"
    branches = []
    for k in range(63):
        base = k * S
        if k < 6:
            sub = f"({u1} - {1 << k})"  # octave narrower than S: identity sub
        else:
            sub = f"(({u1} - {1 << k}) {idiv} {1 << (k - 6)})"
        branches.append(f"WHEN {u1} < {1 << (k + 1)} THEN {base} + {sub}")
    return "CASE " + " ".join(branches) + f" ELSE {63 * S} END"


def _rfm_stage1_sql(spark_dialect: bool, table: str = "events") -> str:
    """The ONE raw-table pass: per-user profile aggregation."""
    return f"""
      SELECT user_id, MAX(ts) AS last_ts, COUNT(*) AS frequency,
             SUM(CAST(value AS DECIMAL(14,4))) AS monetary
      FROM {table} GROUP BY user_id
    """


def _rfm_stage2_ctes(spark_dialect: bool, pu: str = "per_user") -> str:
    """anchor/base/stats/cells CTE block over a per-user relation.

    The corpus-edge anchor reads MAX(last_ts) from the per-user
    relation (identical to MAX(ts) over raw events) so NOTHING after
    stage 1 ever touches the raw table again."""
    if spark_dialect:
        rec = "datediff(a.mx, p.last_ts)"
        idiv = "DIV"
    else:
        rec = "date_diff('day', CAST(p.last_ts AS DATE), CAST(a.mx AS DATE))"
        idiv = "//"
    # per-metric cell: ascending for recency (small = recent = best),
    # descending (mx - v) for frequency/monetary. The shifted value
    # (v - mn, resp. mx - v) is >= 0 and maps onto the log2-octave grid;
    # all-equal metrics degenerate safely to cell 0.
    return f"""anchor AS (SELECT MAX(last_ts) AS mx FROM {pu}),
    base AS (
      SELECT p.user_id,
             CAST({rec} AS BIGINT) AS rec,
             CAST(p.frequency AS BIGINT) AS freq,
             p.monetary,
             CAST(p.monetary * 10000 AS BIGINT) AS mon_e4
      FROM {pu} p CROSS JOIN anchor a
    ),
    stats AS (
      SELECT MIN(rec) AS mn_r, MAX(rec) AS mx_r,
             MIN(freq) AS mn_f, MAX(freq) AS mx_f,
             MIN(mon_e4) AS mn_m, MAX(mon_e4) AS mx_m
      FROM base
    ),
    cells AS (
      SELECT b.user_id, b.rec, b.freq, b.monetary,
             ({_log_cell("b.rec - s.mn_r", idiv)}) AS r_cell,
             ({_log_cell("s.mx_f - b.freq", idiv)}) AS f_cell,
             ({_log_cell("s.mx_m - b.mon_e4", idiv)}) AS m_cell
      FROM base b CROSS JOIN stats s
    )"""


def _rfm_stage3_sql(spark_dialect: bool, cells: str = "cells") -> str:
    """ks/histograms/boundaries/scoring over a cells relation."""
    idiv = "DIV" if spark_dialect else "//"
    hists = ",\n    ".join(
        f"h_{m} AS (SELECT {m}_cell AS cell, COUNT(*) AS cnt FROM {cells} GROUP BY {m}_cell)"
        for m in ("r", "f", "m")
    )
    if spark_dialect:
        null_b = "CAST(NULL AS BIGINT)"
        merge_b = ", ".join(
            f"'b{t}', coalesce(acc.b{t}, IF(acc.cum + x.cnt >= k.k{t}, x.cell, {null_b}))"
            for t in (1, 2, 3, 4)
        )
        bounds = ",\n    ".join(
            f"""arr_{m} AS (
      SELECT sort_array(collect_list(named_struct('cell', cell, 'cnt', cnt))) AS arr FROM h_{m}
    ),
    b_{m} AS (
      SELECT acc.b1 AS b1, acc.b2 AS b2, acc.b3 AS b3, acc.b4 AS b4 FROM (
        SELECT aggregate(a.arr,
          named_struct('cum', CAST(0 AS BIGINT), 'b1', {null_b}, 'b2', {null_b}, 'b3', {null_b}, 'b4', {null_b}),
          (acc, x) -> named_struct('cum', acc.cum + x.cnt, {merge_b})) AS acc
        FROM arr_{m} a CROSS JOIN ks k
      ) f
    )"""
            for m in ("r", "f", "m")
        )
    else:
        minb = ", ".join(
            f"MIN(CASE WHEN cum >= k.k{t} THEN cell END) AS b{t}" for t in (1, 2, 3, 4)
        )
        bounds = ",\n    ".join(
            f"""cum_{m} AS (
      SELECT cell, SUM(cnt) OVER (ORDER BY cell) AS cum FROM h_{m}
    ),
    b_{m} AS (SELECT {minb} FROM cum_{m} CROSS JOIN ks k)"""
            for m in ("r", "f", "m")
        )
    tile = lambda m, b: (  # noqa: E731
        f"1 + (CASE WHEN c.{m}_cell > {b}.b1 THEN 1 ELSE 0 END)"
        f" + (CASE WHEN c.{m}_cell > {b}.b2 THEN 1 ELSE 0 END)"
        f" + (CASE WHEN c.{m}_cell > {b}.b3 THEN 1 ELSE 0 END)"
        f" + (CASE WHEN c.{m}_cell > {b}.b4 THEN 1 ELSE 0 END)"
    )
    return f"""ks AS (
      SELECT (1 * COUNT(*) + 4) {idiv} 5 AS k1, (2 * COUNT(*) + 4) {idiv} 5 AS k2,
             (3 * COUNT(*) + 4) {idiv} 5 AS k3, (4 * COUNT(*) + 4) {idiv} 5 AS k4
      FROM {cells}
    ),
    {hists},
    {bounds},
    scored AS (
      SELECT c.user_id, c.rec AS recency_days, c.freq AS frequency,
             CAST(c.monetary AS DOUBLE) AS monetary,
             {tile("r", "br")} AS r_q,
             {tile("f", "bf")} AS f_q,
             {tile("m", "bm")} AS m_q
      FROM {cells} c CROSS JOIN b_r br CROSS JOIN b_f bf CROSS JOIN b_m bm
    )
    SELECT user_id, recency_days, frequency, monetary,
           6 - r_q AS r_score, 6 - f_q AS f_score, 6 - m_q AS m_score,
           CAST(6 - r_q AS STRING) || CAST(6 - f_q AS STRING) || CAST(6 - m_q AS STRING)
             AS segment
    FROM scored ORDER BY user_id
    """


def _rfm_sql(spark_dialect: bool) -> str:
    """Single-string spelling (the DuckDB oracle — DuckDB plans each
    CTE once, so the inline form is fine there)."""
    return f"""
    WITH per_user AS ({_rfm_stage1_sql(spark_dialect)}),
    {_rfm_stage2_ctes(spark_dialect)},
    {_rfm_stage3_sql(spark_dialect)}
    """


@query("ts22_rfm_segmentation", oracle=_rfm_sql(False))
def ts22(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark side runs STAGED with two localCheckpoint barriers: Spark
    re-expands a CTE per reference, and the inline spelling re-planned
    the raw events scan 22x (events appears once per expansion of the
    per_user/anchor/base chain under cells' four consumers — measured
    with tools/plan_audit.py). Staging pins (1) the per-user profile
    (ONE events scan, the only raw-table pass) and (2) the cells
    relation (consumed by three histograms + scoring); everything
    downstream scans the materialized |users|-row relations only."""
    load_tables(spark, sf_dir)
    pu = spark.sql(_rfm_stage1_sql(True)).localCheckpoint(eager=True)
    pu.createOrReplaceTempView("__rfm_pu__")
    cells = spark.sql(
        "WITH " + _rfm_stage2_ctes(True, "__rfm_pu__") + " SELECT * FROM cells"
    ).localCheckpoint(eager=True)
    cells.createOrReplaceTempView("__rfm_cells__")
    return spark.sql("WITH " + _rfm_stage3_sql(True, "__rfm_cells__"))


# ---------------------------------------------------------------------------
# ts23 — time-weighted average price (TWAP) per (user, 15-min bucket):
# each observation holds until the next event, capped at the bucket
# boundary — the market-data standard where plain AVG over-weights
# bursts. Weights are integer microseconds (LEAD capped to bucket
# end), the weighted sum is exact DECIMAL x BIGINT, and the division
# happens once at emit — cell-exact cross-engine. One shuffle on
# user_id for the LEAD, one for the bucket rollup.
# ---------------------------------------------------------------------------
def _twap_sql(spark_dialect: bool) -> str:
    ep = "unix_micros" if spark_dialect else "epoch_us"
    div = "div" if spark_dialect else "//"
    bucket_s = f"(({ep}(ts) {div} 1000000) {div} 900) * 900"
    if spark_dialect:
        bucket = f"timestamp_seconds({bucket_s})"
        bucket_end = f"timestamp_seconds({bucket_s} + 900)"
        # exact integral division: Spark's `div` on DECIMAL(38,0)
        # operands returns the exact BIGINT quotient
        intdiv = "CAST(SUM(v_e6 * w_us) AS DECIMAL(38,0)) div CAST(SUM(w_us) AS DECIMAL(38,0))"
    else:
        bucket = f"make_timestamp(({bucket_s}) * 1000000)"
        bucket_end = f"make_timestamp(({bucket_s} + 900) * 1000000)"
        # DuckDB's `//` on DECIMALs silently promotes to DOUBLE; HUGEINT
        # division is exact
        intdiv = (
            "CAST(CAST(SUM(v_e6 * w_us) AS HUGEINT) // CAST(SUM(w_us) AS HUGEINT) AS BIGINT)"
        )
    return f"""
    WITH seq AS (
      SELECT user_id, ts, value,
             {bucket} AS bucket,
             {bucket_end} AS bucket_end,
             LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_ts
      FROM events
    ),
    weighted AS (
      -- all-integer domain: the value in exact e6 micro-units
      -- (DECIMAL(20,0)) and the hold time in microseconds
      -- (DECIMAL(12,0) — bounded by one bucket, and decimal x decimal
      -- stays exact where decimal x int64 would overflow 38 digits and
      -- silently go DOUBLE in DuckDB). The final TWAP is an exact
      -- integral division of the two DECIMAL(38,0) sums.
      SELECT user_id, bucket,
             CAST({ep}(LEAST(COALESCE(next_ts, bucket_end), bucket_end)) - {ep}(ts)
                  AS DECIMAL(12,0)) AS w_us,
             CAST(CAST(value AS DECIMAL(18,6)) * 1000000 AS DECIMAL(20,0)) AS v_e6
      FROM seq
    )
    SELECT user_id, bucket,
           COUNT(*) AS n_events,
           CAST(SUM(w_us) AS BIGINT) AS active_us,
           CAST({intdiv} AS BIGINT) AS twap_e6
    FROM weighted
    GROUP BY user_id, bucket
    HAVING SUM(w_us) > 0
    ORDER BY user_id, bucket
    """


@query("ts23_twap", oracle=_twap_sql(False))
def ts23(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_tables(spark, sf_dir)
    return spark.sql(_twap_sql(True))


# ---------------------------------------------------------------------------
# ts24 — point-in-time-correct training features: for every label event
# (purchase), the user's feature values AS THEY WERE strictly before
# that event — running windows with a `1 PRECEDING` upper bound, the
# construction that makes training features reproducible at serving
# time (no label leakage, no training-serving skew). All counts are
# integers, the prior spend is an exact DECIMAL, and recency is integer
# microseconds — cell-exact cross-engine. One shuffle on user_id; every
# feature extends the same window frame.
# ---------------------------------------------------------------------------
def _pit_features_sql(spark_dialect: bool) -> str:
    ep = "unix_micros" if spark_dialect else "epoch_us"
    frame = ("PARTITION BY user_id ORDER BY ts, event_id "
             "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING")
    return f"""
    WITH labeled AS (
      SELECT user_id, event_id, ts, event_type,
             COUNT(CASE WHEN event_type = 'click' THEN 1 END) OVER ({frame}) AS prior_clicks,
             COUNT(CASE WHEN event_type = 'view' THEN 1 END) OVER ({frame}) AS prior_views,
             COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) OVER ({frame}) AS prior_purchases,
             CAST(COALESCE(SUM(CASE WHEN event_type = 'purchase'
                                    THEN CAST(value AS DECIMAL(18,6)) END)
                           OVER ({frame}), 0) AS DOUBLE) AS prior_spend,
             MIN(ts) OVER ({frame}) AS first_seen_ts
      FROM events
    )
    SELECT user_id, event_id, ts,
           prior_clicks, prior_views, prior_purchases, prior_spend,
           CAST(COALESCE({ep}(ts) - {ep}(first_seen_ts), 0) AS BIGINT) AS tenure_us
    FROM labeled
    WHERE event_type = 'purchase'
    ORDER BY user_id, event_id
    """


@query("ts24_pit_features", oracle=_pit_features_sql(False))
def ts24(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_tables(spark, sf_dir)
    return spark.sql(_pit_features_sql(True))


# ---------------------------------------------------------------------------
# ts25 — the ASOF JOIN *SQL surface* graded end-to-end: the identical
# statement executes on both engines — DuckDB runs its native ASOF
# LEFT JOIN, the engine parses it (sqlfront/statements.py) into the
# window-based plan in operators/asof.py (one shuffle on user_id, no
# range join — plan-gated like every graded query). The right side
# dedups to one row per (user, ts) so tie-picking can't differ between
# engines; the left keeps its duplicates (LEFT semantics graded too:
# purchases with no prior click carry NULLs).
# ---------------------------------------------------------------------------
_ASOF_SQL_STMT = """
    SELECT p.user_id, p.ts, p.value AS purchase_value,
           c.click_ts, c.click_value
    FROM (SELECT user_id, ts, value FROM events
          WHERE event_type = 'purchase') p
    ASOF LEFT JOIN (SELECT user_id, ts AS click_ts, MAX(value) AS click_value
                    FROM events WHERE event_type = 'click'
                    GROUP BY user_id, ts) c
    ON p.user_id = c.user_id AND p.ts >= c.click_ts
    ORDER BY p.user_id, p.ts
    """


@query("ts25_asof_sql_surface", oracle=_ASOF_SQL_STMT)
def ts25(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..session import SparkEngine

    load_tables(spark, sf_dir)
    return SparkEngine(spark).sql(_ASOF_SQL_STMT)


# ---------------------------------------------------------------------------
# ts26 — interval (range) join, re-expressed for scale: events land in
# promo windows `[start, end)`. The naive spelling is a range join —
# quadratic risk and a BNLJ in Spark. The scale spelling EXPANDS each
# interval to day grain (a tiny constant blowup: interval_days rows
# per promo) and equi-joins on the event's day, then applies the exact
# range residual — an equi-shuffle plan that survives any event count.
# The DuckDB oracle runs the naive range join, proving the expansion
# is semantics-identical. Money quantizes to exact cents via
# DECIMAL(10,2) before summing.
# ---------------------------------------------------------------------------
_N_PROMOS = 30


def _interval_join_sql(spark_dialect: bool) -> str:
    if spark_dialect:
        promos = f"""
      SELECT id AS promo_id,
             TIMESTAMP '2024-01-01 00:00:00' + make_interval(0,0,0,0, CAST(id*36 AS INT),0,0) AS start_ts,
             TIMESTAMP '2024-01-01 00:00:00' + make_interval(0,0,0,0, CAST(id*36+24 AS INT),0,0) AS end_ts
      FROM range(0, {_N_PROMOS})
        """
        join = """
      SELECT p.promo_id, e.value
      FROM events e
      JOIN (SELECT promo_id, start_ts, end_ts,
                   explode(sequence(to_date(start_ts), to_date(end_ts))) AS d
            FROM promos) p
        ON to_date(e.ts) = p.d
       AND e.ts >= p.start_ts AND e.ts < p.end_ts
        """
    else:
        promos = f"""
      SELECT i AS promo_id,
             TIMESTAMP '2024-01-01 00:00:00' + i * INTERVAL 36 HOUR AS start_ts,
             TIMESTAMP '2024-01-01 00:00:00' + i * INTERVAL 36 HOUR + INTERVAL 24 HOUR AS end_ts
      FROM range(0, {_N_PROMOS}) t(i)
        """
        join = """
      SELECT p.promo_id, e.value
      FROM events e JOIN promos p
        ON e.ts >= p.start_ts AND e.ts < p.end_ts
        """
    return f"""
    WITH promos AS ({promos}),
    hits AS ({join})
    SELECT promo_id, COUNT(*) AS n_events,
           CAST(SUM(CAST(CAST(value AS DECIMAL(10,2)) * 100 AS BIGINT)) AS BIGINT) AS value_cents
    FROM hits GROUP BY promo_id ORDER BY promo_id
    """


@query("ts26_interval_join", oracle=_interval_join_sql(False))
def ts26(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_tables(spark, sf_dir)
    return spark.sql(_interval_join_sql(True))


# ---------------------------------------------------------------------------
# ts27 — SCD2 (slowly-changing-dimension type 2) history build: each
# customer's order-priority timeline collapses to effective-dated
# versions — the warehouse pattern every dimension pipeline runs.
# One window per customer (change detection via LAG, effective-to via
# LEAD over the change rows), deterministic tie-break (date, orderkey);
# the final NULL eff_to marks the current version. Identical SQL both
# engines.
# ---------------------------------------------------------------------------
_SCD2_SQL = """
    WITH seq AS (
      SELECT o_custkey, o_orderpriority, o_orderdate, o_orderkey,
             LAG(o_orderpriority) OVER (PARTITION BY o_custkey
                                        ORDER BY o_orderdate, o_orderkey) AS prev_p
      FROM orders
    ),
    changes AS (
      SELECT * FROM seq WHERE prev_p IS NULL OR prev_p <> o_orderpriority
    )
    SELECT o_custkey AS custkey, o_orderpriority AS priority,
           o_orderdate AS eff_from,
           LEAD(o_orderdate) OVER (PARTITION BY o_custkey
                                   ORDER BY o_orderdate, o_orderkey) AS eff_to,
           ROW_NUMBER() OVER (PARTITION BY o_custkey
                              ORDER BY o_orderdate, o_orderkey) AS version
    FROM changes
    ORDER BY custkey, version
    """


@query("ts27_scd2_history", oracle=_SCD2_SQL)
def ts27(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_tables(spark, sf_dir)
    return spark.sql(_SCD2_SQL)


# ---------------------------------------------------------------------------
# ts28 — cohort retention triangle (the product-analytics companion to
# ts21's growth accounting): users cohorted by FIRST-active day; for
# each (cohort, days-since-cohort age) cell, how many cohort members
# were active and what fraction of the cohort that is. (Day grain, not
# ts21's week: this corpus onboards every user inside its first weeks,
# so week-cohorts degenerate to one row.) Spark-first: one DISTINCT
# (user, day) pass (the same map-side-combined shuffle ts21 plans),
# cohort via a per-user MIN window over it, then one groupBy (cohort,
# age) — no self-join of the activity table against itself (the naive
# spelling), no row multiplication. Exactness: counts are integers;
# retention divides two exact BIGINTs in doubles once at emit. Age is
# an integer day delta over epoch seconds (both stamps are
# date_trunc'd, so the difference is an exact multiple of 86400); only
# the epoch-extraction spelling differs per engine (Spark
# unix_timestamp, DuckDB epoch). Cells cap at cohorts x horizon,
# whatever the event volume — a bounded triangle at any scale.
# ---------------------------------------------------------------------------
def _cohort_retention_sql(spark_dialect: bool) -> str:
    age = (
        "CAST((unix_timestamp(wk) - unix_timestamp(cohort_wk)) DIV 86400 AS BIGINT)"
        if spark_dialect
        else "CAST((epoch(wk) - epoch(cohort_wk)) // 86400 AS BIGINT)"
    )
    return f"""
    WITH au AS (
      SELECT DISTINCT user_id,
             CAST(date_trunc('day', ts) AS TIMESTAMP) AS wk
      FROM events
    ),
    cohorted AS (
      SELECT user_id, wk,
             MIN(wk) OVER (PARTITION BY user_id) AS cohort_wk
      FROM au
    ),
    cells AS (
      SELECT cohort_wk,
             {age} AS age_weeks,
             CAST(COUNT(*) AS BIGINT) AS n_active
      FROM cohorted
      GROUP BY cohort_wk, 2
    ),
    sizes AS (
      SELECT cohort_wk, n_active AS cohort_size
      FROM cells WHERE age_weeks = 0
    )
    SELECT c.cohort_wk AS cohort_day,
           c.age_weeks AS age_days,
           c.n_active AS n_active,
           s.cohort_size AS cohort_size,
           CAST(c.n_active AS DOUBLE) / s.cohort_size AS retention
    FROM cells c JOIN sizes s ON s.cohort_wk = c.cohort_wk
    ORDER BY cohort_day, age_days
    """


@query("ts28_cohort_retention", oracle=_cohort_retention_sql(False))
def ts28(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_tables(spark, sf_dir)
    return spark.sql(_cohort_retention_sql(True))


# ---------------------------------------------------------------------------
# ts29 — Markov transition matrix over user journeys: for every
# (current event_type -> next event_type) pair, the transition count,
# the row-normalized probability, and the rank of each destination
# within its source state — the first-order behavior model a
# recommendation or simulation pipeline estimates from the event log.
# Scale shape: ONE corpus pass (LEAD window PARTITIONED BY user_id —
# never global, the per-entity class every ts operator here uses),
# one map-side-combinable groupBy onto the transition table, and the
# normalizing sums/ranks are windows over THAT table, which is
# |event_type|^2-bounded (constant-size) — no second corpus scan, no
# join back. Probabilities are exact-integer counts divided once
# (IEEE-exact, engine-identical); ranks tie-break on destination.
# Reference parity: no counterpart (core/flow.py delegates relational
# work to DuckDB); extends the journey family (ts02/ts14/ts21/ts28).
# ---------------------------------------------------------------------------
_MARKOV_SQL = """
    WITH seq AS (
      SELECT event_type AS src,
             LEAD(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS dst
      FROM events
    ),
    trans AS (
      SELECT src, dst, CAST(COUNT(*) AS BIGINT) AS n_trans
      FROM seq WHERE dst IS NOT NULL
      GROUP BY src, dst
    )
    SELECT src, dst, n_trans,
           CAST(n_trans AS DOUBLE) /
             CAST(SUM(n_trans) OVER (PARTITION BY src) AS DOUBLE) AS p,
           CAST(RANK() OVER (PARTITION BY src
                             ORDER BY n_trans DESC, dst) AS BIGINT) AS rnk
    FROM trans
    ORDER BY src, rnk, dst
    """


@query("ts29_markov_transitions", oracle=_MARKOV_SQL)
def ts29(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_tables(spark, sf_dir)
    return spark.sql(_MARKOV_SQL)


# ---------------------------------------------------------------------------
# ts30 — robust outlier detection via MAD (median absolute deviation):
# ts10's rolling z-score breaks when the baseline itself contains the
# anomalies (mean and stddev are both dragged); the robust variant
# scores each day against the MEDIAN daily volume and the MAD, using
# the Iglewicz-Hoaglin modified z (0.6745*(x-med)/MAD, spelled as
# (x-med)/(1.4826*MAD), cutoff 3.5). Scale shape: ONE corpus pass
# builds the (event_type x day) daily-count relation (map-side
# combinable groupBy); both medians are aggregates over THAT bounded
# relation, never the corpus — the per-type daily series is what a
# production monitor persists anyway. Spark materializes the daily
# relation once (localCheckpoint): the chain references it three times
# and CTE inlining would re-run the corpus groupBy per reference.
# Exactness: daily counts are exact BIGINTs; median over integers is
# the same (a+b)/2 interpolation in both engines (exactly
# representable); the final score is one double expression.
# ---------------------------------------------------------------------------
_MAD_CUTOFF = 3.5


def _mad_tail_sql(daily: str) -> str:
    """Scoring tail over a daily-count relation (event_type, day, n) —
    shared verbatim by both engines."""
    return f"""
    WITH med AS (
      SELECT event_type, median(n) AS med FROM {daily} GROUP BY event_type
    ),
    mad AS (
      SELECT d.event_type, MAX(m.med) AS med,
             median(abs(CAST(d.n AS DOUBLE) - m.med)) AS mad
      FROM {daily} d JOIN med m ON m.event_type = d.event_type
      GROUP BY d.event_type
    )
    SELECT d.event_type AS event_type, d.day AS day, d.n AS n_events,
           a.med AS med_daily,
           (CAST(d.n AS DOUBLE) - a.med) / (1.4826 * a.mad) AS robust_z,
           abs((CAST(d.n AS DOUBLE) - a.med) / (1.4826 * a.mad))
             > {_MAD_CUTOFF} AS is_outlier
    FROM {daily} d JOIN mad a ON a.event_type = d.event_type
    WHERE a.mad > 0
    ORDER BY abs((CAST(d.n AS DOUBLE) - a.med) / (1.4826 * a.mad)) DESC,
             event_type, day
    LIMIT 15
    """


_MAD_DAILY_SQL = """
    SELECT event_type, CAST(ts AS DATE) AS day,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM events GROUP BY event_type, CAST(ts AS DATE)
    """


@query(
    "ts30_mad_outliers",
    oracle=f"WITH daily AS ({_MAD_DAILY_SQL}), {_mad_tail_sql('daily').strip()[len('WITH '):]}",
)
def ts30(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_tables(spark, sf_dir)
    spark.sql(_MAD_DAILY_SQL).localCheckpoint(eager=True).createOrReplaceTempView(
        "__ts30_daily__"
    )
    return spark.sql(_mad_tail_sql("__ts30_daily__"))


# ---------------------------------------------------------------------------
# ts31 — changepoint detection via CUSUM: for each event type, the day
# where the cumulative sum of deviations from the series mean peaks in
# magnitude — the classic single-changepoint estimator (Page 1954) a
# pipeline runs to locate when a metric's level shifted (deploy,
# data-drift, instrumentation change). Exactness: the deviation is
# scaled by the day count so it stays an exact BIGINT
# ((n - mu)*nd == n*nd - total), making the running window sum
# ASSOCIATIVE-exact — immune to the engines' different windowed-double
# summation orders (the t13 collect-sort-fold concern, solved in the
# integer domain instead); the reported cusum divides once at the end.
# Scale shape: ts30's daily-count relation (one corpus groupBy,
# materialized once) and everything downstream runs over the
# (type x day)-bounded series.
# ---------------------------------------------------------------------------
def _cusum_tail_sql(daily: str) -> str:
    """Changepoint tail over a daily-count relation (event_type, day,
    n) — shared verbatim by both engines."""
    return f"""
    WITH stats AS (
      SELECT event_type,
             CAST(SUM(n) AS BIGINT) AS tot,
             CAST(COUNT(*) AS BIGINT) AS nd
      FROM {daily} GROUP BY event_type
    ),
    cusum AS (
      SELECT d.event_type, d.day, d.n, s.nd,
             SUM(d.n * s.nd - s.tot)
               OVER (PARTITION BY d.event_type ORDER BY d.day) AS c_scaled
      FROM {daily} d JOIN stats s ON s.event_type = d.event_type
    )
    SELECT event_type, day AS changepoint_day,
           CAST(n AS BIGINT) AS n_events,
           CAST(c_scaled AS BIGINT) AS cusum_scaled,
           CAST(c_scaled AS DOUBLE) / nd AS cusum
    FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY event_type
                                   ORDER BY abs(c_scaled) DESC, day) AS r
      FROM cusum
    )
    WHERE r = 1
    ORDER BY event_type
    """


@query(
    "ts31_cusum_changepoint",
    oracle=f"WITH daily AS ({_MAD_DAILY_SQL}), {_cusum_tail_sql('daily').strip()[len('WITH '):]}",
)
def ts31(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_tables(spark, sf_dir)
    spark.sql(_MAD_DAILY_SQL).localCheckpoint(eager=True).createOrReplaceTempView(
        "__ts31_daily__"
    )
    return spark.sql(_cusum_tail_sql("__ts31_daily__"))


# ---------------------------------------------------------------------------
# ts32 — funnel CONVERSION RATES (complements ts14, which reports the
# same strict-order funnel's inter-step LATENCY): the ordered view →
# click → purchase journey
# (each step must happen strictly AFTER the user's first completion of
# the previous step), reported as per-step user counts with step-over-
# step and from-first conversion rates — the product-analytics query
# every event pipeline ships. Scale shape: each step is ONE type-
# filtered corpus pass pre-aggregated to per-user MIN(ts) (map-side
# combinable; the type filter is pushed to the parquet scan), chained
# by equi-joins on user_id (AQE picks broadcast/SMJ by step
# cardinality — funnels shrink monotonically, so later joins broadcast
# the prior step). No windows, no corpus-sized state. Exactness: step
# counts are exact BIGINTs from timestamp comparisons in the integer
# epoch domain; each rate is ONE integer->double division (no float
# accumulation), NULL-guarded identically in both engines.
# Reference parity: no counterpart (core/flow.py delegates relational
# work to DuckDB); extends the behavioral family like ts14/ts28.
# ---------------------------------------------------------------------------
_FUNNEL_STEPS = ("view", "click", "purchase")


def _funnel_tail_sql(counts: str, steps=_FUNNEL_STEPS) -> str:
    """Report tail over a 1-row step-count relation (n1, n2, n3) —
    shared verbatim by ts32, the streaming st18 twin, and the funnel
    stage op."""
    return f"""
    SELECT step, step_name, users,
           CASE WHEN prev = 0 THEN CAST(NULL AS DOUBLE)
                ELSE CAST(users AS DOUBLE) / prev END AS conv_from_prev,
           CASE WHEN first = 0 THEN CAST(NULL AS DOUBLE)
                ELSE CAST(users AS DOUBLE) / first END AS conv_from_first
    FROM (
      SELECT 1 AS step, '{steps[0]}' AS step_name,
             n1 AS users, n1 AS prev, n1 AS first FROM {counts}
      UNION ALL
      SELECT 2, '{steps[1]}', n2, n1, n1 FROM {counts}
      UNION ALL
      SELECT 3, '{steps[2]}', n3, n2, n1 FROM {counts}
    ) steps
    ORDER BY step
    """


def _funnel_sql(
    table: str = "events",
    entity: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    steps=_FUNNEL_STEPS,
) -> str:
    """Full funnel query over any event relation — shared by the graded
    ts32 (defaults) and the ``funnel`` YAML stage op (its params)."""
    return f"""
    WITH s1 AS (
      SELECT {entity} AS user_id, MIN({ts_col}) AS t1 FROM {table}
      WHERE {type_col} = '{steps[0]}' GROUP BY {entity}
    ),
    s2 AS (
      SELECT e.{entity} AS user_id, MIN(e.{ts_col}) AS t2
      FROM {table} e JOIN s1 ON s1.user_id = e.{entity}
      WHERE e.{type_col} = '{steps[1]}' AND e.{ts_col} > s1.t1
      GROUP BY e.{entity}
    ),
    s3 AS (
      SELECT e.{entity} AS user_id, MIN(e.{ts_col}) AS t3
      FROM {table} e JOIN s2 ON s2.user_id = e.{entity}
      WHERE e.{type_col} = '{steps[2]}' AND e.{ts_col} > s2.t2
      GROUP BY e.{entity}
    ),
    counts AS (
      SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM s1) AS n1,
             (SELECT CAST(COUNT(*) AS BIGINT) FROM s2) AS n2,
             (SELECT CAST(COUNT(*) AS BIGINT) FROM s3) AS n3
    )
    {_funnel_tail_sql('counts', steps).strip()}
    """


_FUNNEL32_SQL = _funnel_sql()


@query("ts32_funnel_conversion", oracle=_FUNNEL32_SQL)
def ts32(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Spark side materializes each per-user step table once
    # (localCheckpoint): the counts CTE references every step relation
    # a second time, and uncorrelated scalar subqueries re-execute
    # their whole input plan — without this the corpus is scanned
    # ~12x (s3's count re-runs s2 which re-runs s1). The DuckDB oracle
    # runs the identical SQL as plain CTEs (it materializes CTEs
    # referenced more than once).
    load_tables(spark, sf_dir)
    prev = "events"
    for i, step in enumerate(_FUNNEL_STEPS, start=1):
        if i == 1:
            sql = f"""
            SELECT user_id, MIN(ts) AS t1 FROM events
            WHERE event_type = '{step}' GROUP BY user_id
            """
        else:
            sql = f"""
            SELECT e.user_id, MIN(e.ts) AS t{i}
            FROM events e JOIN {prev} p ON p.user_id = e.user_id
            WHERE e.event_type = '{step}' AND e.ts > p.t{i - 1}
            GROUP BY e.user_id
            """
        spark.sql(sql).localCheckpoint(eager=True).createOrReplaceTempView(
            f"__ts32_s{i}__"
        )
        prev = f"__ts32_s{i}__"
    spark.sql("""
    SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM __ts32_s1__) AS n1,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM __ts32_s2__) AS n2,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM __ts32_s3__) AS n3
    """).createOrReplaceTempView("__ts32_counts__")
    return spark.sql(_funnel_tail_sql("__ts32_counts__"))


# ---------------------------------------------------------------------------
# ts33 — day-of-week seasonality INDEX (complements ts12, which emits
# the raw (dow x hour) traffic matrix): per (event_type, ISO weekday),
# the observed daily event volume versus the type's overall
# daily average, as a normalized seasonality index with above-average
# verdicts — the drift-monitor companion
# to ts30/ts31 (a Tuesday dip is seasonality; the same dip on a Friday
# is an incident). Scale shape: ts30's daily-count relation (ONE
# corpus groupBy) and every downstream step runs over that
# (type x day)-bounded series; output is |types| x 7 rows. Exactness:
# the index compares exact BIGINT cross-products
# (n_events * tot_days vs n_days * tot_events) and divides ONCE into a
# double; the ISO weekday is isodow() in DuckDB and weekday()+1 in
# Spark (both Monday=1..Sunday=7).
# Reference parity: no counterpart (core/flow.py delegates relational
# work to DuckDB); extends the drift-monitor family like ts30/ts31.
# ---------------------------------------------------------------------------
def _dow_tail_sql(daily: str, spark_dialect: bool) -> str:
    """Seasonality tail over a daily-count relation (event_type, day,
    n); only the ISO-weekday projection differs per engine."""
    isodow = "weekday(day) + 1" if spark_dialect else "isodow(day)"
    return f"""
    WITH d2 AS (
      SELECT event_type, day, n, CAST({isodow} AS BIGINT) AS iso_dow
      FROM {daily}
    ),
    per AS (
      SELECT event_type, iso_dow,
             CAST(SUM(n) AS BIGINT) AS n_events,
             CAST(COUNT(*) AS BIGINT) AS n_days
      FROM d2 GROUP BY event_type, iso_dow
    ),
    tot AS (
      SELECT event_type,
             CAST(SUM(n_events) AS BIGINT) AS tot_events,
             CAST(SUM(n_days) AS BIGINT) AS tot_days
      FROM per GROUP BY event_type
    )
    SELECT p.event_type AS event_type, p.iso_dow AS iso_dow,
           p.n_events AS n_events, p.n_days AS n_days,
           CAST(p.n_events * t.tot_days AS DOUBLE)
             / (p.n_days * t.tot_events) AS seasonality_idx,
           p.n_events * t.tot_days > p.n_days * t.tot_events AS above_avg
    FROM per p JOIN tot t ON t.event_type = p.event_type
    ORDER BY event_type, iso_dow
    """


@query(
    "ts33_dow_seasonality",
    oracle=f"WITH daily AS ({_MAD_DAILY_SQL}), {_dow_tail_sql('daily', False).strip()[len('WITH '):]}",
)
def ts33(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_tables(spark, sf_dir)
    spark.sql(_MAD_DAILY_SQL).localCheckpoint(eager=True).createOrReplaceTempView(
        "__ts33_daily__"
    )
    return spark.sql(_dow_tail_sql("__ts33_daily__", True))


# ---------------------------------------------------------------------------
# ts34 — repeat-purchase interval distribution: the gap (whole days)
# between each user's consecutive purchases, aggregated into the
# retention-curve input every commerce pipeline maintains (how long
# until customers come back). Scale shape: ONE type-pruned corpus pass
# with a per-user LAG window (the ts29 Markov shape — partitioned by
# the entity key, map-side prunable), then everything runs over the
# |distinct gaps|-bounded relation; the 1-row total broadcasts into
# the share projection. Exactness: gaps are integer epoch-microsecond
# differences floor-divided to days (BIGINT); counts exact; the share
# divides once.
# Reference parity: no counterpart (core/flow.py delegates relational
# work to DuckDB); extends the behavioral family like ts14/ts28/ts32.
# ---------------------------------------------------------------------------
def _repeat_gap_sql(spark_dialect: bool) -> str:
    epoch = "unix_micros" if spark_dialect else "epoch_us"
    return f"""
    SELECT user_id,
           CAST(floor(CAST({epoch}(ts) - {epoch}(prev_ts) AS DOUBLE)
                      / 86400000000.0) AS BIGINT) AS gap_days
    FROM (
      SELECT user_id, ts,
             LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
      FROM events WHERE event_type = 'purchase'
    )
    WHERE prev_ts IS NOT NULL
    """


def _repeat_tail_sql(gaps: str) -> str:
    """Distribution tail over a (user_id, gap_days) relation — shared
    verbatim by both engines."""
    return f"""
    WITH tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM {gaps})
    SELECT g.gap_days AS gap_days,
           CAST(COUNT(*) AS BIGINT) AS n_gaps,
           CAST(COUNT(DISTINCT g.user_id) AS BIGINT) AS n_users,
           CAST(COUNT(*) AS DOUBLE) / MAX(t.n) AS gap_share
    FROM {gaps} g CROSS JOIN tot t
    GROUP BY g.gap_days
    ORDER BY gap_days
    """


@query(
    "ts34_repeat_purchase_gaps",
    oracle=f"WITH gaps AS ({_repeat_gap_sql(False)}), {_repeat_tail_sql('gaps').strip()[len('WITH '):]}",
)
def ts34(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_tables(spark, sf_dir)
    spark.sql(_repeat_gap_sql(True)).localCheckpoint(eager=True).createOrReplaceTempView(
        "__ts34_gaps__"
    )
    return spark.sql(_repeat_tail_sql("__ts34_gaps__"))


# ---------------------------------------------------------------------------
# ts35 — activity-streak distribution: each user's LONGEST run of
# consecutive active days, rolled into the engagement histogram the
# retention dashboard plots next to ts34's repeat-gap curve. The
# classic gaps-and-islands shape: distinct active days per user, a
# per-user LAG to flag run breaks, a running SUM of the flags to
# number the islands, then two bounded aggregations. Scale shape: both
# windows are PARTITIONED BY the entity key (map-side prunable, no
# global ordering anywhere); everything after the per-user island
# grouping runs over |users|- then |distinct streak-lengths|-bounded
# relations, and the 1-row user-total scalar broadcasts into the share
# projection (q59's class). Exactness: days are integer epoch-micro
# floor-divisions; counts exact; the share divides once.
# Reference parity: no counterpart (core/flow.py delegates relational
# work to DuckDB); completes the ts13/ts21/ts28/ts34 behavioral set.
# ---------------------------------------------------------------------------
def _streak_sql(spark_dialect: bool) -> str:
    epoch = "unix_micros" if spark_dialect else "epoch_us"
    return f"""
    WITH daily AS (
      SELECT DISTINCT user_id,
             CAST(floor(CAST({epoch}(ts) AS DOUBLE) / 86400000000.0) AS BIGINT) AS day
      FROM events
    ),
    lagged AS (
      SELECT user_id, day,
             LAG(day) OVER (PARTITION BY user_id ORDER BY day) AS prev_day
      FROM daily
    ),
    islands AS (
      SELECT user_id, day,
             SUM(CASE WHEN prev_day IS NULL OR day - prev_day > 1 THEN 1 ELSE 0 END)
               OVER (PARTITION BY user_id ORDER BY day
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
      FROM lagged
    ),
    streaks AS (
      SELECT user_id, island, CAST(COUNT(*) AS BIGINT) AS streak_days
      FROM islands GROUP BY user_id, island
    ),
    best AS (
      SELECT user_id, MAX(streak_days) AS best_streak
      FROM streaks GROUP BY user_id
    ),
    tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM best)
    SELECT b.best_streak AS streak_days,
           CAST(COUNT(*) AS BIGINT) AS n_users,
           CAST(COUNT(*) AS DOUBLE) / MAX(t.n) AS user_share
    FROM best b CROSS JOIN tot t
    GROUP BY b.best_streak
    ORDER BY streak_days
    """


@query("ts35_activity_streaks", oracle=_streak_sql(False))
def ts35(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_tables(spark, sf_dir)
    return spark.sql(_streak_sql(True))


# ---------------------------------------------------------------------------
# ts36 — forecast backtest (naive vs seasonal-naive): per event type,
# the mean absolute error of the two standard baseline forecasters
# over the observed daily series — the sanity harness every metric
# pipeline runs before trusting a fancier model (if seasonal-naive
# doesn't beat naive, there is no weekly seasonality worth modeling).
# Forecasts are row-lags over the OBSERVED series (LAG 1 = last
# observed day, LAG 7 = same weekday last week on a dense series) —
# the standard walk-forward backtest on observed points. Scale shape:
# ts30's daily-count relation (ONE corpus groupBy, materialized once);
# both LAG windows PARTITION BY event_type over the (type x day)-
# bounded series; scoring is a |types|-bounded aggregate. Exactness:
# errors are BIGINT absolute differences of counts; each MAE divides
# once; the verdict compares integer error sums directly (same
# denominator, so no float compare).
# Reference parity: no counterpart (core/flow.py delegates relational
# work to DuckDB); completes the ts30/ts31/q73 monitoring family.
# ---------------------------------------------------------------------------
def _backtest_tail_sql(daily: str) -> str:
    """Backtest tail over a daily-count relation (event_type, day, n)
    — shared verbatim by both engines."""
    return f"""
    WITH lagged AS (
      SELECT event_type, day, n,
             LAG(n, 1) OVER (PARTITION BY event_type ORDER BY day) AS f_naive,
             LAG(n, 7) OVER (PARTITION BY event_type ORDER BY day) AS f_seasonal
      FROM {daily}
    ),
    scored AS (
      SELECT event_type,
             CAST(abs(n - f_naive) AS BIGINT) AS e_naive,
             CAST(abs(n - f_seasonal) AS BIGINT) AS e_seasonal
      FROM lagged WHERE f_seasonal IS NOT NULL
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_days_scored,
           CAST(SUM(e_naive) AS BIGINT) AS sae_naive,
           CAST(SUM(e_seasonal) AS BIGINT) AS sae_seasonal,
           CAST(SUM(e_naive) AS DOUBLE) / COUNT(*) AS mae_naive,
           CAST(SUM(e_seasonal) AS DOUBLE) / COUNT(*) AS mae_seasonal,
           SUM(e_seasonal) < SUM(e_naive) AS seasonal_wins
    FROM scored
    GROUP BY event_type
    ORDER BY event_type
    """


@query(
    "ts36_forecast_backtest",
    oracle=f"WITH daily AS ({_MAD_DAILY_SQL}), {_backtest_tail_sql('daily').strip()[len('WITH '):]}",
)
def ts36(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_tables(spark, sf_dir)
    spark.sql(_MAD_DAILY_SQL).localCheckpoint(eager=True).createOrReplaceTempView(
        "__ts36_daily__"
    )
    return spark.sql(_backtest_tail_sql("__ts36_daily__"))


# ---------------------------------------------------------------------------
# ts37 — session-duration survival curve (Kaplan-Meier counting
# table): per observed session length (whole minutes), the at-risk
# count, ended-session events, right-censored exits, the discrete
# hazard d/n, and the surviving share among completed sessions — the
# actuarial table behind "how long do sessions last" engagement
# analysis. Conventions (documented, exact): sessions are ts02's
# 30-minute-gap islands; a session whose last event falls within one
# session gap of the corpus's final timestamp is CENSORED (it may
# have continued past the observation edge — genuine right-
# censoring), all others ENDED at their observed duration. Scale
# shape: ts02's entity-partitioned sessionizer (one shuffle on
# user_id), ONE per-session aggregation, a 1-row corpus-edge scalar
# cross-joined in (q59's scalar class), then everything runs over the
# |distinct durations|-bounded relation — the cumulative windows
# order <= |distinct minutes| rows (ts34/ts35's bounded-walk class).
# Exactness: durations are BIGINT microsecond floor-divisions; counts
# exact; hazard and surviving share each divide once.
# Reference parity: no counterpart (core/flow.py delegates relational
# work to DuckDB); completes the ts02/ts13/ts19/ts34/ts35 behavioral
# engagement family.
# ---------------------------------------------------------------------------
def _survival_tail_sql(per_session: str) -> str:
    """Kaplan-Meier tail over a (dur_min BIGINT, end_us BIGINT)
    per-session relation — shared verbatim by ts37 (batch sessionizer)
    and st21 (the streaming session_window state), dialect-free
    because the censor comparison is integer microseconds."""
    gap_us = SESSION_GAP_MIN * 60 * 1000000
    return f"""
    WITH cut AS (SELECT MAX(end_us) AS edge FROM {per_session}),
    labeled AS (
      SELECT p.dur_min,
             c.edge - p.end_us > {gap_us} AS ended
      FROM {per_session} p CROSS JOIN cut c
    ),
    times AS (
      SELECT dur_min AS t_min,
             CAST(SUM(CASE WHEN ended THEN 1 ELSE 0 END) AS BIGINT) AS n_ended_at,
             CAST(SUM(CASE WHEN ended THEN 0 ELSE 1 END) AS BIGINT) AS n_censored_at
      FROM labeled GROUP BY dur_min
    ),
    tot AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_sessions,
             CAST(SUM(CASE WHEN ended THEN 1 ELSE 0 END) AS BIGINT) AS n_ended
      FROM labeled
    ),
    walk AS (
      SELECT t.t_min, t.n_ended_at, t.n_censored_at, o.n_sessions, o.n_ended,
             COALESCE(SUM(t.n_ended_at + t.n_censored_at)
               OVER (ORDER BY t.t_min ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
               0) AS n_gone,
             SUM(t.n_ended_at)
               OVER (ORDER BY t.t_min ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS cum_ended
      FROM times t CROSS JOIN tot o
    )
    SELECT t_min,
           CAST(n_sessions - n_gone AS BIGINT) AS n_at_risk,
           n_ended_at,
           n_censored_at,
           CAST(n_ended_at AS DOUBLE) / (n_sessions - n_gone) AS hazard,
           CAST(n_ended - cum_ended AS DOUBLE) / n_ended AS ended_surv_share
    FROM walk
    ORDER BY t_min
    """


def _survival_sessions_sql(spark_dialect: bool, with_keys: bool = False) -> str:
    """ts02's gap-island sessionizer reduced to the tail's
    (dur_min, end_us) contract. ``with_keys`` also projects the
    (user_id, session_seq) group keys — st22's bounded-state oracle
    needs them to drop each user's last (never-closed) island."""
    epoch = "unix_micros" if spark_dialect else "epoch_us"
    gap_us = SESSION_GAP_MIN * 60 * 1000000
    keys = "user_id, session_seq, " if with_keys else ""
    return f"""
    SELECT {keys}CAST(floor(CAST(MAX({epoch}(ts)) - MIN({epoch}(ts)) AS DOUBLE) / 60000000.0)
                AS BIGINT) AS dur_min,
           CAST(MAX({epoch}(ts)) AS BIGINT) AS end_us
    FROM (
      SELECT user_id, ts,
             SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_seq
      FROM (
        SELECT user_id, event_id, ts,
               CASE WHEN prev_ts IS NULL
                    OR {epoch}(ts) - {epoch}(prev_ts) > {gap_us} THEN 1 ELSE 0 END AS new_session
        FROM (
          SELECT user_id, event_id, ts,
                 LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
          FROM events
        )
      )
    )
    GROUP BY user_id, session_seq
    """


def _survival_sql(spark_dialect: bool) -> str:
    sessions = _survival_sessions_sql(spark_dialect)
    tail = _survival_tail_sql("per_session").strip()
    assert tail.startswith("WITH ")
    return f"WITH per_session AS ({sessions}), {tail[len('WITH '):]}"


@query("ts37_survival_curve", oracle=_survival_sql(False))
def ts37(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark side checkpoints the per-session relation: the
    Kaplan-Meier tail consumes it several times (at-risk totals,
    the duration spine, the cumulative walk), and each reference
    would re-run the sessionizer over raw events (PERF.md r27)."""
    load_tables(spark, sf_dir)
    per = spark.sql(_survival_sessions_sql(True)).localCheckpoint(eager=True)
    per.createOrReplaceTempView("__ts37_sessions__")
    return spark.sql(_survival_tail_sql("__ts37_sessions__"))


# ---------------------------------------------------------------------------
# ts38 — exponentially-decayed activity leaderboard: the top-10 users
# by half-life-weighted event count (half-life = one week), the
# standard "trending entities" primitive behind every leaderboard /
# hot-keys surface. Decay math is INTEGER-EXACT: per-user weekly
# counts are scaled by 2^(week - corpus_min_week) and summed as
# BIGINT (a 30-day corpus spans <= 5 weeks, so the scale factor is
# <= 2^4; at a longer horizon the same spelling re-anchors per
# retention window), and the decayed score divides ONCE by
# 2^(max_week - min_week) — powers of two are exact in doubles, so
# both engines agree bit-for-bit. Scale shape: ONE map-side-
# combinable (user x week) count, a 1-row week-span scalar
# cross-joined in, a second |users|-bounded re-aggregation, then
# ORDER BY + LIMIT 10 (TakeOrderedAndProject — no global sort) with
# the rank window over the 10 surviving rows (st11's
# rank-after-LIMIT spelling).
# Reference parity: no counterpart (core/flow.py delegates relational
# work to DuckDB); batch twin of st20's incrementally-maintained
# state.
# ---------------------------------------------------------------------------
_WEEK_US = 7 * 86400 * 1000000
DECAY_TOP_N = 10


def _weekly_counts_sql(spark_dialect: bool) -> str:
    epoch = "unix_micros" if spark_dialect else "epoch_us"
    return f"""
    SELECT user_id,
           CAST(floor(CAST({epoch}(ts) AS DOUBLE) / {_WEEK_US}.0) AS BIGINT) AS week,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM events GROUP BY user_id, 2
    """


_DECAY_MAX_SPAN = 40  # retention window (weeks): older periods weigh exactly 0


def _decay_tail_sql(weekly: str, spark_dialect: bool) -> str:
    """Decayed-leaderboard tail over a (user_id, week, n) relation —
    shared by ts38 (batch weekly counts) and st20 (the incrementally
    maintained state table).

    Overflow guard (r7 advice): the anchor is re-based to
    GREATEST(w0, w1 - {_DECAY_MAX_SPAN}) so the BIGINT shift amount is
    bounded by the retention window — periods older than
    {_DECAY_MAX_SPAN} weeks before the newest get weight EXACTLY 0
    (true weight < 2^-40 ~ 9e-13 relative, below leaderboard
    resolution) instead of silently wrapping the shift past ~62 weeks
    (Spark shiftleft masks the shift to 6 bits; non-ANSI sums wrap).
    Bit-identical to the un-anchored spelling for corpora spanning
    <= {_DECAY_MAX_SPAN} weeks (the graded 30-day corpus spans <= 5).

    Residual integer-exactness guard (r8 ADVICE low): a per-entity
    weekly count >= 2^(62 - win) (~4.2M/week at the default span)
    would wrap the scaled BIGINT sum silently on non-ANSI Spark while
    DuckDB raises on overflow — cross-engine divergence exactly at
    stress scale. Both dialects now fail LOUDLY via
    raise_error/error() (the registry op's __chk__ pattern,
    registry.py op_decayed_leaderboard) instead."""
    shift = (
        "shiftleft(CAST(1 AS BIGINT), CAST({x} AS INT))"
        if spark_dialect
        else "(CAST(1 AS BIGINT) << CAST({x} AS INT))"
    )
    err = "raise_error" if spark_dialect else "error"
    win_expr = f"LEAST(MAX(week) - MIN(week), CAST({_DECAY_MAX_SPAN} AS BIGINT))"
    return f"""
    WITH span AS (
      SELECT GREATEST(MIN(week), MAX(week) - {_DECAY_MAX_SPAN}) AS w0,
             {win_expr} AS win,
             CASE WHEN MAX(n) >= {shift.format(x=f"62 - {win_expr}")} THEN
               {err}('decayed leaderboard: per-entity period count too large for integer-exact decay at this span; lower the retention window or pre-aggregate')
             ELSE CAST(0 AS BIGINT) END AS chk
      FROM {weekly}
    ),
    scaled AS (
      SELECT w.user_id,
             CAST(SUM(w.n) AS BIGINT) AS raw_n,
             CAST(SUM(w.n * (CASE WHEN w.week < s.w0 THEN CAST(0 AS BIGINT)
                             ELSE {shift.format(x="w.week - s.w0")} END) + s.chk) AS BIGINT) AS scaled,
             MAX(s.win) AS span_weeks
      FROM {weekly} w CROSS JOIN span s
      GROUP BY w.user_id
    ),
    top AS (
      SELECT user_id, raw_n,
             CAST(scaled AS DOUBLE) / {shift.format(x="span_weeks")} AS decayed_n
      FROM scaled
      ORDER BY scaled DESC, user_id
      LIMIT {DECAY_TOP_N}
    )
    SELECT user_id, raw_n, decayed_n,
           ROW_NUMBER() OVER (ORDER BY decayed_n DESC, user_id) AS rn
    FROM top
    ORDER BY rn
    """


@query(
    "ts38_decayed_leaderboard",
    oracle=f"WITH weekly AS ({_weekly_counts_sql(False)}), {_decay_tail_sql('weekly', False).strip()[len('WITH '):]}",
)
def ts38(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_tables(spark, sf_dir)
    spark.sql(_weekly_counts_sql(True)).createOrReplaceTempView("__ts38_weekly__")
    return spark.sql(_decay_tail_sql("__ts38_weekly__", True))


# ---------------------------------------------------------------------------
# ts39 — linear multi-touch attribution: every purchase's value is
# split equally across the user's clicks in the preceding 7 days
# (integer micro-units, remainder credited to the EARLIEST touch so
# the books reconcile to the cent), rolled up into revenue credited
# per click day — the standard marketing-attribution report between
# last-touch (ts03's as-of) and position-weighted models. Scale
# shape: purchases x clicks join on the USER key (both sides
# type-pruned facts; SMJ correct at scale, AQE broadcasts where
# small) with the 7-day band as a residual predicate; both windows
# PARTITION BY the purchase id; the rollup is |days|-bounded.
# Exactness: values quantize to e6 BIGINTs once (floor(v*1e6 + 0.5) —
# identical doubles both engines); the equal split is integer
# division with the remainder pinned to the first touch, so
# SUM(attributed) equals SUM(purchase value) exactly; the final
# DOUBLE divides once per row.
# Reference parity: no counterpart (core/flow.py delegates relational
# work to DuckDB); completes the ts03/ts14/ts32 journey family.
# ---------------------------------------------------------------------------
_ATTR_WINDOW_US = 7 * 86400 * 1000000


def _attribution_sql(spark_dialect: bool) -> str:
    """Spark side splits the user-key join by 7-day bucket (r9 skew
    fix): the naive ON c.user_id = p.user_id join carries the band as
    a RESIDUAL predicate, so a hot user owning share s of the corpus
    pays |P_u| x |C_u| pair generation — quadratic in per-user HISTORY
    (measured 2.85x organic wall at 0.5 hot share, the only >2x op in
    the r9 entity-window skew sweep). A click can only attribute to a
    purchase whose window-bucket floor(pts_us / 7d) is its own bucket
    or the next one (integer floor: cts in [pts-W, pts-1] spans
    exactly buckets pb-1..pb), so purchases expand 2x via explode and
    the join becomes equi on (user_id, bucket) — per-key products are
    bounded by per-WINDOW activity, history-linear at any skew, and
    each qualifying pair matches exactly one bucket arm (a click's
    bucket is unique), so no dedup is needed. The DuckDB oracle keeps
    the naive single-key spelling: a structurally different plan
    producing the identical pair set is a stronger independent
    check."""
    epoch = "unix_micros" if spark_dialect else "epoch_us"
    intdiv = "div" if spark_dialect else "//"
    if spark_dialect:
        touches_from = f"""
      FROM (SELECT user_id, pid, pts, v_e6,
                   CAST({epoch}(pts) AS BIGINT) {intdiv} {_ATTR_WINDOW_US} - __bk.d AS jb
            FROM purchases
            LATERAL VIEW explode(array(CAST(0 AS BIGINT), CAST(1 AS BIGINT))) __bk AS d) p
      JOIN clicks c
        ON c.user_id = p.user_id
       AND CAST({epoch}(c.cts) AS BIGINT) {intdiv} {_ATTR_WINDOW_US} = p.jb
       AND {epoch}(p.pts) - {epoch}(c.cts) > 0
       AND {epoch}(p.pts) - {epoch}(c.cts) <= {_ATTR_WINDOW_US}"""
    else:
        touches_from = f"""
      FROM purchases p JOIN clicks c
        ON c.user_id = p.user_id
       AND {epoch}(p.pts) - {epoch}(c.cts) > 0
       AND {epoch}(p.pts) - {epoch}(c.cts) <= {_ATTR_WINDOW_US}"""
    return f"""
    WITH purchases AS (
      SELECT user_id, event_id AS pid, ts AS pts,
             CAST(floor(value * 1000000.0 + 0.5) AS BIGINT) AS v_e6
      FROM events WHERE event_type = 'purchase'
    ),
    clicks AS (
      SELECT user_id, event_id AS cid, ts AS cts
      FROM events WHERE event_type = 'click'
    ),
    touches AS (
      SELECT p.pid, p.v_e6,
             CAST(floor(CAST({epoch}(c.cts) AS DOUBLE) / 86400000000.0) AS BIGINT)
               AS click_day,
             ROW_NUMBER() OVER (PARTITION BY p.pid ORDER BY c.cts, c.cid) AS rn,
             COUNT(*) OVER (PARTITION BY p.pid) AS n_touch
      {touches_from}
    ),
    alloc AS (
      SELECT click_day,
             v_e6 {intdiv} n_touch
               + CASE WHEN rn = 1 THEN v_e6 % n_touch ELSE 0 END AS a_e6
      FROM touches
    )
    SELECT click_day,
           CAST(COUNT(*) AS BIGINT) AS n_touches,
           CAST(SUM(a_e6) AS BIGINT) AS attributed_e6,
           CAST(SUM(a_e6) AS DOUBLE) / 1000000.0 AS attributed_value
    FROM alloc
    GROUP BY click_day
    ORDER BY click_day
    """


@query("ts39_linear_attribution", oracle=_attribution_sql(False))
def ts39(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_tables(spark, sf_dir)
    return spark.sql(_attribution_sql(True))


# ---------------------------------------------------------------------------
# ts40 — per-day peak session concurrency (minute grain): the
# capacity-planning number every ops team tracks — for each day, the
# maximum number of sessions simultaneously active in any minute,
# the first minute that peak occurs, and the day's session-span
# count. The sweep is the classic +1/-1 delta walk made SCALE-SAFE:
# deltas aggregate to (day, minute) first (map-side combinable), so
# the cumulative window orders <= 1441 rows PER DAY PARTITION — never
# the corpus. Sessions are ts02's 30-minute-gap islands; a session
# crossing midnight is clipped into both days (correct per-day
# concurrency semantics), expanded via a <= 2-element day sequence.
# "Active in minute b" means overlapping any part of it: +1 at the
# first covered minute, -1 one past the last. Exactness: all integer
# microsecond/minute arithmetic and integer sums; the peak row is a
# rank over the bounded per-day sweep (minute ascending on ties).
# Reference parity: no counterpart (core/flow.py delegates relational
# work to DuckDB); completes the ts01/ts02/ts19/ts37 session family.
# ---------------------------------------------------------------------------
_DAY_US = 86400 * 1000000


def _concurrency_sql(spark_dialect: bool, clipped_rel: str | None = None) -> str:
    epoch = "unix_micros" if spark_dialect else "epoch_us"
    gap_us = SESSION_GAP_MIN * 60 * 1000000
    if spark_dialect:
        days = "explode(sequence(CAST(floor(CAST(a_us AS DOUBLE) / 86400000000.0) AS BIGINT), CAST(floor(CAST(b_us AS DOUBLE) / 86400000000.0) AS BIGINT)))"
    else:
        days = "unnest(range(CAST(floor(CAST(a_us AS DOUBLE) / 86400000000.0) AS BIGINT), CAST(floor(CAST(b_us AS DOUBLE) / 86400000000.0) AS BIGINT) + 1))"
    head = f"""
    WITH numbered AS (
      SELECT user_id, ts,
             SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_seq
      FROM (
        SELECT user_id, event_id, ts,
               CASE WHEN prev_ts IS NULL
                    OR {epoch}(ts) - {epoch}(prev_ts) > {gap_us} THEN 1 ELSE 0 END AS new_session
        FROM (
          SELECT user_id, event_id, ts,
                 LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
          FROM events
        )
      )
    ),
    sessions AS (
      SELECT CAST(MIN({epoch}(ts)) AS BIGINT) AS a_us,
             CAST(MAX({epoch}(ts)) AS BIGINT) AS b_us
      FROM numbered GROUP BY user_id, session_seq
    ),
    clipped_core AS (
      SELECT day,
             GREATEST(a_us, day * {_DAY_US}) AS a_us,
             LEAST(b_us, (day + 1) * {_DAY_US} - 1) AS b_us
      FROM (SELECT a_us, b_us, {days} AS day FROM sessions)
    )
    SELECT * FROM clipped_core"""
    if clipped_rel == "__clipped_only__":
        return head
    if clipped_rel is None:
        # inline spelling (the DuckDB oracle; DuckDB plans CTEs once)
        clipped_cte = f"clipped AS ({head}),"
        clipped = "clipped"
    else:
        # Spark runtime path: the day-clipped session spans are
        # checkpointed by the caller — their three consumers (both
        # delta projections + the span counts) would otherwise each
        # re-run the sessionizer over raw events (PERF.md r27)
        clipped_cte = ""
        clipped = clipped_rel
    return f"""
    WITH {clipped_cte}
    deltas AS (
      SELECT day,
             CAST(floor(CAST(a_us - day * {_DAY_US} AS DOUBLE) / 60000000.0) AS INT) AS minute,
             1 AS d
      FROM {clipped}
      UNION ALL
      SELECT day,
             CAST(floor(CAST(b_us - day * {_DAY_US} AS DOUBLE) / 60000000.0) AS INT) + 1,
             -1
      FROM {clipped}
    ),
    perminute AS (
      SELECT day, minute, CAST(SUM(d) AS BIGINT) AS delta
      FROM deltas GROUP BY day, minute
    ),
    sweep AS (
      SELECT day, minute,
             SUM(delta) OVER (PARTITION BY day ORDER BY minute
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS active
      FROM perminute
    ),
    spans AS (SELECT day, CAST(COUNT(*) AS BIGINT) AS n_session_spans FROM {clipped} GROUP BY day),
    ranked AS (
      SELECT day, minute, active,
             ROW_NUMBER() OVER (PARTITION BY day ORDER BY active DESC, minute) AS rn
      FROM sweep
    )
    SELECT r.day AS day,
           CAST(r.active AS BIGINT) AS peak_concurrent,
           CAST(r.minute AS INT) AS peak_minute,
           s.n_session_spans AS n_session_spans
    FROM ranked r JOIN spans s ON s.day = r.day
    WHERE r.rn = 1
    ORDER BY day
    """


@query("ts40_peak_concurrency", oracle=_concurrency_sql(False))
def ts40(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_tables(spark, sf_dir)
    clipped = spark.sql(
        _concurrency_sql(True, clipped_rel="__clipped_only__")
    ).localCheckpoint(eager=True)
    clipped.createOrReplaceTempView("__ts40_clipped__")
    return spark.sql(_concurrency_sql(True, clipped_rel="__ts40_clipped__"))


# ---------------------------------------------------------------------------
# ts41 — burstiness profile (Fano factor + Goh-Barabasi burstiness):
# per event type, the variance-to-mean ratio of daily volumes and
# B = (sigma - mu) / (sigma + mu) — the dispersion diagnostics that
# separate Poisson-like steady traffic (Fano ~ 1, B ~ -? steady) from
# bursty arrivals (Fano >> 1, B -> 1), read next to ts30/ts31 before
# trusting anomaly thresholds calibrated on a steady-traffic
# assumption. Scale shape: ONE corpus groupBy onto the (type x day)-
# bounded daily relation (ts30's shared _MAD_DAILY_SQL), then pure
# integer-sum aggregation per type. Exactness: n, sum(x), sum(x^2)
# are exact BIGINTs; mean/variance/Fano/B derive from them in a fixed
# arithmetic order (each a handful of IEEE ops on identical operands
# — bit-identical both engines); the overdispersion verdict
# cross-multiplies integers only (n*sum_sq - sum^2 > sum*(n-1)).
# Reference parity: no counterpart (core/flow.py delegates relational
# work to DuckDB); completes the ts30/ts31/ts36/q73 monitoring family.
# ---------------------------------------------------------------------------
def _burstiness_tail_sql(daily: str) -> str:
    """Dispersion tail over a (event_type, day, n) relation — shared
    verbatim by both engines."""
    return f"""
    WITH sums AS (
      SELECT event_type,
             CAST(COUNT(*) AS BIGINT) AS n_days,
             CAST(SUM(n) AS BIGINT) AS sum_n,
             CAST(SUM(n * n) AS BIGINT) AS sum_sq
      FROM {daily} GROUP BY event_type
    )
    SELECT event_type, n_days,
           CAST(sum_n AS DOUBLE) / n_days AS mean_daily,
           CAST(n_days * sum_sq - sum_n * sum_n AS DOUBLE)
             / (CAST(n_days AS DOUBLE) * (n_days - 1)) AS var_daily,
           (CAST(n_days * sum_sq - sum_n * sum_n AS DOUBLE)
             / (CAST(n_days AS DOUBLE) * (n_days - 1)))
             / (CAST(sum_n AS DOUBLE) / n_days) AS fano,
           (sqrt(CAST(n_days * sum_sq - sum_n * sum_n AS DOUBLE)
                 / (CAST(n_days AS DOUBLE) * (n_days - 1)))
             - CAST(sum_n AS DOUBLE) / n_days)
           / (sqrt(CAST(n_days * sum_sq - sum_n * sum_n AS DOUBLE)
                   / (CAST(n_days AS DOUBLE) * (n_days - 1)))
             + CAST(sum_n AS DOUBLE) / n_days) AS burstiness,
           n_days * sum_sq - sum_n * sum_n > sum_n * (n_days - 1) AS overdispersed
    FROM sums
    ORDER BY event_type
    """


@query(
    "ts41_burstiness",
    oracle=f"WITH daily AS ({_MAD_DAILY_SQL}), {_burstiness_tail_sql('daily').strip()[len('WITH '):]}",
)
def ts41(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_tables(spark, sf_dir)
    spark.sql(_MAD_DAILY_SQL).localCheckpoint(eager=True).createOrReplaceTempView(
        "__ts41_daily__"
    )
    return spark.sql(_burstiness_tail_sql("__ts41_daily__"))


# ---------------------------------------------------------------------------
# ts42 — DAU/WAU stickiness: per day, distinct active users that day
# (DAU) over distinct users active in the trailing 7-day window (WAU),
# the canonical product-engagement ratio (a user active every day
# scores 1.0; a once-a-week population scores ~1/7). The sliding
# DISTINCT is spelled scalably: the distinct (user, day) relation is
# built ONCE (map-side-combinable), then each active day contributes
# to at most 7 window ends via a 7-row offset spine — no corpus-wide
# window, no per-day rescan, total intermediate volume <= 7|U|. DAU
# and WAU are two bounded groupBys joined on the day; days past the
# corpus edge are excluded by the DAU join (every output day is an
# observed day). Exactness: day numbers are integer epoch days,
# counts BIGINT, the ratio divides once.
# Reference parity: no counterpart (core/flow.py delegates relational
# work to DuckDB); completes the ts28/ts33/ts35/ts41 engagement family.
# ---------------------------------------------------------------------------
_STICKY_WINDOW = 7


def _stickiness_sql(spark_dialect: bool, table: str = "events") -> str:
    if spark_dialect:
        daynum = "CAST(datediff(CAST(ts AS DATE), DATE '1970-01-01') AS BIGINT)"
        offsets = f"SELECT explode(sequence(0, {_STICKY_WINDOW - 1})) AS o"
    else:
        daynum = "CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT)"
        offsets = f"SELECT unnest(range(0, {_STICKY_WINDOW})) AS o"
    return f"""
    WITH ud AS (
      SELECT DISTINCT user_id, {daynum} AS dn FROM {table}
    ),
    contrib AS (
      SELECT DISTINCT user_id, dn + o.o AS wdn
      FROM ud CROSS JOIN ({offsets}) o
    ),
    dau AS (SELECT dn, CAST(COUNT(*) AS BIGINT) AS n FROM ud GROUP BY dn),
    wau AS (SELECT wdn AS dn, CAST(COUNT(*) AS BIGINT) AS n FROM contrib GROUP BY wdn)
    SELECT d.dn AS day_num,
           d.n AS dau,
           w.n AS wau,
           CAST(d.n AS DOUBLE) / w.n AS stickiness
    FROM dau d JOIN wau w ON w.dn = d.dn
    ORDER BY day_num
    """


@query("ts42_stickiness", oracle=_stickiness_sql(False))
def ts42(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_tables(spark, sf_dir)
    return spark.sql(_stickiness_sql(True))


# ---------------------------------------------------------------------------
# ts43 — in-session event-type co-occurrence (market-basket lift):
# for every ordered pair of event types, the number of sessions
# containing BOTH, support, directional confidence, and lift — the
# association table behind behavioral features ("users who search in
# a session also purchase in it 2.3x more than chance") and
# next-action models. Sessions are ts02's gap islands; the basket
# relation is the DISTINCT (user, session, type) projection, so
# repeat events inside a session count once (true basket semantics).
# Scale shape: one sessionizer pass (entity-keyed windows), one
# map-side-combinable distinct, a self-equi-join on the session key
# whose output is bounded by |types|^2 per session, and a
# |type pairs|-bounded report with a 1-row session-total scalar
# (q59's class). Exactness: all counts BIGINT; support/confidence/
# lift each divide once (lift's numerator multiplies integers before
# its single division).
# Reference parity: no counterpart (core/flow.py delegates relational
# work to DuckDB); extends the ts02/ts32 session-analytics family.
# ---------------------------------------------------------------------------


def _cooccurrence_sql(
    spark_dialect: bool, table: str = "events", baskets_rel: str | None = None
) -> str:
    epoch = "unix_micros" if spark_dialect else "epoch_us"
    gap_us = SESSION_GAP_MIN * 60 * 1000000
    baskets_sql = f"""
    WITH ordered AS (
      SELECT user_id, event_id, ts, event_type,
             LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
      FROM {table}
    ),
    flagged AS (
      SELECT user_id, event_id, ts, event_type,
             CASE WHEN prev_ts IS NULL
                  OR {epoch}(ts) - {epoch}(prev_ts) > {gap_us} THEN 1 ELSE 0 END AS new_session
      FROM ordered
    ),
    baskets_core AS (
      SELECT DISTINCT user_id, session_seq, event_type FROM (
        SELECT user_id, event_type,
               SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS session_seq
        FROM flagged
      ) s
    )
    SELECT * FROM baskets_core"""
    if baskets_rel == "__baskets_only__":
        return baskets_sql
    if baskets_rel is None:
        # inline spelling (the DuckDB oracle; DuckDB plans CTEs once)
        baskets_cte = f"baskets AS ({baskets_sql}),"
        baskets = "baskets"
    else:
        # Spark runtime path: baskets is checkpointed by the caller —
        # its four consumers (n_sess, per_type, both pair sides) would
        # otherwise each re-run the sessionizer chain over the raw
        # table (PERF.md r27)
        baskets_cte = ""
        baskets = baskets_rel
    return f"""
    WITH {baskets_cte}
    n_sess AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n FROM (
        SELECT DISTINCT user_id, session_seq FROM {baskets}
      ) z
    ),
    per_type AS (
      SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_t
      FROM {baskets} GROUP BY event_type
    ),
    pairs AS (
      SELECT a.event_type AS type_a, b.event_type AS type_b,
             CAST(COUNT(*) AS BIGINT) AS n_ab
      FROM {baskets} a
      JOIN {baskets} b ON b.user_id = a.user_id AND b.session_seq = a.session_seq
                    AND a.event_type < b.event_type
      GROUP BY a.event_type, b.event_type
    )
    SELECT p.type_a AS type_a, p.type_b AS type_b, p.n_ab AS n_both,
           CAST(p.n_ab AS DOUBLE) / s.n AS support,
           CAST(p.n_ab AS DOUBLE) / ta.n_t AS conf_a_to_b,
           CAST(p.n_ab AS DOUBLE) / tb.n_t AS conf_b_to_a,
           CAST(p.n_ab * s.n AS DOUBLE) / (ta.n_t * tb.n_t) AS lift
    FROM pairs p
    JOIN per_type ta ON ta.event_type = p.type_a
    JOIN per_type tb ON tb.event_type = p.type_b
    CROSS JOIN n_sess s
    ORDER BY type_a, type_b
    """


def cooccurrence_staged(spark: SparkSession, table: str = "events") -> DataFrame:
    """Run the co-occurrence report with the session-basket relation
    checkpointed (shared by ts43 and the YAML stage op)."""
    baskets = spark.sql(
        _cooccurrence_sql(True, table=table, baskets_rel="__baskets_only__")
    ).localCheckpoint(eager=True)
    baskets.createOrReplaceTempView("__ts43_baskets__")
    return spark.sql(
        _cooccurrence_sql(True, table=table, baskets_rel="__ts43_baskets__")
    )


@query("ts43_session_cooccurrence", oracle=_cooccurrence_sql(False))
def ts43(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_tables(spark, sf_dir)
    return cooccurrence_staged(spark)


# ---------------------------------------------------------------------------
# ts44 — seasonality-adjusted anomaly detection: hourly event counts
# scored against the CALENDAR baseline for the same (day-of-week,
# hour) cell across all weeks — the monitor that catches "this Monday
# 9am is wrong" where ts10's trailing-window z-score would average the
# weekly rhythm away (and ts33 only profiles the rhythm, it doesn't
# score residuals). Baseline is median / MAD (robust: one outage week
# can't drag its own baseline), and the flag is the classic
# |x - med| > 3 * MAD. Exactness: dow derives from integer day-number
# arithmetic ((day_no + 4) % 7, 0 = Sunday — engine-independent,
# avoiding the dayofweek() origin mismatch); medians of integers are
# exact half-integers in doubles, so med2 = 2*median and mad4 =
# 4*MAD = 2*median(|2c - med2|) are EXACT BIGINTs and the verdict
# 2*dev2 > 3*mad4 is pure integer comparison (the dev2 >= 2 guard
# keeps a zero-MAD constant cell from flagging |c-med| = 0.5 noise).
# Scale shape: ONE map-side-combinable scan onto the |days x 24| cell
# lattice; med2 and mad4 are STACKED windowed medians over the SAME
# (dow, hour) partitioning of that lattice — one partitioned-window
# exchange serves both (no baseline joins: a CTE referenced twice
# re-expands in Spark, which would re-SCAN events per reference — the
# windowed spelling plans exactly one scan, verified by
# tools/plan_audit.py). At 100 TB the raw scan dominates and
# everything downstream is lattice-sized megabytes.
# Reference parity: no counterpart (core/flow.py delegates relational
# work to DuckDB); extends the ts10/ts30/ts33 anomaly family.
# ---------------------------------------------------------------------------


def _seasonal_anomaly_sql(spark_dialect: bool, table: str = "events") -> str:
    epoch = "unix_micros" if spark_dialect else "epoch_us"
    intdiv = "div" if spark_dialect else "//"
    day_us = 86400 * 1000000
    hour_us = 3600 * 1000000
    return f"""
    WITH cells AS (
      SELECT CAST({epoch}(ts) {intdiv} {day_us} AS BIGINT) AS day_no,
             CAST(({epoch}(ts) % {day_us}) {intdiv} {hour_us} AS BIGINT) AS hr,
             CAST(COUNT(*) AS BIGINT) AS n_events
      FROM {table} GROUP BY 1, 2
    ),
    keyed AS (
      SELECT day_no, hr, CAST((day_no + 4) % 7 AS BIGINT) AS dow, n_events
      FROM cells
    ),
    scored AS (
      SELECT day_no, hr, dow, n_events,
             CAST(2 * median(n_events) OVER (PARTITION BY dow, hr)
                  AS BIGINT) AS med2
      FROM keyed
    ),
    devd AS (
      SELECT day_no, hr, dow, n_events, med2,
             ABS(2 * n_events - med2) AS dev2
      FROM scored
    )
    SELECT day_no, hr, dow, n_events,
           CAST(med2 AS DOUBLE) / 2 AS baseline_median,
           CAST(CAST(2 * median(dev2) OVER (PARTITION BY dow, hr) AS BIGINT)
                AS DOUBLE) / 4 AS mad,
           (2 * dev2 > 3 * CAST(2 * median(dev2) OVER (PARTITION BY dow, hr)
                                AS BIGINT)
            AND dev2 >= 2) AS is_anomaly
    FROM devd
    ORDER BY day_no, hr
    """


@query("ts44_seasonal_anomaly", oracle=_seasonal_anomaly_sql(False))
def ts44(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_tables(spark, sf_dir)
    return spark.sql(_seasonal_anomaly_sql(True))


# ---------------------------------------------------------------------------
# ts45 — daily-series autocorrelation (ACF, lags 1..7): per event
# type, the Pearson correlation between the daily-count series and its
# lag-k shift — the rhythm detector behind seasonality-aware
# forecasting and anomaly baselines (a weekly cycle shows as a lag-7
# peak; ts33 profiles the rhythm's SHAPE, ts41 its dispersion — ts45
# measures its STRENGTH per lag, which is what decides whether ts44's
# calendar baseline or ts10's trailing window is the right monitor).
# Exactness: the daily lattice is exact BIGINT counts; per (type, lag)
# the five sufficient statistics (sx, sy, sxy, sxx, syy over the
# overlapping window) accumulate in DECIMAL(38,0) — exact integers at
# any scale (1e9-events/day regimes put sxx*m products near 1e2x,
# far inside 38 digits) — and the correlation is ONE compound IEEE
# expression from those exact integers (the ts10/ts41 discipline), so
# both engines agree bit-for-bit. Scale shape: ONE map-side-combinable
# scan onto the |types x days| lattice (checkpointed — the lag join
# consumes it twice, PERF.md r27); everything after is lattice-sized
# (a 7-row lag spine equi-joins day_no = day_no + lag).
# Reference parity: no counterpart (core/flow.py delegates relational
# work to DuckDB); extends the ts33/ts36/ts41 seasonality family.
# ---------------------------------------------------------------------------
_ACF_MAX_LAG = 7


def _daily_acf_sql(
    spark_dialect: bool, daily_rel: str | None = None, table: str = "events"
) -> str:
    epoch = "unix_micros" if spark_dialect else "epoch_us"
    intdiv = "div" if spark_dialect else "//"
    day_us = 86400 * 1000000
    daily_sql = f"""
      SELECT event_type,
             CAST({epoch}(ts) {intdiv} {day_us} AS BIGINT) AS day_no,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM {table} GROUP BY 1, 2
    """
    if daily_rel == "__daily_only__":
        return daily_sql
    if daily_rel is None:
        # inline spelling (the DuckDB oracle; DuckDB plans CTEs once)
        daily_cte, daily = f"daily AS ({daily_sql}),", "daily"
    else:
        # Spark runtime path: the daily lattice is checkpointed by the
        # caller — both lag-join sides would otherwise re-scan events
        daily_cte, daily = "", daily_rel
    if spark_dialect:
        lags = "SELECT explode(sequence(1, %d)) AS lag" % _ACF_MAX_LAG
    else:
        lags = "SELECT unnest(range(1, %d)) AS lag" % (_ACF_MAX_LAG + 1)
    dec = "DECIMAL(38,0)"
    return f"""
    WITH {daily_cte}
    lags AS ({lags}),
    pairs AS (
      SELECT a.event_type, l.lag,
             CAST(a.n AS {dec}) AS x, CAST(b.n AS {dec}) AS y
      FROM {daily} a
      CROSS JOIN lags l
      JOIN {daily} b ON b.event_type = a.event_type
                    AND b.day_no = a.day_no + l.lag
    ),
    stats AS (
      SELECT event_type, lag,
             CAST(COUNT(*) AS {dec}) AS m,
             CAST(SUM(x) AS {dec}) AS sx, CAST(SUM(y) AS {dec}) AS sy,
             CAST(SUM(x * y) AS {dec}) AS sxy,
             CAST(SUM(x * x) AS {dec}) AS sxx,
             CAST(SUM(y * y) AS {dec}) AS syy
      FROM pairs GROUP BY event_type, lag
    )
    SELECT event_type, CAST(lag AS BIGINT) AS lag,
           CAST(m AS BIGINT) AS n_pairs,
           (CAST(m * sxy - sx * sy AS DOUBLE))
             / sqrt(CAST(m * sxx - sx * sx AS DOUBLE)
                    * CAST(m * syy - sy * sy AS DOUBLE)) AS acf
    FROM stats
    ORDER BY event_type, lag
    """


@query("ts45_daily_acf", oracle=_daily_acf_sql(False))
def ts45(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_tables(spark, sf_dir)
    daily = spark.sql(
        _daily_acf_sql(True, daily_rel="__daily_only__")
    ).localCheckpoint(eager=True)
    daily.createOrReplaceTempView("__ts45_daily__")
    return spark.sql(_daily_acf_sql(True, daily_rel="__ts45_daily__"))


# ---------------------------------------------------------------------------
# ts46 — activity max drawdown: per event type, the deepest collapse
# of the daily volume series relative to its running peak — the
# single number an ops review asks for after an incident ("how far
# did traffic fall, and when?"). Finance's max-drawdown statistic
# applied to the activity series: running peak per day, drawdown
# share = (peak - today) / peak, report the deepest point (earliest
# day on ties).
# Scale shape: the corpus folds map-side onto the |types x days| daily
# lattice; the running peak is one window partitioned by type (each
# type's bounded day series ships once); the argmax is a ROW_NUMBER
# over the same lattice. Nothing after the first fold grows with the
# corpus. Exactness: counts and peaks are integers; the share is one
# double division per lattice row, computed from identical integers on
# both engines (so the ranking comparison is bit-identical); ties
# break on the integer day.
# Reference parity: no counterpart (core/flow.py delegates execution
# to DuckDB); completes the ts10/ts30/ts44 anomaly family with the
# cumulative-collapse view.
# ---------------------------------------------------------------------------
def _drawdown_sql(spark_dialect: bool, table: str = "events") -> str:
    epoch = "unix_micros" if spark_dialect else "epoch_us"
    intdiv = "div" if spark_dialect else "//"
    day_us = 86400 * 1000000
    return f"""
    WITH daily AS (
      SELECT event_type,
             CAST(CAST({epoch}(ts) AS BIGINT) {intdiv} {day_us} AS BIGINT) AS day_no,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM {table} GROUP BY 1, 2
    ),
    walked AS (
      SELECT event_type, day_no, n,
             CAST(MAX(n) OVER (PARTITION BY event_type ORDER BY day_no
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS peak_n
      FROM daily
    ),
    ranked AS (
      SELECT event_type, day_no, n, peak_n,
             CAST(peak_n - n AS DOUBLE) / peak_n AS dd_share,
             ROW_NUMBER() OVER (PARTITION BY event_type
                                ORDER BY CAST(peak_n - n AS DOUBLE) / peak_n DESC,
                                         day_no) AS rk
      FROM walked
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_days,
           CAST(MAX(CASE WHEN rk = 1 THEN day_no END) AS BIGINT) AS trough_day,
           CAST(MAX(CASE WHEN rk = 1 THEN peak_n END) AS BIGINT) AS peak_n,
           CAST(MAX(CASE WHEN rk = 1 THEN n END) AS BIGINT) AS trough_n,
           MAX(CASE WHEN rk = 1 THEN dd_share END) AS max_drawdown_share
    FROM ranked
    GROUP BY event_type
    ORDER BY event_type
    """


@query("ts46_max_drawdown", oracle=_drawdown_sql(False))
def ts46(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_tables(spark, sf_dir)
    return spark.sql(_drawdown_sql(True))
