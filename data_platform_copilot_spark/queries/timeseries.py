"""Event-stream analytics: sessionization, tumbling windows, as-of join.

The events table is the reference's only stream-ish table (SURVEY.md
§1.1); these queries cover the time-series surface batch-side, and
``streaming/events.py`` re-runs the tumbling window as a real
Structured Streaming query (asserted equal to the batch answer in
tests).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..operators.asof import asof_join_backward
from .core import _t, epoch_s, query, rnd

SESSION_GAP_MIN = 30


# shared by sessionization_gaps and its whale-proof two-phase twin —
# identical semantics, different physical plan
_SESSIONIZATION_ORACLE = f"""
WITH ordered AS (
    SELECT user_id, ts,
           -- date_diff('second', a, b) counts second-boundary
           -- crossings == floor(epoch(b)) - floor(epoch(a)), the exact
           -- semantics of the Spark side's epoch_s subtraction — an
           -- exact interval compare here would disagree on a gap
           -- falling strictly inside (1800, 1801) seconds when
           -- timestamps carry sub-second precision.
           CASE WHEN date_diff('second',
                     lag(ts) OVER (PARTITION BY user_id ORDER BY ts), ts)
                     > {SESSION_GAP_MIN * 60}
                  OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                THEN 1 ELSE 0 END AS new_session
    FROM events
), sessions AS (
    SELECT user_id, ts,
           sum(new_session) OVER (
               PARTITION BY user_id ORDER BY ts
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
    FROM ordered
), per_session AS (
    SELECT user_id, session_id,
           count(*) AS n_events,
           date_diff('second', min(ts), max(ts)) AS dur_s
    FROM sessions
    GROUP BY 1, 2
)
SELECT user_id,
       CAST(count(*) AS BIGINT) AS n_sessions,
       CAST(max(n_events) AS BIGINT) AS max_session_events,
       round(avg(CAST(dur_s AS DOUBLE)), 2) AS avg_session_dur_s
FROM per_session
GROUP BY user_id
"""


@query("sessionization_gaps", oracle=_SESSIONIZATION_ORACLE)
def sessionization_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30-min inactivity). Since r15 the
    DECLARED entry runs the whale-proof two-phase plan (r14 verdict
    #1): the one-window formulation (lag -> new-session flag ->
    running sum over partitionBy(user_id)) serializes a bot user's
    whole history into one task — AQE cannot split a window
    partition — measured 1.50x under a 10%-whale user at K=100
    (tools/skew_probe.py). Delegates to sessionization_two_phase,
    which keeps the identical result (same DuckDB oracle; the twin
    has been oracle-green since r14)."""
    return sessionization_two_phase(spark, sf_dir)


@query("sessionization_two_phase", oracle=_SESSIONIZATION_ORACLE)
def sessionization_two_phase(spark: SparkSession,
                             sf_dir: str) -> DataFrame:
    """Same sessionization, whale-proof physical plan (r13 verdict
    #1): session ids come from operators/sessionize.py's two-phase
    gap-merge — per-(user, day-chunk) local windows plus a tiny
    chunk-walk merge — so no window partition is wider than one
    user-day, and a bot user with 10^8 events cannot serialize a
    single task the way the one-window plan's partitionBy(user_id)
    does. Same result (identical DuckDB oracle as
    sessionization_gaps); skewed-vs-uniform timings recorded in
    BASELINE.md via tools/skew_probe.py."""
    from ..operators.sessionize import two_phase_session_ids
    ev = _t(spark, sf_dir, "events").select("user_id", "ts")
    sessions = two_phase_session_ids(
        ev, "user_id", "ts", gap_s=SESSION_GAP_MIN * 60)
    per_session = (
        sessions.groupBy("user_id", "session_id")
        .agg(F.count("*").alias("n_events"),
             (epoch_s(F.max("ts")) - epoch_s(F.min("ts")))
             .alias("dur_s"))
    )
    return (
        per_session.groupBy("user_id")
        .agg(F.count("*").alias("n_sessions"),
             F.max("n_events").cast("long").alias("max_session_events"),
             rnd(F.avg(F.col("dur_s").cast("double")), 2)
              .alias("avg_session_dur_s"))
    )


@query("tumbling_window_1h", oracle="""
SELECT strftime(time_bucket(INTERVAL 1 HOUR, ts), '%Y-%m-%d %H:%M:%S')
           AS window_start,
       event_type,
       CAST(count(*) AS BIGINT) AS n,
       round(sum(value), 2) AS total_value
FROM events
GROUP BY 1, 2
""")
def tumbling_window_1h(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour windows per event type — the batch twin of the
    Structured Streaming query in streaming/events.py (same plan
    shape: partial agg -> shuffle on (window, type))."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n"),
             rnd(F.sum("value"), 2).alias("total_value"))
        .select(F.date_format("w.start", "yyyy-MM-dd HH:mm:ss")
                .alias("window_start"),
                "event_type", "n", "total_value")
    )


@query("asof_join_purchase_click", oracle="""
WITH purchases AS (
    SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
), clicks AS (
    SELECT user_id, ts AS click_ts FROM events WHERE event_type = 'click'
)
SELECT p.event_id, p.user_id,
       strftime(c.click_ts, '%Y-%m-%d %H:%M:%S') AS last_click,
       CAST(date_diff('second', c.click_ts, p.ts) AS BIGINT)
           AS secs_since_click
FROM purchases p
ASOF LEFT JOIN clicks c
  ON p.user_id = c.user_id AND p.ts >= c.click_ts
""")
def asof_join_purchase_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each purchase matched to the user's most recent
    click at-or-before it (union-tag-window operator; DuckDB oracle
    uses its native ASOF JOIN — semantics must coincide)."""
    ev = _t(spark, sf_dir, "events")
    purchases = (ev.where(F.col("event_type") == "purchase")
                 .select("event_id", "user_id", "ts"))
    clicks = (ev.where(F.col("event_type") == "click")
              .select("user_id", F.col("ts").alias("click_ts")))
    joined = asof_join_backward(
        purchases, clicks, by="user_id",
        left_ts="ts", right_ts="click_ts", right_cols=["click_ts"])
    return joined.select(
        "event_id", "user_id",
        F.date_format("click_ts", "yyyy-MM-dd HH:mm:ss").alias("last_click"),
        (epoch_s("ts") - epoch_s("click_ts"))
        .alias("secs_since_click"),
    )


@query("hopping_window_15m", oracle="""
SELECT strftime(time_bucket(INTERVAL 15 MINUTE, ts)
                    - k.k * INTERVAL 15 MINUTE,
                '%Y-%m-%d %H:%M:%S') AS window_start,
       event_type,
       CAST(count(*) AS BIGINT) AS n,
       round(sum(value), 2) AS total_value
FROM events, (SELECT unnest(range(4)) AS k) k
GROUP BY 1, 2
""")
def hopping_window_15m(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hopping (sliding) windows: 1-hour size, 15-minute hop — each
    event lands in exactly size/hop = 4 windows. Spark's window()
    replicates rows JVM-side before the partial agg; the oracle
    replays the same membership rule (the 4 slide-aligned starts at
    or before the event). Same shuffle shape as the tumbling query,
    4x the pre-agg rows — the standard smoothed-dashboard cost."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour", "15 minutes").alias("w"),
                   "event_type")
        .agg(F.count("*").alias("n"),
             rnd(F.sum("value"), 2).alias("total_value"))
        .select(F.date_format("w.start", "yyyy-MM-dd HH:mm:ss")
                .alias("window_start"),
                "event_type", "n", "total_value")
    )


@query("events_gap_fill", oracle="""
WITH hourly AS (
    SELECT event_type, time_bucket(INTERVAL 1 HOUR, ts) AS h,
           count(*) AS n, round(avg(value), 2) AS av
    FROM events GROUP BY 1, 2
), b AS (
    SELECT event_type, min(h) AS mn, max(h) AS mx FROM hourly GROUP BY 1
), spine AS (
    SELECT event_type, unnest(generate_series(mn, mx, INTERVAL 1 HOUR)) AS h
    FROM b
), j AS (
    SELECT s.event_type, s.h, coalesce(hh.n, 0) AS n, hh.av
    FROM spine s LEFT JOIN hourly hh USING (event_type, h)
)
SELECT event_type,
       strftime(h, '%Y-%m-%d %H:%M:%S') AS hour,
       CAST(n AS BIGINT) AS n,
       last_value(av IGNORE NULLS) OVER (
           PARTITION BY event_type ORDER BY h
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS avg_value_ffill
FROM j
""")
def events_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series resampling with gap fill: per event type, a dense
    hourly spine from its first to last hour, zero-filled counts, and
    forward-filled hourly averages (rounded BEFORE the fill so both
    engines propagate identical values). The spine generates from a
    |types|-row bounds table (explode of a sequence — no join against
    a calendar table); the fill is one window over the same
    (event_type) partitioning as the spine join, so the plan carries
    a single shuffle of the dense grid."""
    ev = _t(spark, sf_dir, "events")
    hourly = (ev.groupBy("event_type",
                         F.date_trunc("hour", "ts").alias("h"))
              .agg(F.count("*").alias("n"),
                   rnd(F.avg("value"), 2).alias("av")))
    bounds = hourly.groupBy("event_type").agg(
        F.min("h").alias("mn"), F.max("h").alias("mx"))
    spine = bounds.select(
        "event_type",
        F.explode(F.sequence("mn", "mx",
                             F.expr("interval 1 hour"))).alias("h"))
    w = (W.partitionBy("event_type").orderBy("h")
         .rowsBetween(W.unboundedPreceding, W.currentRow))
    return (spine.join(hourly, ["event_type", "h"], "left")
            .select("event_type",
                    F.date_format("h", "yyyy-MM-dd HH:mm:ss").alias("hour"),
                    F.coalesce("n", F.lit(0)).cast("long").alias("n"),
                    F.last("av", ignorenulls=True).over(w)
                    .alias("avg_value_ffill")))


@query("rolling_zscore_anomalies", oracle="""
WITH es AS (
    SELECT event_type, value,
           CAST(floor(epoch(ts)) AS BIGINT) AS es
    FROM events
), c AS (
    SELECT event_type, value, es,
           sum(value)         OVER r1 AS s1,
           sum(value * value) OVER r1 AS ss1,
           count(value)       OVER r1 AS n1,
           sum(value)         OVER r0 AS s0,
           sum(value * value) OVER r0 AS ss0,
           count(value)       OVER r0 AS n0
    FROM es
    WINDOW r1 AS (PARTITION BY event_type ORDER BY es
                  RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
           r0 AS (PARTITION BY event_type ORDER BY es
                  RANGE BETWEEN UNBOUNDED PRECEDING
                            AND 86401 PRECEDING)
), w AS (
    SELECT event_type, value,
           (coalesce(s1, 0) - coalesce(s0, 0))
               / nullif(n1 - coalesce(n0, 0), 0) AS mu,
           sqrt(greatest(
               (coalesce(ss1, 0) - coalesce(ss0, 0))
                   / nullif(n1 - coalesce(n0, 0), 0)
               - pow((coalesce(s1, 0) - coalesce(s0, 0))
                     / nullif(n1 - coalesce(n0, 0), 0), 2), 0)) AS sd,
           n1 - coalesce(n0, 0) AS n_prior
    FROM c
)
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(CASE WHEN n_prior >= 30
                      AND abs(value - mu) / nullif(sd, 0) > 3.0
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_anomalies
FROM w
GROUP BY event_type
""")
def rolling_zscore_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling-window anomaly detection: each event scored against
    the trailing 24 h of its own event_type (RANGE frame over epoch
    seconds, current second excluded so no event scores against
    itself or its same-second peers), flagged when |z| > 3 with at
    least 30 prior points. The streaming-monitoring twin of the
    global z-score DQ rule (A11) — same arithmetic, windowed.

    Scale: one shuffle on event_type, and the trailing stats come
    from PREFIX DIFFERENCES of two add-only unbounded-preceding
    frames (cum(-inf,-1] minus cum(-inf,-86401]) — Spark cannot
    retract from a sliding aggregate frame, so the naive
    RANGE(-86400,-1) form reprocesses the whole 24 h window per row,
    O(rows x window); the two growing frames are O(rows) (measured
    3.5 s -> 0.9 s at sf0.1). The oracle replays the identical
    difference arithmetic; sqrt(greatest(.,0)) guards the
    cancellation-negative on near-constant windows in both engines.
    Skewed event types would salt by (type, day) — noted, not needed
    at testdata cardinality."""
    ev = _t(spark, sf_dir, "events").select("event_type", "value",
                                            epoch_s("ts").alias("es"))
    r1 = (W.partitionBy("event_type").orderBy("es")
          .rangeBetween(W.unboundedPreceding, -1))
    r0 = (W.partitionBy("event_type").orderBy("es")
          .rangeBetween(W.unboundedPreceding, -86401))
    z = F.lit(0.0)
    c = (ev
         .withColumn("s", F.coalesce(F.sum("value").over(r1), z)
                     - F.coalesce(F.sum("value").over(r0), z))
         .withColumn("ss", F.coalesce(
             F.sum(F.col("value") * F.col("value")).over(r1), z)
             - F.coalesce(
                 F.sum(F.col("value") * F.col("value")).over(r0), z))
         .withColumn("n_prior", F.count("value").over(r1)
                     - F.coalesce(F.count("value").over(r0), F.lit(0))))
    nn = F.nullif(F.col("n_prior"), F.lit(0))
    mu = F.col("s") / nn
    w = (c.withColumn("mu", mu)
         .withColumn("sd", F.sqrt(F.greatest(
             F.col("ss") / nn - mu * mu, z))))
    anom = ((F.col("n_prior") >= 30)
            & (F.abs(F.col("value") - F.col("mu"))
               / F.nullif(F.col("sd"), F.lit(0)) > 3.0))
    return (w.groupBy("event_type")
            .agg(F.count("*").alias("n_events"),
                 F.sum(F.when(anom, 1).otherwise(0)).cast("long")
                 .alias("n_anomalies")))


def funnel_conversion(events: DataFrame, user_col: str, type_col: str,
                      ts_col: str, steps: list[str]) -> DataFrame:
    """Sequential funnel: per step, how many users performed step i
    strictly AFTER their qualifying time for step i-1 (first-touch
    semantics: each step's qualifying time is the EARLIEST occurrence
    that still follows the previous step). Output: (step_idx, step,
    n_users, conversion_rate vs step 1).

    One user-keyed shuffle total: per user, each step's event times
    aggregate into one sorted array (map-side combined), then the
    sequential thresholds are pure array expressions — no per-step
    join cascade, no window. Per-user arrays are bounded by that
    user's event count for the funnel types only, the standard
    event-analytics memory envelope; a pathological power user is a
    skew concern for AQE, not a correctness one.
    """
    per_user = events.where(F.col(type_col).isin(steps)).groupBy(
        F.col(user_col).alias("user")).agg(*[
            F.array_sort(F.collect_list(
                F.when(F.col(type_col) == s, F.col(ts_col))))
            .alias(f"ts_{i}")
            for i, s in enumerate(steps)])
    t_prev = None
    reached = []
    for i in range(len(steps)):
        arr = F.col(f"ts_{i}")
        if t_prev is None:
            t_i = F.array_min(arr)
        else:
            after = F.filter(arr, lambda x: x > t_prev)
            t_i = F.when(t_prev.isNotNull(), F.array_min(after))
        per_user = per_user.withColumn(f"t_{i}", t_i)
        t_prev = F.col(f"t_{i}")
        reached.append(F.sum(F.col(f"t_{i}").isNotNull().cast("long"))
                       .alias(f"n_{i}"))
    counts = per_user.agg(*reached)
    rows = counts.select(F.explode(F.array(*[
        F.struct(F.lit(i + 1).alias("step_idx"),
                 F.lit(s).alias("step"),
                 F.col(f"n_{i}").alias("n_users"))
        for i, s in enumerate(steps)])).alias("r")).select("r.*")
    from pyspark.sql import Window as W
    wall = W.partitionBy()
    return rows.select(
        "step_idx", "step", "n_users",
        rnd(F.col("n_users")
            / F.max(F.when(F.col("step_idx") == 1, F.col("n_users")))
            .over(wall).cast("double"), 4).alias("conversion_rate"))


@query("funnel_view_click_purchase", oracle="""
WITH fe AS (
    SELECT user_id, event_type, ts FROM events
    WHERE event_type IN ('view', 'click', 'purchase')
), u AS (
    SELECT user_id,
           min(CASE WHEN event_type = 'view' THEN ts END) AS t0
    FROM fe GROUP BY user_id
), u1 AS (
    SELECT u.user_id, u.t0,
           min(CASE WHEN fe.event_type = 'click'
                     AND fe.ts > u.t0 THEN fe.ts END) AS t1
    FROM u LEFT JOIN fe ON fe.user_id = u.user_id
    GROUP BY u.user_id, u.t0
), u2 AS (
    SELECT u1.user_id, u1.t0, u1.t1,
           min(CASE WHEN fe.event_type = 'purchase'
                     AND fe.ts > u1.t1 THEN fe.ts END) AS t2
    FROM u1 LEFT JOIN fe ON fe.user_id = u1.user_id
    GROUP BY u1.user_id, u1.t0, u1.t1
), c AS (
    SELECT count(t0) AS n0, count(t1) AS n1, count(t2) AS n2 FROM u2
)
SELECT step_idx, step, n_users,
       round(CAST(n_users AS DOUBLE)
             / max(CASE WHEN step_idx = 1 THEN n_users END) OVER (), 4)
           AS conversion_rate
FROM (
    SELECT 1 AS step_idx, 'view' AS step, CAST(n0 AS BIGINT) AS n_users FROM c
    UNION ALL
    SELECT 2, 'click', CAST(n1 AS BIGINT) FROM c
    UNION ALL
    SELECT 3, 'purchase', CAST(n2 AS BIGINT) FROM c
)
""")
def funnel_view_click_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequential view -> click -> purchase funnel over events with
    first-touch ordering semantics (each step must strictly follow
    the user's qualifying time for the previous one); step counts and
    conversion rates value-verify against DuckDB replaying the same
    sequential-min chain."""
    return funnel_conversion(_t(spark, sf_dir, "events"),
                             "user_id", "event_type", "ts",
                             ["view", "click", "purchase"])


_TRANSITION_ORACLE = """
WITH ordered AS (
    SELECT user_id, event_type, ts, event_id,
           lead(event_type) OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS next_type
    FROM events
), pairs AS (
    SELECT event_type AS from_type, next_type AS to_type
    FROM ordered WHERE next_type IS NOT NULL
)
SELECT from_type, to_type,
       CAST(count(*) AS BIGINT) AS n,
       round(CAST(count(*) AS DOUBLE)
             / sum(count(*)) OVER (PARTITION BY from_type), 4) AS p
FROM pairs GROUP BY from_type, to_type
"""


def _transition_combine(pairs: DataFrame) -> DataFrame:
    """(from_type, to_type) pairs -> counts + row-normalized
    P(next | current). Runs over |event_types|^2 rows."""
    from pyspark.sql import Window as W
    counts = pairs.groupBy("from_type", "to_type").agg(
        F.count("*").alias("n"))
    wrow = W.partitionBy("from_type")
    return counts.select(
        "from_type", "to_type", "n",
        rnd(F.col("n") / F.sum("n").over(wrow), 4).alias("p"))


@query("event_transition_matrix", oracle=_TRANSITION_ORACLE)
def event_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order behavioral transition matrix: for each ordered
    pair of consecutive events within a user's stream (ts order,
    event_id tiebreak), the count and row-normalized probability
    P(next | current) — the Markov view of user journeys that powers
    next-action features and anomaly flags on behavioral logs.

    Since r15 the DECLARED entry runs the whale-proof chunked plan
    (r14 verdict #1): the one-window ``lead().over(partitionBy(
    user_id))`` serializes a bot user into one task (1.57x under a
    10%-whale at K=100, tools/skew_probe.py). Delegates to
    transition_matrix_two_phase — identical result, same oracle."""
    return transition_matrix_two_phase(spark, sf_dir)


@query("transition_matrix_two_phase", oracle=_TRANSITION_ORACLE)
def transition_matrix_two_phase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """event_transition_matrix's whale-proof twin — the offset-window
    member of the two-phase family (sessionization / trailing-frame /
    running-last / this). The one-window plan's
    ``lead().over(partitionBy(user_id))`` serializes a whale user into
    one task; ``operators.chunked_window.lead_chunked`` computes the
    identical next-event column with no window partition wider than
    one (user, day) slice — the cross-chunk state is ONE row per
    occupied chunk (the chunk's first event), walked with a lead over
    the tiny per-user summary table. Same oracle, same combine."""
    from ..operators.chunked_window import lead_chunked
    ev = _t(spark, sf_dir, "events")
    nexted = lead_chunked(ev, "user_id", "ts", ["ts", "event_id"],
                          "event_type", out_col="next_type")
    pairs = (nexted.where(F.col("next_type").isNotNull())
             .select(F.col("event_type").alias("from_type"),
                     F.col("next_type").alias("to_type")))
    return _transition_combine(pairs)


@query("trend_slope_by_event_type", oracle="""
WITH x AS (
    SELECT event_type,
           CAST(floor(epoch(ts)) AS BIGINT) / 86400.0 - 19700.0 AS xd,
           value AS y
    FROM events
), s AS (
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n,
           sum(xd) AS sx, sum(y) AS sy,
           sum(xd * y) AS sxy, sum(xd * xd) AS sxx
    FROM x GROUP BY event_type
)
SELECT event_type, n,
       round((sxy - sx * sy / n) / (sxx - sx * sx / n), 6)
           AS slope_per_day,
       round((sy - (sxy - sx * sy / n) / (sxx - sx * sx / n) * sx) / n, 4)
           AS intercept
FROM s
""")
def trend_slope_by_event_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group OLS linear trend of `value` over time — the
    drift-detection primitive behind "is this metric rising?": slope
    (units/day) and intercept from the closed-form moment sums, one
    map-side-combinable groupBy.

    Numerics are engine-portable by construction: x is recentered by
    a constant (~data epoch) BEFORE summation so the n*sxx - sx^2
    cancellation keeps ~9 significant digits, and both engines sum
    the identical doubles. At 100 TB this is |groups| rows of state
    per task — the same one-shuffle shape as any sum/count agg."""
    ev = _t(spark, sf_dir, "events")
    xd = (epoch_s("ts") / F.lit(86400.0)) - F.lit(19700.0)
    s = (ev.select("event_type", xd.alias("xd"), F.col("value").alias("y"))
         .groupBy("event_type")
         .agg(F.count("*").alias("n"),
              F.sum("xd").alias("sx"), F.sum("y").alias("sy"),
              F.sum(F.col("xd") * F.col("y")).alias("sxy"),
              F.sum(F.col("xd") * F.col("xd")).alias("sxx")))
    slope = (F.col("sxy") - F.col("sx") * F.col("sy") / F.col("n")) / \
        (F.col("sxx") - F.col("sx") * F.col("sx") / F.col("n"))
    return s.select(
        "event_type", "n",
        rnd(slope, 6).alias("slope_per_day"),
        rnd((F.col("sy") - slope * F.col("sx")) / F.col("n"),
            4).alias("intercept"))


# shared by ewma_value_per_user and its whale-proof chunked twin
_EWMA_ORACLE = """
WITH arr AS (
    SELECT user_id, event_id, value,
           list(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)
               AS win
    FROM events
    WHERE user_id < 30
)
SELECT user_id, event_id,
       round(
           list_sum(list_transform(range(len(win)),
               j -> win[j + 1] * power(0.7, len(win) - 1 - j)))
           / list_sum(list_transform(range(len(win)),
               j -> power(0.7, len(win) - 1 - j))), 4) AS ewma
FROM arr
"""


def _ewma_from_win(arr: DataFrame) -> DataFrame:
    """(user_id, event_id, ewma) from a trailing-window array column
    ``win`` — shared by both EWMA formulations."""
    decay = F.lit(0.7)
    n = F.size("win").cast("double")
    weighted = F.zip_with(
        F.col("win"), F.sequence(F.lit(1), F.size("win")),
        lambda x, j: x * F.pow(decay, n - j.cast("double")))
    weights = F.transform(
        F.sequence(F.lit(1), F.size("win")),
        lambda j: F.pow(decay, n - j.cast("double")))
    ewma = (F.aggregate(weighted, F.lit(0.0), lambda a, x: a + x)
            / F.aggregate(weights, F.lit(0.0), lambda a, x: a + x))
    return arr.select("user_id", "event_id", rnd(ewma, 4).alias("ewma"))


@query("ewma_value_per_user", oracle=_EWMA_ORACLE)
def ewma_value_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially-weighted moving average of `value` per user
    (decay 0.7), truncated to the trailing 20 events — the smoothing
    primitive for behavioral scoring. The truncation is the scale
    design: exact EWMA is a sequential recurrence (unbounded
    lineage), while the windowed form caps per-row state at 20
    values with relative error (1-a)^20 < 1e-3 of the true
    tail. Weights are normalized over
    the frame so short prefixes (< 20 rows) are exact, and the frame
    list order (ts, event_id) is total, so both engines fold the
    identical sequence.

    Since r15 the DECLARED entry runs the whale-proof chunked-frame
    plan (r14 verdict #1 — the worst one-window offender: 74.5x
    under a 10%-whale user at K=100 per tools/skew_probe.py, and the
    chunked plan is FASTER in absolute terms even on uniform data at
    probe scale, 7.8 -> 4.1 s). Delegates to ewma_value_two_phase —
    identical result, same oracle."""
    return ewma_value_two_phase(spark, sf_dir)


@query("ewma_value_two_phase", oracle=_EWMA_ORACLE)
def ewma_value_two_phase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same EWMA, whale-proof physical plan: the trailing 20-value
    frame comes from operators/chunked_window.py — per-(user,
    day-chunk) local windows plus a BOUNDED carry over the previous
    k-1 chunk summaries — so no window partition is wider than one
    user-day. tools/skew_probe.py measured the one-window plan at 28x
    under a 10%-of-corpus bot user (the worst of the user-window
    entries); this plan holds flat. Identical DuckDB oracle as
    ewma_value_per_user."""
    from ..operators.chunked_window import trailing_values_chunked
    ev = _t(spark, sf_dir, "events").where(F.col("user_id") < 30)
    arr = trailing_values_chunked(
        ev.select("user_id", "event_id", "ts", "value"),
        "user_id", "ts", ["ts", "event_id"], "value", k=20)
    return _ewma_from_win(arr)


_ATTRIBUTION_ORACLE = """
WITH ordered AS (
    SELECT user_id, ts, event_id, event_type, value,
           last_value(CASE WHEN event_type <> 'purchase'
                           THEN event_type END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS prev_type,
           last_value(CASE WHEN event_type <> 'purchase'
                           THEN ts END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS prev_ts
    FROM events
), attributed AS (
    SELECT CASE WHEN prev_ts IS NOT NULL
                     AND date_diff('second', prev_ts, ts) <= 86400
                THEN prev_type ELSE 'direct' END AS attributed_type,
           value
    FROM ordered WHERE event_type = 'purchase'
)
SELECT attributed_type,
       CAST(count(*) AS BIGINT) AS n_purchases,
       round(sum(value), 2) AS total_value
FROM attributed GROUP BY attributed_type
"""


@query("attribution_last_touch", oracle=_ATTRIBUTION_ORACLE)
def attribution_last_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch purchase attribution: each purchase credits the
    user's most recent non-purchase event within 24 h (else
    'direct') — the marketing-analytics sibling of the funnel/as-of
    entries.

    Since r15 the DECLARED entry runs the whale-proof chunked plan
    (r14 verdict #1): the one-window IGNORE NULLS last_value over
    partitionBy(user_id) serializes a bot user into one task (1.55x
    under a 10%-whale at K=100, tools/skew_probe.py). Delegates to
    attribution_two_phase — identical result, same oracle."""
    return attribution_two_phase(spark, sf_dir)


def _attribution_from_prev(df: DataFrame) -> DataFrame:
    """Shared attribute-and-aggregate tail of both attribution
    entries (one body so the formulations cannot drift): rows carry
    (event_type, value, ts, prev_type, prev_ts); purchases credit
    prev_type when it happened within 24 h, else 'direct'."""
    attributed = (df
                  .where(F.col("event_type") == "purchase")
                  .select(
                      F.when(F.col("prev_ts").isNotNull()
                             & ((epoch_s("ts") - epoch_s("prev_ts"))
                                <= 86400),
                             F.col("prev_type"))
                      .otherwise(F.lit("direct"))
                      .alias("attributed_type"),
                      "value"))
    return (attributed.groupBy("attributed_type")
            .agg(F.count("*").alias("n_purchases"),
                 rnd(F.sum("value"), 2).alias("total_value")))


@query("attribution_two_phase", oracle=_ATTRIBUTION_ORACLE)
def attribution_two_phase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whale-proof twin of attribution_last_touch: the exclusive
    running last-non-null moves to
    operators/chunked_window.last_ignorenulls_chunked — chunk-local
    exclusive last inside bounded (user, day-chunk) partitions, carry
    over the per-chunk summary table (rows per user = occupied
    chunks, time-bounded), so a bot user with 10^8 events can never
    serialize one window task the way the one-window plan does
    (tools/skew_probe.py). The last qualifying (type, ts) pair rides
    ONE carried struct — both attributes come from the same
    qualifying row, so a single pass replaces the one-window plan's
    two IGNORE NULLS last_value calls. Identical DuckDB oracle and
    shared combine (_attribution_from_prev) as the one-window
    entry."""
    from ..operators.chunked_window import last_ignorenulls_chunked
    ev = _t(spark, sf_dir, "events")
    qual = F.when(F.col("event_type") != "purchase",
                  F.struct(F.col("event_type").alias("t"),
                           F.col("ts").alias("s")))
    prev = last_ignorenulls_chunked(
        ev.select("event_id", "user_id", "ts", "event_type", "value",
                  qual.alias("__q")),
        "user_id", "ts", ["ts", "event_id"], "__q", out_col="__prev")
    return _attribution_from_prev(
        prev.select("event_type", "value", "ts",
                    F.col("__prev.t").alias("prev_type"),
                    F.col("__prev.s").alias("prev_ts")))


@query("survival_km_user_lifetime", oracle="""
WITH life AS (
    SELECT user_id,
           date_diff('day', min(CAST(ts AS DATE)),
                     max(CAST(ts AS DATE))) AS lifetime_d,
           CAST(max(CAST(ts AS DATE))
                < (SELECT max(CAST(ts AS DATE)) - 2 FROM events)
               AS INT) AS churned
    FROM events GROUP BY user_id
), counts AS (
    SELECT lifetime_d,
           count(*) AS n_ending,
           sum(churned) AS d_events
    FROM life GROUP BY lifetime_d
), risk AS (
    SELECT lifetime_d, d_events,
           sum(n_ending) OVER (ORDER BY lifetime_d DESC) AS n_risk
    FROM counts
)
SELECT CAST(lifetime_d AS BIGINT) AS lifetime_d,
       CAST(n_risk AS BIGINT) AS n_risk,
       CAST(d_events AS BIGINT) AS d_events,
       round(exp(sum(ln(1.0 - CAST(d_events AS DOUBLE) / n_risk))
                 OVER (ORDER BY lifetime_d)), 6) AS survival
FROM risk WHERE d_events < n_risk
""")
def survival_km_user_lifetime(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier survival curve of user activity lifetimes
    (first-to-last active day per user; users still active within
    2 days of the window end are right-CENSORED — they leave the
    risk set without a churn event, the distinction that makes KM
    correct where a naive histogram over-counts churn). The
    product-limit estimator runs as pure windows: risk set via a
    descending cumulative sum, the survival product via
    exp(cumsum(ln(1 - d/n))) — one user combine + two ordered
    windows over |distinct lifetimes| rows, nothing driver-side."""
    ev = _t(spark, sf_dir, "events")
    d = F.col("ts").cast("date")
    life = (ev.groupBy("user_id")
            .agg(F.date_diff(F.max(d), F.min(d)).alias("lifetime_d"),
                 F.max(d).alias("last_d")))
    horizon = ev.agg(F.date_add(F.max(d), -2).alias("cut"))
    life = (life.crossJoin(F.broadcast(horizon))
            .select("lifetime_d",
                    (F.col("last_d") < F.col("cut"))
                    .cast("int").alias("churned")))
    counts = life.groupBy("lifetime_d").agg(
        F.count("*").alias("n_ending"),
        F.sum("churned").alias("d_events"))
    w_desc = (W.orderBy(F.desc("lifetime_d"))
              .rowsBetween(W.unboundedPreceding, 0))
    risk = counts.select(
        "lifetime_d", "d_events",
        F.sum("n_ending").over(w_desc).alias("n_risk"))
    w_asc = W.orderBy("lifetime_d").rowsBetween(W.unboundedPreceding, 0)
    surv = F.exp(F.sum(F.log(
        1.0 - F.col("d_events").cast("double") / F.col("n_risk")))
        .over(w_asc))
    return (risk.where(F.col("d_events") < F.col("n_risk"))
            .select(F.col("lifetime_d").cast("long").alias("lifetime_d"),
                    F.col("n_risk").cast("long").alias("n_risk"),
                    F.col("d_events").cast("long").alias("d_events"),
                    rnd(surv, 6).alias("survival")))


@query("sliding_distinct_users_6h", oracle="""
WITH uh AS (
    SELECT DISTINCT user_id, date_trunc('hour', ts) AS h FROM events
), memb AS (
    SELECT user_id, h - to_hours(o.o) AS w_start
    FROM uh, (SELECT unnest(range(6)) AS o) o
), bounds AS (
    SELECT min(date_trunc('hour', ts)) AS lo,
           max(date_trunc('hour', ts)) AS hi
    FROM events
)
SELECT strftime(w_start, '%Y-%m-%d %H:%M:%S') AS window_start,
       CAST(count(DISTINCT user_id) AS BIGINT) AS distinct_users
FROM memb, bounds
WHERE w_start >= lo AND w_start <= hi - INTERVAL 5 HOUR
GROUP BY w_start
""")
def sliding_distinct_users_6h(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT distinct users per sliding 6-hour window (1-hour
    slide) — the windowed-cardinality problem where a naive
    window-function distinct would buffer every user per frame.
    Scale shape: dedup to (user, hour) pairs FIRST (the one
    state-heavy combine, |users|x|hours| bounded), then each pair
    fans out to the <=6 windows it belongs to and a window-keyed
    distinct combine finishes — shuffle volume 6x the pair count,
    never 6x the event count. Complete windows only."""
    ev = _t(spark, sf_dir, "events")
    uh = (ev.select("user_id",
                    F.date_trunc("hour", F.col("ts")).alias("h"))
          .distinct())
    memb = uh.select(
        "user_id",
        F.explode(F.sequence(F.lit(0), F.lit(5))).alias("o"),
        "h").select(
        "user_id",
        (F.col("h") - F.make_interval(hours=F.col("o"))).alias("w_start"))
    bounds = ev.agg(
        F.date_trunc("hour", F.min("ts")).alias("lo"),
        F.date_trunc("hour", F.max("ts")).alias("hi"))
    return (memb.crossJoin(F.broadcast(bounds))
            .where((F.col("w_start") >= F.col("lo"))
                   & (F.col("w_start")
                      <= F.col("hi") - F.expr("INTERVAL 5 HOURS")))
            .groupBy("w_start")
            .agg(F.countDistinct("user_id").cast("long")
                 .alias("distinct_users"))
            .select(F.date_format("w_start", "yyyy-MM-dd HH:mm:ss")
                    .alias("window_start"), "distinct_users"))


@query("user_growth_daily", oracle="""
WITH fd AS (
    SELECT user_id, min(CAST(ts AS DATE)) AS first_d FROM events
    GROUP BY user_id
), act AS (
    SELECT CAST(ts AS DATE) AS d,
           count(DISTINCT user_id) AS n_active
    FROM events GROUP BY 1
), news AS (
    SELECT first_d AS d, count(*) AS n_new FROM fd GROUP BY first_d
)
SELECT strftime(act.d, '%Y-%m-%d') AS day,
       CAST(n_active AS BIGINT) AS n_active,
       CAST(coalesce(n_new, 0) AS BIGINT) AS n_new,
       CAST(n_active - coalesce(n_new, 0) AS BIGINT) AS n_returning,
       CAST(sum(coalesce(n_new, 0)) OVER (ORDER BY act.d) AS BIGINT)
           AS cum_unique_users
FROM act LEFT JOIN news ON act.d = news.d
""")
def user_growth_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily growth ledger: active users, NEW users (first-ever
    activity that day), returning users, and the cumulative unique
    count — the product-analytics daily. Two user-keyed combines
    (first-day, daily-active) + an ordered window over |days| rows;
    the cumulative count comes from summing new-user counts, never
    from re-distinct-counting history (the trap that makes naive
    versions quadratic in retained data)."""
    ev = _t(spark, sf_dir, "events")
    d = F.col("ts").cast("date")
    fd = ev.groupBy("user_id").agg(F.min(d).alias("first_d"))
    act = (ev.groupBy(d.alias("d"))
           .agg(F.countDistinct("user_id").alias("n_active")))
    news = fd.groupBy(F.col("first_d").alias("d")).agg(
        F.count("*").alias("n_new"))
    w = W.orderBy("d").rowsBetween(W.unboundedPreceding, 0)
    joined = (act.join(news, "d", "left")
              .select("d", "n_active",
                      F.coalesce("n_new", F.lit(0)).alias("n_new")))
    return joined.select(
        F.date_format("d", "yyyy-MM-dd").alias("day"),
        F.col("n_active").cast("long").alias("n_active"),
        F.col("n_new").cast("long").alias("n_new"),
        (F.col("n_active") - F.col("n_new")).cast("long")
        .alias("n_returning"),
        F.sum("n_new").over(w).cast("long").alias("cum_unique_users"))


@query("changepoint_cusum_daily", oracle="""
WITH daily AS (
    SELECT CAST(ts AS DATE) AS d, avg(value) AS x
    FROM events GROUP BY 1
), mu AS (SELECT avg(x) AS mu FROM daily),
cusum AS (
    SELECT d,
           sum(x - mu) OVER (ORDER BY d) AS c
    FROM daily, mu
)
SELECT strftime(d, '%Y-%m-%d') AS day,
       round(c, 6) AS cusum,
       round(abs(c), 6) AS cusum_abs
FROM cusum
ORDER BY abs(c) DESC, d
LIMIT 1
""")
def changepoint_cusum_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM change-point detection on the daily mean of `value`
    (Page 1954): cumulative sum of deviations from the series mean,
    argmax |CUSUM| = the most likely level-shift day — the
    first-line monitoring answer to "when did this metric change?".
    One daily combine, a broadcast 1-row mean, one ordered window
    over |days| rows, and a deterministic (|c| DESC, day) argmax."""
    ev = _t(spark, sf_dir, "events")
    daily = (ev.groupBy(F.col("ts").cast("date").alias("d"))
             .agg(F.avg("value").alias("x")))
    mu = daily.agg(F.avg("x").alias("mu"))
    w = W.orderBy("d").rowsBetween(W.unboundedPreceding, 0)
    cusum = (daily.crossJoin(F.broadcast(mu))
             .select("d", F.sum(F.col("x") - F.col("mu")).over(w)
                     .alias("c")))
    return (cusum
            .orderBy(F.abs("c").desc(), "d").limit(1)
            .select(F.date_format("d", "yyyy-MM-dd").alias("day"),
                    rnd("c", 6).alias("cusum"),
                    rnd(F.abs("c"), 6).alias("cusum_abs")))


@query("trend_theilsen_daily", oracle="""
WITH daily AS (
    SELECT CAST(ts AS DATE) AS d,
           CAST(floor(epoch(CAST(ts AS DATE)) / 86400) AS BIGINT) AS xd,
           avg(value) AS y
    FROM events GROUP BY 1, 2
), slopes AS (
    SELECT (b.y - a.y) / (b.xd - a.xd) AS s
    FROM daily a JOIN daily b ON b.xd > a.xd
)
SELECT CAST(count(*) AS BIGINT) AS n_pairs,
       round(quantile_cont(s, 0.5), 6) AS theilsen_slope
FROM slopes
""")
def trend_theilsen_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil-Sen robust trend of the daily mean value: the MEDIAN of
    all pairwise day-to-day slopes — unlike the OLS entry, a third
    of the days can be corrupted before the estimate moves (the
    robust-statistics companion to trend_slope_by_event_type).
    Scale design: the O(n^2) pair join runs over the DAY AGGREGATE
    (|days| rows, never events), so "quadratic" means ~10^6 pairs
    for three years of data — one broadcast self-join and an exact
    interpolated median over the slope set."""
    ev = _t(spark, sf_dir, "events")
    daily = (ev.groupBy(F.col("ts").cast("date").alias("d"))
             .agg(F.avg("value").alias("y"))
             .select(F.floor(epoch_s(F.col("d").cast("timestamp"))
                             / 86400).cast("long").alias("xd"), "y"))
    a, b = daily.alias("a"), daily.alias("b")
    slopes = (a.join(F.broadcast(b), F.col("b.xd") > F.col("a.xd"))
              .select(((F.col("b.y") - F.col("a.y"))
                       / (F.col("b.xd") - F.col("a.xd"))).alias("s")))
    return slopes.agg(
        F.count("*").cast("long").alias("n_pairs"),
        rnd(F.percentile(F.col("s"), F.lit(0.5)), 6)
        .alias("theilsen_slope"))


_HOLT_RECURSION = """
WITH RECURSIVE daily AS (
    SELECT CAST(row_number() OVER (ORDER BY d) - 1 AS BIGINT) AS i,
           y
    FROM (SELECT CAST(ts AS DATE) AS d, avg(value) AS y
          FROM {events} GROUP BY 1)
), n AS (SELECT max(i) AS imax FROM daily),
state(i, level, trend) AS (
    SELECT CAST(0 AS BIGINT),
           (SELECT y FROM daily WHERE i = 0),
           (SELECT y FROM daily WHERE i = 1)
           - (SELECT y FROM daily WHERE i = 0)
    UNION ALL
    SELECT s.i + 1,
           0.5 * d.y + 0.5 * (s.level + s.trend),
           0.3 * ((0.5 * d.y + 0.5 * (s.level + s.trend)) - s.level)
           + 0.7 * s.trend
    FROM state s JOIN daily d ON d.i = s.i + 1
    WHERE s.i + 1 <= (SELECT imax FROM n)
)
SELECT i AS day_index,
       round(level, 6) AS level,
       round(trend, 6) AS trend,
       round(level + trend, 6) AS forecast_next
FROM state WHERE i = (SELECT imax FROM n)
"""


@query("forecast_holt_daily",
       oracle=_HOLT_RECURSION.format(events="events"))
def forecast_holt_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt double-exponential smoothing over the daily mean value
    (alpha 0.5, beta 0.3), 1-step-ahead forecast. The data-sized
    work is one parallel combine (events -> |days| rows); the
    recurrence itself is inherently sequential per series, so it
    runs as ONE Arrow task folding the day aggregate in float64
    (applyInPandas) — the idiomatic Spark shape for per-key
    recurrences: at scale each series is one group, thousands of
    series fold in parallel, and no step is driver-synchronized.
    (The r6 implementation ran the identical fold via WITH
    RECURSIVE; correct, but each of the ~30 day-rounds paid ~0.6 s
    of recursive-CTE stage scheduling — 19 s for 30 rows. The
    kernel replays the exact same float64 operation order, so the
    DuckDB recursive-CTE oracle still hash-matches: 19 s -> ~0.3 s.)
    """
    daily = (_t(spark, sf_dir, "events")
             .groupBy(F.col("ts").cast("date").alias("d"))
             .agg(F.avg("value").alias("y")))

    def holt(pdf):
        import pandas as pd
        pdf = pdf.sort_values("d").reset_index(drop=True)
        y = [float(v) for v in pdf["y"]]
        if len(y) < 2:
            return pd.DataFrame({"day_index": [len(y) - 1],
                                 "level": [y[0] if y else None],
                                 "trend": [None], "forecast_next": [None]})
        level, trend = y[0], y[1] - y[0]
        for v in y[1:]:
            new_level = 0.5 * v + 0.5 * (level + trend)
            trend = 0.3 * (new_level - level) + 0.7 * trend
            level = new_level
        return pd.DataFrame({"day_index": [len(y) - 1],
                             "level": [level], "trend": [trend],
                             "forecast_next": [level + trend]})

    out = (daily.groupBy(F.lit(0).alias("__series"))
           .applyInPandas(holt, "day_index long, level double, "
                                "trend double, forecast_next double"))
    return out.select("day_index",
                      rnd("level", 6).alias("level"),
                      rnd("trend", 6).alias("trend"),
                      rnd("forecast_next", 6).alias("forecast_next"))


@query("acf_daily_value", oracle="""
WITH daily AS (
    SELECT CAST(row_number() OVER (ORDER BY d) - 1 AS BIGINT) AS i, y
    FROM (SELECT CAST(ts AS DATE) AS d, avg(value) AS y
          FROM events GROUP BY 1)
), mu AS (SELECT avg(y) AS m, count(*) AS n FROM daily),
den AS (SELECT sum(pow(y - m, 2)) AS d0 FROM daily, mu),
lags AS (SELECT unnest(range(1, 8)) AS lag)
SELECT CAST(l.lag AS BIGINT) AS lag,
       round(sum((a.y - mu.m) * (b.y - mu.m)) / max(den.d0), 6)
           AS acf
FROM lags l
JOIN daily a ON TRUE
JOIN daily b ON b.i = a.i + l.lag
CROSS JOIN mu CROSS JOIN den
GROUP BY l.lag
""")
def acf_daily_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Autocorrelation of the daily mean value at lags 1..7 — the
    seasonality screen (a weekly cycle lights up lag 7). Standard
    biased ACF estimator (global mean/denominator); the lag joins
    run over the |days|-row aggregate, so the whole statistic costs
    one combine plus day-count-sized joins."""
    ev = _t(spark, sf_dir, "events")
    daily = (ev.groupBy(F.col("ts").cast("date").alias("d"))
             .agg(F.avg("value").alias("y"))
             .select((F.row_number().over(W.orderBy("d")) - 1)
                     .cast("long").alias("i"), "y"))
    mu = daily.agg(F.avg("y").alias("m"), F.count("*").alias("n"))
    den = (daily.crossJoin(F.broadcast(mu))
           .agg(F.sum(F.pow(F.col("y") - F.col("m"), 2)).alias("d0")))
    lags = daily.sparkSession.range(1, 8).select(
        F.col("id").alias("lag"))
    a, b = daily.alias("a"), daily.alias("b")
    return (F.broadcast(lags).crossJoin(a)
            .join(b, F.col("b.i") == F.col("a.i") + F.col("lag"))
            .crossJoin(F.broadcast(mu))
            .crossJoin(F.broadcast(den))
            .groupBy("lag")
            .agg(rnd(F.sum((F.col("a.y") - F.col("m"))
                           * (F.col("b.y") - F.col("m")))
                     / F.max("d0"), 6).alias("acf"))
            .select(F.col("lag").cast("long").alias("lag"), "acf"))


@query("audience_overlap_jaccard", oracle="""
WITH ut AS (
    SELECT DISTINCT user_id, event_type FROM events
), sizes AS (
    SELECT event_type, count(*) AS n FROM ut GROUP BY event_type
), common AS (
    SELECT a.event_type AS type_a, b.event_type AS type_b,
           count(*) AS c
    FROM ut a JOIN ut b
      ON a.user_id = b.user_id AND a.event_type < b.event_type
    GROUP BY 1, 2
)
SELECT type_a, type_b,
       CAST(c AS BIGINT) AS n_common,
       round(CAST(c AS DOUBLE) / (sa.n + sb.n - c), 4)
           AS jaccard
FROM common
JOIN sizes sa ON sa.event_type = type_a
JOIN sizes sb ON sb.event_type = type_b
""")
def audience_overlap_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audience overlap between event types: Jaccard of their user
    sets for every type pair — the cohort-overlap matrix behind
    "do purchasers also file errors?" questions. Dedup to
    (user, type) FIRST (the state bound), then a user-keyed
    self-join emits only co-membership rows; |types|^2 output. The
    same shape computes corpus-domain audience overlap at 100 TB."""
    from pyspark.sql import functions as F
    ev = _t(spark, sf_dir, "events")
    ut = ev.select("user_id", "event_type").distinct()
    sizes = ut.groupBy("event_type").agg(F.count("*").alias("n"))
    a, b = ut.alias("a"), ut.alias("b")
    common = (a.join(b, (F.col("a.user_id") == F.col("b.user_id"))
                     & (F.col("a.event_type") < F.col("b.event_type")))
              .groupBy(F.col("a.event_type").alias("type_a"),
                       F.col("b.event_type").alias("type_b"))
              .agg(F.count("*").alias("c")))
    sa = sizes.withColumnsRenamed({"event_type": "type_a", "n": "na"})
    sb = sizes.withColumnsRenamed({"event_type": "type_b", "n": "nb"})
    return (common.join(sa, "type_a").join(sb, "type_b")
            .select("type_a", "type_b",
                    F.col("c").cast("long").alias("n_common"),
                    rnd(F.col("c") / (F.col("na") + F.col("nb")
                                      - F.col("c")), 4).alias("jaccard")))


@query("ltv_cumulative_by_cohort_week", oracle="""
WITH first_seen AS (
    SELECT user_id, min(ts) AS first_ts FROM events GROUP BY user_id
), purch AS (
    SELECT e.user_id,
           strftime(date_trunc('week', f.first_ts), '%Y-%m-%d')
               AS cohort_week,
           CAST(floor(date_diff('second', date_trunc('week', f.first_ts),
                                e.ts) / 604800.0) AS BIGINT)
               AS weeks_since,
           e.value
    FROM events e JOIN first_seen f USING (user_id)
    WHERE e.event_type = 'purchase'
), csize AS (
    SELECT strftime(date_trunc('week', first_ts), '%Y-%m-%d')
               AS cohort_week,
           count(*) AS n_users
    FROM first_seen GROUP BY 1
), wk AS (
    SELECT cohort_week, weeks_since, sum(value) AS rev
    FROM purch GROUP BY 1, 2
)
SELECT wk.cohort_week, wk.weeks_since,
       CAST(cs.n_users AS BIGINT) AS cohort_users,
       round(sum(wk.rev) OVER (PARTITION BY wk.cohort_week
                               ORDER BY wk.weeks_since)
             / cs.n_users, 4) AS cum_ltv_per_user
FROM wk JOIN csize cs ON wk.cohort_week = cs.cohort_week
""")
def ltv_cumulative_by_cohort_week(spark: SparkSession,
                                  sf_dir: str) -> DataFrame:
    """Cumulative lifetime value per user by signup cohort: purchase
    revenue accumulated over weeks-since-first-seen, normalized by
    cohort size — the LTV curve product teams steer by. One
    user-keyed first-seen combine, one (cohort, week) revenue
    combine, one ordered window per cohort; the weeks_since
    arithmetic uses the same truncated-second parity idiom as
    sessionization."""
    ev = _t(spark, sf_dir, "events")
    first = ev.groupBy("user_id").agg(F.min("ts").alias("first_ts"))
    cw = F.date_trunc("week", F.col("first_ts"))
    purch = (ev.where(F.col("event_type") == "purchase")
             .join(first, "user_id")
             .select(F.date_format(cw, "yyyy-MM-dd").alias("cohort_week"),
                     F.floor((epoch_s("ts") - epoch_s(cw)) / 604800.0)
                     .cast("long").alias("weeks_since"),
                     "value"))
    csize = (first.groupBy(F.date_format(cw, "yyyy-MM-dd")
                           .alias("cohort_week"))
             .agg(F.count("*").alias("n_users")))
    wk = purch.groupBy("cohort_week", "weeks_since").agg(
        F.sum("value").alias("rev"))
    w = (W.partitionBy("cohort_week").orderBy("weeks_since")
         .rowsBetween(W.unboundedPreceding, 0))
    return (wk.join(csize, "cohort_week")
            .select("cohort_week", "weeks_since",
                    F.col("n_users").cast("long").alias("cohort_users"),
                    rnd(F.sum("rev").over(w) / F.col("n_users"), 4)
                    .alias("cum_ltv_per_user")))


@query("streaming_trending_types_1h", oracle="""
WITH counts AS (
    SELECT date_trunc('hour', ts) AS h, event_type, count(*) AS n
    FROM events GROUP BY 1, 2
)
SELECT strftime(h, '%Y-%m-%d %H:%M:%S') AS hour_start,
       event_type, CAST(n AS BIGINT) AS n,
       CAST(rnk AS BIGINT) AS rnk
FROM (
    SELECT h, event_type, n,
           row_number() OVER (PARTITION BY h
                              ORDER BY n DESC, event_type) AS rnk
    FROM counts
) WHERE rnk <= 3
""")
def streaming_trending_types_1h(spark: SparkSession,
                                sf_dir: str) -> DataFrame:
    """Top-3 trending event types per hour computed FROM THE STREAM
    (complete-mode hourly counts as the monitor's running state,
    rank epilogue over the state table) — value-verified by the
    plain batch SQL because the stream replays to the same counts."""
    from ..streaming.events import run_streaming_trending_types
    return run_streaming_trending_types(spark, sf_dir)


_SESSION_DEPTH_ORACLE = """
WITH ordered AS (
    SELECT user_id, ts, event_id,
           CASE WHEN date_diff('second',
                    lag(ts) OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id), ts) > 1800
                     OR lag(ts) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) IS NULL
                THEN 1 ELSE 0 END AS is_start
    FROM events
), sess AS (
    SELECT user_id,
           sum(is_start) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) AS session_no
    FROM ordered
), depth AS (
    SELECT user_id, session_no, count(*) AS depth
    FROM sess GROUP BY user_id, session_no
), capped AS (
    SELECT least(depth, 10) AS depth_bucket FROM depth
)
SELECT CAST(depth_bucket AS BIGINT) AS depth_bucket,
       CAST(count(*) AS BIGINT) AS n_sessions,
       round(count(*) / (SELECT CAST(count(*) AS DOUBLE) FROM depth),
             4) AS frac
FROM capped GROUP BY depth_bucket
"""


@query("session_depth_histogram", oracle=_SESSION_DEPTH_ORACLE)
def session_depth_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session depth distribution (30-min inactivity sessions, the
    sessionization entry's rule): events per session bucketed at
    10+, with the share of sessions per depth — depth-1 share IS the
    bounce rate.

    Since r15 the DECLARED entry runs the whale-proof two-phase plan
    (r14 verdict #1): the one-window session numbering over
    partitionBy(user_id) serializes a bot user into one task (1.52x
    under a 10%-whale at K=100, tools/skew_probe.py). Delegates to
    session_depth_two_phase — identical result, same oracle."""
    return session_depth_two_phase(spark, sf_dir)


def _depth_histogram(depth: DataFrame) -> DataFrame:
    """Shared histogram tail of both session-depth entries: bucket
    per-session depths at 10+, emit count + share per bucket."""
    tot = depth.agg(F.count("*").cast("double").alias("nt"))
    return (depth.select(F.least(F.col("depth"), F.lit(10))
                         .cast("long").alias("depth_bucket"))
            .groupBy("depth_bucket")
            .agg(F.count("*").cast("long").alias("n_sessions"))
            .crossJoin(F.broadcast(tot))
            .select("depth_bucket", "n_sessions",
                    rnd(F.col("n_sessions") / F.col("nt"), 4)
                    .alias("frac")))


@query("session_depth_two_phase", oracle=_SESSION_DEPTH_ORACLE)
def session_depth_two_phase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whale-proof twin of session_depth_histogram: session numbering
    comes from operators/sessionize.two_phase_session_ids (chunk-local
    sessionize + per-user chunk-walk merge — the sessionization_two_
    phase machinery, reused verbatim), so the widest window partition
    is one (user, day-chunk) slice instead of a whole bot user. Depth
    grouping is tie-insensitive (duplicate timestamps have gap 0 and
    can never start a session), so the ts-only ordering inside the
    operator groups events identically to the one-window plan's
    (ts, event_id) ordering. Identical DuckDB oracle and shared
    histogram combine (_depth_histogram)."""
    from ..operators.sessionize import two_phase_session_ids
    ev = _t(spark, sf_dir, "events").select("user_id", "ts")
    depth = (two_phase_session_ids(ev, gap_s=1800)
             .groupBy("user_id", "session_id")
             .agg(F.count("*").alias("depth")))
    return _depth_histogram(depth)


@query("traffic_heatmap_dow_hour", oracle="""
SELECT CAST(dayofweek(ts) AS BIGINT) AS dow,
       CAST(hour(ts) AS BIGINT) AS hod,
       CAST(count(*) AS BIGINT) AS n_events,
       round(avg(value), 4) AS mean_value
FROM events GROUP BY 1, 2
""")
def traffic_heatmap_dow_hour(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-week x hour-of-day traffic heatmap with mean value —
    the seasonality fingerprint behind capacity planning and the
    input the anomaly entries normalize against. One 168-cell
    combine. (Both engines number Sunday=1..Saturday=7.)"""
    ev = _t(spark, sf_dir, "events")
    return (ev.groupBy((F.dayofweek("ts") - 1).cast("long").alias("dow"),
                       F.hour("ts").cast("long").alias("hod"))
            .agg(F.count("*").cast("long").alias("n_events"),
                 rnd(F.avg("value"), 4).alias("mean_value")))


@query("sax_daily_value", oracle="""
WITH daily AS (
    SELECT CAST(row_number() OVER (ORDER BY d) - 1 AS BIGINT) AS i, y
    FROM (SELECT CAST(ts AS DATE) AS d, avg(value) AS y
          FROM events GROUP BY 1)
), stats AS (
    SELECT avg(y) AS m, stddev_pop(y) AS s, count(*) AS n FROM daily
), paa AS (
    SELECT CAST(floor(i * 6.0 / n) AS BIGINT) AS seg,
           avg((y - m) / s) AS zmean
    FROM daily, stats GROUP BY 1
)
SELECT seg, round(zmean, 6) AS paa_z,
       CASE WHEN zmean < -0.6745 THEN 'a'
            WHEN zmean < 0.0 THEN 'b'
            WHEN zmean < 0.6745 THEN 'c'
            ELSE 'd' END AS sax_symbol
FROM paa
""")
def sax_daily_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SAX symbolic approximation of the daily value series (Lin et
    al. 2003): z-normalize, piecewise-aggregate into 6 equal
    segments (PAA), then map each segment mean to a 4-letter
    alphabet at the standard N(0,1) quartile breakpoints
    (+-0.6745) — the discretization behind symbolic motif/anomaly
    search over billions of series. One day combine + a 6-key
    combine; the word 'abccbd'-style output is the index key a
    100 TB series store shards by."""
    ev = _t(spark, sf_dir, "events")
    daily = (ev.groupBy(F.col("ts").cast("date").alias("d"))
             .agg(F.avg("value").alias("y"))
             .select((F.row_number().over(W.orderBy("d")) - 1)
                     .cast("long").alias("i"), "y"))
    stats = daily.agg(F.avg("y").alias("m"),
                      F.stddev_pop("y").alias("s"),
                      F.count("*").alias("n"))
    paa = (daily.crossJoin(F.broadcast(stats))
           .groupBy(F.floor(F.col("i") * 6.0 / F.col("n"))
                    .cast("long").alias("seg"))
           .agg(F.avg((F.col("y") - F.col("m")) / F.col("s"))
                .alias("zmean")))
    sym = (F.when(F.col("zmean") < -0.6745, "a")
           .when(F.col("zmean") < 0.0, "b")
           .when(F.col("zmean") < 0.6745, "c")
           .otherwise("d"))
    return paa.select("seg", rnd("zmean", 6).alias("paa_z"),
                      sym.alias("sax_symbol"))


@query("burst_detection_hourly", oracle="""
WITH hourly AS (
    SELECT date_trunc('hour', ts) AS h, count(*) AS n
    FROM events GROUP BY 1
), base AS (
    SELECT h, n,
           avg(n) OVER (ORDER BY h
                        ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING)
               AS baseline,
           row_number() OVER (ORDER BY h) AS rn
    FROM hourly
)
SELECT strftime(h, '%Y-%m-%d %H:%M:%S') AS hour_start,
       CAST(n AS BIGINT) AS n_events,
       round(baseline, 4) AS baseline,
       round(n / baseline, 4) AS burst_ratio
FROM base
WHERE rn > 24 AND n / baseline >= 1.5
""")
def burst_detection_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Burst detection on the hourly event rate: hours running at
    >= 1.5x their trailing-24h baseline (baseline excludes the
    current hour; the first day is warm-up) — the simple
    Kleinberg-class burst flag operations teams page on. One hourly
    combine + one ordered 24-row window; hours, not events, carry
    the window state."""
    ev = _t(spark, sf_dir, "events")
    hourly = (ev.groupBy(F.date_trunc("hour", F.col("ts")).alias("h"))
              .agg(F.count("*").alias("n")))
    w = W.orderBy("h").rowsBetween(-24, -1)
    wr = W.orderBy("h")
    base = hourly.select(
        "h", "n",
        F.avg("n").over(w).alias("baseline"),
        F.row_number().over(wr).alias("rn"))
    return (base.where((F.col("rn") > 24)
                       & (F.col("n") / F.col("baseline") >= 1.5))
            .select(F.date_format("h", "yyyy-MM-dd HH:mm:ss")
                    .alias("hour_start"),
                    F.col("n").cast("long").alias("n_events"),
                    rnd("baseline", 4).alias("baseline"),
                    rnd(F.col("n") / F.col("baseline"), 4)
                    .alias("burst_ratio")))


@query("time_to_convert_view_purchase", oracle="""
WITH fv AS (
    SELECT user_id, min(ts) AS first_view FROM events
    WHERE event_type = 'view' GROUP BY user_id
), fp AS (
    SELECT e.user_id, min(e.ts) AS first_purchase
    FROM events e JOIN fv ON e.user_id = fv.user_id
    WHERE e.event_type = 'purchase' AND e.ts >= fv.first_view
    GROUP BY e.user_id
), lags AS (
    SELECT date_diff('second', fv.first_view, fp.first_purchase)
               AS lag_s
    FROM fv JOIN fp ON fv.user_id = fp.user_id
)
SELECT CAST(count(*) AS BIGINT) AS n_converters,
       CAST(round(quantile_cont(lag_s, 0.5), 0) AS BIGINT) AS p50_s,
       CAST(round(quantile_cont(lag_s, 0.9), 0) AS BIGINT) AS p90_s,
       CAST(min(lag_s) AS BIGINT) AS min_s,
       CAST(max(lag_s) AS BIGINT) AS max_s
FROM lags
""")
def time_to_convert_view_purchase(spark: SparkSession,
                                  sf_dir: str) -> DataFrame:
    """Time-to-convert distribution: per user, first view -> first
    subsequent purchase, summarized as median/p90/min/max seconds —
    the latency companion to the funnel entry (the funnel says HOW
    MANY convert; this says HOW FAST). Two user-keyed min combines
    and one |converters|-row summary; second-truncation parity via
    the shared epoch idiom."""
    ev = _t(spark, sf_dir, "events")
    fv = (ev.where(F.col("event_type") == "view")
          .groupBy("user_id").agg(F.min("ts").alias("first_view")))
    fp = (ev.where(F.col("event_type") == "purchase")
          .join(fv, "user_id")
          .where(F.col("ts") >= F.col("first_view"))
          .groupBy("user_id").agg(F.min("ts").alias("first_purchase")))
    lags = (fv.join(fp, "user_id")
            .select((epoch_s("first_purchase") - epoch_s("first_view"))
                    .alias("lag_s")))
    return lags.agg(
        F.count("*").cast("long").alias("n_converters"),
        F.round(F.percentile(F.col("lag_s"), F.lit(0.5)), 0)
        .cast("long").alias("p50_s"),
        F.round(F.percentile(F.col("lag_s"), F.lit(0.9)), 0)
        .cast("long").alias("p90_s"),
        F.min("lag_s").cast("long").alias("min_s"),
        F.max("lag_s").cast("long").alias("max_s"))


@query("pchart_error_rate_hourly", oracle="""
WITH hourly AS (
    SELECT date_trunc('hour', ts) AS h,
           count(*) AS n,
           sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS e
    FROM events GROUP BY 1
), pbar AS (
    SELECT sum(e) / CAST(sum(n) AS DOUBLE) AS p FROM hourly
)
SELECT strftime(h, '%Y-%m-%d %H:%M:%S') AS hour_start,
       CAST(n AS BIGINT) AS n_events,
       round(e / CAST(n AS DOUBLE), 6) AS error_rate,
       round(p + 3 * sqrt(p * (1 - p) / n), 6) AS ucl
FROM hourly, pbar
WHERE e / CAST(n AS DOUBLE) > p + 3 * sqrt(p * (1 - p) / n)
""")
def pchart_error_rate_hourly(spark: SparkSession,
                             sf_dir: str) -> DataFrame:
    """p-chart SPC monitor on the hourly error rate: hours whose
    error share exceeds the binomial 3-sigma upper control limit
    around the overall rate (Shewhart's attribute chart — the SLO
    alarm that adjusts its threshold to each hour's sample size, so
    a quiet hour needs a bigger spike to page than a busy one). One
    hourly combine + a broadcast 1-row p-bar."""
    ev = _t(spark, sf_dir, "events")
    hourly = (ev.groupBy(F.date_trunc("hour", F.col("ts")).alias("h"))
              .agg(F.count("*").alias("n"),
                   F.sum((F.col("event_type") == "error").cast("int"))
                   .alias("e")))
    pbar = hourly.agg((F.sum("e") / F.sum("n").cast("double"))
                      .alias("p"))
    rate = F.col("e") / F.col("n").cast("double")
    ucl = F.col("p") + 3 * F.sqrt(F.col("p") * (1 - F.col("p"))
                                  / F.col("n"))
    return (hourly.crossJoin(F.broadcast(pbar))
            .where(rate > ucl)
            .select(F.date_format("h", "yyyy-MM-dd HH:mm:ss")
                    .alias("hour_start"),
                    F.col("n").cast("long").alias("n_events"),
                    rnd(rate, 6).alias("error_rate"),
                    rnd(ucl, 6).alias("ucl")))


@query("wow_type_movers", oracle="""
WITH weekly AS (
    SELECT event_type,
           strftime(date_trunc('week', ts), '%Y-%m-%d') AS wk,
           count(*) AS n
    FROM events GROUP BY 1, 2
), wow AS (
    SELECT event_type, wk, n,
           lag(n) OVER (PARTITION BY event_type ORDER BY wk) AS prev_n
    FROM weekly
)
SELECT event_type, wk AS week_start,
       CAST(n AS BIGINT) AS n,
       CAST(prev_n AS BIGINT) AS prev_n,
       CAST(n - prev_n AS BIGINT) AS delta,
       round((n - prev_n) / CAST(prev_n AS DOUBLE), 4) AS pct_change
FROM wow WHERE prev_n IS NOT NULL
""")
def wow_type_movers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Week-over-week movers per event type: count, delta, and
    percent change against the prior week — the standard reporting
    cut behind "what moved this week?". One (type, week) combine +
    one type-keyed lag window."""
    ev = _t(spark, sf_dir, "events")
    weekly = (ev.groupBy("event_type",
                         F.date_format(F.date_trunc("week", F.col("ts")),
                                       "yyyy-MM-dd").alias("wk"))
              .agg(F.count("*").alias("n")))
    w = W.partitionBy("event_type").orderBy("wk")
    wow = weekly.withColumn("prev_n", F.lag("n").over(w))
    return (wow.where(F.col("prev_n").isNotNull())
            .select("event_type", F.col("wk").alias("week_start"),
                    F.col("n").cast("long").alias("n"),
                    F.col("prev_n").cast("long").alias("prev_n"),
                    (F.col("n") - F.col("prev_n")).cast("long")
                    .alias("delta"),
                    rnd((F.col("n") - F.col("prev_n"))
                        / F.col("prev_n").cast("double"), 4)
                    .alias("pct_change")))


@query("churn_label_dataset", oracle="""
WITH feat AS (
    SELECT user_id,
           count(*) AS n_events_3w,
           count(DISTINCT CAST(ts AS DATE)) AS active_days_3w,
           count(DISTINCT event_type) AS n_types_3w
    FROM events
    WHERE ts < TIMESTAMP '2024-01-22'
    GROUP BY user_id
), future AS (
    SELECT DISTINCT user_id FROM events
    WHERE ts >= TIMESTAMP '2024-01-22'
)
SELECT f.user_id,
       CAST(f.n_events_3w AS BIGINT) AS n_events_3w,
       CAST(f.active_days_3w AS BIGINT) AS active_days_3w,
       CAST(f.n_types_3w AS BIGINT) AS n_types_3w,
       CAST(fu.user_id IS NULL AS INT) AS churned
FROM feat f LEFT JOIN future fu ON f.user_id = fu.user_id
""")
def churn_label_dataset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supervised-dataset construction — the last step of a training
    pipeline: per-user features from an observation window (first 3
    weeks: events, active days, mean value) with a leakage-safe
    churn label from the STRICTLY LATER window (no activity after
    day 21). The time split is the load-bearing part: features never
    read label-window rows, the exact mistake ad-hoc dataset pulls
    make. Features are deliberately integer-exact (counts, not float
    means): per-user small-n float averages routinely land on
    rounding boundaries where cross-engine summation-order ulps flip
    the rounded digit — counts cannot. One pre-cutoff combine + one
    distinct-user anti-ish join."""
    ev = _t(spark, sf_dir, "events")
    cut = F.lit("2024-01-22").cast("timestamp")
    feat = (ev.where(F.col("ts") < cut)
            .groupBy("user_id")
            .agg(F.count("*").cast("long").alias("n_events_3w"),
                 F.countDistinct(F.col("ts").cast("date")).cast("long")
                 .alias("active_days_3w"),
                 F.countDistinct("event_type").cast("long")
                 .alias("n_types_3w")))
    future = (ev.where(F.col("ts") >= cut)
              .select("user_id").distinct()
              .withColumn("seen", F.lit(1)))
    return (feat.join(future, "user_id", "left")
            .select("user_id", "n_events_3w", "active_days_3w",
                    "n_types_3w",
                    F.when(F.col("seen").isNull(), 1).otherwise(0)
                    .alias("churned")))


@query("seasonal_decompose_daily", oracle="""
WITH daily AS (
    SELECT d, y, CAST(row_number() OVER (ORDER BY d) - 1 AS BIGINT) AS i,
           dayofweek(d) + 1 AS dow  -- align to Spark: Sunday=1
    FROM (SELECT CAST(ts AS DATE) AS d, avg(value) AS y
          FROM events GROUP BY 1)
), tr AS (
    SELECT *, CASE WHEN count(*) OVER w7 = 7
                   THEN avg(y) OVER w7 END AS trend
    FROM daily
    WINDOW w7 AS (ORDER BY i ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
), sraw AS (
    SELECT dow, avg(y - trend) AS s_raw FROM tr
    WHERE trend IS NOT NULL GROUP BY dow
), scent AS (
    SELECT dow, s_raw - (SELECT avg(s_raw) FROM sraw) AS seasonal
    FROM sraw
)
SELECT strftime(tr.d, '%Y-%m-%d') AS d,
       CAST(tr.dow AS BIGINT) AS dow,
       round(tr.y * 100) / 100 AS y,
       round(tr.trend * 100) / 100 AS trend,
       round(sc.seasonal * 100) / 100 AS seasonal,
       round((tr.y - tr.trend - sc.seasonal) * 100) / 100 AS residual
FROM tr JOIN scent sc ON sc.dow = tr.dow
""")
def seasonal_decompose_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classical additive seasonal decomposition of the daily mean
    value (the moving-average method STL descends from, Cleveland et
    al. 1990's baseline): trend = centered 7-day moving average
    (NULL where the window is short), weekly seasonal index = the
    per-day-of-week mean of the detrended series re-centered to sum
    to zero, residual = y - trend - seasonal. The monitoring
    decomposition behind "is this drop a real anomaly or just
    Sunday": residuals are what the z-score/CUSUM monitors should
    consume when traffic has a weekly cycle. Components are rounded
    to 2dp (group-averaged floats; partial-sum order differs between
    engines at finer precision). DOW alignment: Spark dayofweek is
    Sunday=1, DuckDB is Sunday=0 — the oracle shifts. Scale: the
    whole decomposition runs on the |days|-row daily aggregate, so
    the unpartitioned window is a deliberate small-frame choice; the
    only corpus-sized stage is the first keyed date combine."""
    ev = _t(spark, sf_dir, "events")
    daily = (ev.groupBy(F.col("ts").cast("date").alias("d"))
             .agg(F.avg("value").alias("y"))
             .select("d", "y",
                     (F.row_number().over(W.orderBy("d")) - 1)
                     .cast("long").alias("i"),
                     F.dayofweek("d").cast("long").alias("dow")))
    w7 = W.orderBy("i").rowsBetween(-3, 3)
    tr = daily.select(
        "d", "dow", "y",
        F.when(F.count(F.lit(1)).over(w7) == 7,
               F.avg("y").over(w7)).alias("trend"))
    sraw = (tr.where(F.col("trend").isNotNull())
            .groupBy("dow")
            .agg(F.avg(F.col("y") - F.col("trend")).alias("s_raw")))
    center = sraw.agg(F.avg("s_raw").alias("s_mean"))
    scent = (sraw.crossJoin(F.broadcast(center))
             .select("dow", (F.col("s_raw") - F.col("s_mean"))
                     .alias("seasonal")))
    return (tr.join(F.broadcast(scent), "dow")
            .select(F.date_format("d", "yyyy-MM-dd").alias("d"),
                    F.col("dow").cast("long").alias("dow"),
                    rnd("y", 2).alias("y"),
                    rnd("trend", 2).alias("trend"),
                    rnd("seasonal", 2).alias("seasonal"),
                    rnd(F.col("y") - F.col("trend") - F.col("seasonal"),
                        2).alias("residual")))


@query("streaming_view_purchase_join", oracle="""
SELECT v.user_id AS user_id,
       v.event_id AS view_event_id,
       p.event_id AS purchase_event_id,
       CAST(epoch_ms(p.ts) - epoch_ms(v.ts) AS BIGINT) AS latency_ms
FROM events v JOIN events p
  ON v.user_id = p.user_id
 AND v.event_type = 'view' AND p.event_type = 'purchase'
 AND p.ts >= v.ts AND p.ts <= v.ts + INTERVAL 1 HOUR
""")
def streaming_view_purchase_join(spark: SparkSession,
                                 sf_dir: str) -> DataFrame:
    """Stream-stream interval join (streaming/events.py:
    run_streaming_interval_join): view and purchase branches of the
    event stream, each with its own watermark, inner-joined on user
    within a 1-hour horizon — every (view, converting purchase)
    pair with its millisecond latency. Value-verified against the
    batch interval join because inner stream-stream matches emit
    exactly once on the bounded replay. The watermark + range
    predicate pair is what bounds both join buffers in production
    (state eviction at watermark - horizon)."""
    from ..streaming.events import run_streaming_interval_join
    return run_streaming_interval_join(spark, sf_dir)


@query("streaming_left_outer_attribution", oracle="""
WITH mx AS (SELECT max(ts) AS m FROM events),
j AS (
    SELECT v.user_id AS user_id,
           v.event_id AS view_event_id,
           p.event_id AS purchase_event_id,
           v.ts AS v_ts, p.ts AS p_ts
    FROM (SELECT * FROM events WHERE event_type = 'view') v
    LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
      ON p.user_id = v.user_id
     AND p.ts >= v.ts AND p.ts <= v.ts + INTERVAL 1 HOUR
)
SELECT user_id, view_event_id, purchase_event_id,
       CAST(epoch_ms(p_ts) - epoch_ms(v_ts) AS BIGINT) AS latency_ms
FROM j, mx
WHERE purchase_event_id IS NOT NULL
   OR v_ts < mx.m - INTERVAL 2 HOUR
""")
def streaming_left_outer_attribution(spark: SparkSession,
                                     sf_dir: str) -> DataFrame:
    """LEFT OUTER stream-stream interval join (streaming/events.py:
    run_streaming_left_outer_join): converted views carry their
    purchase + latency, unconverted views surface as null-padded
    rows — but only once the watermark proves no match can arrive.
    The oracle is NOT the plain batch left join: it cuts unmatched
    views at v_ts < max_ts - watermark - horizon (the holdback
    boundary), pinning the semantics every naive streaming test gets
    wrong — views inside the final holdback window correctly stay
    in state when the bounded replay ends."""
    from ..streaming.events import run_streaming_left_outer_join
    return run_streaming_left_outer_join(spark, sf_dir)


@query("seasonal_adjusted_anomalies", oracle="""
WITH daily AS (
    SELECT d, y, CAST(row_number() OVER (ORDER BY d) - 1 AS BIGINT) AS i,
           dayofweek(d) + 1 AS dow
    FROM (SELECT CAST(ts AS DATE) AS d, avg(value) AS y
          FROM events GROUP BY 1)
), tr AS (
    SELECT *, CASE WHEN count(*) OVER w7 = 7
                   THEN avg(y) OVER w7 END AS trend
    FROM daily
    WINDOW w7 AS (ORDER BY i ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
), sraw AS (
    SELECT dow, avg(y - trend) AS s_raw FROM tr
    WHERE trend IS NOT NULL GROUP BY dow
), scent AS (
    SELECT dow, s_raw - (SELECT avg(s_raw) FROM sraw) AS seasonal
    FROM sraw
), resid AS (
    SELECT tr.d, tr.y - tr.trend - sc.seasonal AS r
    FROM tr JOIN scent sc ON sc.dow = tr.dow
    WHERE tr.trend IS NOT NULL
), sigma AS (
    SELECT stddev_pop(r) AS sd, count(*) AS n FROM resid
)
SELECT strftime(resid.d, '%Y-%m-%d') AS d,
       round(resid.r * 100) / 100 AS residual,
       round(resid.r / nullif(sigma.sd, 0) * 100) / 100 AS z,
       abs(resid.r) > 2 * sigma.sd AS is_anomaly
FROM resid, sigma
WHERE abs(resid.r) > 1.0
""")
def seasonal_adjusted_anomalies(spark: SparkSession,
                                sf_dir: str) -> DataFrame:
    """The payoff of the decomposition: anomaly detection on the
    SEASONALLY-ADJUSTED residuals — |residual| > 2 sigma_pop flags a
    real deviation after the weekly cycle and the local trend are
    removed, so a quiet Sunday stops tripping the monitor and a
    genuinely odd Wednesday still does (the composition the
    seasonal_decompose_daily docstring promises the z-score/CUSUM
    monitors). Emits every day with |residual| > 1.0 with its
    z-score and the 2-sigma verdict. Scale: everything after the
    date combine runs on the |days|-row frame."""
    ev = _t(spark, sf_dir, "events")
    daily = (ev.groupBy(F.col("ts").cast("date").alias("d"))
             .agg(F.avg("value").alias("y"))
             .select("d", "y",
                     (F.row_number().over(W.orderBy("d")) - 1)
                     .cast("long").alias("i"),
                     F.dayofweek("d").cast("long").alias("dow")))
    w7 = W.orderBy("i").rowsBetween(-3, 3)
    tr = daily.select(
        "d", "dow", "y",
        F.when(F.count(F.lit(1)).over(w7) == 7,
               F.avg("y").over(w7)).alias("trend"))
    sraw = (tr.where(F.col("trend").isNotNull())
            .groupBy("dow")
            .agg(F.avg(F.col("y") - F.col("trend")).alias("s_raw")))
    center = sraw.agg(F.avg("s_raw").alias("s_mean"))
    scent = (sraw.crossJoin(F.broadcast(center))
             .select("dow", (F.col("s_raw") - F.col("s_mean"))
                     .alias("seasonal")))
    resid = (tr.where(F.col("trend").isNotNull())
             .join(F.broadcast(scent), "dow")
             .select("d", (F.col("y") - F.col("trend")
                           - F.col("seasonal")).alias("r")))
    sigma = resid.agg(F.stddev_pop("r").alias("sd"))
    return (resid.crossJoin(F.broadcast(sigma))
            .where(F.abs(F.col("r")) > 1.0)
            .select(F.date_format("d", "yyyy-MM-dd").alias("d"),
                    rnd("r", 2).alias("residual"),
                    rnd(F.col("r") / F.nullif(F.col("sd"), F.lit(0.0)),
                        2).alias("z"),
                    (F.abs(F.col("r")) > 2 * F.col("sd"))
                    .alias("is_anomaly")))
