"""Time-series operators over the event log: OHLC downsampling bars,
first-order Markov transition matrices, and z-score anomaly flags —
the monitoring / feature-engineering surface a KG-construction pipeline
runs beside its extraction jobs (ingest-rate bars, user-behaviour
transitions, per-type volume anomalies).

Spark-first shape, 100-TB story:

* OHLC bars are ONE map-side-combined aggregation keyed by
  (event_type, hour): open/close ride ``min_by``/``max_by`` over a
  zero-padded (micros, event_id) string key — totally ordered and
  unique, so the pick is deterministic on any partitioning — and the
  shuffle carries one row per bar, never raw events;
* Markov transitions use a user-partitioned LEAD window (the natural
  key — millions of small partitions, no global sort), then one
  combinable count per (from, to) cell: the output is |types|^2 rows
  regardless of input scale;
* anomaly z-scores aggregate daily counts (combinable), then join the
  tiny per-type moment frame back broadcast-style; no window.

Float discipline (what makes the DuckDB twins exact): bar volumes are
summed as half-away-snapped integer micros (BIGINT, order-independent)
and divided once at the end; open/high/low/close are single picked
values (no summation); z-scores are derived from exact integer moments
(sum, sum-of-squares of daily counts) through one fixed-shape chain of
IEEE double ops (each individually exact-rounded, hence
engine-identical), then snapped to the shared 1e-6 half-away grid.

Reference contact: none (the reference is a per-document NER engine);
these extend the relational event-log family of operators/retention.py
and operators/funnel.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

MICROS_PER_HOUR = 3_600_000_000
ZSCORE_FLAG = 2.0


def _ordkey():
    """Zero-padded (event-time micros, event_id) string — a unique total
    order identical in Spark and DuckDB, so min_by/max_by never tie."""
    return F.concat(
        F.lpad(F.expr("unix_micros(cast(ts as timestamp))").cast("string"), 20, "0"),
        F.lpad(F.col("event_id").cast("string"), 20, "0"),
    )


ORDKEY_SQL = (
    "lpad(CAST(epoch_us(ts) AS VARCHAR), 20, '0') || "
    "lpad(CAST(event_id AS VARCHAR), 20, '0')"
)

_SNAP = "FLOOR({x} * 1000000.0 + 0.5) / 1000000.0"


def ohlc_bars(events: DataFrame) -> DataFrame:
    """events -> hourly (event_type, hour, open, high, low, close,
    n_events, volume) bars; hour is integer epoch-micros div 3.6e9."""
    return (
        events.select(
            "event_type",
            F.expr(f"unix_micros(cast(ts as timestamp)) div {MICROS_PER_HOUR}")
            .alias("hour"),
            "value",
            _ordkey().alias("_k"),
            F.floor(F.col("value") * F.lit(1000000.0) + F.lit(0.5))
            .cast("long")
            .alias("_vmicros"),
        )
        .groupBy("event_type", "hour")
        .agg(
            F.min_by("value", F.col("_k")).alias("open"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.max_by("value", F.col("_k")).alias("close"),
            F.count(F.lit(1)).alias("n_events"),
            (F.sum("_vmicros") / F.lit(1000000.0)).alias("volume"),
        )
    )


def ohlc_bars_sql() -> str:
    """DuckDB twin: same integer hour, same unique order key, same
    integer-micros volume sum."""
    return f"""
    SELECT event_type,
           epoch_us(ts) // {MICROS_PER_HOUR} AS hour,
           arg_min(value, {ORDKEY_SQL}) AS open,
           MAX(value) AS high,
           MIN(value) AS low,
           arg_max(value, {ORDKEY_SQL}) AS close,
           COUNT(*) AS n_events,
           SUM(CAST(FLOOR(value * 1000000.0 + 0.5) AS BIGINT))
             / 1000000.0 AS volume
    FROM events
    GROUP BY event_type, epoch_us(ts) // {MICROS_PER_HOUR}
    """


def markov_transitions(events: DataFrame) -> DataFrame:
    """Per-user event-type transition matrix: (from_type, to_type,
    n_trans, n_from, p) over each user's time-ordered event sequence."""
    w = Window.partitionBy("user_id").orderBy(
        F.expr("unix_micros(cast(ts as timestamp))"), F.col("event_id")
    )
    from ..cache import tracked_persist

    # persisted: the |types|^2 cell frame feeds both the totals roll-up
    # and the final join — without it the event-scale window runs twice
    trans = tracked_persist(
        events.select(
            "user_id",
            F.col("event_type").alias("from_type"),
            F.lead("event_type").over(w).alias("to_type"),
        )
        .where(F.col("to_type").isNotNull())
        .groupBy("from_type", "to_type")
        .agg(F.count(F.lit(1)).alias("n_trans"))
    )
    totals = trans.groupBy("from_type").agg(
        F.sum("n_trans").alias("n_from")
    )
    return trans.join(totals, "from_type").select(
        "from_type",
        "to_type",
        "n_trans",
        "n_from",
        (
            F.floor(
                F.col("n_trans").cast("double") / F.col("n_from")
                * F.lit(1000000.0) + F.lit(0.5)
            ) / F.lit(1000000.0)
        ).alias("p"),
    )


def markov_transitions_sql() -> str:
    """DuckDB twin: identical (micros, event_id) LEAD ordering."""
    return """
    WITH seq AS (
      SELECT event_type AS from_type,
             LEAD(event_type) OVER (
               PARTITION BY user_id
               ORDER BY epoch_us(ts), event_id) AS to_type
      FROM events),
    trans AS (
      SELECT from_type, to_type, COUNT(*) AS n_trans
      FROM seq WHERE to_type IS NOT NULL
      GROUP BY from_type, to_type),
    totals AS (
      SELECT from_type, SUM(n_trans) AS n_from
      FROM trans GROUP BY from_type)
    SELECT t.from_type, t.to_type, t.n_trans, tt.n_from::BIGINT AS n_from,
           FLOOR(t.n_trans::DOUBLE / tt.n_from * 1000000.0 + 0.5)
             / 1000000.0 AS p
    FROM trans t JOIN totals tt ON tt.from_type = t.from_type
    """


def anomaly_zscore(events: DataFrame,
                   flag_at: float = ZSCORE_FLAG) -> DataFrame:
    """Per-(event_type, day) daily-count z-scores vs that type's own
    30-day distribution; |z| > `flag_at` marks the day anomalous.

    The moments (count, sum, sum of squares of the daily counts) are
    exact BIGINTs; mean/variance/z are one fixed chain of IEEE doubles
    evaluated identically in the twin, snapped to the 1e-6 grid."""
    daily = (
        events.select(
            "event_type",
            F.expr(
                "datediff(to_date(ts), DATE '1970-01-01')"
            ).cast("long").alias("day"),
        )
        .groupBy("event_type", "day")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    stats = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("_days"),
        F.sum("n").alias("_s"),
        F.sum(F.col("n") * F.col("n")).alias("_s2"),
    )
    mean = F.col("_s").cast("double") / F.col("_days")
    var = (
        F.col("_s2").cast("double") / F.col("_days") - mean * mean
    )
    z = (F.col("n").cast("double") - mean) / F.sqrt(var)
    snap = lambda c: F.floor(c * F.lit(1000000.0) + F.lit(0.5)) / F.lit(1000000.0)  # noqa: E731
    return (
        daily.join(stats, "event_type")
        .select(
            "event_type",
            "day",
            "n",
            snap(mean).alias("mean_n"),
            snap(z).alias("z"),
            (F.abs(snap(z)) > F.lit(flag_at)).alias("is_anomaly"),
        )
    )


def anomaly_zscore_sql(flag_at: float = ZSCORE_FLAG) -> str:
    """DuckDB twin: same integer moments, same double-op chain."""
    mean = "(s._s::DOUBLE / s._days)"
    var = f"(s._s2::DOUBLE / s._days - {mean} * {mean})"
    z = f"((d.n::DOUBLE - {mean}) / sqrt({var}))"
    return f"""
    WITH daily AS (
      SELECT event_type,
             date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))::BIGINT
               AS day,
             COUNT(*) AS n
      FROM events GROUP BY 1, 2),
    stats AS (
      SELECT event_type, COUNT(*) AS _days, SUM(n) AS _s,
             SUM(n * n) AS _s2
      FROM daily GROUP BY event_type)
    SELECT d.event_type, d.day, d.n,
           {_SNAP.format(x=mean)} AS mean_n,
           {_SNAP.format(x=z)} AS z,
           ABS({_SNAP.format(x=z)}) > {flag_at} AS is_anomaly
    FROM daily d JOIN stats s ON s.event_type = d.event_type
    """


# ---------------------------------------------------------------------------
# EWMA volume smoothing (alpha = 1/2, truncated lookback)
# ---------------------------------------------------------------------------

EWMA_SPAN = 16  # lookback days; weight of day (t - i) is 2^(15 - i)


def ewma_volume(events: DataFrame) -> DataFrame:
    """Exponentially weighted moving average of the per-type daily volume
    — the trend line the z-score anomaly gate is read against.  alpha is
    fixed at 1/2 with an EWMA_SPAN-day truncation, which makes the whole
    computation INTEGER: the weight of the day i steps back is the BIGINT
    2^(15 - i), the smoothed numerator is a plain combinable SUM, and the
    final ewma = num / 2^16 is a division by a power of two — exact in
    IEEE doubles, so the twin matches bit-for-bit with no snapping.

    Scale shape: a windowed weighted sum has no combinable aggregate over
    a naive per-day window scan, so this uses the same replicate-to-
    window-ends decomposition as rel_rolling_distinct: each (type, day,
    n) fact fans out map-side to the <= EWMA_SPAN window-ends it can
    serve, carrying its shifted weight, then ONE map-side-combined sum
    keyed by (type, window_end).  All shuffles are key-local; window-ends
    are restricted to days the type actually observed (no synthetic
    calendar rows)."""
    daily = (
        events.select(
            "event_type",
            F.expr("datediff(to_date(ts), DATE '1970-01-01')")
            .cast("long").alias("day"),
        )
        .groupBy("event_type", "day")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    cand = daily.select(
        "event_type",
        F.explode(
            F.sequence(F.lit(0), F.lit(EWMA_SPAN - 1))
        ).alias("off"),
        "day",
        "n",
    ).select(
        "event_type",
        (F.col("day") + F.col("off")).alias("wday"),
        (
            F.col("n")
            * F.expr(f"shiftleft(CAST(1 AS BIGINT), {EWMA_SPAN - 1} - off)")
        ).alias("w"),
    )
    observed = daily.select(
        "event_type", F.col("day").alias("wday"), "n"
    )
    denom = float(1 << EWMA_SPAN)
    return (
        cand.join(observed, ["event_type", "wday"])
        .groupBy("event_type", F.col("wday").alias("day"), "n")
        .agg(F.sum("w").alias("ewma_num"))
        .select(
            "event_type", "day", "n", "ewma_num",
            (F.col("ewma_num") / F.lit(denom)).alias("ewma"),
        )
    )


def ewma_volume_sql() -> str:
    """DuckDB twin: same replicate-to-window-ends decomposition, same
    shifted BIGINT weights, same exact power-of-two division."""
    return f"""
    WITH daily AS (
      SELECT event_type,
             date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))::BIGINT
               AS day,
             COUNT(*) AS n
      FROM events GROUP BY 1, 2),
    cand AS (
      SELECT d.event_type, d.day + x.range AS wday,
             d.n * (1::BIGINT << ({EWMA_SPAN - 1} - x.range)) AS w
      FROM daily d, range(0, {EWMA_SPAN}) x)
    SELECT c.event_type, c.wday AS day, o.n,
           SUM(c.w)::BIGINT AS ewma_num,
           SUM(c.w)::BIGINT / {float(1 << EWMA_SPAN)} AS ewma
    FROM cand c
    JOIN daily o ON o.event_type = c.event_type AND o.day = c.wday
    GROUP BY 1, 2, 3
    """


def cusum_changepoint(events_in: DataFrame) -> DataFrame:
    """CUSUM changepoint detection over the daily event-volume series —
    "when did traffic structurally shift?".  The statistic is the classic
    cumulative sum of deviations from the series mean; the changepoint
    estimate is the day maximizing |CUSUM| (the binary-segmentation
    split point).

    Integer-exact throughout: instead of subtracting the float mean
    S/n per day, the engine scales by n —
    ``G_k = n * prefix_k - k * S`` (= n * sum_{i<=k}(c_i - S/n)) with
    prefix_k the cumulative count through day k — so both engines compare
    exact BIGINTs and the argmax can never hinge on float summation
    order.  Ties on |G| flag every tied day on both engines.

    Shuffle profile: ONE map-side-combined daily aggregate over the raw
    events; every window after that runs on the one-row-per-day frame,
    which does not grow with the corpus (the sweepline/totals-frame
    discipline), and the (n, S) scalars arrive by broadcast.

    Output: (day, n_events, cusum, is_changepoint).
    Reference analog: none (monitoring family, like z-score anomalies).
    """
    from .parallelism import fan_out

    days = (
        fan_out(events_in)
        # integer epoch-day like the zscore/EWMA siblings: Spark and
        # DuckDB date/timestamp values canonicalize differently
        # (date_trunc returns TIMESTAMP vs DATE), BIGINTs never do
        .select(
            F.expr("datediff(to_date(ts), DATE '1970-01-01')")
            .cast("long").alias("day")
        )
        .groupBy("day")
        .agg(F.count(F.lit(1)).cast("long").alias("n_events"))
    )
    tot = days.agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        F.sum("n_events").cast("long").alias("s_total"),
    )
    ordered = Window.orderBy("day")
    run = (
        days.crossJoin(F.broadcast(tot))
        .withColumn(
            "prefix",
            F.sum("n_events").over(
                ordered.rowsBetween(Window.unboundedPreceding, 0)
            ),
        )
        .withColumn("k", F.row_number().over(ordered).cast("long"))
        .withColumn(
            "cusum",
            (F.col("n_days") * F.col("prefix")
             - F.col("k") * F.col("s_total")).cast("long"),
        )
    )
    gmax = run.agg(F.max(F.abs(F.col("cusum"))).alias("g_max"))
    return (
        run.crossJoin(F.broadcast(gmax))
        .select(
            "day",
            "n_events",
            "cusum",
            (F.abs(F.col("cusum")) == F.col("g_max")).alias("is_changepoint"),
        )
    )


def cusum_changepoint_sql(table: str = "events") -> str:
    """DuckDB twin of :func:`cusum_changepoint` (identical integer
    scaling, identical tie semantics)."""
    return f"""
    WITH days AS (
      SELECT date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))::BIGINT
               AS day,
             COUNT(*)::BIGINT AS n_events
      FROM {table} GROUP BY 1),
    tot AS (
      SELECT COUNT(*)::BIGINT AS n_days, SUM(n_events)::BIGINT AS s_total
      FROM days),
    run AS (
      SELECT day, n_events,
             (SELECT n_days FROM tot)
               * SUM(n_events) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING)
               - ROW_NUMBER() OVER (ORDER BY day)
               * (SELECT s_total FROM tot) AS cusum
      FROM days)
    SELECT day, n_events, cusum::BIGINT AS cusum,
           ABS(cusum) = (SELECT MAX(ABS(cusum)) FROM run) AS is_changepoint
    FROM run
    """


# ---------------------------------------------------------------------------
# Autocorrelation function (exact integer arithmetic)
# ---------------------------------------------------------------------------

ACF_MAX_LAG = 7


def autocorrelation(events: DataFrame, max_lag: int = ACF_MAX_LAG) -> DataFrame:
    """ACF of the corpus-wide daily event volume at lags 1..``max_lag`` —
    the seasonality probe (a weekly cycle shows as a lag-7 peak) every
    ingest-monitoring stack wants.

    Exactness: with integer daily counts ``x_t``, ``n`` days and
    ``S = sum(x)``, the lag-l autocorrelation is computed in the
    n^2-SCALED integer form

        ``acf_micro(l) = floor(1e6 * sum((n*x_t - S)(n*x_{t+l} - S))
                               / sum((n*x_t - S)^2))``

    — every term is a BIGINT product of BIGINTs (bounded far below 2^63
    at any realistic daily-count scale), both sums are order-free integer
    sums, and the only float anywhere is the FINAL scaled division of
    two identical integers — deterministic across engines (no float
    summation ever).  Lag pairs are an equi-join on
    ``day + l`` (gap days simply contribute no pair; the denominator is
    the full-series mass — documented estimator choice, identical in the
    twin).

    Scale shape: ONE raw-event shuffle (the daily count agg, map-side
    combined); everything after runs on the days-sized frame — the lag
    explode and self-join touch n_days x max_lag rows regardless of event
    volume.  Output: (lag, n_pairs, acf_micro)."""
    daily = (
        events.select(
            F.expr("datediff(to_date(ts), DATE '1970-01-01')")
            .cast("long").alias("day")
        )
        .groupBy("day")
        .agg(F.count(F.lit(1)).alias("x"))
    )
    stats = daily.agg(
        F.count(F.lit(1)).alias("n_days"),
        F.sum("x").alias("s"),
    )
    centered = daily.crossJoin(F.broadcast(stats)).select(
        "day",
        (F.col("n_days") * F.col("x") - F.col("s")).alias("d"),
    )
    den = centered.agg(F.sum(F.col("d") * F.col("d")).alias("den"))
    lags = centered.select(
        "day", "d", F.explode(F.sequence(F.lit(1), F.lit(max_lag))).alias("lag")
    )
    a = lags.select("day", "d", "lag")
    b = centered.select(F.col("day").alias("day_b"), F.col("d").alias("d_b"))
    pairs = a.join(b, a.day + a.lag == F.col("day_b"))
    num = pairs.groupBy("lag").agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.sum(F.col("d") * F.col("d_b")).alias("num"),
    )
    return (
        num.crossJoin(F.broadcast(den))
        .select(
            F.col("lag").cast("long").alias("lag"),
            "n_pairs",
            F.floor(F.lit(1000000) * F.col("num") / F.col("den"))
            .cast("long").alias("acf_micro"),
        )
    )


def autocorrelation_sql(max_lag: int = ACF_MAX_LAG) -> str:
    """DuckDB twin: same daily counts, centered-integer products and
    floor division."""
    return f"""
    WITH daily AS (
      SELECT date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))::BIGINT
               AS day,
             COUNT(*)::BIGINT AS x
      FROM events GROUP BY 1),
    st AS (SELECT COUNT(*)::BIGINT AS n_days, SUM(x)::BIGINT AS s FROM daily),
    c AS (
      SELECT day, (st.n_days * x - st.s)::BIGINT AS d
      FROM daily CROSS JOIN st),
    den AS (SELECT SUM(d * d)::BIGINT AS den FROM c),
    pairs AS (
      SELECT l.range AS lag, a.d AS d, b.d AS d_b
      FROM c a CROSS JOIN range(1, {max_lag} + 1) l
      JOIN c b ON b.day = a.day + l.range),
    num AS (
      SELECT lag, COUNT(*)::BIGINT AS n_pairs, SUM(d * d_b)::BIGINT AS num
      FROM pairs GROUP BY 1)
    SELECT lag::BIGINT AS lag, n_pairs,
           FLOOR(1000000 * num / den)::BIGINT AS acf_micro
    FROM num CROSS JOIN den
    """
