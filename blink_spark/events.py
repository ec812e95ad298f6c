"""Time-series operators over the ``events`` table: hypertable-style
windowed rollups (hourly + daily continuous-aggregate reuse), gap-based
sessionization, and an as-of join — plus Structured Streaming variants
(watermarked window aggregation and an ``applyInPandasWithState``
stateful sessionizer).

These are the event/telemetry primitives of a large-scale training-data
pipeline (the reference's KBP simulation replays a mention *stream* into
an incremental KB — ``scripts/kbp_simulation.py:316-366`` — these
queries generalize that stream shape to generic timestamped events).

Timestamp discipline: the testdata parquet stores naive timestamps
(``isAdjustedToUTC=false``), which Spark reads as ``TIMESTAMP_NTZ``.
All arithmetic here converts to **epoch microseconds as BIGINT** first
(``timestampdiff`` against the NTZ epoch literal), because NTZ-to-epoch
via ``unix_timestamp``/``date_trunc`` silently applies the session
timezone (measured: ``date_trunc('hour')`` shifts by 5h under an
America/New_York session) while ``timestampdiff`` and ``F.window`` on
NTZ are wall-clock pure.  Integer microsecond math is bit-identical
between Spark and the DuckDB oracle (``epoch_us``) regardless of the
harness session's timezone.

Scale notes (100 TB):
- Rollups are plain hash aggregates: map-side partial agg, one shuffle
  keyed on (bucket, type).  The daily rollup re-aggregates the hourly
  *partials* (counts/sums/min/max merge; the continuous-aggregate
  pattern) instead of rescanning raw events.  ``count(DISTINCT
  user_id)`` is exact for oracle parity; at cluster scale swap it for
  ``approx_count_distinct`` (HLL merges, single shuffle).
- Sessionization is a single shuffle on ``user_id`` + one sort within
  partitions (window lag/cumsum); no self-join, no driver loops.
- The as-of join uses the union-and-window trick: tag both sides, one
  shuffle on ``user_id``, ``last(ignorenulls)`` over an ordered running
  frame.  This is O(n log n) per user and never materializes the
  O(views x purchases) range-join intermediate a naive ``ts_v <= ts_p``
  join would.
"""

from __future__ import annotations

from typing import Iterator, Tuple

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from blink_spark.parity import r6 as _r6

SESSION_GAP_S = 8 * 3600  # inactivity gap that starts a new session
SESSION_GAP_US = SESSION_GAP_S * 1_000_000
DAY_US = 86_400_000_000

EVENTS_SCHEMA = (
    "event_id bigint, ts timestamp_ntz, user_id bigint, "
    "event_type string, value double, props string"
)


def load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/events.parquet")


def ts_us_col(colname: str = "ts") -> Column:
    """Epoch microseconds (BIGINT) from a TIMESTAMP_NTZ column —
    wall-clock pure (session-timezone independent), exactly
    ``epoch_us(...)`` on the DuckDB side."""
    return F.expr(
        "timestampdiff(MICROSECOND, "
        f"TIMESTAMP_NTZ '1970-01-01 00:00:00', {colname})"
    )


# ---------------------------------------------------------------------------
# Windowed rollups (hypertable pattern)
# ---------------------------------------------------------------------------

def _hourly_partials(ev: DataFrame) -> DataFrame:
    """Un-rounded hourly partial aggregates — the shared base of the
    hourly query, the daily continuous-aggregate, and the streaming
    variant. ``F.window`` on NTZ is wall-clock pure (measured)."""
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.sum("value").alias("sum_raw"),
            F.min("value").alias("min_v"),
            F.max("value").alias("max_v"),
        )
        .withColumn("bucket_us", ts_us_col("w.start"))
    )


def hourly_rollup(ev: DataFrame) -> DataFrame:
    """Tumbling 1-hour window x event_type: counts, exact distinct
    users, sum/avg/min/max of value."""
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.countDistinct("user_id").cast("long").alias("n_users"),
            F.sum("value").alias("sum_raw"),
            F.avg("value").alias("avg_raw"),
            F.min("value").alias("min_v"),
            F.max("value").alias("max_v"),
        )
        .select(
            ts_us_col("w.start").alias("bucket_us"),
            "event_type",
            "n_events",
            "n_users",
            _r6(F.col("sum_raw")).alias("sum_value"),
            _r6(F.col("avg_raw")).alias("avg_value"),
            _r6(F.col("min_v")).alias("min_value"),
            _r6(F.col("max_v")).alias("max_value"),
        )
    )


def daily_rollup(ev: DataFrame) -> DataFrame:
    """Daily rollup derived from the hourly *partials* (counts/sums/
    min/max merge) — the continuous-aggregate reuse pattern: at scale
    the hourly table is materialized once and every coarser resolution
    aggregates it, never the raw events."""
    hourly = _hourly_partials(ev)
    return (
        hourly.withColumn(
            "day_us", F.col("bucket_us") - F.col("bucket_us") % F.lit(DAY_US)
        )
        .groupBy("day_us", "event_type")
        .agg(
            F.sum("n_events").cast("long").alias("n_events"),
            F.count("*").cast("long").alias("n_hours_active"),
            _r6(F.sum("sum_raw")).alias("sum_value"),
            _r6(F.min("min_v")).alias("min_value"),
            _r6(F.max("max_v")).alias("max_value"),
        )
    )


# ---------------------------------------------------------------------------
# Gap-based sessionization
# ---------------------------------------------------------------------------

def sessionize(ev: DataFrame, gap_s: int = SESSION_GAP_S) -> DataFrame:
    """Per-user sessions: a gap > ``gap_s`` of inactivity starts a new
    session.  One shuffle on user_id (window lag + running cumsum), then
    a session-level aggregate.  (user_id, ts) is unique in the corpus,
    so ordering by ts_us alone is deterministic."""
    gap_us = gap_s * 1_000_000
    w = Window.partitionBy("user_id").orderBy("ts_us")
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    prev = F.lag("ts_us").over(w)
    is_new = F.when(
        prev.isNull() | ((F.col("ts_us") - prev) > gap_us), F.lit(1)
    ).otherwise(F.lit(0))
    e = (
        ev.select("user_id", ts_us_col("ts").alias("ts_us"), "value")
        .withColumn("is_new", is_new)
        .withColumn("session_idx", F.sum("is_new").over(run).cast("long"))
    )
    return e.groupBy("user_id", "session_idx").agg(
        F.count("*").cast("long").alias("n_events"),
        F.min("ts_us").alias("session_start_us"),
        F.max("ts_us").alias("session_end_us"),
        _r6((F.max("ts_us") - F.min("ts_us")) / F.lit(1_000_000.0)).alias(
            "duration_s"
        ),
        _r6(F.sum("value")).alias("sum_value"),
    )


# ---------------------------------------------------------------------------
# As-of join
# ---------------------------------------------------------------------------

def asof_latest_view(ev: DataFrame) -> DataFrame:
    """For each 'purchase' event, the most recent 'view' at ts <= the
    purchase ts by the same user (-1 / -1.0 sentinels when none).

    Union-and-window formulation: tag views side=0 and purchases
    side=1, order by (ts_us, side) within user, and take
    ``last(view_cols, ignorenulls)`` over the running frame — a view at
    exactly the purchase timestamp sorts first, giving <= semantics.
    One shuffle, no range-join blowup; the DuckDB oracle cross-checks
    it with a native ASOF LEFT JOIN."""
    base = ev.select(
        "event_id", "user_id", ts_us_col("ts").alias("ts_us"), "event_type"
    )
    views = base.filter(F.col("event_type") == "view").select(
        "user_id",
        "ts_us",
        F.col("event_id").alias("view_event_id"),
        F.col("ts_us").alias("view_ts_us"),
        F.lit(0).alias("side"),
    )
    purchases = base.filter(F.col("event_type") == "purchase").select(
        "user_id",
        "ts_us",
        F.col("event_id").alias("purchase_event_id"),
        F.lit(1).alias("side"),
    )
    u = views.unionByName(purchases, allowMissingColumns=True)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_us", "side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    lv_id = F.last("view_event_id", ignorenulls=True).over(w)
    lv_ts = F.last("view_ts_us", ignorenulls=True).over(w)
    return (
        u.withColumn("lv_id", lv_id)
        .withColumn("lv_ts", lv_ts)
        .filter(F.col("side") == 1)
        .select(
            "purchase_event_id",
            "user_id",
            F.coalesce(F.col("lv_id"), F.lit(-1)).cast("long").alias(
                "view_event_id"
            ),
            _r6(
                F.when(
                    F.col("lv_ts").isNotNull(),
                    (F.col("ts_us") - F.col("lv_ts")) / F.lit(1_000_000.0),
                ).otherwise(F.lit(-1.0))
            ).alias("gap_s"),
        )
    )


# ---------------------------------------------------------------------------
# Structured Streaming variants
# ---------------------------------------------------------------------------

def read_events_stream(
    spark: SparkSession, input_dir: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """File-source event stream.  ``max_files_per_trigger`` is a SOURCE
    option (setting it on writeStream is a silent no-op): with 1, each
    staged chunk becomes its own micro-batch, genuinely exercising the
    cross-batch state carry instead of one catch-all batch."""
    r = spark.readStream.schema(EVENTS_SCHEMA)
    if max_files_per_trigger is not None:
        r = r.option("maxFilesPerTrigger", max_files_per_trigger)
    return r.parquet(input_dir)


def with_event_time(ev: DataFrame) -> DataFrame:
    """A TIMESTAMP event-time column from the NTZ ``ts`` — watermarks
    refuse TIMESTAMP_NTZ, and a plain NTZ->TIMESTAMP cast would apply
    the session timezone.  ``timestamp_micros(epoch_us)`` interprets the
    wall clock as a UTC instant deterministically in any session."""
    return ev.withColumn("event_time", F.timestamp_micros(ts_us_col("ts")))


def windowed_counts(ev: DataFrame) -> DataFrame:
    """The batch/stream-shared core of the windowed rollup (the subset
    of aggregates that is legal in a streaming aggregation)."""
    return (
        with_event_time(ev)
        .groupBy(F.window("event_time", "1 hour").alias("w"), "event_type")
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.sum("value").alias("sum_raw"),
        )
        .select(
            F.unix_micros(F.col("w.start")).alias("bucket_us"),
            "event_type",
            "n_events",
            _r6(F.col("sum_raw")).alias("sum_value"),
        )
    )


def windowed_counts_stream(
    spark: SparkSession,
    input_dir: str,
    watermark: str = "2 hours",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Watermarked streaming window aggregation over an events dir —
    identical output shape to ``windowed_counts`` on the same data, so
    the two are directly comparable (tests assert equality)."""
    ev = with_event_time(
        read_events_stream(spark, input_dir, max_files_per_trigger)
    ).withWatermark("event_time", watermark)
    return (
        ev.groupBy(F.window("event_time", "1 hour").alias("w"), "event_type")
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.sum("value").alias("sum_raw"),
        )
        .select(
            F.unix_micros(F.col("w.start")).alias("bucket_us"),
            "event_type",
            "n_events",
            _r6(F.col("sum_raw")).alias("sum_value"),
        )
    )


_SESSION_OUT_SCHEMA = (
    "user_id long, session_idx long, n_events long, session_start_us long, "
    "session_end_us long, duration_s double, sum_value double"
)
_SESSION_STATE_SCHEMA = (
    "last_ts_us long, start_us long, n_events long, sum_value double, "
    "n_closed long"
)


def _make_sessionize_state_func(flush_idle: bool):
    """Build the per-user session accumulator for
    ``applyInPandasWithState``: emits a session row the moment a later
    event closes it (gap > SESSION_GAP_US); the in-flight session stays
    in state.  With ``flush_idle`` the function also arms an event-time
    timeout at last_ts + gap, so a session idle past the watermark is
    flushed without waiting for the user's next event (and the n_closed
    counter survives the flush — session_idx stays continuous).  Without
    it, batches are assumed time-ordered and open tails are held forever
    (fine for the file-source tests; anything long-running should pass
    flush_idle=True)."""

    def _sessionize_state_func(
        key: Tuple, pdf_iter: Iterator[pd.DataFrame], state
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.exists:
            last_ts, start, n, sv, closed = state.get
        else:
            last_ts, start, n, sv, closed = None, None, 0, 0.0, 0

        def _row(n_, start_, end_, sv_):
            return (
                user_id,
                closed,
                int(n_),
                int(start_),
                int(end_),
                round((int(end_) - int(start_)) / 1_000_000.0, 6),
                round(float(sv_), 6),
            )

        out = []
        frames = [pdf for pdf in pdf_iter if len(pdf)]
        if frames:
            # vectorized intra-batch path: gap mask -> cumsum segment ids ->
            # reduceat aggregates; only the cross-batch carry tuple is scalar
            # Python (it has to be — it lives in the state store)
            pdf = pd.concat(frames, ignore_index=True).sort_values("ts_us")
            ts = pdf["ts_us"].to_numpy(dtype=np.int64)
            val = pdf["value"].to_numpy(dtype=np.float64)
            prev = np.empty_like(ts)
            prev[1:] = ts[:-1]
            # event 0's "previous event" is the carried open tail; with no
            # carry, force a session boundary at the batch head
            prev[0] = last_ts if n else ts[0] - SESSION_GAP_US - 1
            seg = np.cumsum((ts - prev) > SESSION_GAP_US)
            heads = np.flatnonzero(np.r_[True, seg[1:] != seg[:-1]])
            seg_n = np.diff(np.r_[heads, len(ts)])
            seg_sum = np.add.reduceat(val, heads)
            seg_start = ts[heads]
            seg_end = ts[np.r_[heads[1:] - 1, len(ts) - 1]]
            if n and seg[0] == 0:
                # batch head continues the carried session; min/max the
                # bounds so an out-of-order row BEHIND the carry (late
                # arrival under flush_idle's watermark) folds into the
                # session without regressing its start/end — a no-op on
                # time-ordered replays
                seg_n[0] += n
                seg_sum[0] += sv
                seg_start[0] = min(int(seg_start[0]), start)
                seg_end[0] = max(int(seg_end[0]), last_ts)
            elif n:
                # batch head opens a new session: the carry closes first
                closed += 1
                out.append(_row(n, start, last_ts, sv))
            # every segment but the open tail is closed by a later event
            for i in range(len(heads) - 1):
                closed += 1
                out.append(_row(seg_n[i], seg_start[i], seg_end[i], seg_sum[i]))
            last_ts, start = int(seg_end[-1]), int(seg_start[-1])
            n, sv = int(seg_n[-1]), float(seg_sum[-1])
        elif flush_idle and state.hasTimedOut and n:
            # idle past the watermark: flush the open tail as a closed
            # session; keep the state row (n=0) so n_closed — and with it
            # session_idx continuity — survives a later revival
            closed += 1
            out.append(_row(n, start, last_ts, sv))
            n, sv = 0, 0.0

        state.update((last_ts, start, n, sv, closed))
        if flush_idle and n:
            # arm the flush for SESSION_GAP after the open tail's last
            # event; clamp above the current watermark (required by the
            # state API when a straggler batch arrives behind it)
            state.setTimeoutTimestamp(
                max(
                    last_ts // 1000 + SESSION_GAP_US // 1000,
                    state.getCurrentWatermarkMs() + 1,
                )
            )
        cols = [
            "user_id",
            "session_idx",
            "n_events",
            "session_start_us",
            "session_end_us",
            "duration_s",
            "sum_value",
        ]
        yield pd.DataFrame(out, columns=cols)

    return _sessionize_state_func


# no-timeout variant: module-level so Spark pickles a stable reference
# and unit tests can drive it directly (NOT the production default — see
# sessionize_stream)
_sessionize_state_func = _make_sessionize_state_func(False)


def sessionize_stream(
    spark: SparkSession,
    input_dir: str,
    flush_idle: bool = True,
    watermark: str = "30 minutes",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Stateful streaming sessionizer (``applyInPandasWithState``):
    same session definition as the batch ``sessionize``; closed sessions
    stream out incrementally, the open tail of each user stays in
    state.  State is one fixed-size tuple per user — O(users), not
    O(events).  With ``flush_idle`` (the DEFAULT — a long-running stream
    must never hold an idle user's open session forever) the input is
    watermarked and open sessions idle past SESSION_GAP are flushed by an
    event-time timeout instead of waiting (possibly forever) for the
    user's next event; the timeout changes WHEN a session is emitted,
    never WHAT.  ``flush_idle=False`` is the opt-out for strictly
    time-ordered file-source replays (exact closed-by-a-later-event
    emission semantics, no watermark column required)."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    base = read_events_stream(spark, input_dir, max_files_per_trigger)
    ev = base.select("user_id", ts_us_col("ts").alias("ts_us"), "value")
    timeout = GroupStateTimeout.NoTimeout
    if flush_idle:
        ev = (
            with_event_time(base)
            .select(
                "user_id", ts_us_col("ts").alias("ts_us"), "value", "event_time"
            )
            .withWatermark("event_time", watermark)
        )
        timeout = GroupStateTimeout.EventTimeTimeout
    return ev.groupBy("user_id").applyInPandasWithState(
        _make_sessionize_state_func(flush_idle),
        _SESSION_OUT_SCHEMA,
        _SESSION_STATE_SCHEMA,
        "update",
        timeout,
    )


ATTRIB_WINDOW_US = DAY_US  # view -> purchase attribution horizon


def interval_join_stream(
    spark: SparkSession,
    input_dir: str,
    max_files_per_trigger: int | None = None,
    watermark: str = "1 hour",
) -> DataFrame:
    """Watermarked stream-stream interval join: each purchase event is
    joined to every view by the same user within the preceding 24 h —
    the attribution-window primitive (and the streaming generalization
    of the reference's mention->candidate alignment joins,
    ``blink/main_dense.py:125-148``, where both sides arrive over time
    in the KBP replay, ``scripts/kbp_simulation.py:316-366``).

    Scale notes (100 TB): both sides shuffle once on ``user_id`` (the
    equi-key Spark extracts from the condition); the time-range bounds
    let the state store evict views older than
    ``watermark_purchase - 24h`` and purchases behind their own
    watermark, so per-executor state is sized by the attribution
    horizon, never the stream's history.  Inner-join matches emit as
    soon as both rows are present — the watermark governs state
    eviction only, so an availableNow drain yields exactly the batch
    range-join result (the DuckDB oracle)."""

    def _side(name: str) -> DataFrame:
        ev = with_event_time(
            read_events_stream(spark, input_dir, max_files_per_trigger)
        ).where(F.col("event_type") == name)
        return ev.select(
            F.col("event_id").alias(f"{name}_event_id"),
            F.col("user_id").alias(f"{name}_user_id"),
            ts_us_col("ts").alias(f"{name}_ts_us"),
            F.col("event_time").alias(f"{name}_time"),
        ).withWatermark(f"{name}_time", watermark)

    v, p = _side("view"), _side("purchase")
    cond = (
        (v.view_user_id == p.purchase_user_id)
        & (p.purchase_time >= v.view_time)
        & (p.purchase_time <= v.view_time + F.expr("INTERVAL 24 HOURS"))
    )
    return v.join(p, cond, "inner").select(
        "view_event_id",
        "purchase_event_id",
        F.col("view_user_id").alias("user_id"),
        (
            F.round(
                (F.col("purchase_ts_us") - F.col("view_ts_us")) / 1e6, 6
            )
            + F.lit(0.0)
        ).alias("gap_s"),
    )


def dedup_stream(
    spark: SparkSession,
    input_dir: str,
    max_files_per_trigger: int | None = None,
    delay: str = "35 days",
) -> DataFrame:
    """Watermarked streaming deduplication
    (``dropDuplicatesWithinWatermark`` on ``event_id``): re-delivered
    events — at-least-once sources replay whole files/offset ranges —
    are dropped while their key is inside the watermark horizon, and
    the key state is evicted once the watermark passes it, so state is
    sized by the re-delivery window, not the stream's history.  The
    streaming analog of the batch exact-dedup collapse
    (``textops.py`` ``doc_exact_dedup``); at 100 TB the horizon (here
    35 days, sized to cover the whole fixture span so the oracle is the
    table at rest) would be the source's actual replay bound."""
    ev = with_event_time(
        read_events_stream(spark, input_dir, max_files_per_trigger)
    )
    return (
        ev.withWatermark("event_time", delay)
        .dropDuplicatesWithinWatermark(["event_id"])
        .select(
            "event_id",
            "user_id",
            "event_type",
            ts_us_col("ts").alias("ts_us"),
            (F.round("value", 6) + F.lit(0.0)).alias("value"),
        )
    )


# ---------------------------------------------------------------------------
# Driver-contract queries + DuckDB oracles
# ---------------------------------------------------------------------------

def q_evt_windowed_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return hourly_rollup(load_events(spark, sf_dir))


def q_evt_daily_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return daily_rollup(load_events(spark, sf_dir))


def q_evt_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sessionize(load_events(spark, sf_dir))


def q_evt_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    return asof_latest_view(load_events(spark, sf_dir))


ANOM_WINDOW = 24  # trailing hourly buckets in the baseline
ANOM_MIN_HIST = 12  # minimum baseline buckets before a verdict
ANOM_Z = 3.0


_HOUR_US = 3_600_000_000


def densify_hourly(hourly: DataFrame) -> DataFrame:
    """Zero-fill the hourly census: one row per (event_type, hour) over
    each type's [min, max] bucket span, n_events coalesced to 0.  Output
    volume is types × hours (census-scale); the generated range rides a
    broadcast-size per-type bounds table."""
    bounds = hourly.groupBy("event_type").agg(
        F.min("bucket_us").alias("__lo"), F.max("bucket_us").alias("__hi")
    )
    dense = bounds.select(
        "event_type",
        F.explode(
            F.sequence(F.col("__lo"), F.col("__hi"), F.lit(_HOUR_US))
        ).alias("bucket_us"),
    )
    return dense.join(hourly, ["event_type", "bucket_us"], "left").select(
        "bucket_us",
        "event_type",
        F.coalesce(F.col("n_events"), F.lit(0)).cast("long").alias("n_events"),
    )


def q_evt_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Volume anomaly detection over the hourly rollup: per event type,
    each hour's count is z-scored against that type's TRAILING 24-bucket
    baseline (current hour excluded — the baseline must not contain the
    value it judges) and flagged when |z| ≥ 3 — the monitoring primitive
    a telemetry pipeline runs on every rollup it publishes.  Hours with
    fewer than ``ANOM_MIN_HIST`` baseline buckets emit no verdict (cold
    start discipline).

    Plan (100 TB): the corpus collapses to the hourly census first (one
    combinable shuffle, same as ``evt_windowed_rollup``), so the window
    scan runs over buckets — hours × types, not events; one window
    shuffle on low-cardinality event_type with an O(1)-row frame.  A
    constant-volume baseline (stddev 0) z-scores to 0, never NaN.

    Silence is judged too: the census is DENSIFIED per type before the
    window — ``sequence`` over the type's [min, max] bucket range,
    counts coalesced to 0 — so an hour with zero events both enters the
    trailing baseline as a real 0 and is itself z-scored (a stream that
    goes silent inside its active span IS the on-call page).  The dense
    frame therefore spans exactly 24 wall-clock hours.  Densify cost is
    O(types × hours) — census-scale, not event-scale — and the range is
    per-type, so a type's verdicts never extend past its own lifetime."""
    ev = load_events(spark, sf_dir)
    hourly = (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").cast("long").alias("n_events"))
        .select(
            ts_us_col("w.start").alias("bucket_us"), "event_type", "n_events"
        )
    )
    return anomaly_verdicts(densify_hourly(hourly))


def anomaly_verdicts(hourly: DataFrame) -> DataFrame:
    """Trailing z-score verdicts over a (dense) hourly census —
    (bucket_us, event_type, n_events) in, one verdict row per bucket
    with ≥ ANOM_MIN_HIST baseline buckets out."""
    w = (
        Window.partitionBy("event_type")
        .orderBy("bucket_us")
        .rowsBetween(-ANOM_WINDOW, -1)
    )
    v = F.col("n_events").cast("double")
    hist = hourly.select(
        "bucket_us",
        "event_type",
        "n_events",
        F.count("n_events").over(w).cast("long").alias("hist_n"),
        F.avg(v).over(w).alias("_mean"),
        F.stddev_samp(v).over(w).alias("_std"),
    )
    z = F.when(
        F.col("_std") > 0, (F.col("n_events") - F.col("_mean")) / F.col("_std")
    ).otherwise(F.lit(0.0))
    return (
        hist.filter(F.col("hist_n") >= ANOM_MIN_HIST)
        .select(
            "bucket_us",
            "event_type",
            "n_events",
            "hist_n",
            _r6(F.col("_mean")).alias("hist_mean"),
            _r6(F.col("_std")).alias("hist_std"),
            _r6(z).alias("zscore"),
            (F.abs(z) >= F.lit(ANOM_Z)).alias("is_anomaly"),
        )
    )


QUANTILE_PS = [0.5, 0.9, 0.99]


def q_evt_value_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type exact value quantiles (p50/p90/p99) — the latency/
    metric-distribution primitive of any telemetry rollup.

    Exact ``percentile`` keeps the oracle comparable value-for-value
    (both engines use the same linear interpolation on sorted doubles);
    at 100 TB swap it for ``approx_percentile`` — a mergeable KLL-style
    sketch with map-side partial aggregation, same single shuffle on
    event_type, no global sort. The exact form here is also one shuffle:
    Spark's percentile aggregates per group, never a global orderBy."""
    ev = load_events(spark, sf_dir)
    qs = ev.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n_events"),
        F.percentile("value", F.lit(QUANTILE_PS)).alias("_q"),
    )
    cols = [
        _r6(F.element_at("_q", i + 1)).alias(f"p{int(p * 100)}")
        for i, p in enumerate(QUANTILE_PS)
    ]
    return qs.select("event_type", "n_events", *cols)


def _stage_stream_input(
    sf_dir: str, n_chunks: int = 3, sentinel: bool = False, dup: bool = False
) -> str:
    """Write the events table as time-ordered parquet chunks with strictly
    increasing mtimes — the arrival order a real stream would have (the
    file source processes files in mtime order under maxFilesPerTrigger=1).

    Harness scaffolding only: in production the stream arrives pre-ordered
    from Kafka/file drops; this driver-side pandas pass exists to SIMULATE
    that arrival inside a single correctness query, sf0.01 events fit
    trivially.  With ``sentinel`` a final chunk appends one far-future
    event per user (global max ts + gap + 1s), which closes every real
    open session; the sentinel sessions themselves never emit, so the
    streamed output covers exactly the batch result."""
    import os
    import tempfile
    import time

    pdf = pd.read_parquet(f"{sf_dir}/events.parquet").sort_values("ts")
    input_dir = tempfile.mkdtemp(prefix="evt_stream_in_")
    k = max(1, len(pdf) // n_chunks)
    chunks = [
        pdf.iloc[i * k: len(pdf) if i == n_chunks - 1 else (i + 1) * k]
        for i in range(n_chunks)
    ]
    if sentinel:
        users = pdf["user_id"].unique()
        sent_ts = pdf["ts"].max() + pd.Timedelta(seconds=SESSION_GAP_S + 1)
        chunks.append(
            pd.DataFrame(
                {
                    "event_id": -1 - np.arange(len(users), dtype=np.int64),
                    # keep the SOURCE timestamp resolution: a bare
                    # Timestamp column defaults to ns, and the file
                    # source rejects a chunk whose parquet type differs
                    # from the us-resolution real chunks
                    "ts": pd.Series(
                        [sent_ts] * len(users), dtype=pdf["ts"].dtype
                    ),
                    "user_id": users,
                    "event_type": "__sentinel__",
                    "value": 0.0,
                    "props": "{}",
                }
            )
        )
    if dup:
        # re-deliver the OLDEST chunk after everything else has arrived
        # (worst case for a dedup horizon): an at-least-once source
        # replaying its first file
        chunks.append(chunks[0].copy())
    now = time.time()
    for i, chunk in enumerate(chunks):
        p = os.path.join(input_dir, f"chunk{i}.parquet")
        chunk.to_parquet(p, index=False)
        os.utime(p, (now + i, now + i))
    return input_dir


def _run_to_memory(stream_df: DataFrame, mode: str, timeout_s: int = 600):
    """availableNow-drain a streaming DataFrame into a uniquely-named
    memory sink; returns (spark, table_name)."""
    import uuid

    name = f"evt_stream_{uuid.uuid4().hex[:12]}"
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout_s)
    if q.isActive:
        q.stop()
        raise TimeoutError(f"stream {name} did not drain in {timeout_s}s")
    return name


def q_evt_stream_windowed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Structured Streaming windowed aggregation, verified against the
    SAME batch oracle as the rollup family: the events table replayed as
    time-ordered micro-batches through the watermarked streaming plan
    must produce value-identical hourly aggregates to one DuckDB pass
    over the table at rest (stream/batch unification)."""
    input_dir = _stage_stream_input(sf_dir)
    name = _run_to_memory(
        windowed_counts_stream(spark, input_dir, max_files_per_trigger=1),
        "complete",
    )
    t = spark.table(name)
    return t.select(
        "bucket_us",
        "event_type",
        F.col("n_events").cast("long").alias("n_events"),
        # already rounded in-stream; + 0.0 canonicalizes any -0.0
        (F.col("sum_value") + F.lit(0.0)).alias("sum_value"),
    )


def q_evt_stream_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The stateful streaming sessionizer (applyInPandasWithState) under
    the hard oracle gate: replay the events table as time-ordered
    micro-batches plus a per-user far-future sentinel (which closes every
    real open session), and the emitted closed sessions must hash-match
    the batch/DuckDB gap-sessionization of the table at rest.  The
    sentinel sessions themselves stay open in state and never emit."""
    input_dir = _stage_stream_input(sf_dir, sentinel=True)
    stream_df = sessionize_stream(spark, input_dir, max_files_per_trigger=1)
    name = _run_to_memory(stream_df, "update")
    t = spark.table(name)
    return t.select(
        "user_id",
        "session_idx",
        "n_events",
        "session_start_us",
        "session_end_us",
        (F.col("duration_s") + F.lit(0.0)).alias("duration_s"),
        (F.col("sum_value") + F.lit(0.0)).alias("sum_value"),
    )


FUNNEL_STEPS = ["view", "click", "purchase"]


def q_evt_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel progression (view → click → purchase): a user
    reaches step k+1 only with an event of that type strictly AFTER
    their step-k time — the product-analytics staple (and SQL's
    MATCH_RECOGNIZE lite).

    Plan (100 TB): step k is ONE equi-join on user_id against the
    step-(k-1) timestamps followed by a min-aggregate — co-partitioned
    with the previous step's shuffle, no window over the whole event
    stream, no per-user event collection.  The report is
    steps-count-sized."""
    ev = load_events(spark, sf_dir).select(
        "user_id", "event_type", ts_us_col("ts").alias("ts_us")
    )
    reached = []  # per step: DataFrame[user_id, t]
    prev = None
    for step in FUNNEL_STEPS:
        cur = ev.filter(F.col("event_type") == step)
        if prev is not None:
            cur = cur.join(
                prev.select("user_id", F.col("t").alias("_pt")), "user_id"
            ).filter(F.col("ts_us") > F.col("_pt"))
        prev = cur.groupBy("user_id").agg(F.min("ts_us").alias("t"))
        reached.append(prev)

    counts = [
        df.agg(F.count(F.lit(1)).cast("long").alias("n_users")).select(
            F.lit(i + 1).cast("long").alias("step"),
            F.lit(s).alias("event_type"),
            "n_users",
        )
        for i, (s, df) in enumerate(zip(FUNNEL_STEPS, reached))
    ]
    out = counts[0]
    for c in counts[1:]:
        out = out.unionByName(c)
    # steps-count-sized table: a single-partition window is fine; anchor
    # the denominator on step 1 explicitly (never on row order)
    w = Window.partitionBy().rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    base = F.max(F.when(F.col("step") == 1, F.col("n_users"))).over(w)
    return out.select(
        "step",
        "event_type",
        "n_users",
        _r6(F.col("n_users") / base, 6).alias("frac_of_step1"),
    )


def q_evt_props_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured extraction: pull a typed field out of the JSON
    ``props`` payload per event, then roll up by (event_type, field
    decile) — the schema-on-read pattern every event table with a
    free-form properties bag needs.

    Plan (100 TB): ``get_json_object`` evaluates inside whole-stage
    codegen per row (no Python, no UDF); the rollup is one map-side
    partial + one shuffle on the tiny group key.  At scale, promote
    hot JSON fields to real columns at ingest (this query is exactly
    the promotion candidate census); DuckDB mirrors with
    ``json_extract``."""
    ev = load_events(spark, sf_dir)
    k = F.get_json_object("props", "$.k").cast("long")
    return (
        ev.select("event_type", k.alias("k"), "value")
        .groupBy("event_type", (F.col("k") - F.col("k") % 10).alias("k_decile"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            _r6(F.sum("value"), 6).alias("sum_value"),
            F.min("k").cast("long").alias("k_min"),
            F.max("k").cast("long").alias("k_max"),
        )
    )


HOUR_US = 3_600_000_000


def q_evt_zorder_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Morton/Z-order key over (user_id, hour index) — the sort key a
    ``rewrite_data_files`` Z-order compaction clusters event data by so
    per-dir min/max bounds prune 2-D box probes (user range AND time
    range) on BOTH columns; see blink_spark/zorder.py and the layout
    A/B in tests/test_checkpoint_snapshots.py.  Pure 64-bit bitwise
    ladder, bit-identical across engines — the kernel itself sits under
    the hash gate here."""
    from blink_spark import zorder

    ev = load_events(spark, sf_dir)
    us = ts_us_col()
    hour_idx = (us - us % HOUR_US) / HOUR_US
    return ev.select(
        "event_id",
        "user_id",
        hour_idx.cast("long").alias("hour_idx"),
        zorder.morton_col(F.col("user_id"), hour_idx.cast("long")).alias(
            "zkey"
        ),
    )


def q_evt_sketch_accuracy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100-TB sketch swap, made verifiable: per event_type, the
    exact distinct-user count and exact p50/p99 (oracle-comparable
    value-for-value) PLUS booleans asserting Spark's mergeable sketches
    — ``approx_count_distinct`` (HyperLogLog++, default rsd 5%) and
    ``approx_percentile`` (KLL-style, accuracy 10000 → rank error
    ≤1/10000) — land within their published error bounds on the same
    data.  The oracle states the bounds as literals, so a sketch
    regression (or an engine upgrade that breaks determinism) flips a
    hash-green row red.  Both sketches aggregate map-side and merge —
    at scale they replace the exact forms with no extra shuffle."""
    ev = load_events(spark, sf_dir)
    agg = ev.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n_events"),
        F.countDistinct("user_id").cast("long").alias("n_users_exact"),
        F.approx_count_distinct("user_id").cast("long").alias("_hll"),
        F.percentile("value", F.lit([0.5, 0.99])).alias("_ex"),
        F.percentile_approx(
            "value", F.lit([0.5, 0.99]), F.lit(10000)
        ).alias("_ap"),
    )
    hll_rel_err = F.abs(F.col("_hll") - F.col("n_users_exact")) / F.col(
        "n_users_exact"
    )
    # KLL guarantees rank error, not value error: the approx pN must sit
    # between the exact values at ranks N%±1% (comfortably wider than
    # the 1/10000 configured bound, robust to interpolation-vs-exact-
    # element differences between the two estimators)
    exact_band = F.percentile(
        "value", F.lit([0.49, 0.51, 0.98, 1.0])
    )
    band = ev.groupBy("event_type").agg(exact_band.alias("_b"))
    j = agg.join(band, "event_type")
    return j.select(
        "event_type",
        "n_events",
        "n_users_exact",
        _r6(F.element_at("_ex", 1)).alias("p50_exact"),
        _r6(F.element_at("_ex", 2)).alias("p99_exact"),
        (hll_rel_err <= F.lit(0.15)).alias("hll_within_3rsd"),
        (
            (F.element_at("_ap", 1) >= F.element_at("_b", 1))
            & (F.element_at("_ap", 1) <= F.element_at("_b", 2))
        ).alias("p50_approx_in_band"),
        (
            (F.element_at("_ap", 2) >= F.element_at("_b", 3))
            & (F.element_at("_ap", 2) <= F.element_at("_b", 4))
        ).alias("p99_approx_in_band"),
    )


def q_evt_rolling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user trailing-24 h window features (count / sum / avg of the
    user's events in the 24 h up to and including each event) — the
    RANGE-frame window primitive behind velocity/abuse features and
    trailing engagement metrics.

    Plan (100 TB): ONE shuffle keyed on ``user_id`` (high cardinality —
    never partition a running window by a low-cardinality column like
    event_type, which would serialize the corpus through a handful of
    tasks), then a sort within partitions; Spark evaluates the RANGE
    frame with a sliding two-pointer over each user's sorted events, so
    cost is O(events per user), not O(frame²).  Integer-µs frame bounds
    are bit-identical to the DuckDB oracle's ``RANGE BETWEEN n
    PRECEDING`` (both ends inclusive in both engines, pinned in
    tests/test_events.py)."""
    ev = load_events(spark, sf_dir).select(
        "event_id", "user_id", ts_us_col("ts").alias("ts_us"), "value"
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_us")
        .rangeBetween(-ATTRIB_WINDOW_US, 0)
    )
    return ev.select(
        "event_id",
        "user_id",
        "ts_us",
        F.count("*").over(w).cast("long").alias("n_24h"),
        (F.round(F.sum("value").over(w), 6) + F.lit(0.0)).alias("sum_24h"),
        (F.round(F.avg("value").over(w), 6) + F.lit(0.0)).alias("avg_24h"),
    )


def q_evt_stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream interval join under the hard oracle gate: the
    events table replayed as time-ordered micro-batches through the
    watermarked view<->purchase join must produce value-identical
    attribution pairs to one DuckDB range-join pass over the table at
    rest."""
    input_dir = _stage_stream_input(sf_dir)
    name = _run_to_memory(
        interval_join_stream(spark, input_dir, max_files_per_trigger=1),
        "append",
    )
    t = spark.table(name)
    return t.select(
        "view_event_id",
        "purchase_event_id",
        "user_id",
        (F.col("gap_s") + F.lit(0.0)).alias("gap_s"),
    )


def q_evt_stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked streaming dedup under the hard oracle gate: the
    events table replayed as micro-batches PLUS a re-delivered copy of
    the oldest chunk (an at-least-once replay) must, after
    ``dropDuplicatesWithinWatermark`` on ``event_id``, equal exactly
    the table at rest."""
    input_dir = _stage_stream_input(sf_dir, dup=True)
    name = _run_to_memory(
        dedup_stream(spark, input_dir, max_files_per_trigger=1), "append"
    )
    t = spark.table(name)
    return t.select(
        "event_id",
        "user_id",
        "event_type",
        "ts_us",
        (F.col("value") + F.lit(0.0)).alias("value"),
    )


WEEK_US = 7 * DAY_US


def q_evt_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention — the growth-analytics staple: users are
    cohorted by their first-event week, and each cell reports how many of
    that cohort were active N weeks later (plus the retained fraction).

    Plan (100 TB): first-event week is ONE shuffle on user_id (min agg);
    activity weeks are a distinct over (user, week) — combinable, same
    shuffle key family; the cohort join is user-keyed (co-partitioned
    with both aggregates, AQE reuses the exchange). The final census is a
    tiny (weeks × offsets) table; the retained fraction divides by the
    offset-0 cohort size via a window over that tiny result — nothing
    user-sized ever sits on the driver. Integer microsecond week math is
    bit-identical to the DuckDB oracle regardless of session timezone."""
    us = ts_us_col()
    ev = load_events(spark, sf_dir).select(
        "user_id", (us - us % WEEK_US).alias("week_us")  # pure int64 math
    )
    active = ev.distinct()
    first = active.groupBy("user_id").agg(F.min("week_us").alias("cohort_us"))
    cells = (
        active.join(first, "user_id")
        .groupBy(
            "cohort_us",
            ((F.col("week_us") - F.col("cohort_us")) / WEEK_US)
            .cast("long")
            .alias("week_offset"),
        )
        .agg(F.count("*").cast("long").alias("n_active"))
    )
    w = Window.partitionBy("cohort_us")
    cohort_size = F.max(
        F.when(F.col("week_offset") == 0, F.col("n_active"))
    ).over(w)
    return cells.select(
        "cohort_us",
        "week_offset",
        "n_active",
        _r6((F.col("n_active") / cohort_size).cast("double"), 6).alias(
            "retained_frac"
        ),
    )


QUERIES = {
    "evt_windowed_rollup": q_evt_windowed_rollup,
    "evt_daily_rollup": q_evt_daily_rollup,
    "evt_sessionize": q_evt_sessionize,
    "evt_asof_join": q_evt_asof_join,
    "evt_value_quantiles": q_evt_value_quantiles,
    "evt_anomaly": q_evt_anomaly,
    "evt_stream_windowed": q_evt_stream_windowed,
    "evt_stream_sessionize": q_evt_stream_sessionize,
    "evt_sketch_accuracy": q_evt_sketch_accuracy,
    "evt_zorder_key": q_evt_zorder_key,
    "evt_props_extract": q_evt_props_extract,
    "evt_funnel": q_evt_funnel,
    "evt_rolling_window": q_evt_rolling_window,
    "evt_stream_stream_join": q_evt_stream_stream_join,
    "evt_stream_dedup": q_evt_stream_dedup,
    "evt_retention_cohorts": q_evt_retention_cohorts,
}


def oracle_sqls() -> dict[str, str]:
    sql = {}
    p_cols = ",\n       ".join(
        f"round(quantile_cont(value, {p}), 6) + 0.0 AS p{int(p * 100)}"
        for p in QUANTILE_PS
    )
    sql["evt_anomaly"] = f"""
WITH hourly0 AS (
  SELECT epoch_us(time_bucket(INTERVAL '1 hour', ts)) AS bucket_us,
         event_type, count(*) AS n_events
  FROM events GROUP BY 1, 2
),
bounds AS (
  SELECT event_type, min(bucket_us) AS lo, max(bucket_us) AS hi
  FROM hourly0 GROUP BY 1
),
dense AS (
  SELECT event_type, unnest(range(lo, hi + 1, {_HOUR_US})) AS bucket_us
  FROM bounds
),
hourly AS (
  SELECT d.bucket_us, d.event_type,
         coalesce(h.n_events, 0) AS n_events
  FROM dense d LEFT JOIN hourly0 h USING (event_type, bucket_us)
),
win AS (
  SELECT bucket_us, event_type, n_events,
         count(n_events) OVER wtrail AS hist_n,
         avg(CAST(n_events AS DOUBLE)) OVER wtrail AS hist_mean,
         stddev_samp(CAST(n_events AS DOUBLE)) OVER wtrail AS hist_std
  FROM hourly
  WINDOW wtrail AS (PARTITION BY event_type ORDER BY bucket_us
                    ROWS BETWEEN {ANOM_WINDOW} PRECEDING AND 1 PRECEDING)
)
SELECT bucket_us, event_type, n_events, hist_n::BIGINT AS hist_n,
       round(hist_mean, 6) + 0.0 AS hist_mean,
       round(hist_std, 6) + 0.0 AS hist_std,
       round(z, 6) + 0.0 AS zscore,
       abs(z) >= {ANOM_Z!r} AS is_anomaly
FROM (
  SELECT *, CASE WHEN hist_std > 0 THEN (n_events - hist_mean) / hist_std
                 ELSE 0.0 END AS z
  FROM win
)
WHERE hist_n >= {ANOM_MIN_HIST}"""

    sql["evt_value_quantiles"] = f"""
SELECT event_type,
       count(*) AS n_events,
       {p_cols}
FROM events GROUP BY event_type"""

    sql["evt_retention_cohorts"] = f"""
WITH ev AS (
  SELECT DISTINCT user_id,
         epoch_us(ts) - epoch_us(ts) % {WEEK_US} AS week_us
  FROM events
),
fw AS (SELECT user_id, min(week_us) AS cohort_us FROM ev GROUP BY 1),
cells AS (
  SELECT cohort_us,
         ((week_us - cohort_us) / {WEEK_US})::BIGINT AS week_offset,
         count(*) AS n_active
  FROM ev JOIN fw USING (user_id) GROUP BY 1, 2
)
SELECT cohort_us, week_offset, n_active,
  round(n_active::DOUBLE
        / max(CASE WHEN week_offset = 0 THEN n_active END)
            OVER (PARTITION BY cohort_us), 6) + 0.0 AS retained_frac
FROM cells"""

    sql["evt_windowed_rollup"] = """
SELECT epoch_us(time_bucket(INTERVAL '1 hour', ts)) AS bucket_us,
       event_type,
       count(*) AS n_events,
       count(DISTINCT user_id) AS n_users,
       round(sum(value), 6) + 0.0 AS sum_value,
       round(avg(value), 6) + 0.0 AS avg_value,
       round(min(value), 6) + 0.0 AS min_value,
       round(max(value), 6) + 0.0 AS max_value
FROM events GROUP BY 1, 2"""

    sql["evt_daily_rollup"] = f"""
WITH hourly AS (
  SELECT epoch_us(time_bucket(INTERVAL '1 hour', ts)) AS bucket_us,
         event_type, count(*) AS n_events, sum(value) AS sum_raw,
         min(value) AS min_v, max(value) AS max_v
  FROM events GROUP BY 1, 2)
SELECT bucket_us - bucket_us % {DAY_US} AS day_us, event_type,
       CAST(sum(n_events) AS BIGINT) AS n_events,
       CAST(count(*) AS BIGINT) AS n_hours_active,
       round(sum(sum_raw), 6) + 0.0 AS sum_value,
       round(min(min_v), 6) + 0.0 AS min_value,
       round(max(max_v), 6) + 0.0 AS max_value
FROM hourly GROUP BY 1, 2"""

    sql["evt_sessionize"] = f"""
WITH e AS (SELECT user_id, epoch_us(ts) AS ts_us, value FROM events),
m AS (SELECT *, CASE WHEN lag(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us) IS NULL
        OR ts_us - lag(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us) > {SESSION_GAP_US}
        THEN 1 ELSE 0 END AS is_new FROM e),
s AS (SELECT *, CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts_us
        ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_idx FROM m)
SELECT user_id, session_idx, count(*) AS n_events,
       min(ts_us) AS session_start_us, max(ts_us) AS session_end_us,
       round((max(ts_us) - min(ts_us)) / 1000000.0, 6) + 0.0 AS duration_s,
       round(sum(value), 6) + 0.0 AS sum_value
FROM s GROUP BY 1, 2"""

    # stream/batch unification oracles: the streaming plans replay the
    # SAME table as micro-batches, so one DuckDB pass over the table at
    # rest is their exact expected output.  A hash-green row here means
    # the watermarked streaming aggregation / the stateful sessionizer
    # produced value-identical results to the batch semantics.
    sql["evt_stream_windowed"] = """
SELECT epoch_us(time_bucket(INTERVAL '1 hour', ts)) AS bucket_us,
       event_type,
       count(*) AS n_events,
       round(sum(value), 6) + 0.0 AS sum_value
FROM events GROUP BY 1, 2"""

    # identical text to evt_sessionize on purpose: closed streamed
    # sessions (+ sentinel-forced closure of the open tails) must equal
    # the batch gap-sessionization row-for-row
    sql["evt_stream_sessionize"] = sql["evt_sessionize"]

    sql["evt_funnel"] = """
WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS ts_us FROM events),
s1 AS (SELECT user_id, min(ts_us) AS t FROM e
       WHERE event_type = 'view' GROUP BY 1),
s2 AS (SELECT e.user_id, min(e.ts_us) AS t
       FROM e JOIN s1 ON e.user_id = s1.user_id
       WHERE e.event_type = 'click' AND e.ts_us > s1.t GROUP BY 1),
s3 AS (SELECT e.user_id, min(e.ts_us) AS t
       FROM e JOIN s2 ON e.user_id = s2.user_id
       WHERE e.event_type = 'purchase' AND e.ts_us > s2.t GROUP BY 1),
c AS (
  SELECT 1::BIGINT AS step, 'view' AS event_type,
         count(*)::BIGINT AS n_users FROM s1
  UNION ALL
  SELECT 2::BIGINT, 'click', count(*)::BIGINT FROM s2
  UNION ALL
  SELECT 3::BIGINT, 'purchase', count(*)::BIGINT FROM s3
)
SELECT step, event_type, n_users,
       round(n_users::DOUBLE / max(CASE WHEN step = 1 THEN n_users END)
               OVER (), 6) + 0.0 AS frac_of_step1
FROM c"""

    sql["evt_props_extract"] = """
WITH e AS (SELECT event_type,
                  CAST(json_extract(props, '$.k') AS BIGINT) AS k,
                  value
           FROM events)
SELECT event_type, k - k % 10 AS k_decile,
       count(*) AS n_events,
       round(sum(value), 6) + 0.0 AS sum_value,
       min(k) AS k_min, max(k) AS k_max
FROM e GROUP BY 1, 2"""

    from blink_spark import zorder

    hr = f"(epoch_us(ts) - epoch_us(ts) % {HOUR_US}) // {HOUR_US}"
    sql["evt_zorder_key"] = f"""
SELECT event_id, user_id,
       ({hr})::BIGINT AS hour_idx,
       {zorder.sql_morton("user_id", hr)} AS zkey
FROM events"""

    # exact columns compared value-for-value; the sketch columns are
    # error-bound BOOLEANS the oracle states as literals — a sketch
    # drifting outside its published bound flips the row red
    sql["evt_sketch_accuracy"] = """
SELECT event_type,
       count(*) AS n_events,
       count(DISTINCT user_id) AS n_users_exact,
       round(quantile_cont(value, 0.5), 6) + 0.0 AS p50_exact,
       round(quantile_cont(value, 0.99), 6) + 0.0 AS p99_exact,
       TRUE AS hll_within_3rsd,
       TRUE AS p50_approx_in_band,
       TRUE AS p99_approx_in_band
FROM events GROUP BY event_type"""

    sql["evt_rolling_window"] = f"""
WITH e AS (SELECT event_id, user_id, epoch_us(ts) AS ts_us, value
           FROM events)
SELECT event_id, user_id, ts_us,
       count(*) OVER w AS n_24h,
       round(sum(value) OVER w, 6) + 0.0 AS sum_24h,
       round(avg(value) OVER w, 6) + 0.0 AS avg_24h
FROM e
WINDOW w AS (PARTITION BY user_id ORDER BY ts_us
             RANGE BETWEEN {ATTRIB_WINDOW_US} PRECEDING AND CURRENT ROW)"""

    # the streaming interval join must equal the batch range join over
    # the table at rest (independent formulation: DuckDB evaluates the
    # inequality pair directly, Spark routes it through watermarked
    # join state)
    sql["evt_stream_stream_join"] = f"""
WITH e AS (SELECT event_id, user_id, epoch_us(ts) AS ts_us, event_type
           FROM events)
SELECT v.event_id AS view_event_id,
       p.event_id AS purchase_event_id,
       v.user_id AS user_id,
       round((p.ts_us - v.ts_us) / 1000000.0, 6) + 0.0 AS gap_s
FROM e v JOIN e p
  ON v.user_id = p.user_id
 AND v.event_type = 'view' AND p.event_type = 'purchase'
 AND p.ts_us >= v.ts_us AND p.ts_us <= v.ts_us + {ATTRIB_WINDOW_US}"""

    # dedup of the replayed-duplicates stream == the table at rest
    sql["evt_stream_dedup"] = """
SELECT event_id, user_id, event_type, epoch_us(ts) AS ts_us,
       round(value, 6) + 0.0 AS value
FROM events"""

    # independent formulation on purpose: DuckDB's native ASOF JOIN
    # cross-checks the union-and-window implementation.  (user_id, ts)
    # is unique at every sf, so the ASOF match is deterministic.
    sql["evt_asof_join"] = """
WITH v AS (SELECT user_id, epoch_us(ts) AS ts_us, event_id FROM events
           WHERE event_type = 'view'),
p AS (SELECT user_id, epoch_us(ts) AS ts_us, event_id FROM events
      WHERE event_type = 'purchase')
SELECT p.event_id AS purchase_event_id, p.user_id AS user_id,
       coalesce(v.event_id, -1) AS view_event_id,
       round(CASE WHEN v.event_id IS NULL THEN -1.0
             ELSE (p.ts_us - v.ts_us) / 1000000.0 END, 6) + 0.0 AS gap_s
FROM p ASOF LEFT JOIN v ON p.user_id = v.user_id AND v.ts_us <= p.ts_us"""
    return sql
