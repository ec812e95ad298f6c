"""Event-stream operators: batch/stream parity for the windowed rollup
and the stateful sessionizer, as-of join edge semantics, and
timezone-independence of the epoch-microsecond conversion.  (Oracle
parity for the four batch queries is covered by test_entry_contract.)"""

from __future__ import annotations

import os
import sys
import time

import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from blink_spark import events

SF_DIR = "/root/testdata/sf0.001"


def _rows(df, ndigits=6):
    out = []
    for r in df.collect():
        out.append(
            tuple(
                round(v, ndigits) if isinstance(v, float) else v for v in r
            )
        )
    return sorted(out)


def _write_ordered_chunks(tmp_path, n_chunks=3):
    """Split the events table into time-ordered parquet chunks with
    strictly increasing mtimes (the file source processes in mtime
    order under maxFilesPerTrigger=1)."""
    pdf = pd.read_parquet(f"{SF_DIR}/events.parquet").sort_values("ts")
    input_dir = str(tmp_path / "evt_in")
    os.makedirs(input_dir)
    k = len(pdf) // n_chunks
    for i in range(n_chunks):
        lo = i * k
        hi = len(pdf) if i == n_chunks - 1 else (i + 1) * k
        p = os.path.join(input_dir, f"chunk{i}.parquet")
        pdf.iloc[lo:hi].to_parquet(p, index=False)
        os.utime(p, (time.time() + i, time.time() + i))
    return input_dir, pdf


def test_windowed_stream_matches_batch(spark, tmp_path):
    input_dir, _ = _write_ordered_chunks(tmp_path)
    stream_df = events.windowed_counts_stream(spark, input_dir)
    q = (
        stream_df.writeStream.format("memory")
        .queryName("evt_win_stream")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    assert not q.isActive

    got = _rows(spark.table("evt_win_stream"))
    expected = _rows(events.windowed_counts(spark.read.parquet(input_dir)))
    assert got == expected
    assert len(got) > 0


def test_sessionize_stream_emits_closed_sessions(spark, tmp_path):
    input_dir, _ = _write_ordered_chunks(tmp_path)
    # maxFilesPerTrigger is a SOURCE option: one chunk per micro-batch,
    # so the cross-batch carry path actually runs; flush_idle=False opts
    # out of the timeout default for exact closed-by-a-later-event
    # emission semantics on this ordered replay
    stream_df = events.sessionize_stream(
        spark, input_dir, flush_idle=False, max_files_per_trigger=1
    )
    q = (
        stream_df.writeStream.format("memory")
        .queryName("evt_sess_stream")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    assert not q.isActive

    got = _rows(spark.table("evt_sess_stream"))

    # streaming emits exactly the CLOSED sessions: batch result minus
    # each user's final (still-open) session
    batch = events.sessionize(spark.read.parquet(input_dir))
    pdf = batch.toPandas()
    last_idx = pdf.groupby("user_id")["session_idx"].transform("max")
    closed = pdf[pdf["session_idx"] < last_idx]
    expected = sorted(
        tuple(
            round(v, 6) if isinstance(v, float) else int(v)
            for v in row
        )
        for row in closed.itertuples(index=False)
    )
    assert got == expected
    assert len(got) > 0


def test_sessionize_stream_flush_idle_times_out_open_sessions(spark, tmp_path):
    """With flush_idle, sessions idle past the watermark are flushed by the
    event-time timeout.  Every emitted row must still be an exact row of the
    batch result (same idx/bounds/sums — the timeout changes WHEN a session
    is emitted, never WHAT), and the set must cover at least all sessions a
    later event closes."""
    input_dir, _ = _write_ordered_chunks(tmp_path)
    stream_df = events.sessionize_stream(
        spark, input_dir, flush_idle=True, watermark="0 seconds",
        max_files_per_trigger=1,
    )
    q = (
        stream_df.writeStream.format("memory")
        .queryName("evt_sess_flush")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    assert not q.isActive

    got = set(_rows(spark.table("evt_sess_flush")))
    pdf = events.sessionize(spark.read.parquet(input_dir)).toPandas()
    batch_rows = {
        tuple(round(v, 6) if isinstance(v, float) else int(v) for v in row)
        for row in pdf.itertuples(index=False)
    }
    last_idx = pdf.groupby("user_id")["session_idx"].transform("max")
    closed_by_event = {
        tuple(round(v, 6) if isinstance(v, float) else int(v) for v in row)
        for row in pdf[pdf["session_idx"] < last_idx].itertuples(index=False)
    }
    assert got <= batch_rows
    assert got >= closed_by_event
    assert len(got) > len(closed_by_event)  # the timeout actually fired


def test_sessionize_stream_default_flushes_idle_and_absorbs_late_rows(
    spark, tmp_path
):
    """The DEFAULT sessionizer (flush_idle=True) on a disordered replay,
    both late-data regimes pinned:

    - watermark delay 24h (bounded disorder ADMITTED): the out-of-order
      row behind the carried tail is delivered, folds into the open
      session, and must NOT regress its end bound; the idle user's
      session is flushed once the watermark passes its gap; users whose
      gap has not elapsed stay open (nothing emitted, state held).
    - watermark delay 0s (disorder EXCLUDED): the same row is behind the
      watermark, so the stateful operator's late-data filter drops it
      before the state function, and the idle flush emits the untouched
      2-event session.

    availableNow runs one final timeout-only micro-batch after the last
    file — that is what fires the idle flushes."""
    import pandas as pd

    T0 = pd.Timestamp("2024-01-01 00:00:00")
    MIN, H = pd.Timedelta("1 minute"), pd.Timedelta("1 hour")

    def mk(rows):
        return pd.DataFrame(
            [
                {
                    "event_id": i,
                    "ts": ts,
                    "user_id": u,
                    "event_type": "view",
                    "value": 1.0,
                    "props": "{}",
                }
                for i, (u, ts) in enumerate(rows)
            ]
        )

    chunks = [
        mk([(1, T0), (1, T0 + 10 * MIN), (2, T0)]),
        mk([(2, T0 + 24 * H)]),  # advances the watermark past u1's gap
        # u3 advances further; u1's row is OUT-OF-ORDER (behind the
        # carried tail's last event at T0+10min)
        mk([(3, T0 + 48 * H), (1, T0 + 5 * MIN)]),
    ]
    input_dir = str(tmp_path / "in")
    os.makedirs(input_dir)
    now = time.time()
    for i, c in enumerate(chunks):
        p = os.path.join(input_dir, f"c{i}.parquet")
        c.to_parquet(p, index=False, coerce_timestamps="us")
        os.utime(p, (now + i, now + i))

    us = lambda t: int(t.value // 1_000)  # noqa: E731

    def run(watermark, name):
        q = (
            events.sessionize_stream(
                spark, input_dir, watermark=watermark, max_files_per_trigger=1
            )
            .writeStream.format("memory")
            .queryName(name)
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
        assert not q.isActive
        return sorted(tuple(r) for r in spark.table(name).collect())

    # bounded disorder admitted: wm lags 24h, so T0+5min is on time
    got = run("24 hours", "evt_sess_late_admit")
    assert got == sorted(
        [
            # late row folded in (n=3); end stays T0+10min, NOT T0+5min
            (1, 1, 3, us(T0), us(T0 + 10 * MIN), 600.0, 3.0),
            # u2 idx1 closed by the 24h-later event; u2's tail and u3
            # are within watermark+gap -> held open, nothing emitted
            (2, 1, 1, us(T0), us(T0), 0.0, 1.0),
        ]
    )

    # zero delay: the T0+5min row is late -> dropped before the state fn
    got = run("0 seconds", "evt_sess_late_drop")
    assert got == sorted(
        [
            (1, 1, 2, us(T0), us(T0 + 10 * MIN), 600.0, 2.0),
            (2, 1, 1, us(T0), us(T0), 0.0, 1.0),
            # u2's tail flushed too: wm reaches T0+48h > T0+24h+gap
            (2, 2, 1, us(T0 + 24 * H), us(T0 + 24 * H), 0.0, 1.0),
        ]
    )


class _FakeState:
    """Minimal stand-in for the GroupState handle so the vectorized state
    function can be pinned branch-by-branch without a streaming query."""

    def __init__(self, tup=None):
        self._tup = tup

    @property
    def exists(self):
        return self._tup is not None

    @property
    def get(self):
        return self._tup

    def update(self, tup):
        self._tup = tup


def _run_batch(state, rows):
    pdf = pd.DataFrame(rows, columns=["ts_us", "value"])
    (out,) = list(events._sessionize_state_func((7,), iter([pdf]), state))
    return [tuple(r) for r in out.itertuples(index=False)]


def test_sessionize_state_func_carry_branches():
    gap = events.SESSION_GAP_US

    # batch 1: two sessions; the second stays open in state
    st = _FakeState()
    out = _run_batch(st, [(0, 1.0), (10, 2.0), (gap + 20, 4.0)])
    assert out == [(7, 1, 2, 0, 10, round(10 / 1e6, 6), 3.0)]
    assert st.get == (gap + 20, gap + 20, 1, 4.0, 1)

    # batch 2 continues the carry (small gap) then closes it mid-batch
    out = _run_batch(st, [(gap + 30, 1.0), (3 * gap, 8.0)])
    assert out == [(7, 2, 2, gap + 20, gap + 30, round(10 / 1e6, 6), 5.0)]
    assert st.get == (3 * gap, 3 * gap, 1, 8.0, 2)

    # batch 3 opens with a big gap: the carry closes as-is first
    out = _run_batch(st, [(5 * gap, 16.0)])
    assert out == [(7, 3, 1, 3 * gap, 3 * gap, 0.0, 8.0)]
    assert st.get == (5 * gap, 5 * gap, 1, 16.0, 3)

    # empty batch: state untouched, nothing emitted
    (out,) = list(events._sessionize_state_func((7,), iter([]), st))
    assert len(out) == 0
    assert st.get == (5 * gap, 5 * gap, 1, 16.0, 3)


def test_asof_sentinel_and_tie_semantics(spark):
    # user 1: purchase before any view -> sentinel; then a view at the
    # EXACT purchase timestamp -> counts (<= semantics, gap 0); then a
    # later purchase picks the latest of two earlier views.
    rows = [
        (1, 1, "2024-01-01 00:00:10", "purchase", 1.0),
        (2, 1, "2024-01-01 00:01:00", "view", 1.0),
        (3, 1, "2024-01-01 00:01:00", "purchase", 1.0),
        (4, 1, "2024-01-01 00:02:00", "view", 1.0),
        (5, 1, "2024-01-01 00:03:00", "purchase", 1.0),
        (6, 2, "2024-01-01 00:00:01", "purchase", 1.0),
    ]
    ev = spark.createDataFrame(
        [(i, ts, u, t, v) for (i, u, ts, t, v) in rows],
        "event_id long, ts_s string, user_id long, event_type string, value double",
    ).select(
        "event_id",
        F_to_ntz("ts_s").alias("ts"),
        "user_id",
        "event_type",
        "value",
    )
    got = {
        r["purchase_event_id"]: (r["view_event_id"], r["gap_s"])
        for r in events.asof_latest_view(ev).collect()
    }
    assert got[1] == (-1, -1.0)   # no prior view
    assert got[3] == (2, 0.0)     # same-timestamp view counts
    assert got[5] == (4, 60.0)    # latest of the two earlier views
    assert got[6] == (-1, -1.0)   # user with no views at all


def F_to_ntz(colname):
    from pyspark.sql import functions as F

    return F.to_timestamp_ntz(F.col(colname), F.lit("yyyy-MM-dd HH:mm:ss"))


def test_sessionize_edges(spark):
    from pyspark.sql import functions as F

    # empty input
    empty = spark.createDataFrame([], events.EVENTS_SCHEMA)
    out = events.sessionize(empty)
    assert out.count() == 0
    assert out.columns == [
        "user_id",
        "session_idx",
        "n_events",
        "session_start_us",
        "session_end_us",
        "duration_s",
        "sum_value",
    ]

    # one event -> one session of one event, duration 0
    one = spark.createDataFrame(
        [(1, "2024-01-01 00:00:00", 7, "view", 2.5, "{}")],
        "event_id long, ts_s string, user_id long, event_type string, value double, props string",
    ).select(
        "event_id",
        F_to_ntz("ts_s").alias("ts"),
        "user_id",
        "event_type",
        "value",
        "props",
    )
    r = events.sessionize(one).collect()[0]
    assert (r["user_id"], r["session_idx"], r["n_events"]) == (7, 1, 1)
    assert r["duration_s"] == 0.0 and r["sum_value"] == 2.5

    # boundary: gap == SESSION_GAP_S does NOT split; gap just over does
    two = spark.createDataFrame(
        [
            (1, "2024-01-01 00:00:00", 1, "view", 1.0, "{}"),
            (2, "2024-01-01 08:00:00", 1, "view", 1.0, "{}"),
            (3, "2024-01-01 16:00:01", 1, "view", 1.0, "{}"),
        ],
        "event_id long, ts_s string, user_id long, event_type string, value double, props string",
    ).select(
        "event_id",
        F_to_ntz("ts_s").alias("ts"),
        "user_id",
        "event_type",
        "value",
        "props",
    )
    got = sorted(
        (r["session_idx"], r["n_events"])
        for r in events.sessionize(two).collect()
    )
    assert got == [(1, 2), (2, 1)]


def test_rollup_timezone_independent(spark):
    """The epoch-us conversion must not depend on the harness session
    timezone (the driver builds its own SparkSession, whose timezone we
    don't control)."""
    old = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    try:
        df = events.hourly_rollup(events.load_events(spark, SF_DIR))
        first = df.orderBy("bucket_us").first()
        # 2024-01-01 00:00:00 wall clock == 1704067200000000 epoch us
        assert first["bucket_us"] == 1_704_067_200_000_000
    finally:
        spark.conf.set("spark.sql.session.timeZone", old)


def test_retention_cohorts_sparse_fixture(spark, monkeypatch):
    from pyspark.sql import functions as F

    # Two cohorts: users 1,2 start week 0 (1=retained through wk2,
    # 2=churns after wk0); user 3 starts week 1 and stays through wk2.
    rows = [
        (1, "2024-01-01 00:00:00", 1),
        (2, "2024-01-02 00:00:00", 2),
        (3, "2024-01-08 12:00:00", 1),   # user 1, week 1
        (4, "2024-01-16 00:00:00", 1),   # user 1, week 2
        (5, "2024-01-10 00:00:00", 3),   # user 3 first seen week 1
        (6, "2024-01-17 00:00:00", 3),   # user 3, week 2
    ]
    df = spark.createDataFrame(
        [(i, ts, u, "view", 1.0, "{}") for i, ts, u in rows],
        "event_id long, ts_s string, user_id long, event_type string, "
        "value double, props string",
    ).select(
        "event_id", F_to_ntz("ts_s").alias("ts"), "user_id",
        "event_type", "value", "props",
    )
    monkeypatch.setattr(events, "load_events", lambda _s, _d: df)
    out = {
        (r.cohort_us, r.week_offset): (r.n_active, r.retained_frac)
        for r in events.q_evt_retention_cohorts(spark, "x").collect()
    }
    wk = events.WEEK_US
    c0 = (1704067200000000 // wk) * wk  # week containing 2024-01-01
    c1 = c0 + wk
    assert out[(c0, 0)] == (2, 1.0)
    assert out[(c0, 1)] == (1, 0.5)
    assert out[(c0, 2)] == (1, 0.5)
    assert out[(c1, 0)] == (1, 1.0)
    assert out[(c1, 1)] == (1, 1.0)
    assert set(out) == {(c0, 0), (c0, 1), (c0, 2), (c1, 0), (c1, 1)}


def test_interval_join_stream_matches_batch_range_join(spark, tmp_path):
    """The watermarked stream-stream interval join over time-ordered
    micro-batches equals the batch range join of the table at rest —
    including pairs that span micro-batch boundaries (view in chunk i,
    purchase in chunk i+1), which exercises the cross-batch join
    state."""
    input_dir, pdf = _write_ordered_chunks(tmp_path)
    stream_df = events.interval_join_stream(
        spark, input_dir, max_files_per_trigger=1
    )
    q = (
        stream_df.writeStream.format("memory")
        .queryName("evt_ssj_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    assert not q.isActive

    got = _rows(spark.table("evt_ssj_stream"))

    # independent batch expectation in pandas
    v = pdf[pdf.event_type == "view"][["event_id", "user_id", "ts"]]
    p = pdf[pdf.event_type == "purchase"][["event_id", "user_id", "ts"]]
    m = v.merge(p, on="user_id", suffixes=("_v", "_p"))
    m = m[
        (m.ts_p >= m.ts_v)
        & (m.ts_p <= m.ts_v + pd.Timedelta(microseconds=events.ATTRIB_WINDOW_US))
    ]
    expected = sorted(
        (
            int(r.event_id_v),
            int(r.event_id_p),
            int(r.user_id),
            round((r.ts_p - r.ts_v).total_seconds(), 6) + 0.0,
        )
        for r in m.itertuples()
    )
    assert got == expected
    assert len(got) > 0
    # pairs crossing a chunk boundary actually occurred (the state carry
    # was exercised, not just intra-batch matches)
    k = len(pdf) // 3
    chunk_of = {
        int(e): min(i // k, 2) for i, e in enumerate(pdf["event_id"])
    }
    assert any(chunk_of[ve] != chunk_of[pe] for ve, pe, _, _ in got)


def test_dedup_stream_drops_redelivered_chunk(spark, tmp_path):
    """dropDuplicatesWithinWatermark: replaying the oldest chunk after
    the stream has advanced (an at-least-once re-delivery) must yield
    exactly one row per event_id — the table at rest."""
    input_dir, pdf = _write_ordered_chunks(tmp_path)
    # re-deliver chunk0 with the LATEST mtime (arrives last)
    k = len(pdf) // 3
    dup = os.path.join(input_dir, "chunk0_redelivered.parquet")
    pdf.iloc[:k].to_parquet(dup, index=False)
    os.utime(dup, (time.time() + 10, time.time() + 10))

    stream_df = events.dedup_stream(spark, input_dir, max_files_per_trigger=1)
    q = (
        stream_df.writeStream.format("memory")
        .queryName("evt_dedup_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    assert not q.isActive

    got = spark.table("evt_dedup_stream")
    ids = [r.event_id for r in got.select("event_id").collect()]
    assert len(ids) == len(pdf)          # every original event survives
    assert len(set(ids)) == len(ids)     # exactly once


def test_rolling_window_frame_bounds_inclusive(spark):
    """RANGE frame semantics pinned on a constructed edge: an event
    EXACTLY 24 h older is inside the frame; one microsecond older is
    out.  (Both engines treat RANGE bounds as inclusive — this is the
    contract the DuckDB oracle relies on.)"""
    import pandas as pd

    base = 1_700_000_000_000_000
    w = events.ATTRIB_WINDOW_US
    pdf = pd.DataFrame(
        {
            "event_id": [1, 2, 3, 4],
            "user_id": [7, 7, 7, 8],
            "ts": pd.to_datetime(
                [base - w - 1, base - w, base, base], unit="us"
            ),
            "event_type": ["view"] * 4,
            "value": [100.0, 10.0, 1.0, 5.0],
            "props": ["{}"] * 4,
        }
    )
    sdf = spark.createDataFrame(pdf)
    import blink_spark.events as ev_mod

    orig = ev_mod.load_events
    try:
        ev_mod.load_events = lambda s, d: sdf
        out = {
            r.event_id: (r.n_24h, r.sum_24h)
            for r in ev_mod.q_evt_rolling_window(spark, "ignored").collect()
        }
    finally:
        ev_mod.load_events = orig
    # event 3's frame: event 2 (exactly 24h older, IN) but not event 1
    # (24h + 1us older, OUT); event 4 is another user entirely
    assert out[3] == (2, 11.0)
    assert out[1] == (1, 100.0)
    assert out[4] == (1, 5.0)


def test_anomaly_matches_pandas_replay(spark):
    """evt_anomaly must equal a pandas replay of the trailing z-score over
    the DENSIFIED hourly census (zero-filled per type over its bucket
    span; independent window implementation), and the flag discipline
    must hold: cold-start rows absent, hist_n bounded by the window,
    anomaly <=> |z| >= ANOM_Z on the unrounded score."""
    pdf = pd.read_parquet(f"{SF_DIR}/events.parquet")
    pdf["bucket"] = pdf["ts"].dt.floor("h")
    hourly = (
        pdf.groupby(["event_type", "bucket"], as_index=False)
        .agg(n_events=("event_id", "size"))
        .sort_values(["event_type", "bucket"])
    )
    expected = {}
    for et, g in hourly.groupby("event_type"):
        # independent densify: zero-fill the type's hourly span
        g = (
            g.set_index("bucket")
            .reindex(
                pd.date_range(
                    g["bucket"].min(), g["bucket"].max(), freq="h"
                ),
                fill_value=0,
            )
            .rename_axis("bucket")
            .reset_index()
        )
        counts = g["n_events"].tolist()
        buckets = g["bucket"].tolist()
        for i in range(len(counts)):
            hist = counts[max(0, i - events.ANOM_WINDOW): i]
            if len(hist) < events.ANOM_MIN_HIST:
                continue
            mean = sum(hist) / len(hist)
            var = sum((x - mean) ** 2 for x in hist) / (len(hist) - 1)
            std = var ** 0.5
            z = (counts[i] - mean) / std if std > 0 else 0.0
            us = int(buckets[i].value // 1000)
            expected[(et, us)] = (counts[i], len(hist), mean, std, z)

    got = events.q_evt_anomaly(spark, SF_DIR).collect()
    assert len(got) == len(expected)
    for r in got:
        n, hn, mean, std, z = expected[(r.event_type, r.bucket_us)]
        assert r.n_events == n
        assert r.hist_n == hn
        assert hn <= events.ANOM_WINDOW
        assert abs(r.hist_mean - mean) < 2e-6
        assert abs(r.hist_std - std) < 2e-6
        assert abs(r.zscore - z) < 2e-6
        assert r.is_anomaly == (abs(z) >= events.ANOM_Z)


def test_anomaly_flags_silent_hour(spark):
    """A zero-volume hour inside a type's active span must itself be
    judged — and with a steady baseline, FLAGGED (dead-stream page).
    Also pins densify semantics: the gap hour enters later baselines as
    a real 0, and the span never extends past the type's lifetime."""
    hr = events._HOUR_US
    # steady-but-jittered volume (constant would hit the std=0 guard and
    # z-score the gap to 0 — the guard is for flat streams, not silence)
    census = spark.createDataFrame(
        [(i * hr, "api", 100 + i % 5) for i in range(30) if i != 25],
        "bucket_us long, event_type string, n_events long",
    )
    out = {
        r.bucket_us: r
        for r in events.anomaly_verdicts(
            events.densify_hourly(census)
        ).collect()
    }
    silent = out[25 * hr]
    assert silent.n_events == 0
    assert silent.is_anomaly and silent.zscore < -events.ANOM_Z
    # steady hours before the gap are unflagged; the hour after the gap
    # has the 0 in its baseline (std > 0) but is itself normal
    assert not out[24 * hr].is_anomaly
    after = out[26 * hr]
    assert after.hist_std > 0 and not after.is_anomaly
    # verdicts never extend past the type's observed span
    assert max(out) == 29 * hr and min(out) == events.ANOM_MIN_HIST * hr
