"""Custom stateful streaming operators (B9 — beyond the built-ins).

The batch engine's gapfill/interpolate pair (``q_ts_gapfill``,
``q_ts_interpolate``) has a natural streaming twin: per-key ordered
state that closes each observation interval as soon as its right
endpoint arrives. ``interpolate_stream`` implements it with
``applyInPandasWithState`` — the arbitrary-stateful-op API the
reference's transform hook would feed [SURVEY §2 A13] — keeping
per-key state BOUNDED (one (minute, value) pair per key) and per-
record output bounded by ``max_gap_minutes``.

Semantics vs the batch operator (deliberate, causal): a minute grid
point is emitted only once the NEXT observation closes its interval —
linear interpolation needs both endpoints, so a stream can only emit
interior points (no leading/trailing extrapolation, which the batch
pass back-/forward-fills). Rows arriving at or before the state's
watermark minute are dropped as late — upstream event-time
watermarking (``FrSource`` + ``withWatermark``) is what makes that
drop correct, mirroring Spark's own late-data discipline.

Scale shape: state is O(keys) with a constant payload (contrast
buffering whole partitions); each input row does O(gap) work capped
by ``max_gap_minutes`` (a reconnect after an outage does not emit an
unbounded grid); shuffle is the one hash exchange on the state key
that every stateful op pays.
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame

OUTPUT_SCHEMA = "key string, mi bigint, value double, kind string"
STATE_SCHEMA = "pm bigint, pv double"


def interpolate_stream(
    obs: DataFrame,
    key_col: str = "key",
    minute_col: str = "mi",
    value_col: str = "v",
    max_gap_minutes: int = 120,
    output_mode: str = "append",
) -> DataFrame:
    """Streaming linear interpolation onto a per-key minute grid.

    ``obs`` is a (possibly streaming) DataFrame of per-minute
    observations ``(key, mi, v)`` — one row per key+minute, minutes
    ascending within and across micro-batches (enforce upstream with
    a watermark + the file source's ordered replay). Emits every
    grid minute in ``(prev_mi, mi]`` per consecutive observation
    pair, linearly interpolated, tagged ``kind`` = 'obs' (right
    endpoint — the observation itself) or 'interp'; the first
    observation of a key is emitted as 'obs' with no fill. Gaps
    wider than ``max_gap_minutes`` emit the endpoints only (bounded
    fan-out; the batch pass is the backfill tool for outages).
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def fill(key, pdfs: Iterator["pd.DataFrame"], state: GroupState):
        if state.exists:
            pm, pv = state.get
        else:
            pm, pv = None, None
        rows = pd.concat(list(pdfs), ignore_index=True)
        rows = rows.sort_values(minute_col)
        out_mi: list[int] = []
        out_v: list[float] = []
        out_kind: list[str] = []
        for mi, v in zip(rows[minute_col], rows[value_col]):
            mi = int(mi)
            v = float(v)
            if pm is None:
                out_mi.append(mi)
                out_v.append(v)
                out_kind.append("obs")
            elif mi <= pm:
                continue  # late or duplicate minute: watermark territory
            elif mi - pm > max_gap_minutes:
                out_mi.append(mi)
                out_v.append(v)
                out_kind.append("obs")  # outage: endpoints only
            else:
                for m in range(pm + 1, mi + 1):
                    frac = (m - pm) / (mi - pm)
                    out_mi.append(m)
                    out_v.append(pv + (v - pv) * frac)
                    out_kind.append("obs" if m == mi else "interp")
            pm, pv = mi, v
        if pm is not None:
            state.update((pm, pv))
        yield pd.DataFrame(
            {
                "key": [str(key[0])] * len(out_mi),
                "mi": out_mi,
                "value": out_v,
                "kind": out_kind,
            }
        )

    return obs.groupBy(key_col).applyInPandasWithState(
        fill,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode=output_mode,
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


#: Default output shape (``key_col``/``id_col`` defaults); the actual
#: schema is built from the caller's column names — see
#: ``_session_output_schema``.
SESSION_OUTPUT_SCHEMA = (
    "user_id bigint, event_id bigint, session_seq int, seq_in_session int"
)
SESSION_STATE_SCHEMA = "last_us bigint, session_seq int, seq int"


def _session_output_schema(key_col: str, id_col: str) -> str:
    return f"{key_col} bigint, {id_col} bigint, session_seq int, seq_in_session int"


def sessionize_stream(
    events: DataFrame,
    gap_minutes: int = 30,
    key_col: str = "user_id",
    ts_col: str = "ts_us",
    id_col: str = "event_id",
    output_mode: str = "append",
) -> DataFrame:
    """Streaming per-event sessionization — the stateful twin of the
    batch ``q_events_sessionize`` (operators/analytics.py): tag every
    event with its session ordinal and position within the session,
    where a session breaks after ``gap_minutes`` of inactivity (the
    same half-open boundary: an event at exactly ``prev + gap``
    starts a new session).

    This is the third ``applyInPandasWithState`` genre, closing the
    batch ≡ stream equivalence family: interval-close
    (``interpolate_stream``), state machine (``alert_stream``), and
    now running per-key counters. Unlike ``session_window`` (the
    built-in, which can only emit per-SESSION aggregates after the
    watermark closes a session), the per-event tag is emitted
    immediately — each row needs only the previous event's timestamp,
    so the state is three numbers per key and output latency is one
    micro-batch, not one watermark delay.

    ``events`` carries ``(user_id, event_id, ts_us)`` with event time
    as epoch MICROSECONDS (integer cross-engine discipline —
    ``unix_micros`` upstream); rows must replay in event-time order
    per key across micro-batches (watermark + ordered source, the
    module contract), and are sorted by ``(ts_us, event_id)`` within
    each batch — the batch window's exact total order, so ties are
    tagged identically.

    Scale shape: the one key-hash exchange every stateful op pays,
    O(1) state per key (three numbers — contrast ``session_window``'s
    open-session buffers), output exactly one row per input row.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    gap_us = gap_minutes * 60_000_000

    def tag(key, pdfs: Iterator["pd.DataFrame"], state: GroupState):
        if state.exists:
            last_us, sess, seq = state.get
        else:
            last_us, sess, seq = None, 0, 0
        rows = pd.concat(list(pdfs), ignore_index=True).sort_values(
            [ts_col, id_col]
        )
        out_id: list[int] = []
        out_sess: list[int] = []
        out_seq: list[int] = []
        for ts_us, eid in zip(rows[ts_col], rows[id_col]):
            ts_us, eid = int(ts_us), int(eid)
            if last_us is not None and ts_us < last_us:
                # strictly late (behind state): watermark territory —
                # emitting it would move last_us BACKWARD and corrupt
                # every subsequent gap comparison; equal timestamps
                # are legitimate ties and pass through (the batch
                # window's (ts, event_id) order)
                continue
            if last_us is None or ts_us >= last_us + gap_us:
                sess, seq = sess + 1, 1
            else:
                seq += 1
            last_us = ts_us
            out_id.append(eid)
            out_sess.append(sess)
            out_seq.append(seq)
        state.update((last_us if last_us is not None else 0, sess, seq))
        yield pd.DataFrame(
            {
                key_col: [int(key[0])] * len(out_id),
                id_col: out_id,
                "session_seq": out_sess,
                "seq_in_session": out_seq,
            }
        )

    return events.groupBy(key_col).applyInPandasWithState(
        tag,
        outputStructType=_session_output_schema(key_col, id_col),
        stateStructType=SESSION_STATE_SCHEMA,
        outputMode=output_mode,
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


ALERT_OUTPUT_SCHEMA = (
    "key string, opened_mi bigint, closed_mi bigint, peak double, n_points bigint"
)
#: STATE-SCHEMA COMPATIBILITY: widened from 4 to 5 fields (``last_mi``,
#: the redelivery guard) in the round-9 tree. A streaming query
#: resuming from a checkpoint written by the 4-field version will fail
#: on state deserialization — restart such queries with a FRESH
#: checkpoint directory. (Spark's state store has no schema migration
#: for applyInPandasWithState state structs.)
ALERT_STATE_SCHEMA = (
    "active boolean, opened_mi bigint, peak double, n_points bigint, "
    "last_mi bigint"
)


def alert_stream(
    obs: DataFrame,
    hi: float,
    lo: float,
    key_col: str = "key",
    minute_col: str = "mi",
    value_col: str = "v",
    output_mode: str = "append",
) -> DataFrame:
    """Streaming threshold alerting with HYSTERESIS: per key, an
    alert episode OPENS when the value crosses above ``hi`` and
    CLOSES only when it falls below ``lo`` (< hi) — the two-level
    rule that stops a value oscillating around one threshold from
    flapping an alert per sample. Emits one row per CLOSED episode
    (opened/closed minute, peak value, points in episode).

    This is the state-machine genre ``interpolate_stream``'s
    interval-close genre doesn't cover: state is the machine's
    current mode plus episode accumulators — (active, opened_mi,
    peak, n_points), CONSTANT per key — and transitions are driven
    by event-time-ordered observations. A still-open episode stays
    in state across micro-batches until its close crossing arrives
    (or forever — unclosed episodes are live alerts, not output).

    Scale shape: one hash exchange on the key, O(1) state per key,
    output bounded by closed episodes. The batch equivalent of the
    same rule is a gaps-and-islands pass; tests assert the stream
    reproduces it exactly across trigger boundaries.

    Checkpoint compatibility: the state struct gained ``last_mi`` in
    the round-9 tree (see ``ALERT_STATE_SCHEMA``) — checkpoints
    written by the 4-field version cannot be resumed; restart fresh.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def step(key, pdfs, state: GroupState):
        if state.exists:
            active, opened, peak, n, last_mi = state.get
        else:
            active, opened, peak, n, last_mi = False, 0, 0.0, 0, None
        rows = pd.concat(list(pdfs), ignore_index=True).sort_values(minute_col)
        out = {"opened_mi": [], "closed_mi": [], "peak": [], "n_points": []}
        for mi, v in zip(rows[minute_col], rows[value_col]):
            mi, v = int(mi), float(v)
            if last_mi is not None and mi <= last_mi:
                # late or redelivered minute: the machine already
                # transitioned past it — processing it again would
                # double-count n_points or transition on stale data
                # (watermark territory, the interpolate_stream rule;
                # the feed is one row per (key, minute), so equality
                # is always a duplicate here)
                continue
            last_mi = mi
            if not active:
                if v > hi:
                    active, opened, peak, n = True, mi, v, 1
            else:
                n += 1
                peak = max(peak, v)
                if v < lo:
                    out["opened_mi"].append(opened)
                    out["closed_mi"].append(mi)
                    out["peak"].append(peak)
                    out["n_points"].append(n)
                    active, opened, peak, n = False, 0, 0.0, 0
        state.update(
            (active, opened, peak, n, last_mi if last_mi is not None else -1)
        )
        k = str(key[0])
        yield pd.DataFrame({"key": [k] * len(out["opened_mi"]), **out})

    return obs.groupBy(key_col).applyInPandasWithState(
        step,
        outputStructType=ALERT_OUTPUT_SCHEMA,
        stateStructType=ALERT_STATE_SCHEMA,
        outputMode=output_mode,
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
