"""Stream-shaped operators over the events log (SURVEY.md §2.10 note).

Ray Data has no event-time windowing; these express the standard shapes as
groupby(key).map_groups over ts-sorted groups (per the engine's ordering
assumption: events are processed per-key in timestamp order; keys are
independent). All outputs are deterministic and SQL-expressible, so each op
carries a DuckDB oracle in the query registry.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ray.data import Dataset

US_PER_HOUR = 3_600_000_000


def sessionize(
    events: Dataset,
    gap_us: int = US_PER_HOUR,
    key: str = "user_id",
    ts: str = "ts",
) -> Dataset:
    """Session windows: consecutive events of a key belong to one session
    while gaps stay ≤ gap_us. Output: (user_id, session_id [1-based per
    user], n_events, start_us, end_us)."""

    def per_user(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([ts, "event_id"])
        t = g[ts].astype("int64").to_numpy()  # µs epoch
        new = np.ones(t.size, dtype=np.int64)
        new[1:] = (t[1:] - t[:-1] > gap_us).astype(np.int64)
        sid = np.cumsum(new)
        df = pd.DataFrame({key: g[key].to_numpy(), "session_id": sid, "_t": t})
        out = (
            df.groupby("session_id", sort=True)
            .agg(
                n_events=("_t", "size"),
                start_us=("_t", "min"),
                end_us=("_t", "max"),
            )
            .reset_index()
        )
        out[key] = g[key].iloc[0]
        return out[[key, "session_id", "n_events", "start_us", "end_us"]]

    schema = pa.schema(
        [
            (key, pa.int64()),
            ("session_id", pa.int64()),
            ("n_events", pa.int64()),
            ("start_us", pa.int64()),
            ("end_us", pa.int64()),
        ]
    )
    return (
        events.select_columns([key, ts, "event_id"])
        .groupby(key)
        .map_groups(per_user, batch_format="pandas")
        .map_batches(
            lambda b: b.cast(schema) if b.num_columns else schema.empty_table(),
            batch_format="pyarrow",
            batch_size=None,
        )
    )


def sliding_hourly_counts(
    events: Dataset, window_hours: int = 3, key: str = "event_type", ts: str = "ts"
) -> Dataset:
    """Sliding window (size = window_hours, stride = 1h): for every hour
    bucket that has events, the event count over [hour-window+1, hour].
    Output: (event_type, hour, n_window)."""

    def per_key(g: pd.DataFrame) -> pd.DataFrame:
        t = g[ts].astype("int64").to_numpy()
        hours = t // US_PER_HOUR
        uniq, cnt = np.unique(hours, return_counts=True)
        # prefix sums over the sparse hour counts
        n_win = np.zeros(uniq.size, dtype=np.int64)
        csum = np.cumsum(cnt)
        lo = np.searchsorted(uniq, uniq - window_hours + 1, side="left")
        n_win = csum - np.where(lo > 0, csum[lo - 1], 0)
        return pd.DataFrame({key: g[key].iloc[0], "hour": uniq, "n_window": n_win})

    schema = pa.schema([(key, pa.string()), ("hour", pa.int64()), ("n_window", pa.int64())])
    return (
        events.select_columns([key, ts])
        .groupby(key)
        .map_groups(per_key, batch_format="pandas")
        .map_batches(
            lambda b: b.cast(schema) if b.num_columns else schema.empty_table(),
            batch_format="pyarrow",
            batch_size=None,
        )
    )


def asof_prior_event(
    events: Dataset,
    left_type: str = "purchase",
    right_type: str = "click",
    key: str = "user_id",
    ts: str = "ts",
) -> Dataset:
    """As-of join within one log: for every ``left_type`` event, the key's
    most recent strictly-earlier ``right_type`` event. Output:
    (event_id, user_id, ts_us, prior_event_id, gap_us); lefts with no prior
    right are omitted. Bucketed by key → vectorized searchsorted per group
    (the pd.merge_asof pattern from the Ray guide, done in numpy)."""

    def per_user(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([ts, "event_id"])
        t = g[ts].astype("int64").to_numpy()
        kinds = g["event_type"].to_numpy()
        ids = g["event_id"].to_numpy()
        li = np.flatnonzero(kinds == left_type)
        ri = np.flatnonzero(kinds == right_type)
        if li.size == 0 or ri.size == 0:
            return pd.DataFrame(
                {"event_id": [], key: [], "ts_us": [], "prior_event_id": [], "gap_us": []}
            )
        pos = np.searchsorted(t[ri], t[li], side="left") - 1  # strictly earlier
        ok = pos >= 0
        li, pos = li[ok], pos[ok]
        return pd.DataFrame(
            {
                "event_id": ids[li],
                key: g[key].iloc[0],
                "ts_us": t[li],
                "prior_event_id": ids[ri][pos],
                "gap_us": t[li] - t[ri][pos],
            }
        )

    schema = pa.schema(
        [
            ("event_id", pa.int64()),
            (key, pa.int64()),
            ("ts_us", pa.int64()),
            ("prior_event_id", pa.int64()),
            ("gap_us", pa.int64()),
        ]
    )
    return (
        events.select_columns(["event_id", key, ts, "event_type"])
        .groupby(key)
        .map_groups(per_user, batch_format="pandas")
        .map_batches(
            lambda b: b.cast(schema) if b.num_columns else schema.empty_table(),
            batch_format="pyarrow",
            batch_size=None,
        )
    )
