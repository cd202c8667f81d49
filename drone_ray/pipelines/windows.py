"""Stream-shaped operators over the events log (SURVEY.md §2.10 note).

Ray Data has no event-time windowing; these express the standard shapes —
session windows, sliding counts, as-of join — with the engine's bucketing
rule (stages/edges.py): ONE shuffle on a ``hash(key) % B`` bucket column,
then a single vectorized numpy pass over ALL keys in the bucket. A
``groupby(key).map_groups(per_key)`` would pay one pandas DataFrame + Python
call per distinct key, which collapses at millions of users; the bucketed
body is O(rows log rows) regardless of key cardinality. All outputs are
deterministic and SQL-expressible, so each op carries a DuckDB oracle in the
query registry.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

from drone_ray.pipelines._util import pin_schema as _pin

from ray.data import Dataset

from drone_ray.hashing import mix64

US_PER_HOUR = 3_600_000_000
_NUM_BUCKETS = 32


def _str_bucket(values: np.ndarray, num_buckets: int) -> np.ndarray:
    """Deterministic bucket for string keys (hashed per DISTINCT value)."""
    uniq, inv = np.unique(values, return_inverse=True)
    codes = np.fromiter(
        (
            int.from_bytes(hashlib.blake2b(u.encode(), digest_size=8).digest(), "big") >> 1
            for u in uniq
        ),
        dtype=np.int64,
        count=len(uniq),
    )
    return (codes % num_buckets)[inv]


def _run_starts(keys: np.ndarray) -> np.ndarray:
    """Boolean mask marking the first row of each contiguous key run."""
    new = np.empty(keys.size, dtype=bool)
    if keys.size:
        new[0] = True
        new[1:] = keys[1:] != keys[:-1]
    return new


def _key_type(ds: Dataset, key: str):
    """pa.string() for string key columns, else pa.int64() (the output
    schema must be fixed before execution — worker-side detection can't
    reach the driver)."""
    try:
        sch = ds.schema()
        t = sch.types[sch.names.index(key)]
        if pa.types.is_string(t) or pa.types.is_large_string(t):
            return pa.string()
    except Exception:
        pass
    return pa.int64()


def _key_and_bucket(b: pa.Table, key: str, num_buckets: int):
    """(key array kept in its own type, bucket int64 array). Integer keys
    bucket via mix64; string keys via the per-distinct-value blake2b hash —
    callers work for either dtype."""
    kcol = b[key]
    if pa.types.is_string(kcol.type) or pa.types.is_large_string(kcol.type):
        k = kcol.to_numpy(zero_copy_only=False)
        return kcol, pa.array(_str_bucket(k, num_buckets), pa.int64()), pa.string()
    k = b[key].to_numpy(zero_copy_only=False).astype(np.int64)
    return (
        pa.array(k, pa.int64()),
        pa.array((mix64(k) % np.uint64(num_buckets)).astype(np.int64)),
        pa.int64(),
    )


def _sliding_window_sums(
    k: np.ndarray, h: np.ndarray, c: np.ndarray, window_hours: int,
    _max_runs: int | None = None,
) -> np.ndarray:
    """Windowed sums over (key-run-sorted, hour-ascending-within-run) sparse
    counts, all keys at once. The vectorized path gives every key run its
    own hour offset so a window can never reach into the previous key's
    rows; the offset arithmetic is bound-checked — with an astronomically
    large key-cardinality × hour-span product in ONE bucket it would
    overflow int64, and the per-run loop (identical results) takes over
    instead of silently merging windows across keys."""
    if k.size == 0:
        return np.zeros(0, np.int64)
    kcode = np.cumsum(_run_starts(k)) - 1
    h0 = h - h.min()
    span = np.int64(int(h0.max()) + window_hours + 1)
    n_runs = int(kcode[-1]) + 1
    csum = np.cumsum(c)
    limit = (2**62) // int(span) if _max_runs is None else _max_runs
    if n_runs <= limit:
        comp = kcode * span + h0
        lo = np.searchsorted(comp, comp - (window_hours - 1), side="left")
        return csum - np.where(lo > 0, csum[lo - 1], 0)
    starts = np.flatnonzero(_run_starts(k))
    ends = np.append(starts[1:], k.size)
    out = np.empty(k.size, np.int64)
    for s, e in zip(starts, ends):
        lo = s + np.searchsorted(h0[s:e], h0[s:e] - (window_hours - 1), side="left")
        out[s:e] = csum[s:e] - np.where(lo > 0, csum[lo - 1], 0)
    return out


def sessionize(
    events: Dataset,
    gap_us: int = US_PER_HOUR,
    key: str = "user_id",
    ts: str = "ts",
    num_buckets: int = _NUM_BUCKETS,
) -> Dataset:
    """Session windows: consecutive events of a key belong to one session
    while gaps stay ≤ gap_us. Output: (user_id, session_id [1-based per
    user], n_events, start_us, end_us)."""

    def partial(b: pa.Table) -> pa.Table:
        karr, bucket, _ = _key_and_bucket(b, key, num_buckets)
        t = b[ts].cast(pa.int64()).to_numpy()
        return pa.table(
            {
                key: karr,
                "_t": pa.array(t, pa.int64()),
                "event_id": b["event_id"],
                "_b": bucket,
            }
        )

    def bucket_body(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([key, "_t", "event_id"], kind="mergesort")
        k = g[key].to_numpy()
        t = g["_t"].to_numpy()
        n = k.size
        if n == 0:
            return pd.DataFrame(
                {key: [], "session_id": [], "n_events": [], "start_us": [], "end_us": []}
            )
        newu = _run_starts(k)
        brk = newu.copy()
        brk[1:] |= (t[1:] - t[:-1]) > gap_us
        starts = np.flatnonzero(brk)
        ends = np.append(starts[1:], n)
        sk = k[starts]
        # 1-based session rank within each user (users are contiguous runs)
        ustart = np.flatnonzero(_run_starts(sk))
        runlen = np.diff(np.append(ustart, starts.size))
        sid = np.arange(starts.size) - np.repeat(ustart, runlen) + 1
        return pd.DataFrame(
            {
                key: sk,
                "session_id": sid,
                "n_events": ends - starts,
                "start_us": t[starts],
                "end_us": t[ends - 1],
            }
        )

    schema = pa.schema(
        [
            (key, _key_type(events, key)),
            ("session_id", pa.int64()),
            ("n_events", pa.int64()),
            ("start_us", pa.int64()),
            ("end_us", pa.int64()),
        ]
    )
    return (
        events.select_columns([key, ts, "event_id"])
        .map_batches(partial, batch_format="pyarrow", batch_size=None)
        .groupby("_b")
        .map_groups(bucket_body, batch_format="pandas")
        .map_batches(_pin(schema), batch_format="pyarrow", batch_size=None)
    )


def sliding_hourly_counts(
    events: Dataset,
    window_hours: int = 3,
    key: str = "event_type",
    ts: str = "ts",
    num_buckets: int = _NUM_BUCKETS,
) -> Dataset:
    """Sliding window (size = window_hours, stride = 1h): for every hour
    bucket that has events, the event count over [hour-window+1, hour].
    Output: (event_type, hour, n_window). Per-batch (key, hour) counts are
    pre-combined before the shuffle."""

    def partial(b: pa.Table) -> pa.Table:
        k = np.asarray(b[key].to_numpy(zero_copy_only=False), dtype=object)
        hours = b[ts].cast(pa.int64()).to_numpy() // US_PER_HOUR
        df = pd.DataFrame({key: k, "hour": hours})
        g = df.groupby([key, "hour"], sort=False).size().reset_index(name="_c")
        kk = g[key].to_numpy()
        return pa.table(
            {
                key: pa.array(kk.astype(str)),
                "hour": pa.array(g["hour"].to_numpy(), pa.int64()),
                "_c": pa.array(g["_c"].to_numpy(), pa.int64()),
                "_b": pa.array(_str_bucket(kk, num_buckets), pa.int64()),
            }
        )

    def bucket_body(g: pd.DataFrame) -> pd.DataFrame:
        k = g[key].to_numpy()
        h = g["hour"].to_numpy()
        c = g["_c"].to_numpy()
        order = np.lexsort((h, k))
        k, h, c = k[order], h[order], c[order]
        newg = _run_starts(k) | np.concatenate(([True], h[1:] != h[:-1]))
        starts = np.flatnonzero(newg)
        k, h = k[starts], h[starts]
        c = np.add.reduceat(c, starts)
        n_win = _sliding_window_sums(k, h, c, window_hours)
        return pd.DataFrame({key: k, "hour": h, "n_window": n_win})

    schema = pa.schema([(key, pa.string()), ("hour", pa.int64()), ("n_window", pa.int64())])
    return (
        events.select_columns([key, ts])
        .map_batches(partial, batch_format="pyarrow", batch_size=None)
        .groupby("_b")
        .map_groups(bucket_body, batch_format="pandas")
        .map_batches(_pin(schema), batch_format="pyarrow", batch_size=None)
    )


def asof_prior_event(
    events: Dataset,
    left_type: str = "purchase",
    right_type: str = "click",
    key: str = "user_id",
    ts: str = "ts",
    num_buckets: int = _NUM_BUCKETS,
) -> Dataset:
    """As-of join within one log: for every ``left_type`` event, the key's
    most recent strictly-earlier ``right_type`` event. Output:
    (event_id, user_id, ts_us, prior_event_id, gap_us); lefts with no prior
    right are omitted.

    Bucket body is a single merge pass: rows sorted by (key, t, is_right,
    event_id) — lefts before rights at equal t, so "strictly earlier" falls
    out of the order — then a running maximum.accumulate of right-row
    indices; a match is valid iff it lands inside the left row's own key
    run (carryover from the previous key is always a smaller index)."""

    def partial(b: pa.Table) -> pa.Table:
        kinds = b["event_type"].to_numpy(zero_copy_only=False)
        keep = (kinds == left_type) | (kinds == right_type)
        filt = b.filter(pa.array(keep))
        karr, bucket, _ = _key_and_bucket(filt, key, num_buckets)
        return pa.table(
            {
                key: karr,
                "_t": pa.array(filt[ts].cast(pa.int64()).to_numpy(), pa.int64()),
                "event_id": pa.array(
                    filt["event_id"].to_numpy(zero_copy_only=False), pa.int64()
                ),
                "_r": pa.array(kinds[keep] == right_type),
                "_b": bucket,
            }
        )

    def bucket_body(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([key, "_t", "_r", "event_id"], kind="mergesort")
        k = g[key].to_numpy()
        t = g["_t"].to_numpy()
        ids = g["event_id"].to_numpy()
        is_r = g["_r"].to_numpy()
        n = k.size
        empty = pd.DataFrame(
            {"event_id": [], key: [], "ts_us": [], "prior_event_id": [], "gap_us": []}
        )
        if n == 0:
            return empty
        last_r = np.maximum.accumulate(np.where(is_r, np.arange(n), -1))
        newu = _run_starts(k)
        seg_start = np.maximum.accumulate(np.where(newu, np.arange(n), -1))
        li = np.flatnonzero(~is_r)
        cand = last_r[li]
        ok = cand >= seg_start[li]
        li, cand = li[ok], cand[ok]
        if li.size == 0:
            return empty
        return pd.DataFrame(
            {
                "event_id": ids[li],
                key: k[li],
                "ts_us": t[li],
                "prior_event_id": ids[cand],
                "gap_us": t[li] - t[cand],
            }
        )

    schema = pa.schema(
        [
            ("event_id", pa.int64()),
            (key, _key_type(events, key)),
            ("ts_us", pa.int64()),
            ("prior_event_id", pa.int64()),
            ("gap_us", pa.int64()),
        ]
    )
    return (
        events.select_columns(["event_id", key, ts, "event_type"])
        .map_batches(partial, batch_format="pyarrow", batch_size=None)
        .groupby("_b")
        .map_groups(bucket_body, batch_format="pandas")
        .map_batches(_pin(schema), batch_format="pyarrow", batch_size=None)
    )
