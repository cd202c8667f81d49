"""Window/session/as-of operators on a hand-built event log."""

import numpy as np
import pyarrow as pa

from drone_ray.pipelines.windows import US_PER_HOUR, asof_prior_event, sessionize, sliding_hourly_counts

H = US_PER_HOUR


def _events():
    import ray.data as rd

    rows = [
        # user 1: two sessions (gap 2h between idx 2 and 3)
        (1, 1, 0 * H, "click"),
        (2, 1, int(0.5 * H), "click"),
        (3, 1, 1 * H, "purchase"),
        (4, 1, 3 * H, "click"),
        (5, 1, int(3.5 * H), "purchase"),
        # user 2: single session, purchase with no prior click
        (6, 2, 0 * H, "purchase"),
        (7, 2, int(0.2 * H), "click"),
    ]
    eid, uid, ts, et = zip(*rows)
    return rd.from_arrow(
        pa.table(
            {
                "event_id": pa.array(eid, pa.int64()),
                "user_id": pa.array(uid, pa.int64()),
                "ts": pa.array(list(ts), pa.timestamp("us")),
                "event_type": pa.array(et, pa.string()),
            }
        )
    )


def test_sessionize():
    out = sessionize(_events(), gap_us=H).to_pandas().sort_values(["user_id", "session_id"])
    recs = out.to_records(index=False).tolist()
    assert recs == [
        (1, 1, 3, 0, 1 * H),
        (1, 2, 2, 3 * H, int(3.5 * H)),
        (2, 1, 2, 0, int(0.2 * H)),
    ]


def test_asof_prior_event():
    out = asof_prior_event(_events()).to_pandas().sort_values("event_id")
    # purchase 3 ← click 2; purchase 5 ← click 4; purchase 6 has no prior click
    assert out["event_id"].tolist() == [3, 5]
    assert out["prior_event_id"].tolist() == [2, 4]
    assert out["gap_us"].tolist() == [int(0.5 * H), int(0.5 * H)]


def test_sliding_counts():
    out = sliding_hourly_counts(_events(), window_hours=3).to_pandas()
    click = out[out["event_type"] == "click"].sort_values("hour")
    # click hours: 0, 0, 3, 0 (user2) → buckets {0: 3, 3: 1}; window [1,3] = 1
    assert dict(zip(click["hour"], click["n_window"])) == {0: 3, 3: 1}


def test_sessionize_string_keys():
    """ADVICE round 2: string keys must route through _str_bucket, not a
    silent int64 cast."""
    import ray.data as rd

    t = pa.table(
        {
            "event_id": pa.array([1, 2, 3, 4], pa.int64()),
            "user_id": pa.array(["alice", "alice", "bob", "alice"], pa.string()),
            "ts": pa.array([0, H // 2, 0, 3 * H], pa.timestamp("us")),
            "event_type": pa.array(["click"] * 4, pa.string()),
        }
    )
    out = sessionize(rd.from_arrow(t), gap_us=H).to_pandas().sort_values(
        ["user_id", "session_id"]
    )
    recs = out.to_records(index=False).tolist()
    assert recs == [
        ("alice", 1, 2, 0, H // 2),
        ("alice", 2, 1, 3 * H, 3 * H),
        ("bob", 1, 1, 0, 0),
    ]


def test_sliding_window_sums_fallback_matches_vectorized():
    """The per-run overflow fallback must agree with the composite-key path."""
    from drone_ray.pipelines.windows import _sliding_window_sums

    rng = np.random.default_rng(5)
    ks, hs, cs = [], [], []
    for key in range(20):
        hours = np.unique(rng.integers(0, 50, size=rng.integers(1, 12)))
        ks.extend([key] * hours.size)
        hs.extend(hours.tolist())
        cs.extend(rng.integers(1, 9, size=hours.size).tolist())
    k = np.array(ks)
    h = np.array(hs, dtype=np.int64)
    c = np.array(cs, dtype=np.int64)
    fast = _sliding_window_sums(k, h, c, 3)
    slow = _sliding_window_sums(k, h, c, 3, _max_runs=0)  # force the loop path
    assert (fast == slow).all()
