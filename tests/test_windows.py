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
