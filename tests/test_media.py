"""Multimodal stub stage: real actor-pool plumbing over a binary column."""

import numpy as np
import pyarrow as pa
import pytest

from drone_ray.pipelines.media import MediaDecodeStub, media_features


def _media_ds(n=100):
    import ray.data as rd

    rng = np.random.default_rng(0)
    payloads = [rng.bytes(64 + int(i) % 512) for i in range(n)]
    return rd.from_arrow(
        pa.table({"id": np.arange(n, dtype=np.int64), "media": pa.array(payloads, pa.binary())})
    )


def test_media_features_schema_and_determinism():
    ds = _media_ds()
    out = media_features(ds, feature_dim=8, concurrency=2, batch_size=16).to_pandas()
    assert sorted(out.columns) == ["feature", "height", "id", "n_bytes", "width"]
    assert len(out) == 100
    assert all(len(f) == 8 for f in out["feature"])
    # deterministic: same payload → same features at different batch size
    out2 = media_features(_media_ds(), feature_dim=8, concurrency=1, batch_size=7).to_pandas()
    a = out.sort_values("id")["feature"].tolist()
    b = out2.sort_values("id")["feature"].tolist()
    assert np.allclose(np.array(a), np.array(b))


def test_real_decode_is_explicitly_stubbed():
    stub = MediaDecodeStub(real=True)
    with pytest.raises(NotImplementedError):
        stub._decode(b"payload")
