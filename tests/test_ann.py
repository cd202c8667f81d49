"""Similarity search: exact top-k vs full numpy, LSH variant recall."""

import numpy as np
import pyarrow as pa

from drone_ray.functions.vectors import cosine_matrix
from drone_ray.pipelines.ann import ann_topk_exact, ann_topk_lsh


def _emb_ds(n=200, d=32, seed=3):
    rng = np.random.default_rng(seed)
    x = rng.standard_normal((n, d))
    import ray.data as rd

    ds = rd.from_arrow(
        pa.table(
            {
                "vec_id": np.arange(n, dtype=np.int64),
                "embedding": pa.array(x.tolist(), pa.list_(pa.float32())),
            }
        )
    )
    # float32 storage round-trip, matching the parquet column type
    x32 = np.array(x, dtype=np.float32).astype(np.float64)
    return ds, x32


def test_ann_exact_matches_numpy():
    ds, x = _emb_ds()
    out = ann_topk_exact(ds, query_ids=(0, 1, 2), k=5).to_pandas()
    sims = cosine_matrix(x, x[:3])
    for m, qid in enumerate((0, 1, 2)):
        ids = np.arange(len(x))
        idx = np.lexsort((ids, -sims[:, m]))[:5]
        sub = out[out["query_id"] == qid]
        assert sub["vec_id"].tolist() == ids[idx].tolist()
        assert np.allclose(sub["cosine"].to_numpy(), np.round(sims[idx, m], 6))
    # query itself is rank 1 with cosine 1.0
    assert out[out["query_id"] == 0].iloc[0]["vec_id"] == 0


def test_ann_lsh_subset_of_exact_space():
    ds, x = _emb_ds()
    out = ann_topk_lsh(ds, query_ids=(0,), k=5, n_bits=4, n_tables=6).to_pandas()
    assert len(out) <= 5
    # the query shares every bucket with itself → always recalled
    assert out.iloc[0]["vec_id"] == 0
    assert abs(out.iloc[0]["cosine"] - 1.0) < 1e-9
    # all reported cosines are true cosines
    sims = cosine_matrix(x, x[:1])[:, 0]
    for _, r in out.iterrows():
        assert abs(r["cosine"] - round(sims[int(r["vec_id"])], 6)) < 1e-6


def test_ann_ivf_recall_vs_exact():
    # IVF with n_probe=4 of 16 clusters on clustered vectors should keep
    # high top-10 recall vs the exact scan; all reported cosines exact
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from drone_ray.pipelines.ann import ann_topk_exact, ann_topk_ivf

    rng = np.random.default_rng(11)
    centers = rng.normal(size=(8, 32))
    vecs = np.vstack([c + 0.1 * rng.normal(size=(80, 32)) for c in centers])
    ids = np.arange(len(vecs))
    emb = rd.from_arrow(
        pa.table({"vec_id": ids, "embedding": pa.array(vecs.tolist(), pa.list_(pa.float64()))})
    )
    exact = ann_topk_exact(emb, query_ids=(0, 100, 200), k=10).to_pandas()
    ivf = ann_topk_ivf(emb, query_ids=(0, 100, 200), k=10, n_clusters=8, n_probe=2).to_pandas()
    for qid in (0, 100, 200):
        e = set(exact[exact.query_id == qid].vec_id)
        g = set(ivf[ivf.query_id == qid].vec_id)
        assert len(e & g) >= 8, f"recall too low for query {qid}: {len(e & g)}/10"


def test_ann_ivf_distributed_trainer_recall_and_determinism():
    # the full-corpus Lloyd trainer: same recall bar as the sample trainer,
    # and bit-identical centroids across runs (sorted partial reduce)
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from drone_ray.pipelines.ann import ann_topk_exact, ann_topk_ivf, kmeans_distributed

    rng = np.random.default_rng(11)
    centers = rng.normal(size=(8, 32))
    vecs = np.vstack([c + 0.1 * rng.normal(size=(80, 32)) for c in centers])
    ids = np.arange(len(vecs))
    emb = rd.from_arrow(
        pa.table({"vec_id": ids, "embedding": pa.array(vecs.tolist(), pa.list_(pa.float64()))})
    )
    exact = ann_topk_exact(emb, query_ids=(0, 100, 200), k=10).to_pandas()
    ivf = ann_topk_ivf(
        emb, query_ids=(0, 100, 200), k=10, n_clusters=8, n_probe=2, train="distributed"
    ).to_pandas()
    for qid in (0, 100, 200):
        e = set(exact[exact.query_id == qid].vec_id)
        g = set(ivf[ivf.query_id == qid].vec_id)
        assert len(e & g) >= 8, f"recall too low for query {qid}: {len(e & g)}/10"

    c1 = kmeans_distributed(emb, 8, iters=3)
    c2 = kmeans_distributed(emb, 8, iters=3)
    assert np.array_equal(c1, c2)
    assert c1.shape == (8, 32)


def test_embedding_kmeans_query_matches_numpy():
    """q_embedding_kmeans's per-cluster reduce vs a driver-side numpy
    recomputation from the same deterministic centroids (sf0.001)."""
    import numpy as np
    import pyarrow.parquet as pq

    from drone_ray.pipelines.ann import kmeans_distributed
    from drone_ray.pipelines.queries import KMEANS_K, q_embedding_kmeans, _read

    sf = "/root/testdata/sf0.001"
    got = q_embedding_kmeans(sf).to_pandas().sort_values("cluster").reset_index(drop=True)

    emb = _read(sf, "embeddings", ["vec_id", "embedding"])
    cent = kmeans_distributed(emb, KMEANS_K, iters=5)
    t = pq.read_table(f"{sf}/embeddings.parquet", columns=["embedding"])
    x = np.asarray(t["embedding"].to_pylist(), dtype=np.float64)
    d2 = (x * x).sum(1)[:, None] - 2.0 * (x @ cent.T) + (cent * cent).sum(1)[None, :]
    lab = np.argmin(d2, axis=1)
    dist = np.sqrt(np.maximum(d2[np.arange(len(lab)), lab], 0.0))
    assert got["n_vectors"].sum() == len(lab)
    for row in got.itertuples():
        m = lab == row.cluster
        assert m.sum() == row.n_vectors
        assert abs(dist[m].mean() - row.mean_dist) < 1e-5
