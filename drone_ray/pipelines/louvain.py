"""Distributed Louvain community detection (Blondel, Guillaume, Lambiotte
& Lefebvre, "Fast unfolding of communities in large networks", J. Stat.
Mech. 2008) as a composition of hash-bucketed Dataset exchanges.

Deterministic synchronous variant: per level, vertices repeatedly evaluate
the standard modularity gain of adopting a neighboring community

    gain(u → C) = w_{u,C} − k_u · a'_C / 2m          (a'_C = a_C − k_u·[C = D])

against staying in their current community D, and move only when a move is
STRICTLY better (ties prefer staying, then the smallest community id).
Synchronous simultaneous moves oscillate on symmetric structures (two
vertices swapping communities forever), so each round only the alternating
hash-parity half of the vertices may move — the standard distributed-Louvain
remedy (cf. Ghosh et al., "Distributed Louvain algorithm for graph community
detection", IPDPS 2018), derandomized here with the splitmix64 vid hash so
the outcome is a pure function of the graph. A level converges when two
consecutive rounds (one per parity) move nothing; the level's communities
then contract into super-vertices (multi-edges summed, intra edges becoming
self-loops) and the next level repeats on the coarsened graph.

Engine shape: the graph is a double-stored undirected weighted adjacency
(u, v, w) Dataset; the per-vertex table S = (vid, k, label) rides hash(vid)
buckets. Each round is four bucketed exchanges, all O(E) rows:

  1. volumes:   S bucketed by hash(label) → Sa = (vid, k, label, a_label);
  2. label-attach: adjacency keyed by v meets Sa keyed by vid →
     per-(u, C) partial weights, re-keyed by C;
  3. volume-attach: candidate rows meet the (label, a) table in hash(C)
     buckets — aggregation per (u, C) completes here (same-C rows share a
     bucket) and a_C rides along, re-keyed by u;
  4. decide: candidates meet S in hash(u) buckets; vectorized segmented
     argmax picks each vertex's best strictly-improving move.

No step holds more than one bucket's rows in a task heap and the driver
sees only scalars (2m, per-round move counts, the final modularity), so the
shape survives the 100-TB target; the real cost model is ~4 shuffles per
round with adjacency volume shrinking geometrically per level. All moments
(w, k, a) are exact int64 sums, so gains are identical floats in any
execution order — results are bitwise partition-invariant.

The reference engine ships no community detection beyond label propagation;
this extends the same analytics surface (reference LPA parity:
/root/reference/src/worker/, see programs.LabelPropagation)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
from ray.data import Dataset

import ray

from drone_ray.hashing import adaptive_buckets, mix64
from drone_ray.pipelines._util import pin_schema


@ray.remote(num_cpus=0)
def _block_col_sum(block: pa.Table, col: str) -> int:
    """Sum one int column of one materialized block (see _mat_with_sum)."""
    if col not in block.schema.names or block.num_rows == 0:
        return 0
    import pyarrow.compute as pc

    return int(pc.sum(block[col]).as_py() or 0)

# generic row shapes for the union-join exchanges: the narrow 3-lane form
# carries the E-dominant volumes (label-attach, contraction, mapping
# compose) — dropping the unused i3 lane cuts those shuffles by ~20%
# (41 -> 33 B/row); the wide form adds i3 where volume-attach output and
# the decide exchange genuinely need a fourth integer.
_ROW = pa.schema(
    [
        ("key", pa.int64()),
        ("i1", pa.int64()),
        ("i2", pa.int64()),
        ("i3", pa.int64()),
        ("side", pa.int8()),
        ("_b", pa.int64()),
    ]
)
_ROW3 = pa.schema(
    [
        ("key", pa.int64()),
        ("i1", pa.int64()),
        ("i2", pa.int64()),
        ("side", pa.int8()),
        ("_b", pa.int64()),
    ]
)
_S_SCHEMA = pa.schema(
    [("vid", pa.int64()), ("k", pa.int64()), ("label", pa.int64()), ("moved", pa.int64())]
)
_SA_SCHEMA = pa.schema(
    [("vid", pa.int64()), ("k", pa.int64()), ("label", pa.int64()), ("a", pa.int64())]
)
_ADJ_SCHEMA = pa.schema([("u", pa.int64()), ("v", pa.int64()), ("w", pa.int64())])
_OUT_SCHEMA = pa.schema([("vid", pa.int64()), ("community", pa.int64())])


def _bk(x: np.ndarray, B: int) -> np.ndarray:
    return (mix64(x.astype(np.int64)) % np.uint64(B)).astype(np.int64)


def _pairbk(u: np.ndarray, v: np.ndarray, B: int) -> np.ndarray:
    hu, hv = mix64(u.astype(np.int64)), mix64(v.astype(np.int64))
    h = hu ^ ((hv << np.uint64(1)) | (hv >> np.uint64(63)))
    return (h % np.uint64(B)).astype(np.int64)


def _col(x, n: int) -> np.ndarray:
    a = np.asarray(x, np.int64)
    return a if a.shape == (n,) else np.full(n, int(a), np.int64)


def _rows(key, i1, i2, i3, side: int, B: int) -> pa.Table:
    """i3=None emits the narrow 3-lane row (no i3 column)."""
    key = np.asarray(key, np.int64)
    n = key.size
    cols = {
        "key": pa.array(key),
        "i1": pa.array(_col(i1, n)),
        "i2": pa.array(_col(i2, n)),
    }
    if i3 is not None:
        cols["i3"] = pa.array(_col(i3, n))
    cols["side"] = pa.array(np.full(n, side, np.int8))
    cols["_b"] = pa.array(_bk(key, B))
    return pa.table(cols)


def _split(g: pd.DataFrame):
    side = g["side"].to_numpy()
    key = g["key"].to_numpy().astype(np.int64)
    i1 = g["i1"].to_numpy().astype(np.int64)
    i2 = g["i2"].to_numpy().astype(np.int64)
    i3 = (
        g["i3"].to_numpy().astype(np.int64)
        if "i3" in g.columns
        else np.zeros(key.size, np.int64)
    )
    m = side == 1
    return (key[~m], i1[~m], i2[~m], i3[~m]), (key[m], i1[m], i2[m], i3[m])


def _empty_pdf(cols: dict[str, type]) -> pd.DataFrame:
    return pd.DataFrame({c: np.empty(0, t) for c, t in cols.items()})


def _mat(ds: Dataset, B: int) -> Dataset:
    """Materialize with a bounded block count AND hard-severed lineage.

    Louvain's rounds union three branches per exchange and groupby outputs
    inherit input block counts, so without the coalesce the per-round block
    count triples — an exponential scheduling-overhead explosion (observed
    4 → 1093 blocks in 5 rounds) even though row counts shrink. And a chain
    of ``materialize()`` datasets still accumulates nested plan references
    (a ~37-deep chain exhausts the Python recursion limit inside Ray's
    executor), so the blocks are re-wrapped as bare object refs
    (``from_arrow_refs``, the dedup.py block-grid precedent): the new
    dataset holds O(B) refs and nothing else. All louvain stages end in an
    Arrow ``pin_schema`` pass, so every block is a pyarrow Table."""
    import ray.data as _rd

    mat = ds.repartition(B, shuffle=False).materialize()
    refs = []
    for bundle in mat.iter_internal_ref_bundles():
        refs.extend(bundle.block_refs)
    return _rd.from_arrow_refs(refs)


def _mat_with_sum(ds: Dataset, B: int, col: str) -> tuple[Dataset, int]:
    """_mat plus the int sum of ``col``, computed with one tiny task per
    block over the already-materialized refs — the per-round move count
    without a second Dataset execution (executor startup dominates a
    50-row sum at gate scale; at any scale this is O(blocks) driver refs
    and a single parallel task wave)."""
    import ray as _ray
    import ray.data as _rd

    mat = ds.repartition(B, shuffle=False).materialize()
    refs = []
    for bundle in mat.iter_internal_ref_bundles():
        refs.extend(bundle.block_refs)
    sums = _ray.get([_block_col_sum.remote(r, col) for r in refs])
    return _rd.from_arrow_refs(refs), int(sum(sums))


def symmetrize_weighted(
    edges: Dataset, num_buckets: int, weight_col: str | None = None
) -> Dataset:
    """Directed (src, dst) rows → double-stored undirected weighted
    adjacency (u, v, w): each directed edge contributes its weight
    (``weight_col``, INTEGER — the exact-moment invariance relies on
    int64 sums; 1 when None) to both (a, b) and (b, a); self-loops are
    dropped (as in the CSR loader). Σw = 2m by construction — this is
    what lets the contracted host graph (contract_edges' integer
    multi-edge counts) feed Louvain directly. One pair-bucketed
    shuffle."""

    def partial(b: pa.Table) -> pa.Table:
        s = b["src"].to_numpy(zero_copy_only=False).astype(np.int64)
        d = b["dst"].to_numpy(zero_copy_only=False).astype(np.int64)
        if weight_col is not None:
            ew = b[weight_col].to_numpy(zero_copy_only=False)
            if not np.issubdtype(ew.dtype, np.integer):
                raise ValueError(
                    "louvain needs integer edge weights — the exact-int64 "
                    f"gain moments cannot carry {ew.dtype}"
                )
            ew = ew.astype(np.int64)
        else:
            ew = np.ones(s.size, np.int64)
        keep = s != d
        s, d, ew = s[keep], d[keep], ew[keep]
        u = np.concatenate([s, d])
        v = np.concatenate([d, s])
        w2 = np.concatenate([ew, ew])
        pairs = np.stack([u, v], axis=1)
        uq, inv = np.unique(pairs, axis=0, return_inverse=True)
        sums = np.zeros(uq.shape[0], np.int64)
        np.add.at(sums, inv, w2)
        return pa.table(
            {
                "u": pa.array(uq[:, 0], pa.int64()),
                "v": pa.array(uq[:, 1], pa.int64()),
                "w": pa.array(sums, pa.int64()),
                "_b": pa.array(_pairbk(uq[:, 0], uq[:, 1], num_buckets)),
            }
        )

    def finish(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby(["u", "v"], as_index=False)["w"].sum()

    cols = ["src", "dst"] if weight_col is None else ["src", "dst", weight_col]
    return (
        edges.select_columns(cols)
        .map_batches(partial, batch_format="pyarrow", batch_size=None)
        .groupby("_b")
        .map_groups(finish, batch_format="pandas")
        .map_batches(pin_schema(_ADJ_SCHEMA), batch_format="pyarrow", batch_size=None)
    )


def _init_nodes(adj: Dataset, B: int) -> Dataset:
    """S₀ = (vid, k, label=vid, moved=0): k = Σ_v w(u, v) over the
    double-stored rows — the vertex strength (self rows, present only on
    contracted levels, already carry both directions)."""

    def partial(b: pa.Table) -> pa.Table:
        u = b["u"].to_numpy(zero_copy_only=False)
        w = b["w"].to_numpy(zero_copy_only=False)
        us, inv = np.unique(u, return_inverse=True)
        sums = np.zeros(us.size, np.int64)
        np.add.at(sums, inv, w)
        return pa.table(
            {"vid": pa.array(us, pa.int64()), "k": pa.array(sums), "_b": pa.array(_bk(us, B))}
        )

    def finish(g: pd.DataFrame) -> pd.DataFrame:
        agg = g.groupby("vid", as_index=False)["k"].sum()
        agg["label"] = agg["vid"]
        agg["moved"] = np.int64(0)
        return agg[["vid", "k", "label", "moved"]]

    return (
        adj.map_batches(partial, batch_format="pyarrow", batch_size=None)
        .groupby("_b")
        .map_groups(finish, batch_format="pandas")
        .map_batches(pin_schema(_S_SCHEMA), batch_format="pyarrow", batch_size=None)
    )


def _attach_volumes(S: Dataset, B: int) -> Dataset:
    """Sa = (vid, k, label, a): a = community volume Σ k over the vertex's
    own community — every member of a label lands in the same hash(label)
    bucket, so one transform closes the sum."""

    def tag(b: pa.Table) -> pa.Table:
        lab = b["label"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "vid": b["vid"],
                "k": b["k"],
                "label": b["label"],
                "_b": pa.array(_bk(lab, B)),
            }
        )

    def vol(g: pd.DataFrame) -> pd.DataFrame:
        a = g.groupby("label")["k"].transform("sum")
        return pd.DataFrame(
            {"vid": g["vid"], "k": g["k"], "label": g["label"], "a": a.astype(np.int64)}
        )

    return (
        S.select_columns(["vid", "k", "label"])
        .map_batches(tag, batch_format="pyarrow", batch_size=None)
        .groupby("_b")
        .map_groups(vol, batch_format="pandas")
        .map_batches(pin_schema(_SA_SCHEMA), batch_format="pyarrow", batch_size=None)
    )


def _adj_label_rows(adj: Dataset, B: int, drop_self: bool) -> Dataset:
    """Adjacency rows keyed by v for the label-attach exchange. Candidate
    evaluation drops self rows (a self-loop's contribution is invariant
    across the vertex's choice, so it cancels from every gain)."""

    def tag(b: pa.Table) -> pa.Table:
        u = b["u"].to_numpy(zero_copy_only=False)
        v = b["v"].to_numpy(zero_copy_only=False)
        w = b["w"].to_numpy(zero_copy_only=False)
        if drop_self:
            keep = u != v
            u, v, w = u[keep], v[keep], w[keep]
        return _rows(v, u, w, None, side=0, B=B)

    return adj.map_batches(tag, batch_format="pyarrow", batch_size=None)


def _sa_rows(Sa: Dataset, i1: str, i2: str | None, i3: str | None, B: int) -> Dataset:
    def tag(b: pa.Table) -> pa.Table:
        vid = b["vid"].to_numpy(zero_copy_only=False)
        return _rows(
            vid,
            b[i1].to_numpy(zero_copy_only=False),
            b[i2].to_numpy(zero_copy_only=False) if i2 else 0,
            b[i3].to_numpy(zero_copy_only=False) if i3 else None,
            side=1,
            B=B,
        )

    return Sa.map_batches(tag, batch_format="pyarrow", batch_size=None)


def _label_lookup(g: pd.DataFrame):
    """Split a join bucket and sort the side-1 (per-vid) rows for
    searchsorted lookups. Returns (edge-side arrays, sorted vid-side)."""
    (ek, e1, e2, e3), (sk, s1, s2, s3) = _split(g)
    order = np.argsort(sk, kind="stable")
    return (ek, e1, e2, e3), (sk[order], s1[order], s2[order], s3[order])


def _cand_partial(B: int):
    """Bucket join #2: adjacency rows (key=v, i1=u, i2=w) meet Sa rows
    (key=vid, i1=label) → per-(u, C) partial weights keyed by C."""

    def join(g: pd.DataFrame) -> pd.DataFrame:
        (ek, eu, ew, _), (sk, slab, _, _) = _label_lookup(g)
        if ek.size == 0:
            return _empty_pdf(
                {"key": np.int64, "i1": np.int64, "i2": np.int64, "side": np.int8, "_b": np.int64}
            )
        pos = np.searchsorted(sk, ek)
        C = slab[pos]  # every adjacency endpoint exists in S
        pairs = np.stack([eu, C], axis=1)
        uq, inv = np.unique(pairs, axis=0, return_inverse=True)
        sums = np.zeros(uq.shape[0], np.int64)
        np.add.at(sums, inv, ew)
        cu, cC = uq[:, 0], uq[:, 1]
        return pd.DataFrame(
            {
                "key": cC,
                "i1": cu,
                "i2": sums,
                "side": np.zeros(cu.size, np.int8),
                "_b": _bk(cC, B),
            }
        )

    return join


def _a_rows(Sa: Dataset, B: int) -> Dataset:
    """(label, a) rows for the volume-attach exchange — per-batch partial
    dedup only (Sa blocks come out of the hash(label) groupby, so labels
    are clustered and duplicates across blocks are rare; duplicate rows
    carry identical `a` values and the join takes the first match)."""

    def tag(b: pa.Table) -> pa.Table:
        lab = b["label"].to_numpy(zero_copy_only=False)
        a = b["a"].to_numpy(zero_copy_only=False)
        uq, idx = np.unique(lab, return_index=True)
        return _rows(uq, a[idx], 0, None, side=1, B=B)

    return Sa.map_batches(tag, batch_format="pyarrow", batch_size=None)


def _cand_full(B: int):
    """Bucket join #3: candidate partials (key=C, i1=u, i2=w) meet (label,
    a) rows. All rows of a community share the bucket, so the per-(u, C)
    sum completes here; output keyed by u carries (C, w_uC, a_C)."""

    def join(g: pd.DataFrame) -> pd.DataFrame:
        (eC, eu, ew, _), (ak, aa, _, _) = _label_lookup(g)
        if eu.size == 0:
            return _empty_pdf(
                {"key": np.int64, "i1": np.int64, "i2": np.int64, "i3": np.int64, "side": np.int8, "_b": np.int64}
            )
        pairs = np.stack([eu, eC], axis=1)
        uq, inv = np.unique(pairs, axis=0, return_inverse=True)
        sums = np.zeros(uq.shape[0], np.int64)
        np.add.at(sums, inv, ew)
        cu, cC = uq[:, 0], uq[:, 1]
        pos = np.searchsorted(ak, cC)
        aC = aa[pos]
        return pd.DataFrame(
            {
                "key": cu,
                "i1": cC,
                "i2": sums,
                "i3": aC,
                "side": np.zeros(cu.size, np.int8),
                "_b": _bk(cu, B),
            }
        )

    return join


def _decide(r: int, m2: int):
    """Bucket join #4: full candidates (key=u, i1=C, i2=w_uC, i3=a_C) meet
    Sa rows (key=vid, i1=k, i2=label, i3=a_label). Gains are elementwise
    float64 over exact int64 moments — identical in any execution order."""

    def join(g: pd.DataFrame) -> pd.DataFrame:
        (cu, cC, cw, ca), (svid, sk, sD, saD) = _label_lookup(g)
        if svid.size == 0:
            return _empty_pdf(
                {"vid": np.int64, "k": np.int64, "label": np.int64, "moved": np.int64}
            )
        pos = np.searchsorted(svid, cu)
        ku = sk[pos]
        Du = sD[pos]
        selfm = cC == Du
        stay_w = np.zeros(svid.size, np.int64)
        stay_w[pos[selfm]] = cw[selfm]
        # k·a products go through float64 (not int64 — k and a are O(2m),
        # so the int product wraps silently past ~3e9 edges; the float
        # product rounds at 2^53, deterministically, mirrored in the oracle)
        stay_gain = stay_w - sk.astype(np.float64) * (saD - sk) / m2
        nd = ~selfm
        gain = cw[nd] - ku[nd].astype(np.float64) * ca[nd] / m2
        un, Cn = cu[nd], cC[nd]
        newlab = sD.copy()
        moved = np.zeros(svid.size, np.int64)
        if un.size:
            o = np.lexsort((Cn, -gain, un))
            uo, go, Co = un[o], gain[o], Cn[o]
            first = np.ones(uo.size, bool)
            first[1:] = uo[1:] != uo[:-1]
            bu, bg, bC = uo[first], go[first], Co[first]
            bpos = np.searchsorted(svid, bu)
            allowed = ((mix64(svid) + np.uint64(r)) % np.uint64(2)) == 0
            sel = (bg > stay_gain[bpos]) & allowed[bpos]
            newlab[bpos[sel]] = bC[sel]
            moved[bpos[sel]] = 1
        return pd.DataFrame({"vid": svid, "k": sk, "label": newlab, "moved": moved})

    return join


def _local_move_round(adj: Dataset, Sa: Dataset, r: int, m2: int, B: int) -> Dataset:
    cand1 = (
        _adj_label_rows(adj, B, drop_self=True)
        .union(_sa_rows(Sa, "label", None, None, B))
        .groupby("_b")
        .map_groups(_cand_partial(B), batch_format="pandas")
        .map_batches(pin_schema(_ROW3), batch_format="pyarrow", batch_size=None)
    )
    cand2 = (
        cand1.union(_a_rows(Sa, B))
        .groupby("_b")
        .map_groups(_cand_full(B), batch_format="pandas")
        .map_batches(pin_schema(_ROW), batch_format="pyarrow", batch_size=None)
    )
    return (
        cand2.union(_sa_rows(Sa, "k", "label", "a", B))
        .groupby("_b")
        .map_groups(_decide(r, m2), batch_format="pandas")
        .map_batches(pin_schema(_S_SCHEMA), batch_format="pyarrow", batch_size=None)
    )


def _contract(adj: Dataset, Sa: Dataset, B: int) -> Dataset:
    """Coarsen: map both endpoints through the level's labels (two bucketed
    label-attach exchanges) and sum multi-edges. Intra-community edges
    collapse onto (C, C) self rows — both stored directions land on the
    same row, so the self weight carries 2× the undirected internal weight,
    exactly what the next level's strength sum expects."""

    def relabel_u(g: pd.DataFrame) -> pd.DataFrame:
        # rows keyed by v were relabeled by _cand-style join below; this
        # second pass relabels the carried u and forms the contracted pair
        (ek, eCv, ew, _), (sk, slab, _, _) = _label_lookup(g)
        if ek.size == 0:
            return _empty_pdf({"u": np.int64, "v": np.int64, "w": np.int64, "_b2": np.int64})
        pos = np.searchsorted(sk, ek)
        Cu = slab[pos]
        pairs = np.stack([Cu, eCv], axis=1)
        uq, inv = np.unique(pairs, axis=0, return_inverse=True)
        sums = np.zeros(uq.shape[0], np.int64)
        np.add.at(sums, inv, ew)
        return pd.DataFrame(
            {
                "u": uq[:, 0],
                "v": uq[:, 1],
                "w": sums,
                "_b2": _pairbk(uq[:, 0], uq[:, 1], B),
            }
        )

    def attach_v(g: pd.DataFrame) -> pd.DataFrame:
        (ek, eu, ew, _), (sk, slab, _, _) = _label_lookup(g)
        if ek.size == 0:
            return _empty_pdf(
                {"key": np.int64, "i1": np.int64, "i2": np.int64, "side": np.int8, "_b": np.int64}
            )
        pos = np.searchsorted(sk, ek)
        Cv = slab[pos]
        # re-key by u for the second relabel pass; carry (C_v, w)
        return pd.DataFrame(
            {
                "key": eu,
                "i1": Cv,
                "i2": ew,
                "side": np.zeros(eu.size, np.int8),
                "_b": _bk(eu, B),
            }
        )

    def finish(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby(["u", "v"], as_index=False)["w"].sum()

    half = (
        _adj_label_rows(adj, B, drop_self=False)
        .union(_sa_rows(Sa, "label", None, None, B))
        .groupby("_b")
        .map_groups(attach_v, batch_format="pandas")
        .map_batches(pin_schema(_ROW3), batch_format="pyarrow", batch_size=None)
    )
    return (
        half.union(_sa_rows(Sa, "label", None, None, B))
        .groupby("_b")
        .map_groups(relabel_u, batch_format="pandas")
        .groupby("_b2")
        .map_groups(finish, batch_format="pandas")
        .map_batches(pin_schema(_ADJ_SCHEMA), batch_format="pyarrow", batch_size=None)
    )


def _communities(Sa: Dataset, B: int) -> Dataset:
    """Next level's S: one row per community, vid = label, k = volume."""

    def tag(b: pa.Table) -> pa.Table:
        lab = b["label"].to_numpy(zero_copy_only=False)
        a = b["a"].to_numpy(zero_copy_only=False)
        uq, idx = np.unique(lab, return_index=True)
        return pa.table(
            {
                "vid": pa.array(uq, pa.int64()),
                "k": pa.array(a[idx], pa.int64()),
                "_b": pa.array(_bk(uq, B)),
            }
        )

    def finish(g: pd.DataFrame) -> pd.DataFrame:
        agg = g.drop_duplicates("vid")
        out = pd.DataFrame({"vid": agg["vid"], "k": agg["k"]})
        out["label"] = out["vid"]
        out["moved"] = np.int64(0)
        return out

    return (
        Sa.map_batches(tag, batch_format="pyarrow", batch_size=None)
        .groupby("_b")
        .map_groups(finish, batch_format="pandas")
        .map_batches(pin_schema(_S_SCHEMA), batch_format="pyarrow", batch_size=None)
    )


def _compose_mapping(mapping: Dataset, S: Dataset, B: int) -> Dataset:
    """mapping (vid → node) ∘ S (node → label) in hash(node) buckets."""

    def m_rows(b: pa.Table) -> pa.Table:
        return _rows(
            b["label"].to_numpy(zero_copy_only=False),
            b["vid"].to_numpy(zero_copy_only=False),
            0,
            None,
            side=0,
            B=B,
        )

    def s_rows(b: pa.Table) -> pa.Table:
        return _rows(
            b["vid"].to_numpy(zero_copy_only=False),
            b["label"].to_numpy(zero_copy_only=False),
            0,
            None,
            side=1,
            B=B,
        )

    def join(g: pd.DataFrame) -> pd.DataFrame:
        (mk, mvid, _, _), (sk, slab, _, _) = _label_lookup(g)
        if mk.size == 0:
            return _empty_pdf({"vid": np.int64, "label": np.int64})
        pos = np.searchsorted(sk, mk)
        return pd.DataFrame({"vid": mvid, "label": slab[pos]})

    schema = pa.schema([("vid", pa.int64()), ("label", pa.int64())])
    return (
        mapping.map_batches(m_rows, batch_format="pyarrow", batch_size=None)
        .union(S.map_batches(s_rows, batch_format="pyarrow", batch_size=None))
        .groupby("_b")
        .map_groups(join, batch_format="pandas")
        .map_batches(pin_schema(schema), batch_format="pyarrow", batch_size=None)
    )


def _modularity_final(adj: Dataset, S: Dataset, m2: int) -> float:
    """Q on the fully-contracted graph, where every node is its own
    community: Q = Σ_x selfw(x)/2m − Σ_x (k_x/2m)². Two streaming partial
    sums, no shuffle."""

    def self_partial(b: pa.Table) -> pa.Table:
        u = b["u"].to_numpy(zero_copy_only=False)
        v = b["v"].to_numpy(zero_copy_only=False)
        w = b["w"].to_numpy(zero_copy_only=False)
        return pa.table({"s": pa.array([int(w[u == v].sum())], pa.int64())})

    def sq_partial(b: pa.Table) -> pa.Table:
        k = b["k"].to_numpy(zero_copy_only=False).astype(np.float64)
        return pa.table({"s": pa.array([float(np.sum((k / m2) ** 2))], pa.float64())})

    selfw = adj.map_batches(self_partial, batch_format="pyarrow", batch_size=None).sum("s")
    sq = S.map_batches(sq_partial, batch_format="pyarrow", batch_size=None).sum("s")
    return float((selfw or 0) / m2 - (sq or 0.0))


def louvain(
    edges: Dataset,
    max_rounds: int = 10,
    max_levels: int = 4,
    num_buckets: int | None = None,
    est_edges: int | None = None,
    weight_col: str | None = None,
    checkpoint_dir: str | None = None,
    resume: bool = True,
    verbose: bool = False,
) -> tuple[Dataset, dict]:
    """Run Louvain over a directed (src, dst) edge Dataset (optionally
    integer-weighted via ``weight_col`` — e.g. the contracted host
    graph's multi-edge counts). Returns
    ``(communities, info)``: a (vid, community) Dataset over every non-
    isolated vertex, and ``info`` with the final modularity, level count,
    and per-level round/move history. Deterministic for a given graph
    (hash-parity alternation; strict-gain moves; smallest-id tie-breaks);
    independent of ``num_buckets`` and input partitioning.

    ``checkpoint_dir``: after each completed level the contracted
    adjacency, community table and vid→community mapping are written as
    parquet with a write-then-rename manifest (the K1–K4 atomicity
    contract); a rerun with ``resume=True`` restarts from the last
    complete level and produces the bit-identical result of the cold
    run. Resuming with different ``max_rounds``/``num_buckets`` would
    silently change the fixpoint, so a knob mismatch refuses loudly."""
    import time as _time

    _t0 = _time.monotonic()

    def _log(msg: str) -> None:
        if verbose:
            print(f"[louvain +{_time.monotonic() - _t0:6.1f}s] {msg}", flush=True)

    import json as _json
    import os as _os

    import ray.data as _rd

    B = num_buckets or adaptive_buckets(est_edges, 32)
    start_level = 0
    mapping: Dataset | None = None
    info: dict = {"m2": 0, "levels": 0, "history": [], "modularity": 0.0}
    ck = None
    if checkpoint_dir:
        ck = checkpoint_dir
        _os.makedirs(ck, exist_ok=True)
        done = sorted(
            int(d.split("=", 1)[1])
            for d in _os.listdir(ck)
            if d.startswith("level=")
            and _os.path.exists(_os.path.join(ck, d, "manifest.json"))
        ) if resume else []
        if done:
            lvl = done[-1]
            man = _json.load(open(_os.path.join(ck, f"level={lvl}", "manifest.json")))
            if man["max_rounds"] != max_rounds or man["B"] != B:
                # resuming with different move/bucket knobs silently changes
                # the fixpoint — refuse, like the engine's checkpoint guards
                raise ValueError(
                    f"louvain checkpoint level={lvl} was written with "
                    f"max_rounds={man['max_rounds']}, B={man['B']} — rerun with "
                    "the same knobs or a fresh checkpoint_dir"
                )
            d = _os.path.join(ck, f"level={lvl}")
            adj = _mat(_rd.read_parquet(_os.path.join(d, "adj")), B)
            S = _mat(_rd.read_parquet(_os.path.join(d, "S")), B)
            mapping = _mat(_rd.read_parquet(_os.path.join(d, "mapping")), B)
            m2 = man["m2"]
            info["m2"] = int(m2)
            info["history"] = man["history"]
            info["levels"] = lvl + 1
            start_level = lvl + 1
            _log(f"resumed from checkpoint level {lvl}")
    if start_level == 0:
        adj = _mat(symmetrize_weighted(edges, B, weight_col=weight_col), B)
        _log(f"symmetrized: {adj.count()} adjacency rows, B={B}")
        m2 = adj.sum("w") or 0
        info["m2"] = int(m2)
        if m2 == 0:
            return (
                adj.map_batches(
                    lambda b: _OUT_SCHEMA.empty_table(),
                    batch_format="pyarrow",
                    batch_size=None,
                ),
                info,
            )
        S = _mat(_init_nodes(adj, B), B)
    for level in range(start_level, max_levels):
        level_moves = 0
        zero_streak = 0
        rounds = 0
        for r in range(max_rounds):
            Sa = _mat(_attach_volumes(S, B), B)
            S, mv = _mat_with_sum(_local_move_round(adj, Sa, r, m2, B), B, "moved")
            _log(f"level {level} round {r}: {mv} moves")
            rounds += 1
            level_moves += mv
            zero_streak = zero_streak + 1 if mv == 0 else 0
            if zero_streak >= 2:
                break
        info["history"].append({"level": level, "rounds": rounds, "moves": level_moves})
        if level_moves == 0:
            break
        info["levels"] = level + 1
        node2lab = S.select_columns(["vid", "label"])
        mapping = (
            node2lab.materialize()
            if mapping is None
            else _mat(_compose_mapping(mapping, S, B), B)
        )
        Sa = _mat(_attach_volumes(S, B), B)
        adj = _mat(_contract(adj, Sa, B), B)
        S = _mat(_communities(Sa, B), B)
        _log(f"level {level} contracted: {S.count()} communities, {adj.count()} edges")
        if ck:
            # write-then-rename-manifest: a level is resumable only once its
            # three tables are fully on disk (the K1-K4 atomicity contract)
            d = _os.path.join(ck, f"level={level}")
            import shutil as _shutil

            if _os.path.isdir(d):
                _shutil.rmtree(d)
            adj.write_parquet(_os.path.join(d, "adj"))
            S.write_parquet(_os.path.join(d, "S"))
            mapping.write_parquet(_os.path.join(d, "mapping"))
            tmp = _os.path.join(d, ".manifest.tmp")
            with open(tmp, "w") as f:
                _json.dump({"level": level, "m2": int(m2), "B": B,
                            "max_rounds": max_rounds,
                            "history": info["history"]}, f)
            _os.replace(tmp, _os.path.join(d, "manifest.json"))
            _log(f"level {level} checkpointed")
    info["modularity"] = round(_modularity_final(adj, S, m2), 9)
    if mapping is None:  # nothing ever moved: every vertex its own community
        mapping = S.select_columns(["vid", "label"])
    out = mapping.map_batches(
        lambda b: pa.table({"vid": b["vid"], "community": b["label"]}).cast(_OUT_SCHEMA),
        batch_format="pyarrow",
        batch_size=None,
    )
    return out, info
