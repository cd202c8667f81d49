"""Descriptive link-graph statistics over an edge Dataset.

The audit metrics a web-crawl pipeline reports next to the iterative
programs: degree distribution, edge reciprocity, average neighbor
out-degree, and co-citation similarity (related pages à la Dean &
Henzinger). The reference engine only materializes raw degree files
(/root/reference/src/graph/graph.go:389-420 Degree.<i>); these extend that
inventory with the standard graph-shape reports, each expressed as the
engine's one-bucketed-shuffle pattern: per-batch vectorized partials →
hash-bucket groupby → one vectorized pass per bucket. No driver-side loops;
every stage streams.

Scale notes (100 TB): every operator here shuffles O(|E|) rows exactly once
(plus one O(distinct keys) reduce); co-citation additionally expands
per-source neighbor pairs, which is O(Σ d_src²) — the ``max_source_degree``
knob is the celebrity-page guard for power-law graphs (standard practice:
a shopping-cart page linked from every product page would otherwise emit
billions of pairs).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ray.data import Dataset

from drone_ray.hashing import mix64
from drone_ray.pipelines._util import pin_schema
from drone_ray.stages.edges import out_degrees

_B = 32
_GOLDEN = np.uint64(0x9E3779B97F4A7C15)


def _pair_bucket(a: np.ndarray, b: np.ndarray, num_buckets: int) -> np.ndarray:
    with np.errstate(over="ignore"):
        return ((mix64(a) * _GOLDEN + mix64(b)) % np.uint64(num_buckets)).astype(np.int64)


def degree_distribution(edges: Dataset, num_buckets: int = _B) -> Dataset:
    """(out_degree, n_vertices) histogram of the out-degree sequence.

    out_degrees is itself a bucketed reduce; the histogram is a second tiny
    reduce keyed by the degree value (distinct degrees ≪ |V| on power-law
    graphs, so the final shuffle is near-free)."""

    def partial(b: pa.Table) -> pa.Table:
        d = b["out_degree"].to_numpy(zero_copy_only=False)
        uniq, cnt = np.unique(d, return_counts=True)
        return pa.table(
            {
                "out_degree": pa.array(uniq, pa.int64()),
                "_c": pa.array(cnt, pa.int64()),
                "_b": pa.array((mix64(uniq) % np.uint64(num_buckets)).astype(np.int64)),
            }
        )

    def finish(g: pd.DataFrame) -> pd.DataFrame:
        agg = g.groupby("out_degree", sort=False)["_c"].sum().reset_index()
        return pd.DataFrame(
            {"out_degree": agg["out_degree"], "n_vertices": agg["_c"]}
        )

    schema = pa.schema([("out_degree", pa.int64()), ("n_vertices", pa.int64())])
    return (
        out_degrees(edges)
        .map_batches(partial, batch_format="pyarrow", batch_size=None)
        .groupby("_b")
        .map_groups(finish, batch_format="pandas")
        .map_batches(pin_schema(schema), batch_format="pyarrow", batch_size=None)
    )


def reciprocity(edges: Dataset, num_buckets: int = _B) -> Dataset:
    """One row: (n_edges, n_reciprocal, reciprocity) over a DEDUPED directed
    edge table without self-loops. An edge (a, b) is reciprocal iff (b, a)
    is also present; ``reciprocity`` = reciprocal edges / all edges — the
    classic mutual-link fraction of a web graph.

    Both directions of an unordered pair land in the same hash({lo,hi})
    bucket, so the mutual test is a per-bucket sorted run-length check —
    each edge row moves exactly once."""

    def partial(b: pa.Table) -> pa.Table:
        s = b["src"].to_numpy(zero_copy_only=False)
        d = b["dst"].to_numpy(zero_copy_only=False)
        lo = np.minimum(s, d)
        hi = np.maximum(s, d)
        return pa.table(
            {
                "lo": pa.array(lo, pa.int64()),
                "hi": pa.array(hi, pa.int64()),
                "_b": pa.array(_pair_bucket(lo, hi, num_buckets)),
            }
        )

    def finish(g: pd.DataFrame) -> pd.DataFrame:
        lo = g["lo"].to_numpy()
        hi = g["hi"].to_numpy()
        n = lo.size
        if n == 0:
            return pd.DataFrame({"n_edges": [0], "n_reciprocal": [0]})
        order = np.lexsort((hi, lo))
        sl, sh = lo[order], hi[order]
        new = np.empty(n, dtype=bool)
        new[0] = True
        new[1:] = (sl[1:] != sl[:-1]) | (sh[1:] != sh[:-1])
        starts = np.flatnonzero(new)
        runs = np.diff(np.append(starts, n))
        # input is exact-deduped, so a run of 2 == both directions present
        return pd.DataFrame(
            {"n_edges": [int(n)], "n_reciprocal": [int((runs == 2).sum() * 2)]}
        )

    def total(g: pd.DataFrame) -> pd.DataFrame:
        ne = int(g["n_edges"].sum())
        nr = int(g["n_reciprocal"].sum())
        return pd.DataFrame(
            {
                "n_edges": [ne],
                "n_reciprocal": [nr],
                "reciprocity": [round(nr / ne, 6) if ne else 0.0],
            }
        )

    schema = pa.schema(
        [("n_edges", pa.int64()), ("n_reciprocal", pa.int64()), ("reciprocity", pa.float64())]
    )
    return (
        edges.select_columns(["src", "dst"])
        .map_batches(partial, batch_format="pyarrow", batch_size=None)
        .groupby("_b")
        .map_groups(finish, batch_format="pandas")
        .map_batches(lambda b: b.append_column("_k", pa.array([0] * len(b), pa.int64())),
                     batch_format="pyarrow", batch_size=None)
        .groupby("_k")
        .map_groups(total, batch_format="pandas")
        .map_batches(pin_schema(schema), batch_format="pyarrow", batch_size=None)
    )


def avg_neighbor_degree(edges: Dataset, num_buckets: int = _B) -> Dataset:
    """(src, avg_nbr_degree): mean out-degree of each vertex's out-neighbors
    (a neighbor with no out-edges counts 0) — the assortativity ingredient.

    Two-hop bucketed join, no broadcast: edge rows keyed by dst and degree
    rows keyed by vid meet in hash(key) buckets (the degree table is O(|V|)
    — too big to broadcast at web scale); per-bucket searchsorted lookup,
    then per-src partial sums reduce through a second hash(src) shuffle."""
    degs = out_degrees(edges)

    def edge_rows(b: pa.Table) -> pa.Table:
        s = b["src"].to_numpy(zero_copy_only=False)
        d = b["dst"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "key": pa.array(d, pa.int64()),
                "val": pa.array(s, pa.int64()),
                "side": pa.array(np.zeros(s.size, np.int8)),
                "_b": pa.array((mix64(d) % np.uint64(num_buckets)).astype(np.int64)),
            }
        )

    def deg_rows(b: pa.Table) -> pa.Table:
        v = b["src"].to_numpy(zero_copy_only=False)
        od = b["out_degree"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "key": pa.array(v, pa.int64()),
                "val": pa.array(od, pa.int64()),
                "side": pa.array(np.ones(v.size, np.int8)),
                "_b": pa.array((mix64(v) % np.uint64(num_buckets)).astype(np.int64)),
            }
        )

    def join_bucket(g: pd.DataFrame) -> pd.DataFrame:
        side = g["side"].to_numpy()
        key = g["key"].to_numpy()
        val = g["val"].to_numpy()
        dk = key[side == 1]
        dv = val[side == 1]
        order = np.argsort(dk, kind="stable")
        dk, dv = dk[order], dv[order]
        ek = key[side == 0]  # the dst being looked up
        es = val[side == 0]  # the src accumulating the average
        if es.size == 0:
            return pd.DataFrame({"src": [], "sum_od": [], "n": []})
        if dk.size == 0:
            od = np.zeros(es.size, np.int64)
        else:
            pos = np.minimum(np.searchsorted(dk, ek), dk.size - 1)
            od = np.where(dk[pos] == ek, dv[pos], 0)
        # per-src partial (sum, count) inside the bucket — integer-domain
        # accumulation (bincount weights round through float64 above 2^53)
        us, inv = np.unique(es, return_inverse=True)
        sums = np.zeros(us.size, np.int64)
        np.add.at(sums, inv, od.astype(np.int64))
        cnts = np.bincount(inv)
        return pd.DataFrame({"src": us, "sum_od": sums, "n": cnts})

    def rebucket(b: pa.Table) -> pa.Table:
        if not b.num_columns or len(b) == 0:
            return pa.table(
                {
                    "src": pa.array([], pa.int64()),
                    "sum_od": pa.array([], pa.int64()),
                    "n": pa.array([], pa.int64()),
                    "_b2": pa.array([], pa.int64()),
                }
            )
        b = b.cast(pa.schema([("src", pa.int64()), ("sum_od", pa.int64()), ("n", pa.int64())]))
        s = b["src"].to_numpy(zero_copy_only=False)
        return b.append_column(
            "_b2", pa.array((mix64(s) % np.uint64(num_buckets)).astype(np.int64))
        )

    def finish(g: pd.DataFrame) -> pd.DataFrame:
        agg = g.groupby("src", sort=False).agg(sum_od=("sum_od", "sum"), n=("n", "sum"))
        avg = np.round(agg["sum_od"].to_numpy() / agg["n"].to_numpy(), 6)
        return pd.DataFrame({"src": agg.index.to_numpy(), "avg_nbr_degree": avg})

    schema = pa.schema([("src", pa.int64()), ("avg_nbr_degree", pa.float64())])
    both = edges.select_columns(["src", "dst"]).map_batches(
        edge_rows, batch_format="pyarrow", batch_size=None
    ).union(degs.map_batches(deg_rows, batch_format="pyarrow", batch_size=None))
    return (
        both.groupby("_b")
        .map_groups(join_bucket, batch_format="pandas")
        .map_batches(rebucket, batch_format="pyarrow", batch_size=None)
        .groupby("_b2")
        .map_groups(finish, batch_format="pandas")
        .map_batches(pin_schema(schema), batch_format="pyarrow", batch_size=None)
    )


def _copair(
    edges: Dataset,
    min_common: int,
    max_source_degree: int | None,
    num_buckets: int,
    weighted: bool,
) -> Dataset:
    """Shared co-citation pair pipeline (cocitation / adamic_adar). Stage 1
    groups each source's out-list into one hash(src) bucket and expands its
    neighbor pairs fully vectorized (repeat/cumsum, the triangles.py wedge
    pattern); because the grouping key is the source, the run length IS the
    global out-degree, so the Adamic-Adar weight 1/ln(deg) is a per-run
    constant. Stage 2 sums partial (count[, weight]) rows through a
    hash(a, b) shuffle and filters. ``max_source_degree`` skips sources with
    larger out-lists (the Σd² guard at web scale; None = no cap, used where
    the oracle must see every pair)."""

    def tag(b: pa.Table) -> pa.Table:
        s = b["src"].to_numpy(zero_copy_only=False)
        return b.append_column(
            "_b", pa.array((mix64(s) % np.uint64(num_buckets)).astype(np.int64))
        )

    def _empty() -> pd.DataFrame:
        cols = {
            "a": pd.Series([], dtype=np.int64),
            "b": pd.Series([], dtype=np.int64),
            "c": pd.Series([], dtype=np.int64),
        }
        if weighted:
            cols["w"] = pd.Series([], dtype=np.float64)
        return pd.DataFrame(cols)

    def expand(g: pd.DataFrame) -> pd.DataFrame:
        s = g["src"].to_numpy()
        d = g["dst"].to_numpy()
        if s.size == 0:
            return _empty()
        order = np.lexsort((d, s))
        s, d = s[order], d[order]
        new = np.empty(s.size, dtype=bool)
        new[0] = True
        new[1:] = s[1:] != s[:-1]
        starts = np.flatnonzero(new)
        lens = np.diff(np.append(starts, s.size))
        if max_source_degree is not None:
            keep = lens <= max_source_degree
            starts, lens = starts[keep], lens[keep]
        keep = lens >= 2  # runs of one emit no pairs (and ln(1) = 0)
        starts, lens = starts[keep], lens[keep]
        npairs = lens * (lens - 1) // 2
        total = int(npairs.sum())
        if total == 0:
            return _empty()
        # vectorized pair expansion (the triangles.py wedge pattern): each
        # row at within-run position p pairs with the L-1-p rows after it
        rows = np.repeat(starts, lens) + (
            np.arange(int(lens.sum())) - np.repeat(np.cumsum(lens) - lens, lens)
        )
        p = rows - np.repeat(starts, lens)
        rep = np.repeat(lens, lens) - 1 - p  # pairs led by each row
        i_glob = np.repeat(rows, rep)
        j_off = np.arange(total) - np.repeat(np.cumsum(rep) - rep, rep)
        j_glob = i_glob + j_off + 1
        a = d[i_glob]
        b = d[j_glob]
        key = np.stack([a, b], axis=1)  # within-run d is sorted ⇒ a < b
        uk, inv = np.unique(key, axis=0, return_inverse=True)
        out = {"a": uk[:, 0], "b": uk[:, 1], "c": np.bincount(inv)}
        if weighted:
            # per-occurrence weight = the source run's 1/ln(outdeg)
            run_w = 1.0 / np.log(lens.astype(np.float64))
            w_occ = np.repeat(np.repeat(run_w, lens), rep)
            out["w"] = np.bincount(inv, weights=w_occ)
        return pd.DataFrame(out)

    fields = [("a", pa.int64()), ("b", pa.int64()), ("c", pa.int64())] + (
        [("w", pa.float64())] if weighted else []
    )
    mid_schema = pa.schema(fields)

    def rebucket(b: pa.Table) -> pa.Table:
        if not b.num_columns or len(b) == 0:
            t = mid_schema.empty_table()
            return t.append_column("_b2", pa.array([], pa.int64()))
        b = b.cast(mid_schema)
        a = b["a"].to_numpy(zero_copy_only=False)
        bb = b["b"].to_numpy(zero_copy_only=False)
        return b.append_column("_b2", pa.array(_pair_bucket(a, bb, num_buckets)))

    def finish(g: pd.DataFrame) -> pd.DataFrame:
        aggs = {"c": ("c", "sum")}
        if weighted:
            aggs["w"] = ("w", "sum")
        agg = g.groupby(["a", "b"], sort=False).agg(**aggs).reset_index()
        agg = agg[agg["c"] >= min_common]
        out = {"a": agg["a"], "b": agg["b"], "n_common": agg["c"]}
        if weighted:
            # round after the final sum so value hashes are stable across
            # summation orders (float error ~1e-16·n ≪ the 1e-6 grid)
            out["aa_score"] = np.round(agg["w"].to_numpy(), 6)
        return pd.DataFrame(out)

    schema = pa.schema(
        [("a", pa.int64()), ("b", pa.int64()), ("n_common", pa.int64())]
        + ([("aa_score", pa.float64())] if weighted else [])
    )
    return (
        edges.select_columns(["src", "dst"])
        .map_batches(tag, batch_format="pyarrow", batch_size=None)
        .groupby("_b")
        .map_groups(expand, batch_format="pandas")
        .map_batches(rebucket, batch_format="pyarrow", batch_size=None)
        .groupby("_b2")
        .map_groups(finish, batch_format="pandas")
        .map_batches(pin_schema(schema), batch_format="pyarrow", batch_size=None)
    )


def cocitation(
    edges: Dataset,
    min_common: int = 2,
    max_source_degree: int | None = None,
    num_buckets: int = _B,
) -> Dataset:
    """(a, b, n_common) pairs of vertices co-cited by ≥ ``min_common``
    common sources (a < b) — the related-page signal of Dean & Henzinger,
    "Finding related pages in the World Wide Web" (1999). See _copair for
    the two-shuffle shape and the Σd² guard."""
    return _copair(edges, min_common, max_source_degree, num_buckets, weighted=False)


def adamic_adar(
    edges: Dataset,
    min_common: int = 2,
    max_source_degree: int | None = None,
    num_buckets: int = _B,
) -> Dataset:
    """Adamic–Adar link-prediction scores over co-cited pairs: for every
    (a, b) with ≥ ``min_common`` common in-linking sources,
    ``aa_score = Σ_{u: u→a, u→b} 1 / ln(outdeg(u))`` (Adamic & Adar,
    "Friends and neighbors on the Web", Social Networks 2003) — the
    rare-source-weighted twin of :func:`cocitation`. Same pipeline
    (_copair) with the per-run weight column enabled."""
    return _copair(edges, min_common, max_source_degree, num_buckets, weighted=True)


def bibliographic_coupling(
    edges: Dataset,
    min_common: int = 2,
    max_source_degree: int | None = None,
    num_buckets: int = _B,
) -> Dataset:
    """Bibliographic coupling (Kessler 1963): pairs (a, b) of SOURCES that
    link to ≥ ``min_common`` common destinations — the out-neighborhood
    dual of :func:`cocitation` (two pages citing the same references are
    related, vs. two pages cited together). Implemented as the identical
    _copair pipeline on the swapped edge set: grouping by (old) dst pairs
    the (old) srcs, so ``max_source_degree`` here caps the IN-degree of the
    shared destination (the celebrity-target guard)."""

    def swap(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "src" not in b.schema.names:
            return pa.schema([("src", pa.int64()), ("dst", pa.int64())]).empty_table()
        return pa.table({"src": b["dst"], "dst": b["src"]})

    swapped = edges.select_columns(["src", "dst"]).map_batches(
        swap, batch_format="pyarrow", batch_size=None
    )
    return _copair(swapped, min_common, max_source_degree, num_buckets, weighted=False)


def jaccard_pairs(
    edges: Dataset,
    min_common: int = 2,
    max_source_degree: int | None = None,
    num_buckets: int = _B,
) -> Dataset:
    """In-neighborhood Jaccard link prediction over co-cited pairs: for
    every (a, b) with ≥ ``min_common`` common in-linking sources,
    ``jaccard = |in(a) ∩ in(b)| / |in(a) ∪ in(b)|``, with the union
    expanded as ``indeg(a) + indeg(b) − common`` so no neighbor set is
    ever materialized (Salton/Jaccard neighborhood similarity; see
    Liben-Nowell & Kleinberg, "The link-prediction problem for social
    networks", 2003). Returns (a, b, n_common, jaccard).

    Shape: the :func:`_copair` pair expansion (one hash(src) bucket pass +
    one hash(a,b) reduce) followed by TWO more bucketed degree-attach
    exchanges — indeg(a) in hash(a) buckets, indeg(b) in hash(b) buckets —
    the degree_assortativity pattern: the O(|V|) in-degree table rides the
    shuffle as tagged rows, never a broadcast, never a driver join."""
    from drone_ray.stages.edges import in_degrees

    pairs = _copair(edges, min_common, max_source_degree, num_buckets, weighted=False)
    # the O(|V|) degree table feeds BOTH attach hops — materialize once so
    # lineage re-execution doesn't run its shuffle twice (the justified
    # small-side materialize, same stance as triangles.py)
    idg = in_degrees(edges).materialize()

    hop1_schema = pa.schema(
        [
            ("key", pa.int64()),  # the vertex whose indeg we look up this hop
            ("other", pa.int64()),
            ("c", pa.int64()),
            ("deg", pa.int64()),
            ("side", pa.int8()),  # 0 = pair row, 1 = degree row
            ("_b", pa.int64()),
        ]
    )

    def pair_rows(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "a" not in b.schema.names:
            return hop1_schema.empty_table()
        a = b["a"].to_numpy(zero_copy_only=False)
        bb = b["b"].to_numpy(zero_copy_only=False)
        c = b["n_common"].to_numpy(zero_copy_only=False)
        z = np.zeros(a.size, np.int64)
        return pa.table(
            {
                "key": pa.array(a, pa.int64()),
                "other": pa.array(bb, pa.int64()),
                "c": pa.array(c, pa.int64()),
                "deg": pa.array(z),
                "side": pa.array(np.zeros(a.size, np.int8)),
                "_b": pa.array((mix64(a) % np.uint64(num_buckets)).astype(np.int64)),
            }
        )

    def deg_rows(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "dst" not in b.schema.names:
            return hop1_schema.empty_table()
        v = b["dst"].to_numpy(zero_copy_only=False)
        dg = b["in_degree"].to_numpy(zero_copy_only=False)
        z = np.zeros(v.size, np.int64)
        return pa.table(
            {
                "key": pa.array(v, pa.int64()),
                "other": pa.array(z),
                "c": pa.array(z),
                "deg": pa.array(dg.astype(np.int64)),
                "side": pa.array(np.ones(v.size, np.int8)),
                "_b": pa.array((mix64(v) % np.uint64(num_buckets)).astype(np.int64)),
            }
        )

    def _deg_lookup(g: pd.DataFrame):
        """(pair-row mask rows, looked-up degree) inside one bucket."""
        side = g["side"].to_numpy()
        key = g["key"].to_numpy()
        dk = key[side == 1]
        dv = g["deg"].to_numpy()[side == 1]
        order = np.argsort(dk, kind="stable")
        dk, dv = dk[order], dv[order]
        pk = key[side == 0]
        # every pair endpoint is an edge dst ⇒ it HAS an in-degree row
        pos = np.minimum(np.searchsorted(dk, pk), max(dk.size - 1, 0))
        deg = dv[pos] if dk.size else np.zeros(pk.size, np.int64)
        return side == 0, pk, deg

    def attach_a(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0 or "key" not in g.columns:
            return pd.DataFrame(
                {
                    c: pd.Series([], dtype=t)
                    for c, t in (
                        ("key", np.int64), ("other", np.int64), ("c", np.int64),
                        ("deg", np.int64), ("side", np.int8), ("_b", np.int64),
                    )
                }
            )
        is_pair, pk, da = _deg_lookup(g)
        b_v = g["other"].to_numpy()[is_pair]  # rekey on b for hop 2
        out = pd.DataFrame(
            {
                "key": b_v,
                "other": pk,
                "c": g["c"].to_numpy()[is_pair],
                "deg": da,
                "side": np.int8(0),
            }
        )
        out["_b"] = (mix64(b_v) % np.uint64(num_buckets)).astype(np.int64)
        return out

    out_schema = pa.schema(
        [
            ("a", pa.int64()),
            ("b", pa.int64()),
            ("n_common", pa.int64()),
            ("jaccard", pa.float64()),
        ]
    )

    def finish(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0 or "key" not in g.columns:
            return pd.DataFrame(
                {
                    "a": pd.Series([], dtype=np.int64),
                    "b": pd.Series([], dtype=np.int64),
                    "n_common": pd.Series([], dtype=np.int64),
                    "jaccard": pd.Series([], dtype=np.float64),
                }
            )
        is_pair, bk, db = _deg_lookup(g)
        a_v = g["other"].to_numpy()[is_pair]
        c = g["c"].to_numpy()[is_pair]
        da = g["deg"].to_numpy()[is_pair]
        union = da + db - c
        j = c / union.astype(np.float64)
        return pd.DataFrame(
            {
                "a": a_v,
                "b": bk,
                "n_common": c,
                # half-AWAY-from-zero to the 1e-6 grid (DuckDB round()):
                # jaccard is a small rational (e.g. 5/128 = 0.0390625) that
                # lands exactly on .5 ulps, where np.round's half-to-even
                # diverges from the oracle
                "jaccard": np.floor(j * 1e6 + 0.5) / 1e6,
            }
        )

    hop1 = pairs.map_batches(pair_rows, batch_format="pyarrow", batch_size=None).union(
        idg.map_batches(deg_rows, batch_format="pyarrow", batch_size=None)
    )
    hop2 = (
        hop1.groupby("_b")
        .map_groups(attach_a, batch_format="pandas")
        # union() requires uniform block types: re-pin the pandas groups to
        # Arrow so they can join the Arrow-formatted degree stream
        .map_batches(pin_schema(hop1_schema), batch_format="pyarrow", batch_size=None)
        .union(idg.map_batches(deg_rows, batch_format="pyarrow", batch_size=None))
    )
    return (
        hop2.groupby("_b")
        .map_groups(finish, batch_format="pandas")
        .map_batches(pin_schema(out_schema), batch_format="pyarrow", batch_size=None)
    )


def contract_edges(
    edges: Dataset,
    block: int,
    drop_intra: bool = True,
    num_buckets: int = _B,
) -> Dataset:
    """Graph coarsening: contract vertices into groups (group id = vid //
    block) and aggregate the multi-edges between groups into one weighted
    edge each — the page-graph → host-graph contraction a web pipeline runs
    before site-level analytics (block plays the role of the host prefix in
    the hash_url id layout; any monotone vid→group map would do).

    One bucketed shuffle: per-batch vectorized partial counts per
    (gsrc, gdst), hash-bucket groupby, per-bucket reduce. Output streams;
    the contracted graph is |groups|², typically orders of magnitude
    smaller than the input."""

    def partial(b: pa.Table) -> pa.Table:
        s = b["src"].to_numpy(zero_copy_only=False) // block
        d = b["dst"].to_numpy(zero_copy_only=False) // block
        if drop_intra:
            keep = s != d
            s, d = s[keep], d[keep]
        pairs = np.stack([s, d], axis=1)
        uniq, cnt = np.unique(pairs, axis=0, return_counts=True)
        gs, gd = uniq[:, 0], uniq[:, 1]
        return pa.table(
            {
                "hsrc": pa.array(gs, pa.int64()),
                "hdst": pa.array(gd, pa.int64()),
                "_c": pa.array(cnt, pa.int64()),
                "_b": pa.array(_pair_bucket(gs, gd, num_buckets)),
            }
        )

    def finish(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby(["hsrc", "hdst"], as_index=False)["_c"].sum()
        return out.rename(columns={"_c": "weight"})

    schema = pa.schema([("hsrc", pa.int64()), ("hdst", pa.int64()), ("weight", pa.int64())])
    return (
        edges.map_batches(partial, batch_format="pyarrow", batch_size=None)
        .groupby("_b")
        .map_groups(finish, batch_format="pandas")
        .map_batches(pin_schema(schema), batch_format="pyarrow", batch_size=None)
    )


def degree_assortativity(edges: Dataset, num_buckets: int = _B) -> pa.Table:
    """One-row (assortativity) — Pearson correlation of (out_degree(src),
    in_degree(dst)) over the deduped directed edges (out-in degree
    assortativity, Newman 2002; SQL oracle = plain ``corr()``).

    Fully distributed: out-degrees attach to edge rows in hash(src)
    buckets, in-degrees in hash(dst) buckets (two two-sided bucketed
    joins — the degree tables are O(|V|), never broadcast), then each
    bucket reduces to ONE (n, Σx, Σy, Σxx, Σyy, Σxy) moment row; the
    driver combines ≤B moment rows into the scalar."""
    from drone_ray.stages.edges import dedup_edges, in_degrees

    e = dedup_edges(edges)
    od = out_degrees(e)
    idg = in_degrees(e)

    def e_src_rows(b: pa.Table) -> pa.Table:
        s = b["src"].to_numpy(zero_copy_only=False)
        d = b["dst"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "key": pa.array(s, pa.int64()),
                "other": pa.array(d, pa.int64()),
                "deg": pa.array(np.zeros(s.size, np.int64)),
                "side": pa.array(np.zeros(s.size, np.int8)),
                "_b": pa.array((mix64(s) % np.uint64(num_buckets)).astype(np.int64)),
            }
        )

    def deg_rows(b: pa.Table, vcol: str, dcol: str) -> pa.Table:
        v = b[vcol].to_numpy(zero_copy_only=False)
        dg = b[dcol].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "key": pa.array(v, pa.int64()),
                "other": pa.array(np.zeros(v.size, np.int64)),
                "deg": pa.array(dg.astype(np.int64), pa.int64()),
                "side": pa.array(np.ones(v.size, np.int8)),
                "_b": pa.array((mix64(v) % np.uint64(num_buckets)).astype(np.int64)),
            }
        )

    def _lookup(g: pd.DataFrame):
        side = g["side"].to_numpy()
        key = g["key"].to_numpy()
        dk = key[side == 1]
        dv = g["deg"].to_numpy()[side == 1]
        order = np.argsort(dk, kind="stable")
        dk, dv = dk[order], dv[order]
        ek = key[side == 0]
        pos = np.minimum(np.searchsorted(dk, ek), max(dk.size - 1, 0))
        # every edge endpoint has a degree row by construction
        return ek, g["other"].to_numpy()[side == 0], dv[pos] if dk.size else np.zeros(ek.size, np.int64)

    def attach_src(g: pd.DataFrame) -> pd.DataFrame:
        _, dst, sdeg = _lookup(g)
        out = pd.DataFrame({"key": dst, "other": np.zeros(dst.size, np.int64), "deg": sdeg})
        out["side"] = np.int8(0)
        out["_b2"] = (mix64(dst) % np.uint64(num_buckets)).astype(np.int64)
        return out

    def deg_rows2(b: pa.Table) -> pa.Table:
        v = b["dst"].to_numpy(zero_copy_only=False)
        dg = b["in_degree"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "key": pa.array(v, pa.int64()),
                "other": pa.array(np.zeros(v.size, np.int64)),
                "deg": pa.array(dg.astype(np.int64), pa.int64()),
                "side": pa.array(np.ones(v.size, np.int8)),
                "_b2": pa.array((mix64(v) % np.uint64(num_buckets)).astype(np.int64)),
            }
        )

    def moments(g: pd.DataFrame) -> pd.DataFrame:
        side = g["side"].to_numpy()
        key = g["key"].to_numpy()
        dk = key[side == 1]
        dv = g["deg"].to_numpy()[side == 1]
        order = np.argsort(dk, kind="stable")
        dk, dv = dk[order], dv[order]
        ek = key[side == 0]
        x = g["deg"].to_numpy()[side == 0].astype(np.float64)  # out_degree(src)
        if ek.size == 0:
            return pd.DataFrame(
                {"n": [0], "sx": [0.0], "sy": [0.0], "sxx": [0.0], "syy": [0.0], "sxy": [0.0]}
            )
        pos = np.minimum(np.searchsorted(dk, ek), max(dk.size - 1, 0))
        y = (dv[pos] if dk.size else np.zeros(ek.size, np.int64)).astype(np.float64)
        return pd.DataFrame(
            {
                "n": [int(ek.size)],
                "sx": [float(x.sum())],
                "sy": [float(y.sum())],
                "sxx": [float((x * x).sum())],
                "syy": [float((y * y).sum())],
                "sxy": [float((x * y).sum())],
            }
        )

    hop1 = (
        e.map_batches(e_src_rows, batch_format="pyarrow", batch_size=None)
        .union(
            od.map_batches(
                lambda b: deg_rows(b, "src", "out_degree"),
                batch_format="pyarrow",
                batch_size=None,
            )
        )
        .groupby("_b")
        .map_groups(attach_src, batch_format="pandas")
        # normalize to Arrow blocks: the next union's other side is Arrow,
        # and Ray's sort refuses mixed block types
        .map_batches(lambda b: b, batch_format="pyarrow", batch_size=None)
    )
    mom = (
        hop1.union(idg.map_batches(deg_rows2, batch_format="pyarrow", batch_size=None))
        .groupby("_b2")
        .map_groups(moments, batch_format="pandas")
        .to_pandas()
    )
    n = float(mom["n"].sum())
    if n == 0:
        return pa.table({"assortativity": pa.array([None], pa.float64())})
    sx, sy = float(mom["sx"].sum()), float(mom["sy"].sum())
    sxx, syy, sxy = float(mom["sxx"].sum()), float(mom["syy"].sum()), float(mom["sxy"].sum())
    cov = sxy - sx * sy / n
    vx = sxx - sx * sx / n
    vy = syy - sy * sy / n
    r = cov / np.sqrt(vx * vy) if vx > 0 and vy > 0 else None
    return pa.table(
        {
            "assortativity": pa.array(
                [round(r, 6) if r is not None else None], pa.float64()
            )
        }
    )


def modularity_q(
    edges_factory,
    labels: Dataset,
    num_partitions: int = 4,
) -> pa.Table:
    """Newman modularity Q = Σ_c (m_c/m − (d_c/2m)²) of a labeling over the
    undirected simple view of a directed edge Dataset. Fully distributed:
    per-community (intra-edge count, degree sum) tallies form in ONE
    bucketed groupby over unioned tagged rows — intra edges contribute
    (label, 1, 0), vertex degrees contribute (label, 0, degree) — then a
    map_batches computes per-community Q terms and a global (sum, count)
    aggregate reduces them. The driver never holds a per-community table
    (communities can approach O(V) on fragmented graphs); it sees only the
    final scalars. Extension beyond the reference (which has no community
    metrics), on its plugin surface
    (/root/reference/src/protobuf/worker_service.proto:11-22).

    ``labels``: Dataset (vid, label) covering every vertex of the graph.
    Returns a one-row table (n_communities, m_edges, modularity)."""
    import pyarrow.compute as pc

    from ray.data.aggregate import Count, Sum

    from drone_ray.stages.edges import dedup_edges, symmetrize

    und = dedup_edges(symmetrize(edges_factory())).map_batches(
        lambda b: pa.table(
            {
                "u": pc.min_element_wise(b["src"], b["dst"]),
                "v": pc.max_element_wise(b["src"], b["dst"]),
            }
        ),
        batch_format="pyarrow",
        batch_size=None,
    )
    # (u, v) deduped pairs, u < v, self-loops excluded upstream
    und = dedup_edges(
        und.map_batches(
            lambda b: pa.table({"src": b["u"], "dst": b["v"]}),
            batch_format="pyarrow",
            batch_size=None,
        )
    )
    lu = labels.map_batches(
        lambda b: pa.table({"src": b["vid"], "lu": b["label"]}),
        batch_format="pyarrow",
        batch_size=None,
    )
    lv = labels.map_batches(
        lambda b: pa.table({"dst": b["vid"], "lv": b["label"]}),
        batch_format="pyarrow",
        batch_size=None,
    )
    tagged = und.join(lu, join_type="inner", num_partitions=num_partitions, on=("src",)).join(
        lv, join_type="inner", num_partitions=num_partitions, on=("dst",)
    )
    # intra-edge selection is a vectorized Arrow mask, not a per-row filter
    intra = tagged.map_batches(
        lambda b: b.filter(pc.equal(b["lu"], b["lv"])),
        batch_format="pyarrow",
        batch_size=None,
    )
    mc_rows = intra.map_batches(
        lambda b: pa.table(
            {
                "label": b["lu"],
                "m_c": pa.array(np.ones(b.num_rows, np.int64), pa.int64()),
                "d_c": pa.array(np.zeros(b.num_rows, np.int64), pa.int64()),
            }
        ),
        batch_format="pyarrow",
        batch_size=None,
    )
    deg = out_degrees(dedup_edges(symmetrize(edges_factory()))).map_batches(
        lambda b: pa.table({"vid": b["src"], "degree": b["out_degree"]}),
        batch_format="pyarrow",
        batch_size=None,
    )
    dc_rows = labels.join(
        deg, join_type="inner", num_partitions=num_partitions, on=("vid",)
    ).map_batches(
        lambda b: pa.table(
            {
                "label": b["label"],
                "m_c": pa.array(np.zeros(b.num_rows, np.int64), pa.int64()),
                "d_c": b["degree"].cast(pa.int64()),
            }
        ),
        batch_format="pyarrow",
        batch_size=None,
    )
    per_label = mc_rows.union(dc_rows).groupby("label").aggregate(
        Sum(on="m_c", alias_name="m_c"), Sum(on="d_c", alias_name="d_c")
    )
    m = und.count()

    def qterm(b: pa.Table) -> pa.Table:
        m_c = b["m_c"].to_numpy(zero_copy_only=False).astype(np.float64)
        d_c = b["d_c"].to_numpy(zero_copy_only=False).astype(np.float64)
        return pa.table({"q": pa.array(m_c / m - (d_c / (2.0 * m)) ** 2, pa.float64())})

    agg = per_label.map_batches(qterm, batch_format="pyarrow", batch_size=None).aggregate(
        Sum(on="q", alias_name="q_sum"), Count(alias_name="n_comm")
    )
    return pa.table(
        {
            "n_communities": pa.array([int(agg["n_comm"])], pa.int64()),
            "m_edges": pa.array([int(m)], pa.int64()),
            "modularity": pa.array([round(float(agg["q_sum"]), 6)], pa.float64()),
        }
    )
