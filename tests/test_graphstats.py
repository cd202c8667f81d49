"""graphstats operators vs hand-computed oracles on planted graphs."""

import numpy as np
import pyarrow as pa

from drone_ray.pipelines.graphstats import (
    avg_neighbor_degree,
    cocitation,
    degree_distribution,
    reciprocity,
)


def _ds(src, dst):
    import ray.data as rd

    return rd.from_arrow(
        pa.table(
            {
                "src": pa.array(src, pa.int64()),
                "dst": pa.array(dst, pa.int64()),
            }
        )
    )


def test_degree_distribution():
    # out-degrees: 0→3, 1→1, 2→1, 5→1  ⇒  degree 1 × 3 vertices, 3 × 1
    e = _ds([0, 0, 0, 1, 2, 5], [1, 2, 3, 0, 0, 9])
    got = degree_distribution(e).to_pandas().sort_values("out_degree")
    assert got["out_degree"].tolist() == [1, 3]
    assert got["n_vertices"].tolist() == [3, 1]


def test_reciprocity():
    # edges: 0↔1 mutual (2 reciprocal edges), 0→2, 3→0  ⇒  2/4
    e = _ds([0, 1, 0, 3], [1, 0, 2, 0])
    got = reciprocity(e).to_pandas()
    assert got["n_edges"].tolist() == [4]
    assert got["n_reciprocal"].tolist() == [2]
    assert got["reciprocity"].tolist() == [0.5]


def test_reciprocity_none():
    e = _ds([0, 1, 2], [1, 2, 0])  # directed cycle — no mutual edge
    got = reciprocity(e).to_pandas()
    assert got["n_reciprocal"].tolist() == [0]
    assert got["reciprocity"].tolist() == [0.0]


def test_avg_neighbor_degree():
    # 0→{1,2}: deg(1)=1, deg(2)=0 → 0.5 ; 1→{0}: deg(0)=2 → 2.0
    e = _ds([0, 0, 1], [1, 2, 0])
    got = avg_neighbor_degree(e).to_pandas().sort_values("src")
    assert got["src"].tolist() == [0, 1]
    assert got["avg_nbr_degree"].tolist() == [0.5, 2.0]


def test_cocitation_planted():
    # sources 10,11,12 all cite {1,2}; 10 also cites 3
    src = [10, 10, 10, 11, 11, 12, 12]
    dst = [1, 2, 3, 1, 2, 1, 2]
    got = cocitation(_ds(src, dst), min_common=2).to_pandas()
    assert len(got) == 1
    assert got.iloc[0]["a"] == 1 and got.iloc[0]["b"] == 2 and got.iloc[0]["n_common"] == 3
    # threshold 1 also surfaces the (1,3) and (2,3) pairs from source 10
    got1 = cocitation(_ds(src, dst), min_common=1).to_pandas()
    assert len(got1) == 3


def test_cocitation_matches_brute(sized_graph=None):
    """Random graph vs O(n²) numpy oracle, including the degree cap."""
    rng = np.random.default_rng(5)
    src = rng.integers(0, 40, 600).astype(np.int64)
    dst = rng.integers(0, 40, 600).astype(np.int64)
    keep = src != dst
    src, dst = src[keep], dst[keep]
    # dedup like lg_edges does
    pairs = {(int(s), int(d)) for s, d in zip(src, dst)}
    src = np.array([p[0] for p in sorted(pairs)], np.int64)
    dst = np.array([p[1] for p in sorted(pairs)], np.int64)

    def brute(cap):
        from collections import Counter, defaultdict

        outs = defaultdict(set)
        for s, d in zip(src, dst):
            outs[int(s)].add(int(d))
        c = Counter()
        for s, ns in outs.items():
            if cap is not None and len(ns) > cap:
                continue
            ns = sorted(ns)
            for i in range(len(ns)):
                for j in range(i + 1, len(ns)):
                    c[(ns[i], ns[j])] += 1
        return c

    for cap in (None, 10):
        got = cocitation(_ds(src, dst), min_common=3, max_source_degree=cap).to_pandas()
        exp = {k: v for k, v in brute(cap).items() if v >= 3}
        gmap = {
            (int(r["a"]), int(r["b"])): int(r["n_common"]) for _, r in got.iterrows()
        }
        assert gmap == exp


def test_adamic_adar_planted():
    from drone_ray.pipelines.graphstats import adamic_adar

    # sources 10,11,12 all cite {1,2}; 10 also cites 3 (outdeg 3)
    src = [10, 10, 10, 11, 11, 12, 12]
    dst = [1, 2, 3, 1, 2, 1, 2]
    got = adamic_adar(_ds(src, dst), min_common=2).to_pandas()
    assert len(got) == 1
    r = got.iloc[0]
    assert (r["a"], r["b"], r["n_common"]) == (1, 2, 3)
    # 1/ln(3) from source 10 + 1/ln(2) from 11 and 12
    exp = 1.0 / np.log(3) + 2.0 / np.log(2)
    assert abs(r["aa_score"] - round(exp, 6)) < 1e-12


def test_adamic_adar_matches_brute():
    """Random graph vs O(n²) numpy oracle (counts and weighted scores)."""
    rng = np.random.default_rng(7)
    src = rng.integers(0, 40, 600).astype(np.int64)
    dst = rng.integers(0, 40, 600).astype(np.int64)
    keep = src != dst
    src, dst = src[keep], dst[keep]
    pairs = {(int(s), int(d)) for s, d in zip(src, dst)}
    src = np.array([p[0] for p in sorted(pairs)], np.int64)
    dst = np.array([p[1] for p in sorted(pairs)], np.int64)

    from collections import Counter, defaultdict
    from drone_ray.pipelines.graphstats import adamic_adar

    outs = defaultdict(set)
    for s, d in zip(src, dst):
        outs[int(s)].add(int(d))
    cnt, score = Counter(), defaultdict(float)
    for s, ns in outs.items():
        if len(ns) < 2:
            continue
        w = 1.0 / np.log(len(ns))
        ns = sorted(ns)
        for i in range(len(ns)):
            for j in range(i + 1, len(ns)):
                cnt[(ns[i], ns[j])] += 1
                score[(ns[i], ns[j])] += w
    got = adamic_adar(_ds(src, dst), min_common=3).to_pandas()
    exp = {k: (v, round(score[k], 6)) for k, v in cnt.items() if v >= 3}
    gmap = {
        (int(r["a"]), int(r["b"])): (int(r["n_common"]), float(r["aa_score"]))
        for _, r in got.iterrows()
    }
    assert set(gmap) == set(exp)
    for k, (c, w) in exp.items():
        assert gmap[k][0] == c
        assert abs(gmap[k][1] - w) <= 1e-6


def test_contract_edges():
    from collections import Counter

    from drone_ray.pipelines.graphstats import contract_edges

    rng = np.random.default_rng(21)
    src = rng.integers(0, 200, 3000)
    dst = rng.integers(0, 200, 3000)
    B = 10
    got = contract_edges(_ds(src, dst), B).to_pandas()
    exp = Counter(
        (int(s) // B, int(d) // B)
        for s, d in zip(src, dst)
        if s // B != d // B
    )
    gmap = {(int(r["hsrc"]), int(r["hdst"])): int(r["weight"]) for _, r in got.iterrows()}
    assert gmap == dict(exp)

    # keep_intra variant keeps the diagonal
    got2 = contract_edges(_ds(src, dst), B, drop_intra=False).to_pandas()
    exp2 = Counter((int(s) // B, int(d) // B) for s, d in zip(src, dst))
    gmap2 = {(int(r["hsrc"]), int(r["hdst"])): int(r["weight"]) for _, r in got2.iterrows()}
    assert gmap2 == dict(exp2)


def test_degree_assortativity_vs_numpy():
    import numpy as np
    import pandas as pd
    import pyarrow as pa

    from drone_ray.pipelines.graphstats import degree_assortativity

    import ray.data as rd

    rng = np.random.default_rng(5)
    src = rng.integers(0, 150, 3000).astype(np.int64)
    dst = rng.integers(0, 150, 3000).astype(np.int64)
    ds = rd.from_arrow(pa.table({"src": src, "dst": dst}))
    got = degree_assortativity(ds)["assortativity"].to_pylist()[0]

    e = pd.DataFrame({"src": src, "dst": dst}).drop_duplicates()
    od = e.groupby("src").size()
    idg = e.groupby("dst").size()
    x = od.loc[e["src"]].to_numpy(dtype=float)
    y = idg.loc[e["dst"]].to_numpy(dtype=float)
    exp = np.corrcoef(x, y)[0, 1]
    assert got == round(float(exp), 6)


def test_modularity_q_two_communities():
    """Distributed Q vs the textbook formula on a known two-community
    labeling: two 5-cliques joined by one bridge (exact arithmetic)."""
    import ray.data as rd

    from drone_ray.pipelines.graphstats import modularity_q
    from tests.graphs import two_cliques_bridge

    src, dst = two_cliques_bridge(5)
    # ground-truth labeling: clique membership (vertices 0-4 → 0, 5-9 → 5)
    vids = np.arange(10, dtype=np.int64)
    labels = rd.from_arrow(
        pa.table({"vid": vids, "label": np.where(vids < 5, 0, 5).astype(np.int64)})
    )
    out = modularity_q(
        lambda: rd.from_arrow(pa.table({"src": src, "dst": dst})),
        labels,
        num_partitions=2,
    ).to_pandas()
    # m = 2*C(5,2) + 1 = 21; per clique: m_c = 10, d_c = 21 (one endpoint
    # of the bridge adds 1 to each side); Q = 2*(10/21 - (21/42)^2) = 0.452381
    assert int(out["n_communities"][0]) == 2
    assert int(out["m_edges"][0]) == 21
    q_expected = 2 * (10 / 21 - (21 / 42) ** 2)
    assert abs(float(out["modularity"][0]) - round(q_expected, 6)) < 1e-9


def test_jaccard_pairs_matches_brute():
    """jaccard = |in(a) ∩ in(b)| / |in(a) ∪ in(b)| vs a dict brute force on a
    random 400-edge digraph; also cross-checks n_common against cocitation."""
    from drone_ray.pipelines.graphstats import jaccard_pairs

    rng = np.random.default_rng(11)
    src = rng.integers(0, 40, 400)
    dst = rng.integers(0, 25, 400)
    keep = src != dst
    pairs = sorted(set(zip(src[keep].tolist(), dst[keep].tolist())))
    src = [p[0] for p in pairs]
    dst = [p[1] for p in pairs]

    ins: dict[int, set] = {}
    for s, d in zip(src, dst):
        ins.setdefault(d, set()).add(s)
    expect = {}
    vs = sorted(ins)
    for i, a in enumerate(vs):
        for b in vs[i + 1:]:
            c = len(ins[a] & ins[b])
            if c >= 2:
                expect[(a, b)] = (c, len(ins[a] | ins[b]))

    got = jaccard_pairs(_ds(src, dst), min_common=2).to_pandas()
    assert len(got) == len(expect)
    for row in got.itertuples():
        c, u = expect[(row.a, row.b)]
        assert row.n_common == c
        assert abs(row.jaccard - c / u) < 2e-6


def test_bibliographic_coupling_matches_brute():
    """(a, b) source pairs sharing >= 2 out-neighbors vs a dict brute force;
    dual symmetry: coupling(G) == cocitation(G with edges reversed)."""
    from drone_ray.pipelines.graphstats import bibliographic_coupling

    rng = np.random.default_rng(13)
    src = rng.integers(0, 30, 300)
    dst = rng.integers(0, 30, 300)
    keep = src != dst
    pairs = sorted(set(zip(src[keep].tolist(), dst[keep].tolist())))
    src = [p[0] for p in pairs]
    dst = [p[1] for p in pairs]

    outs: dict[int, set] = {}
    for s, d in zip(src, dst):
        outs.setdefault(s, set()).add(d)
    expect = {}
    vs = sorted(outs)
    for i, a in enumerate(vs):
        for b in vs[i + 1:]:
            c = len(outs[a] & outs[b])
            if c >= 2:
                expect[(a, b)] = c

    got = bibliographic_coupling(_ds(src, dst), min_common=2).to_pandas()
    assert len(got) == len(expect)
    for row in got.itertuples():
        assert expect[(row.a, row.b)] == row.n_common

    rev = cocitation(_ds(dst, src), min_common=2).to_pandas()
    a = got.sort_values(["a", "b"]).reset_index(drop=True)
    b = rev.sort_values(["a", "b"]).reset_index(drop=True)
    assert a.equals(b)
