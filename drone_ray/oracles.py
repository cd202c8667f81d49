"""Dense/driver-side reference implementations for conformance tests
(FIXTURES.md §5). Pure numpy/python on small graphs — never used in
pipelines, only as pytest oracles.
"""

from __future__ import annotations

import numpy as np


def _relabel(src: np.ndarray, dst: np.ndarray):
    vids = np.unique(np.concatenate([src, dst]))
    s = np.searchsorted(vids, src)
    d = np.searchsorted(vids, dst)
    return vids, s, d


def pagerank_oracle(
    src: np.ndarray,
    dst: np.ndarray,
    damping: float = 0.85,
    tol: float = 1e-12,
    max_iter: int = 5000,
):
    """Dense power iteration of the exact reference recurrence
    ``pr = 0.85·(Σ_in pr/outdeg) + 0.15``, init 1.0
    (/root/reference/src/algorithm/PageRank.go:19-23,74). Returns (vids, pr)."""
    vids, s, d = _relabel(np.asarray(src, np.int64), np.asarray(dst, np.int64))
    # exact-dedup edges, matching the engine's loader
    pairs = np.unique(np.stack([s, d], axis=1), axis=0)
    s, d = pairs[:, 0], pairs[:, 1]
    n = vids.size
    outdeg = np.bincount(s, minlength=n).astype(np.float64)
    pr = np.ones(n)
    share = np.zeros(n)
    for _ in range(max_iter):
        np.divide(pr, outdeg, out=share, where=outdeg > 0)
        acc = np.zeros(n)
        np.add.at(acc, d, share[s])
        new = damping * acc + (1.0 - damping)
        if np.abs(new - pr).max() < tol:
            pr = new
            break
        pr = new
    return vids, pr


def components_oracle(src: np.ndarray, dst: np.ndarray):
    """Union-find WCC on symmetrized edges; component id = min vid.
    Returns (vids, component)."""
    vids, s, d = _relabel(np.asarray(src, np.int64), np.asarray(dst, np.int64))
    parent = np.arange(vids.size)

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in zip(s, d):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # union always hangs the larger root under the smaller, so find(i) is the
    # minimum index in i's component; vids is sorted ascending ⇒ min vid.
    comp = np.array([vids[find(i)] for i in range(vids.size)], dtype=np.int64)
    return vids, comp


def triangles_oracle(src: np.ndarray, dst: np.ndarray):
    """Brute-force triangle count on the undirected simple graph (self-loops
    dropped). Returns (total, vids, per_vertex_counts)."""
    vids, s, d = _relabel(np.asarray(src, np.int64), np.asarray(dst, np.int64))
    n = vids.size
    adj = np.zeros((n, n), dtype=bool)
    adj[s, d] = True
    adj[d, s] = True
    np.fill_diagonal(adj, False)
    a = adj.astype(np.int64)
    tri_per_vertex = (a @ a * a).sum(axis=1) // 2
    total = int(tri_per_vertex.sum() // 3)
    return total, vids, tri_per_vertex


def lpa_oracle(src: np.ndarray, dst: np.ndarray, max_rounds: int = 10):
    """Synchronous LPA with the engine's exact semantics: symmetrized simple
    graph, label init = vid, new label = most frequent neighbor label with
    ties to the lowest label, vertices with no neighbors keep their label,
    stop on no change or round cap. Returns (vids, labels, rounds)."""
    vids, s, d = _relabel(np.asarray(src, np.int64), np.asarray(dst, np.int64))
    n = vids.size
    # symmetrize + dedup
    es = np.concatenate([s, d])
    ed = np.concatenate([d, s])
    pairs = np.unique(np.stack([es, ed], axis=1), axis=0)
    es, ed = pairs[:, 0], pairs[:, 1]
    labels = vids.copy()
    rounds = 0
    for _ in range(max_rounds):
        new = labels.copy()
        for v in range(n):
            nbrs = es[ed == v]
            if nbrs.size == 0:
                continue
            ls, cs = np.unique(labels[nbrs], return_counts=True)
            best = ls[cs == cs.max()].min()
            new[v] = best
        rounds += 1
        if np.array_equal(new, labels):
            break
        labels = new
    return vids, labels, rounds


def bfs_oracle(src: np.ndarray, dst: np.ndarray, source: int):
    """BFS hop counts (all weights 1.0, /root/reference/src/graph/graph.go:357-362).
    Returns dict vid -> dist for reachable vertices only."""
    from collections import deque

    adj: dict[int, list[int]] = {}
    for a, b in zip(np.asarray(src).tolist(), np.asarray(dst).tolist()):
        adj.setdefault(a, []).append(b)
    dist = {int(source): 0.0}
    q = deque([int(source)])
    while q:
        u = q.popleft()
        for v in adj.get(u, ()):  # directed
            if v not in dist:
                dist[v] = dist[u] + 1.0
                q.append(v)
    return dist


def simulation_oracle(src, dst, pattern_attrs, pattern_targets, attr_mod=100):
    """Naive graph-simulation fixpoint (reference Sim semantics, SURVEY §2.12).
    Returns sorted (pattern_node, vid) pairs."""
    import numpy as np

    src = np.asarray(src, np.int64)
    dst = np.asarray(dst, np.int64)
    vids = np.unique(np.concatenate([src, dst]))
    out: dict[int, set] = {int(v): set() for v in vids}
    for a, b in zip(src.tolist(), dst.tolist()):
        out[a].add(b)
    sim = {
        int(v): {u for u, a in pattern_attrs.items() if a == int(v) % attr_mod}
        for v in vids
    }
    changed = True
    while changed:
        changed = False
        for v in vids:
            v = int(v)
            for u in list(sim[v]):
                for up in pattern_targets.get(u, []):
                    if not any(up in sim[w] for w in out[v]):
                        sim[v].discard(u)
                        changed = True
                        break
    return sorted((u, v) for v, s in sim.items() for u in s)


def hits_oracle(src: np.ndarray, dst: np.ndarray, iters: int = 40):
    """Dense HITS, K L1-normalized iterations (matches programs.HITS and
    the queries._HITS_SQL recursive CTE). Returns (vids, auth, hub)."""
    vids, s, d = _relabel(np.asarray(src, np.int64), np.asarray(dst, np.int64))
    pairs = np.unique(np.stack([s, d], axis=1), axis=0)
    s, d = pairs[:, 0], pairs[:, 1]
    n = vids.size
    hub = np.ones(n)
    auth = np.zeros(n)
    for _ in range(iters):
        a = np.zeros(n)
        np.add.at(a, d, hub[s])
        sa = a.sum()
        if sa:
            a /= sa
        h = np.zeros(n)
        np.add.at(h, s, a[d])
        sh = h.sum()
        if sh:
            h /= sh
        auth, hub = a, h
    return vids, auth, hub


def ppr_oracle(
    src: np.ndarray,
    dst: np.ndarray,
    teleport_mod: int,
    damping: float = 0.85,
    iters: int = 120,
):
    """Dense personalized PageRank: the reference recurrence with the
    additive teleport restricted to {v : v % teleport_mod == 0}, init 1.0,
    fixed synchronous iterations (matches queries._PPR_SQL)."""
    vids, s, d = _relabel(np.asarray(src, np.int64), np.asarray(dst, np.int64))
    pairs = np.unique(np.stack([s, d], axis=1), axis=0)
    s, d = pairs[:, 0], pairs[:, 1]
    n = vids.size
    outdeg = np.bincount(s, minlength=n).astype(np.float64)
    base = np.where(vids % teleport_mod == 0, 1.0 - damping, 0.0)
    pr = np.ones(n)
    share = np.zeros(n)
    for _ in range(iters):
        np.divide(pr, outdeg, out=share, where=outdeg > 0)
        share[outdeg == 0] = 0.0
        acc = np.zeros(n)
        np.add.at(acc, d, share[s])
        pr = damping * acc + base
    return vids, pr


def kcore_oracle(src: np.ndarray, dst: np.ndarray, k: int):
    """Sequential peeling on the symmetrized, deduped graph. Returns
    (member_vids, core_deg) — the unique k-core and each member's surviving
    in-core degree."""
    vids, s, d = _relabel(np.asarray(src, np.int64), np.asarray(dst, np.int64))
    # symmetrize + dedup + drop self-loops, matching the engine's both-view
    s2 = np.concatenate([s, d])
    d2 = np.concatenate([d, s])
    keep = s2 != d2
    pairs = np.unique(np.stack([s2[keep], d2[keep]], axis=1), axis=0)
    s2, d2 = pairs[:, 0], pairs[:, 1]
    n = vids.size
    deg = np.bincount(s2, minlength=n)
    alive = np.ones(n, dtype=bool)
    while True:
        dead = alive & (deg < k)
        if not dead.any():
            break
        alive[dead] = False
        removed = np.isin(s2, np.flatnonzero(dead))
        np.subtract.at(deg, d2[removed], 1)
        s2, d2 = s2[~removed], d2[~removed]
    m = np.flatnonzero(alive)
    return vids[m], deg[m]


def dijkstra_oracle(src: np.ndarray, dst: np.ndarray, w: np.ndarray, source: int):
    """Dense Dijkstra with min-weight dedup of duplicate (src, dst) edges
    (matches csr.PartitionGraph's weighted dedup). Returns dict
    vid -> dist for reachable vertices only. Pure-python heap — pytest
    oracle, never a pipeline."""
    import heapq

    adj: dict[int, list[tuple[int, float]]] = {}
    best_edge: dict[tuple[int, int], float] = {}
    for a, b, ww in zip(
        np.asarray(src).tolist(), np.asarray(dst).tolist(), np.asarray(w, np.float64).tolist()
    ):
        key = (int(a), int(b))
        if key not in best_edge or ww < best_edge[key]:
            best_edge[key] = ww
    for (a, b), ww in best_edge.items():
        adj.setdefault(a, []).append((b, ww))
    dist: dict[int, float] = {}
    heap = [(0.0, int(source))]
    while heap:
        du, u = heapq.heappop(heap)
        if u in dist:
            continue
        dist[u] = du
        for v, ww in adj.get(u, ()):
            if v not in dist:
                heapq.heappush(heap, (du + ww, v))
    return dist


def bellman_ford_oracle(
    src: np.ndarray, dst: np.ndarray, w: np.ndarray, source: int
):
    """Textbook Bellman-Ford with min-weight dedup of duplicate (src, dst)
    edges — negative weights allowed. Returns dict vid -> dist for reachable
    vertices, or None when a negative cycle is reachable from ``source``
    (round V still relaxes). Pure-python pytest oracle, never a pipeline."""
    best_edge: dict[tuple[int, int], float] = {}
    verts: set[int] = {int(source)}
    for a, b, ww in zip(
        np.asarray(src).tolist(), np.asarray(dst).tolist(), np.asarray(w, np.float64).tolist()
    ):
        key = (int(a), int(b))
        verts.add(int(a))
        verts.add(int(b))
        if key not in best_edge or ww < best_edge[key]:
            best_edge[key] = ww
    edges = [(a, b, ww) for (a, b), ww in best_edge.items()]
    dist: dict[int, float] = {int(source): 0.0}
    for rnd in range(len(verts)):
        improved = False
        for a, b, ww in edges:
            if a in dist and dist[a] + ww < dist.get(b, float("inf")):
                dist[b] = dist[a] + ww
                improved = True
        if not improved:
            return dist
    return None  # still improving after V rounds: negative cycle


def pagerank_weighted_oracle(
    src: np.ndarray,
    dst: np.ndarray,
    w: np.ndarray,
    damping: float = 0.85,
    tol: float = 1e-12,
    max_iter: int = 5000,
):
    """Dense power iteration of pr = 0.85·Σ_in pr(u)·w/W(u) + 0.15 with
    min-weight dedup of duplicate (src, dst) edges (matches
    csr.PartitionGraph + programs.WeightedPageRank). Returns (vids, pr)."""
    vids, s, d = _relabel(np.asarray(src, np.int64), np.asarray(dst, np.int64))
    order = np.lexsort((d, s))
    s, d, ww = s[order], d[order], np.asarray(w, np.float64)[order]
    if s.size:
        keep = np.empty(s.size, dtype=bool)
        keep[0] = True
        keep[1:] = (s[1:] != s[:-1]) | (d[1:] != d[:-1])
        ww = np.minimum.reduceat(ww, np.flatnonzero(keep))
        s, d = s[keep], d[keep]
    n = vids.size
    wsum = np.zeros(n)
    np.add.at(wsum, s, ww)
    t = np.zeros(ww.size)
    np.divide(ww, wsum[s], out=t, where=wsum[s] > 0)
    pr = np.ones(n)
    for _ in range(max_iter):
        acc = np.zeros(n)
        np.add.at(acc, d, t * pr[s])
        new = damping * acc + (1.0 - damping)
        if np.abs(new - pr).max() < tol:
            pr = new
            break
        pr = new
    return vids, pr


def katz_oracle(
    src: np.ndarray,
    dst: np.ndarray,
    alpha: float,
    iters: int,
):
    """Dense fixed-iteration Katz: x_{k+1} = α·Σ_in x_k + (1-α), x_0 = 1
    (matches programs.KatzCentrality at eps=0 and queries._KATZ_SQL).
    Returns (vids, x)."""
    vids, s, d = _relabel(np.asarray(src, np.int64), np.asarray(dst, np.int64))
    pairs = np.unique(np.stack([s, d], axis=1), axis=0)
    s, d = pairs[:, 0], pairs[:, 1]
    n = vids.size
    x = np.ones(n)
    for _ in range(iters):
        acc = np.zeros(n)
        np.add.at(acc, d, x[s])
        x = alpha * acc + (1.0 - alpha)
    return vids, x


def betweenness_oracle(src: np.ndarray, dst: np.ndarray, sources):
    """Dense Brandes (2001) over the deduped directed graph for the given
    source set: raw pair-dependency sums, unnormalized. Returns
    dict vid -> bc."""
    from collections import deque

    vids, s, d = _relabel(np.asarray(src, np.int64), np.asarray(dst, np.int64))
    pairs = np.unique(np.stack([s, d], axis=1), axis=0)
    s, d = pairs[:, 0], pairs[:, 1]
    n = vids.size
    adj: list[list[int]] = [[] for _ in range(n)]
    for a, b in zip(s.tolist(), d.tolist()):
        adj[a].append(b)
    vid_to_i = {int(v): i for i, v in enumerate(vids)}
    bc = np.zeros(n)
    for sv in sources:
        if int(sv) not in vid_to_i:
            continue
        si = vid_to_i[int(sv)]
        dist = np.full(n, -1, np.int64)
        sigma = np.zeros(n)
        dist[si] = 0
        sigma[si] = 1.0
        order = []
        q = deque([si])
        while q:
            u = q.popleft()
            order.append(u)
            for w in adj[u]:
                if dist[w] < 0:
                    dist[w] = dist[u] + 1
                    q.append(w)
                if dist[w] == dist[u] + 1:
                    sigma[w] += sigma[u]
        delta = np.zeros(n)
        for u in reversed(order):
            for w in adj[u]:
                if dist[w] == dist[u] + 1:
                    delta[u] += sigma[u] / sigma[w] * (1.0 + delta[w])
            if u != si:
                bc[u] += delta[u]
    return {int(vids[i]): float(bc[i]) for i in range(n)}


def louvain_oracle(
    src: np.ndarray,
    dst: np.ndarray,
    max_rounds: int = 10,
    max_levels: int = 4,
):
    """Single-machine mirror of pipelines.louvain: identical symmetrize /
    strength / gain / parity-alternation / tie-break / contraction rules,
    evaluated with dense numpy. Returns (vids, community, modularity)."""
    from drone_ray.hashing import mix64

    src = np.asarray(src, np.int64)
    dst = np.asarray(dst, np.int64)
    keep = src != dst
    u = np.concatenate([src[keep], dst[keep]])
    v = np.concatenate([dst[keep], src[keep]])
    pairs, w = np.unique(np.stack([u, v], axis=1), axis=0, return_counts=True)
    au, av, aw = pairs[:, 0], pairs[:, 1], w.astype(np.int64)
    m2 = int(aw.sum())
    vids0 = np.unique(au)
    if m2 == 0:
        return vids0, vids0.copy(), 0.0
    # S over current-level nodes
    node = vids0.copy()
    k = np.zeros(node.size, np.int64)
    np.add.at(k, np.searchsorted(node, au), aw)
    label = node.copy()
    mapping = None  # orig vid -> current community
    for _level in range(max_levels):
        level_moves = 0
        zero_streak = 0
        for r in range(max_rounds):
            # community volumes
            labs, linv = np.unique(label, return_inverse=True)
            vol = np.zeros(labs.size, np.int64)
            np.add.at(vol, linv, k)
            a_of_node = vol[linv]
            # candidate weights per (u, C) excluding self rows
            nm = au != av
            eu, ev, ew = au[nm], av[nm], aw[nm]
            pu = np.searchsorted(node, eu)
            pv = np.searchsorted(node, ev)
            C = label[pv]
            pc, pinv = np.unique(np.stack([eu, C], axis=1), axis=0, return_inverse=True)
            wsum = np.zeros(pc.shape[0], np.int64)
            np.add.at(wsum, pinv, ew)
            cu, cC, cw = pc[:, 0], pc[:, 1], wsum
            cpos = np.searchsorted(node, cu)
            ku = k[cpos]
            Du = label[cpos]
            aC = vol[np.searchsorted(labs, cC)]
            selfm = cC == Du
            stay_w = np.zeros(node.size, np.int64)
            stay_w[cpos[selfm]] = cw[selfm]
            # float64 k·a products, exactly as the engine (int64 wraps
            # silently past ~3e9 edges)
            stay_gain = stay_w - k.astype(np.float64) * (a_of_node - k) / m2
            nd = ~selfm
            gain = cw[nd] - ku[nd].astype(np.float64) * aC[nd] / m2
            un, Cn = cu[nd], cC[nd]
            newlab = label.copy()
            mv = 0
            if un.size:
                o = np.lexsort((Cn, -gain, un))
                uo, go, Co = un[o], gain[o], Cn[o]
                first = np.ones(uo.size, bool)
                first[1:] = uo[1:] != uo[:-1]
                bu, bg, bC = uo[first], go[first], Co[first]
                bpos = np.searchsorted(node, bu)
                allowed = ((mix64(node) + np.uint64(r)) % np.uint64(2)) == 0
                sel = (bg > stay_gain[bpos]) & allowed[bpos]
                newlab[bpos[sel]] = bC[sel]
                mv = int(sel.sum())
            label = newlab
            level_moves += mv
            zero_streak = zero_streak + 1 if mv == 0 else 0
            if zero_streak >= 2:
                break
        if level_moves == 0:
            break
        # compose mapping
        if mapping is None:
            mapping = label.copy()  # indexed by vids0 order == node order
        else:
            mapping = label[np.searchsorted(node, mapping)]
        # contract
        Cu = label[np.searchsorted(node, au)]
        Cv = label[np.searchsorted(node, av)]
        pc, pinv = np.unique(np.stack([Cu, Cv], axis=1), axis=0, return_inverse=True)
        wsum = np.zeros(pc.shape[0], np.int64)
        np.add.at(wsum, pinv, aw)
        au, av, aw = pc[:, 0], pc[:, 1], wsum
        node = np.unique(au)
        k = np.zeros(node.size, np.int64)
        np.add.at(k, np.searchsorted(node, au), aw)
        label = node.copy()
    selfw = int(aw[au == av].sum())
    q = selfw / m2 - float(np.sum((k / m2) ** 2))
    community = mapping if mapping is not None else vids0.copy()
    return vids0, community, round(q, 9)


def eigenvector_oracle(src: np.ndarray, dst: np.ndarray, iters: int = 20):
    """Dense K-step L1-normalized in-edge power iteration from x = 1 over
    exact-deduped edges (mirrors programs.EigenvectorCentrality / the
    queries._EIGEN_SQL recursion). Returns (vids, x)."""
    vids, s, d = _relabel(np.asarray(src, np.int64), np.asarray(dst, np.int64))
    pairs = np.unique(np.stack([s, d], axis=1), axis=0)
    s, d = pairs[:, 0], pairs[:, 1]
    x = np.ones(vids.size)
    for _ in range(iters):
        raw = np.zeros(vids.size)
        np.add.at(raw, d, x[s])
        tot = raw.sum()
        x = raw / tot if tot else raw
    return vids, x
