"""High-level graph analytics entry points over an edge Dataset.

Each function: build (or reuse) the hash-partitioned graph layout, run the
VertexProgram superstep harness, return the emitted per-vertex table as a
``pyarrow.Table`` (small results) plus the ProgramResult for metrics.

Graph builds are cached on disk keyed by (cache_key, P, symmetrized) so
repeated queries over the same input skip the partitioning shuffle — the
manifest's content token is the lineage link (SURVEY.md §4 checkpoint row).
"""

from __future__ import annotations

import hashlib
import os

from drone_ray.graph.harness import ProgramResult, run_vertex_program
from drone_ray.graph.partition import MANIFEST_NAME, GraphManifest, build_graph
from drone_ray.graph.programs import (
    HITS,
    SCC,
    SSSP,
    BellmanFordSSSP,
    BetweennessCentrality,
    ClosenessCentrality,
    EigenvectorCentrality,
    HarmonicCentrality,
    IncrementalPageRank,
    ConnectedComponents,
    Coreness,
    KatzCentrality,
    KCore,
    LabelPropagation,
    NegativeCycleError,
    PageRank,
    WeightedPageRank,
    WeightedSSSP,
)

import ray as _ray


@_ray.remote
def _added_slice(p: int, num_partitions: int, own_dict, sym: bool, *blocks):
    """One task per partition: extract the added-edge rows whose src this
    partition owns from the update batch's blocks (object-store reads —
    nothing crosses the driver). ``sym``: also include the swapped
    orientation (dst, src) — incremental WCC wants both endpoints to push
    along the new undirected edge. The update batch is assumed small
    relative to the base graph (it is an incremental delta); for deltas
    comparable to the graph itself, a cold rebuild is the right tool."""
    import numpy as np
    import pyarrow as pa

    from drone_ray.hashing import Ownership

    own = Ownership.from_dict(own_dict)
    srcs, dsts = [], []
    for t in blocks:
        # Ray Data can hand back empty blocks with an EMPTY schema (no
        # columns at all) when an upstream operator produced zero rows for
        # a bundle — seen nondeterministically under load. Skip them.
        if t.num_rows == 0 or "src" not in t.schema.names:
            continue
        s = t["src"].to_numpy(zero_copy_only=False).astype(np.int64)
        d = t["dst"].to_numpy(zero_copy_only=False).astype(np.int64)
        if sym:
            s, d = np.concatenate([s, d]), np.concatenate([d, s])
        m = own.of(s, num_partitions) == p
        if m.any():
            srcs.append(s[m])
            dsts.append(d[m])
    if not srcs:
        return pa.table({"src": pa.array([], pa.int64()), "dst": pa.array([], pa.int64())})
    return pa.table(
        {
            "src": pa.array(np.concatenate(srcs), pa.int64()),
            "dst": pa.array(np.concatenate(dsts), pa.int64()),
        }
    )


def _added_ds(added_src, added_dst):
    """Normalize the update batch: Dataset / factory / plain arrays."""
    import numpy as np
    import pyarrow as pa

    if added_dst is None:
        return added_src() if callable(added_src) else added_src
    import ray.data as rd

    return rd.from_arrow(
        pa.table(
            {
                "src": pa.array(np.asarray(added_src, dtype=np.int64), pa.int64()),
                "dst": pa.array(np.asarray(added_dst, dtype=np.int64), pa.int64()),
            }
        )
    )


_CACHE_ROOT = os.environ.get("DRONE_RAY_CACHE", "/tmp/drone_ray/graphs")
# bump when the on-disk partition layout or ownership hashing changes —
# invalidates caches left by older code versions across driver rounds
_LAYOUT_VERSION = 4  # v4: shared dual-direction layout


def path_fingerprint(path: str) -> str:
    """Cheap input fingerprint for cache keys: hash of the sorted
    (relpath, size, mtime) listing of parquet files under ``path``. Callers
    that build a graph from an on-disk edge table should fold this into
    ``cache_key`` so edited inputs invalidate the cached layout."""
    import glob as _glob

    h = hashlib.blake2b(digest_size=8)
    paths = sorted(_glob.glob(os.path.join(path, "**", "*.parquet"), recursive=True))
    if os.path.isfile(path):
        paths = [path]
    for p in paths:
        st = os.stat(p)
        h.update(f"{os.path.relpath(p, path) if p != path else p}|{st.st_size}|{st.st_mtime_ns}".encode())
    return h.hexdigest()


def graph_for(
    edges_factory,
    cache_key: str,
    num_partitions: int,
    symmetrize: bool = False,
    hub_threshold: int | None = None,
    dual: bool = True,
    ownership=None,
    weight_col: str | None = None,
    allow_negative_weights: bool = False,
) -> GraphManifest:
    """Build the partitioned layout once per (cache_key, P, layout, hub,
    ownership).

    Default layout is DUAL: one build serves the directed (PR/SSSP),
    reversed (simulation) and symmetrized (WCC/LPA) views, so the expensive
    upstream (HTML extraction at web scale) and the partitioning shuffle run
    once for the whole analytics suite instead of once per direction.

    ``ownership``: a hashing.Ownership — mode "host" co-locates same-site
    vertices (vids must use the hash_url host-prefix layout)."""
    layout = "dual" if dual else f"sym={symmetrize}"
    own_tok = ownership.token() if ownership is not None else "page"
    token = hashlib.blake2b(
        f"v{_LAYOUT_VERSION}|{cache_key}|P={num_partitions}|{layout}|hub={hub_threshold}"
        f"|own={own_tok}|w={weight_col}"
        f"{'|negw' if allow_negative_weights else ''}".encode(),
        digest_size=8,
    ).hexdigest()
    work_dir = os.path.join(_CACHE_ROOT, token)
    if os.path.exists(os.path.join(work_dir, MANIFEST_NAME)):
        return GraphManifest.load(work_dir)
    return build_graph(
        edges_factory(),
        work_dir,
        num_partitions,
        symmetrize=symmetrize and not dual,
        source=cache_key,
        hub_threshold=hub_threshold,
        dual=dual,
        ownership=ownership,
        weight_col=weight_col,
        allow_negative_weights=allow_negative_weights,
    )


def _run(manifest, cls, kwargs, **hk) -> ProgramResult:
    return run_vertex_program(manifest, cls, kwargs, **hk)


def pagerank(
    edges_factory,
    cache_key: str,
    num_partitions: int = 8,
    eps: float = 1e-10,
    damping: float = 0.85,
    hub_threshold: int | None = None,
    ownership=None,
    **harness_kwargs,
) -> ProgramResult:
    m = graph_for(edges_factory, cache_key, num_partitions, hub_threshold=hub_threshold,
                  ownership=ownership)
    return _run(m, PageRank, {"eps": eps, "damping": damping},
                direction="fwd", **harness_kwargs)


def pagerank_incremental(
    base_factory,
    updated_factory,
    added_src,
    added_dst,
    base_key: str,
    updated_key: str,
    num_partitions: int = 8,
    eps: float = 1e-12,
    damping: float = 0.85,
    warm_dir: str | None = None,
    **harness_kwargs,
):
    """The reference's namesake incremental evaluation: converge PageRank
    on the base graph once (writing the per-partition Assemble files),
    then re-evaluate on base+added edges by warm-starting from those files
    and pushing only the corrections the added edges cause
    (programs.IncrementalPageRank). Returns (cold_base_result,
    warm_updated_result); warm scores equal a cold run on the updated
    graph (unique fixpoint), at a fraction of the supersteps/messages.

    ``added_src/added_dst`` must be genuinely NEW edges (not present in
    the base set) — the correction algebra assumes the old share was
    pr/d1 along exactly the old adjacency. Both graphs must use the same
    ownership mode and partition count (the warm files align by slot).

    ``added_src`` may be a Dataset (or zero-arg factory returning one)
    with columns (src, dst) — the scale path: the update batch is sliced
    per owner partition by remote tasks and handed to actors as object
    refs, so the driver holds O(P) refs and never materializes edge rows.
    Old out-degrees of changed sources are derived by each actor from its
    OWN slice of the base layout (dir=0 rows of edges/part=<p>) — fully
    local, no shuffle. Plain int arrays are also accepted (tests / small
    updates) and go through the same per-partition slicing.
    """
    import tempfile

    import pyarrow as pa

    import ray

    m1 = graph_for(base_factory, base_key, num_partitions)
    warm = warm_dir or tempfile.mkdtemp(prefix="drone_ray_warm_", dir="/tmp")
    r1 = _run(m1, PageRank, {"eps": eps, "damping": damping}, direction="fwd",
              output_dir=warm, **harness_kwargs)

    m2 = graph_for(updated_factory, updated_key, num_partitions)
    if added_dst is None:
        added_ds = added_src() if callable(added_src) else added_src
        block_refs = added_ds.to_arrow_refs()
    else:
        import numpy as np

        t = pa.table(
            {
                "src": pa.array(np.asarray(added_src, dtype=np.int64), pa.int64()),
                "dst": pa.array(np.asarray(added_dst, dtype=np.int64), pa.int64()),
            }
        )
        block_refs = [ray.put(t)]
    own_dict = m2.ownership
    slices = {
        p: _added_slice.remote(p, num_partitions, own_dict, False, *block_refs)
        for p in range(num_partitions)
    }
    r2 = _run(
        m2,
        IncrementalPageRank,
        {
            "warm_dir": warm,
            "added_slices": slices,
            "base_edges_dir": m1.edges_dir,
            "eps": eps,
            "damping": damping,
        },
        direction="fwd",
        **harness_kwargs,
    )
    return r1, r2


def wcc_incremental(
    base_factory,
    updated_factory,
    added_src,
    added_dst,
    base_key: str,
    updated_key: str,
    num_partitions: int = 8,
    warm_dir: str | None = None,
    **harness_kwargs,
):
    """Warm-start WCC after edge additions (the general reference IncEval
    contract, /root/reference/src/worker/CCworker.go): converge on the base
    graph once (writing per-partition Assemble files), then re-evaluate on
    base+added by warm-starting labels from those files and seeding
    propagation ONLY at the added-edge endpoints — min labels are monotone
    under additions, so the warm run reaches the cold fixpoint exactly, at
    a fraction of the traversals. Returns (cold_base_result, warm_result).

    ``added_src`` may be a Dataset/factory of (src, dst) rows (then pass
    ``added_dst=None``) or plain arrays; slicing per owner partition runs
    in remote tasks, the driver holds O(P) refs. Both graphs must share
    ownership mode and partition count."""
    import tempfile

    from drone_ray.graph.programs import IncrementalConnectedComponents

    m1 = graph_for(base_factory, base_key, num_partitions)
    warm = warm_dir or tempfile.mkdtemp(prefix="drone_ray_warm_", dir="/tmp")
    r1 = _run(m1, ConnectedComponents, {}, direction="both",
              output_dir=warm, **harness_kwargs)
    m2 = graph_for(updated_factory, updated_key, num_partitions)
    block_refs = _added_ds(added_src, added_dst).to_arrow_refs()
    seeds = {
        p: _added_slice.remote(p, num_partitions, m2.ownership, True, *block_refs)
        for p in range(num_partitions)
    }
    r2 = _run(
        m2,
        IncrementalConnectedComponents,
        {"warm_dir": warm, "added_slices": seeds},
        direction="both",
        **harness_kwargs,
    )
    return r1, r2


def sssp_incremental(
    base_factory,
    updated_factory,
    added_src,
    added_dst,
    base_key: str,
    updated_key: str,
    source: int,
    num_partitions: int = 8,
    warm_dir: str | None = None,
    **harness_kwargs,
):
    """Warm-start SSSP after edge additions (the general reference IncEval
    contract, /root/reference/src/worker/SSSPworker.go): distances are
    monotone non-increasing under additions, so relaxation warm-started
    from the converged base distances (same source!) reaches the cold-run
    fixpoint. Seeds are the owned SOURCES of added edges (directed).
    Returns (cold_base_result, warm_result). Same slicing/ownership
    contract as wcc_incremental."""
    import tempfile

    from drone_ray.graph.programs import IncrementalSSSP

    m1 = graph_for(base_factory, base_key, num_partitions)
    warm = warm_dir or tempfile.mkdtemp(prefix="drone_ray_warm_", dir="/tmp")
    r1 = _run(m1, SSSP, {"source": source}, direction="fwd",
              output_dir=warm, **harness_kwargs)
    m2 = graph_for(updated_factory, updated_key, num_partitions)
    block_refs = _added_ds(added_src, added_dst).to_arrow_refs()
    seeds = {
        p: _added_slice.remote(p, num_partitions, m2.ownership, False, *block_refs)
        for p in range(num_partitions)
    }
    r2 = _run(
        m2,
        IncrementalSSSP,
        {"source": source, "warm_dir": warm, "added_slices": seeds},
        direction="fwd",
        **harness_kwargs,
    )
    return r1, r2


def personalized_pagerank(
    edges_factory,
    cache_key: str,
    teleport_mod: int,
    num_partitions: int = 8,
    eps: float = 1e-10,
    damping: float = 0.85,
    hub_threshold: int | None = None,
    ownership=None,
    **harness_kwargs,
) -> ProgramResult:
    """PageRank with the teleport term restricted to the deterministic
    source set {v : v % teleport_mod == 0} — same delta-propagation engine,
    different additive base (programs.PageRank.teleport_mod)."""
    m = graph_for(edges_factory, cache_key, num_partitions, hub_threshold=hub_threshold,
                  ownership=ownership)
    return _run(m, PageRank, {"eps": eps, "damping": damping, "teleport_mod": teleport_mod},
                direction="fwd", **harness_kwargs)


def hits(
    edges_factory,
    cache_key: str,
    num_partitions: int = 8,
    iters: int = 40,
    **harness_kwargs,
) -> ProgramResult:
    """Hubs & authorities over both adjacency directions (dualview actors).
    Split hubs are unsupported on dualview, so no hub_threshold knob."""
    m = graph_for(edges_factory, cache_key, num_partitions)
    return _run(m, HITS, {"iters": iters}, direction="dualview", **harness_kwargs)


def coloring(
    edges_factory,
    cache_key: str,
    num_partitions: int = 8,
    max_colors: int = 256,
    **harness_kwargs,
) -> ProgramResult:
    """Deterministic Jones–Plassmann greedy coloring
    (programs.GreedyColoring) — md5-priority order, announcement rows on
    the extra-key route, mex via a multi-word seen-mask (``max_colors``
    capacity, loud overflow)."""
    from drone_ray.graph.programs import GreedyColoring

    m = graph_for(edges_factory, cache_key, num_partitions)
    return _run(m, GreedyColoring, {"max_colors": max_colors},
                direction="both", **harness_kwargs)


def seed_bfs(
    edges_factory,
    cache_key: str,
    seed_mod: int,
    num_partitions: int = 8,
    direction: str = "fwd",
    **harness_kwargs,
) -> ProgramResult:
    """Multi-source BFS from the deterministic seed set
    {v : v % seed_mod == 0} (programs.MultiSourceBFS) — the crawl-frontier
    depth report."""
    from drone_ray.graph.programs import MultiSourceBFS

    m = graph_for(edges_factory, cache_key, num_partitions)
    return _run(m, MultiSourceBFS, {"seed_mod": seed_mod},
                direction=direction, **harness_kwargs)


def mis(
    edges_factory,
    cache_key: str,
    num_partitions: int = 8,
    **harness_kwargs,
) -> ProgramResult:
    """Deterministic maximal independent set (programs.MIS) — parallel
    greedy by md5 priority over the symmetrized view, O(log n) expected
    rounds, two supersteps per round."""
    from drone_ray.graph.programs import MIS

    m = graph_for(edges_factory, cache_key, num_partitions)
    return _run(m, MIS, {}, direction="both", **harness_kwargs)


def salsa(
    edges_factory,
    cache_key: str,
    num_partitions: int = 8,
    iters: int = 20,
    **harness_kwargs,
) -> ProgramResult:
    """SALSA stochastic hubs & authorities (programs.SALSA) — HITS with
    degree-normalized walk steps. No global normalizer ⇒ no feedback
    barrier ⇒ the K iterations pipeline (unlike hits())."""
    from drone_ray.graph.programs import SALSA

    m = graph_for(edges_factory, cache_key, num_partitions)
    return _run(m, SALSA, {"iters": iters}, direction="dualview", **harness_kwargs)


def kcore(
    edges_factory,
    cache_key: str,
    num_partitions: int = 8,
    k: int | None = None,
    offset: int = 5,
    hub_threshold: int | None = None,
    ownership=None,
    **harness_kwargs,
) -> ProgramResult:
    """k-core membership by distributed peeling on the symmetrized view.
    k=None derives k = global_min_degree + offset via the feedback channel
    (one scalar reduce after PEval, no extra data pass)."""
    m = graph_for(edges_factory, cache_key, num_partitions, hub_threshold=hub_threshold,
                  ownership=ownership)
    return _run(m, KCore, {"k": k, "offset": offset}, direction="both", **harness_kwargs)


def scc(
    edges_factory,
    cache_key: str,
    num_partitions: int = 8,
    **harness_kwargs,
) -> ProgramResult:
    """Strongly connected components (forward-max coloring + backward
    marking on dualview actors). Labels are the max member vid. No
    hub_threshold: dualview rejects split hubs."""
    m = graph_for(edges_factory, cache_key, num_partitions)
    return _run(m, SCC, {}, direction="dualview", **harness_kwargs)


def coreness(
    edges_factory,
    cache_key: str,
    num_partitions: int = 8,
    ownership=None,
    **harness_kwargs,
) -> ProgramResult:
    """Full k-core decomposition (per-vertex coreness) by distributed
    h-index iteration on the symmetrized view. No hub_threshold: coreness
    messages carry sender identity, which hub broadcasts would collapse."""
    m = graph_for(edges_factory, cache_key, num_partitions, ownership=ownership)
    return _run(m, Coreness, {}, direction="both", **harness_kwargs)


def connected_components(
    edges_factory,
    cache_key: str,
    num_partitions: int = 8,
    hub_threshold: int | None = None,
    ownership=None,
    **harness_kwargs,
) -> ProgramResult:
    m = graph_for(edges_factory, cache_key, num_partitions, hub_threshold=hub_threshold,
                  ownership=ownership)
    return _run(m, ConnectedComponents, {}, direction="both", **harness_kwargs)


def label_propagation(
    edges_factory,
    cache_key: str,
    num_partitions: int = 8,
    max_rounds: int = 10,
    hub_threshold: int | None = None,
    ownership=None,
    **harness_kwargs,
) -> ProgramResult:
    m = graph_for(edges_factory, cache_key, num_partitions, hub_threshold=hub_threshold,
                  ownership=ownership)
    return _run(m, LabelPropagation, {"max_rounds": max_rounds},
                direction="both", **harness_kwargs)


def sssp(
    edges_factory,
    cache_key: str,
    source: int,
    num_partitions: int = 8,
    hub_threshold: int | None = None,
    ownership=None,
    direction: str = "fwd",
    **harness_kwargs,
) -> ProgramResult:
    """``direction``: "fwd" (directed hop counts, the reference semantics)
    or "both" (undirected BFS — what eccentricity/diameter sweeps want)."""
    m = graph_for(edges_factory, cache_key, num_partitions, hub_threshold=hub_threshold,
                  ownership=ownership)
    return _run(m, SSSP, {"source": source}, direction=direction, **harness_kwargs)


def _distinct_vids(manifest):
    """Distinct vertex ids of a built layout as a Dataset. In the dual
    layout every endpoint appears as the ``src`` (u) of some row in its
    owner's partition — except split hubs, recovered from the hubs table —
    so one column-pruned read + a bucketed unique reduce yields the vertex
    set without touching the driver."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from drone_ray.hashing import adaptive_buckets, mix64
    from drone_ray.pipelines._util import pin_schema

    eds = rd.read_parquet(manifest.edges_dir, columns=["src"])
    # parquet-metadata row count (2E in the dual layout) — a safe
    # overestimate of the distinct-vid rows each bucket will hold
    B = adaptive_buckets(eds.count(), floor=32)

    def partial(b: pa.Table) -> pa.Table:
        v = np.unique(b["src"].to_numpy(zero_copy_only=False)).astype(np.int64)
        return pa.table(
            {
                "vid": pa.array(v, pa.int64()),
                "_b": pa.array((mix64(v.astype(np.uint64)) % np.uint64(B)).astype(np.int64)),
            }
        )

    def finish(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"vid": np.unique(g["vid"].to_numpy(np.int64))})

    schema = pa.schema([("vid", pa.int64())])
    vds = (
        eds.map_batches(partial, batch_format="pyarrow", batch_size=None)
        .groupby("_b")
        .map_groups(finish, batch_format="pandas")
        .map_batches(pin_schema(schema), batch_format="pyarrow", batch_size=None)
    )
    if manifest.hubs_path:
        hubs = rd.read_parquet(manifest.hubs_path, columns=["vid"])
        vds = vds.union(hubs.map_batches(pin_schema(schema), batch_format="pyarrow",
                                         batch_size=None))
    return vds


def _iter_source_batches(manifest, source_batch: int):
    """Stream the graph's DISTINCT vids in sorted order, ``source_batch`` at
    a time. The distinct set may still carry duplicates across the hubs
    union, so the global sort brings equal vids together and the driver
    dedupes at each batch boundary by carrying the previous batch's last
    vid — driver memory stays O(source_batch)."""
    import numpy as np

    vds = _distinct_vids(manifest).sort("vid")
    last = None
    pending: list[int] = []
    for b in vds.iter_batches(batch_size=max(source_batch * 4, 4096), batch_format="pyarrow"):
        v = np.unique(b["vid"].to_numpy(zero_copy_only=False))
        if last is not None and v.size and v[0] == last:
            v = v[1:]
        if v.size:
            last = int(v[-1])
            pending.extend(int(x) for x in v)
        while len(pending) >= source_batch:
            yield pending[:source_batch]
            pending = pending[source_batch:]
    if pending:
        yield pending


def _sum_by_vid(ds, value_col: str | list[str], num_buckets: int = 32):
    """Bucketed per-vid sum of the per-source-batch partial tables (house
    pattern: vectorized per-block partial → one hash-bucket shuffle →
    vectorized per-bucket finish). ``value_col`` may name several columns
    (e.g. closeness's (sum_d, reach) moments) — each sums independently."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa

    from drone_ray.hashing import mix64
    from drone_ray.pipelines._util import pin_schema

    cols = [value_col] if isinstance(value_col, str) else list(value_col)

    def partial(b: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {"vid": b["vid"].to_numpy(zero_copy_only=False)}
            | {c: b[c].to_numpy(zero_copy_only=False) for c in cols}
        )
        agg = df.groupby("vid", sort=False)[cols].sum().reset_index()
        vid = agg["vid"].to_numpy(np.int64)
        agg["_b"] = (mix64(vid.astype(np.uint64)) % np.uint64(num_buckets)).astype(np.int64)
        return pa.Table.from_pandas(agg, preserve_index=False)

    def finish(g: pd.DataFrame) -> pd.DataFrame:
        agg = g.groupby("vid", sort=False)[cols].sum().reset_index()
        return agg[["vid", *cols]]

    schema = pa.schema([("vid", pa.int64())] + [(c, pa.float64()) for c in cols])
    return (
        ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
        .groupby("_b")
        .map_groups(finish, batch_format="pandas")
        .map_batches(pin_schema(schema), batch_format="pyarrow", batch_size=None)
    )


def _exact_all_sources(
    manifest,
    program_cls,
    value_col: str,
    direction: str,
    *,
    source_batch: int = 64,
    max_steps: int = 2000,
    output_dir: str | None = None,
    checkpoint_dir: str | None = None,
    checkpoint_every: int = 0,
    resume: bool = True,
    **harness_kwargs,
) -> ProgramResult:
    """EXACT centrality (every vertex a source) via a source-batched,
    resumable schedule.

    Cost envelope: exact Brandes/harmonic is Θ(V·E) edge traversals —
    ~2·ecc(s)+3 supersteps per source, all sources — so it is only payable
    on graphs where V·E work is (sampled mode with k sources is the
    100-TB path, cost k·E). The schedule bounds everything else:

      * sources stream from the layout's vertices table in sorted
        ``source_batch`` chunks (driver memory O(source_batch), never O(V));
      * each chunk is ONE program run over the cached graph layout writing
        its partial per-partition parquet to ``…/chunk-NNNNN.tmp`` and
        atomically renaming on completion — a re-run (``resume=True``,
        the default) skips finished chunks, so a killed exact job loses at
        most one chunk of work;
      * partials merge with one bucketed per-vid sum (no driver state).

    ``checkpoint_dir`` (optional) checkpoints INSIDE each chunk's run under
    ``<checkpoint_dir>/chunk-NNNNN`` for very large chunks."""
    import shutil

    import ray.data as rd

    scratch = os.path.join(
        manifest.work_dir, f"exact_{program_cls.__name__}_b{source_batch}"
    )
    final_dir = output_dir or os.path.join(scratch, "result")
    done = os.path.join(final_dir, "_DONE")
    if resume and os.path.exists(done):
        return ProgramResult([], 0, True, 0.0, 0, output_dir=final_dir)
    os.makedirs(scratch, exist_ok=True)
    metrics: list[dict] = []
    steps = edges = 0
    wall = 0.0
    part_dirs: list[str] = []
    for i, batch in enumerate(_iter_source_batches(manifest, source_batch)):
        pdir = os.path.join(scratch, f"chunk-{i:05d}")
        part_dirs.append(pdir)
        if resume and os.path.isdir(pdir):
            continue
        tmp = pdir + ".tmp"
        if os.path.isdir(tmp):
            shutil.rmtree(tmp)
        hk = dict(harness_kwargs)
        if checkpoint_dir:
            hk["checkpoint_dir"] = os.path.join(checkpoint_dir, f"chunk-{i:05d}")
            hk["checkpoint_every"] = checkpoint_every
            hk["resume"] = resume
        res = run_vertex_program(
            manifest, program_cls, {"sources": batch},
            direction=direction, max_steps=max_steps, output_dir=tmp, **hk,
        )
        if not res.converged:
            raise RuntimeError(
                f"exact {program_cls.__name__} chunk {i} hit max_steps={max_steps} "
                f"unconverged — raise max_steps or shrink source_batch"
            )
        metrics.extend(res.metrics)
        steps += res.steps
        edges += res.edges_traversed
        wall += res.wall_seconds
        os.replace(tmp, pdir)
    import glob as _glob

    # read_parquet takes a list of FILES (a single path may be a dir)
    files = sorted(
        f for d in part_dirs for f in _glob.glob(os.path.join(d, "**", "*.parquet"),
                                                 recursive=True)
    )
    vcols = [value_col] if isinstance(value_col, str) else list(value_col)
    union = rd.read_parquet(files, columns=["vid", *vcols])
    result = _sum_by_vid(union, value_col)
    if os.path.isdir(final_dir):
        shutil.rmtree(final_dir)
    result.write_parquet(final_dir)
    with open(done, "w") as f:
        f.write("ok")
    return ProgramResult(metrics, steps, True, wall, edges, output_dir=final_dir)


def betweenness(
    edges_factory,
    cache_key: str,
    sources,
    num_partitions: int = 8,
    max_steps: int = 2000,
    source_batch: int = 64,
    **harness_kwargs,
) -> ProgramResult:
    """Betweenness centrality over ``sources`` (sampled Brandes;
    programs.BetweennessCentrality). Raw directed pair-dependency sums —
    multiply by n/len(sources) for the sampled estimator. Runs on the
    dualview layout (no hub splitting). Steps ≈ Σ_s 2·ecc(s) + 3.

    ``sources="all"``: EXACT Brandes — every vertex a source, run as a
    resumable source-batched schedule (see _exact_all_sources; Θ(V·E))."""
    m = graph_for(edges_factory, cache_key, num_partitions)
    if sources == "all":
        return _exact_all_sources(
            m, BetweennessCentrality, "bc", "dualview",
            source_batch=source_batch, max_steps=max_steps, **harness_kwargs)
    return _run(m, BetweennessCentrality, {"sources": sources},
                direction="dualview", max_steps=max_steps, **harness_kwargs)


def harmonic_centrality(
    edges_factory,
    cache_key: str,
    sources,
    num_partitions: int = 8,
    max_steps: int = 2000,
    source_batch: int = 64,
    **harness_kwargs,
) -> ProgramResult:
    """Sampled harmonic centrality H(v) = Σ_s 1/d(s, v) (programs.
    HarmonicCentrality) — the forward half of the Brandes machinery.

    ``sources="all"``: exact harmonic centrality via the same resumable
    source-batched schedule as exact betweenness (Θ(V·E))."""
    m = graph_for(edges_factory, cache_key, num_partitions)
    if sources == "all":
        return _exact_all_sources(
            m, HarmonicCentrality, "harmonic", "fwd",
            source_batch=source_batch, max_steps=max_steps, **harness_kwargs)
    return _run(m, HarmonicCentrality, {"sources": sources},
                direction="fwd", max_steps=max_steps, **harness_kwargs)


def closeness_centrality(
    edges_factory,
    cache_key: str,
    sources,
    num_partitions: int = 8,
    max_steps: int = 2000,
    source_batch: int = 64,
    **harness_kwargs,
) -> ProgramResult:
    """Sampled closeness centrality (programs.ClosenessCentrality): raw
    (sum_d, reach) moments per vertex over ``sources``; C(v) =
    reach / sum_d is the reach-normalized estimator. Same layered-BFS
    engine and cost envelope as harmonic_centrality.

    ``sources="all"``: exact closeness via the resumable source-batched
    schedule — both moments are additive across source batches, so the
    bucketed two-column sum merges partials exactly (Θ(V·E))."""
    m = graph_for(edges_factory, cache_key, num_partitions)
    if sources == "all":
        return _exact_all_sources(
            m, ClosenessCentrality, ["sum_d", "reach"], "fwd",
            source_batch=source_batch, max_steps=max_steps, **harness_kwargs)
    return _run(m, ClosenessCentrality, {"sources": sources},
                direction="fwd", max_steps=max_steps, **harness_kwargs)


def eigenvector_centrality(
    edges_factory,
    cache_key: str,
    num_partitions: int = 8,
    iters: int = 20,
    **harness_kwargs,
) -> ProgramResult:
    """K fixed L1-normalized power iterations of the in-edge sum
    (programs.EigenvectorCentrality). Driver-fed global normalizer, like
    hits(); steps = iters + 2."""
    m = graph_for(edges_factory, cache_key, num_partitions)
    return _run(m, EigenvectorCentrality, {"iters": iters},
                direction="fwd", max_steps=iters + 3, **harness_kwargs)


def katz_centrality(
    edges_factory,
    cache_key: str,
    num_partitions: int = 8,
    alpha: float = 0.02,
    eps: float = 1e-12,
    hub_threshold: int | None = None,
    ownership=None,
    **harness_kwargs,
) -> ProgramResult:
    """Katz centrality x = α·Σ_in x(u) + (1-α) (programs.KatzCentrality).
    α must be < 1/λ_max(A); the conservative safe bound on an unknown graph
    is 1/max_in_degree."""
    m = graph_for(edges_factory, cache_key, num_partitions,
                  hub_threshold=hub_threshold, ownership=ownership)
    return _run(m, KatzCentrality, {"eps": eps, "damping": alpha},
                direction="fwd", **harness_kwargs)


def pagerank_weighted(
    edges_factory,
    cache_key: str,
    num_partitions: int = 8,
    eps: float = 1e-10,
    damping: float = 0.85,
    weight_col: str = "w",
    hub_threshold: int | None = None,
    **harness_kwargs,
) -> ProgramResult:
    """PageRank with weight-proportional transitions (programs.
    WeightedPageRank): pr = 0.85·Σ_in pr(u)·w(u,v)/W(u) + 0.15. No hub
    splitting (W(u) must see every out-edge locally) — a non-None
    ``hub_threshold`` fails at actor load with a clear error."""
    m = graph_for(edges_factory, cache_key, num_partitions,
                  hub_threshold=hub_threshold, weight_col=weight_col)
    return _run(m, WeightedPageRank, {"eps": eps, "damping": damping},
                direction="fwd", **harness_kwargs)


def sssp_weighted(
    edges_factory,
    cache_key: str,
    source: int,
    num_partitions: int = 8,
    hub_threshold: int | None = None,
    ownership=None,
    direction: str = "fwd",
    weight_col: str = "w",
    **harness_kwargs,
) -> ProgramResult:
    """Weighted single-source shortest paths (distributed asynchronous
    Bellman-Ford; programs.WeightedSSSP). ``edges_factory`` must yield a
    (src, dst, <weight_col>) Dataset; duplicate (src, dst) rows keep the
    minimum weight. Nonnegative weights required."""
    m = graph_for(
        edges_factory,
        cache_key,
        num_partitions,
        hub_threshold=hub_threshold,
        ownership=ownership,
        weight_col=weight_col,
    )
    return _run(m, WeightedSSSP, {"source": source}, direction=direction, **harness_kwargs)


def bellman_ford_sssp(
    edges_factory,
    cache_key: str,
    source: int,
    n_vertices: int,
    num_partitions: int = 8,
    hub_threshold: int | None = None,
    ownership=None,
    direction: str = "fwd",
    weight_col: str = "w",
    **harness_kwargs,
) -> ProgramResult:
    """Weighted single-source shortest paths over a graph that may carry
    NEGATIVE edge weights (programs.BellmanFordSSSP). ``n_vertices`` must
    upper-bound the vertex count: it sets the V-superstep detection bound —
    synchronous Bellman-Ford converges within V − 1 rounds on any
    negative-cycle-free graph, so a run still messaging past that proves a
    negative cycle reachable from ``source`` and raises NegativeCycleError
    (intra-partition cycles raise earlier via the local wave cap)."""
    m = graph_for(
        edges_factory,
        cache_key,
        num_partitions,
        hub_threshold=hub_threshold,
        ownership=ownership,
        weight_col=weight_col,
        allow_negative_weights=True,
    )
    max_steps = int(n_vertices) + 2
    if harness_kwargs.pop("max_steps", None) is not None:
        raise ValueError("max_steps is derived from n_vertices (the cycle bound)")
    res = _run(
        m,
        BellmanFordSSSP,
        {"source": source},
        direction=direction,
        max_steps=max_steps,
        **harness_kwargs,
    )
    if not res.converged:
        raise NegativeCycleError(
            f"Bellman-Ford still relaxing after {res.steps} supersteps "
            f"(V bound {n_vertices}) — negative-weight cycle reachable from "
            f"source {source}"
        )
    return res


def pseudo_diameter(
    edges_factory,
    cache_key: str,
    num_partitions: int = 8,
    **harness_kwargs,
):
    """Double-BFS sweep (the standard pseudo-diameter lower bound): BFS on
    the symmetrized view from the min vid, hop to the farthest vertex
    (ties to the smallest vid), BFS again — the second eccentricity is the
    bound. Two superstep runs + two one-row sort/limit reads; covers the
    source's component (disconnected remainders don't constrain it).
    Returns (source, peak, ecc_source, pseudo_diameter) as one-row data."""
    import pyarrow as pa

    def far(res):
        t = (
            res.dataset()
            .sort(["dist", "vid"], descending=[True, False])
            .limit(1)
            .take_all()[0]
        )
        return int(t["vid"]), int(t["dist"])

    # deterministic start: the smallest vertex id — map_batches partial-min
    # (one row per block) + a tiny driver reduce; the edge table itself
    # never crosses to the driver (same pattern as cc_star._checksum)
    import numpy as np

    def partial_min(b: pa.Table) -> pa.Table:
        m = min(
            int(np.min(b["src"].to_numpy(zero_copy_only=False))),
            int(np.min(b["dst"].to_numpy(zero_copy_only=False))),
        )
        return pa.table({"m": pa.array([m], pa.int64())})

    partials = edges_factory().map_batches(
        partial_min, batch_format="pyarrow", batch_size=None
    ).take_all()
    src0 = min(int(r["m"]) for r in partials)
    r1 = sssp(edges_factory, cache_key, src0, num_partitions, direction="both",
              **harness_kwargs)
    peak, ecc0 = far(r1)
    r2 = sssp(edges_factory, cache_key, peak, num_partitions, direction="both",
              **harness_kwargs)
    _, diam = far(r2)
    return pa.table(
        {
            "source": pa.array([src0], pa.int64()),
            "peak": pa.array([peak], pa.int64()),
            "ecc_source": pa.array([ecc0], pa.int64()),
            "pseudo_diameter": pa.array([diam], pa.int64()),
        }
    )


def hyperanf(
    edges_factory,
    cache_key: str,
    num_partitions: int = 8,
    p: int = 6,
    **harness_kwargs,
):
    """HyperANF neighborhood function + effective diameter (programs
    .HyperANF): per-vertex HLL sketches merged along reversed edges until
    no register changes. Returns one row per superstep:
    (step, nf_estimate, frac_of_final, effective_diameter) where NF(t) is
    the estimated number of (v, u) pairs with dist(v→u) ≤ t and the
    effective diameter is the smallest t with NF(t) ≥ 0.9 · NF(final) —
    the standard webgraph distance report (Broder et al. 2000 measure it
    exactly; HyperANF is how it's done at 10^12 docs). Approximate by
    design (HLL σ ≈ 1.04/√2^p) → rows-only registry entry; the pytest gate
    bounds it against exact BFS neighborhood functions."""
    import pyarrow as pa

    from drone_ray.graph.programs import HyperANF

    m = graph_for(edges_factory, cache_key, num_partitions)
    res = _run(m, HyperANF, {"p": p}, direction="rev", **harness_kwargs)
    per_step: dict[int, float] = {}
    for mt in res.metrics:
        if "nf_sum" in mt:
            per_step[mt["step"]] = per_step.get(mt["step"], 0.0) + mt["nf_sum"]
    steps = sorted(per_step)
    nf = [per_step[s] for s in steps]
    # trailing steps with a bit-identical estimate are the engine's
    # fixpoint-confirmation rounds (the quiet superstep that proves no
    # register changed, plus any speculative no-ops) — not distance levels
    while len(nf) >= 2 and nf[-1] == nf[-2]:
        nf.pop()
        steps.pop()
    final = nf[-1] if nf else 0.0
    eff = next((s for s, v in zip(steps, nf) if final and v >= 0.9 * final), 0)
    return pa.table(
        {
            "step": pa.array(steps, pa.int64()),
            "nf_estimate": pa.array([round(v, 4) for v in nf], pa.float64()),
            "frac_of_final": pa.array(
                [round(v / final, 6) if final else 0.0 for v in nf], pa.float64()
            ),
            "effective_diameter": pa.array([eff] * len(steps), pa.int64()),
        }
    )


def random_walks(
    edges_factory,
    cache_key: str,
    num_partitions: int = 8,
    walk_length: int = 8,
    num_walks: int = 1,
    **harness_kwargs,
) -> ProgramResult:
    """Deterministic DeepWalk-style random-walk corpus: ``num_walks`` walks
    per vertex, ``walk_length`` hops along out-edges, md5-derived next-hop
    choice (programs.RandomWalks). No hub_threshold: walk messages carry
    walk identity, which hub broadcasts would collapse."""
    from drone_ray.graph.programs import RandomWalks

    if harness_kwargs.get("checkpoint_dir") and harness_kwargs.get("checkpoint_every"):
        raise NotImplementedError(
            "random-walk state is per-walk visit rows, not per-vertex arrays "
            "— the vertex-state checkpoint layout cannot represent it; rerun "
            "instead (walks are deterministic, a rerun is bit-identical)"
        )

    m = graph_for(edges_factory, cache_key, num_partitions)
    return _run(
        m,
        RandomWalks,
        {"walk_length": walk_length, "num_walks": num_walks},
        direction="fwd",
        **harness_kwargs,
    )


def bowtie(
    edges_factory,
    cache_key: str,
    num_partitions: int = 8,
    num_buckets: int = 32,
    scc_max_steps: int = 500,
    **harness_kwargs,
):
    """Broder-et-al bowtie decomposition of a directed web graph ("Graph
    structure in the Web", WWW 2000): classify every vertex as

    - ``core``          — member of the largest SCC (ties → smallest label),
    - ``in``            — reaches the core but is not in it,
    - ``out``           — reachable from the core but is not in it,
    - ``tendril``       — same weak component as the core, touching neither
                          reach set (tendrils and tubes),
    - ``disconnected``  — a different weak component.

    Composition over the shared layout: one SCC run picks the core; because
    the core is strongly connected, forward/backward reachability from the
    WHOLE core equals reachability from any single member, so two
    single-source BFS runs (directed + reversed view) from the core's label
    vertex (labels are the max member vid, hence itself a member) replace
    the multi-source sweeps; one WCC run separates tendrils from other
    components. Label assembly is one bucketed per-vid merge — the driver
    holds only the core label and its weak-component id (two ints).

    Returns a Dataset of (vid, bowtie_class)."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa

    for kw in ("output_dir", "checkpoint_dir", "checkpoint_every", "resume"):
        if harness_kwargs.get(kw):
            # four sub-runs would share one directory: lazy part-file reads
            # would all see the LAST writer's files, and the second sub-run
            # would refuse the first's checkpoint (program-type guard)
            raise ValueError(
                f"bowtie composes four program runs and cannot forward {kw!r}; "
                "write the returned Dataset instead"
            )

    from drone_ray.hashing import mix64
    from drone_ray.pipelines._util import pin_schema

    scc_ds = scc(
        edges_factory, cache_key, num_partitions,
        max_steps=scc_max_steps, **harness_kwargs,
    ).dataset()
    from ray.data.aggregate import Count

    top = (
        scc_ds.groupby("scc")
        .aggregate(Count(alias_name="n"))
        .sort(["n", "scc"], descending=[True, False])
        .limit(1)
        .take_all()
    )
    core_label = int(top[0]["scc"])

    fwd = sssp(edges_factory, cache_key, core_label, num_partitions,
               direction="fwd", **harness_kwargs).dataset()
    bwd = sssp(edges_factory, cache_key, core_label, num_partitions,
               direction="rev", **harness_kwargs).dataset()
    wcc_ds = connected_components(
        edges_factory, cache_key, num_partitions, **harness_kwargs
    ).dataset()

    def _rep_component(b: pa.Table) -> pa.Table:
        vid = b["vid"].to_numpy(zero_copy_only=False)
        hit = vid == core_label
        return pa.table(
            {"component": pa.array(b["component"].to_numpy(zero_copy_only=False)[hit])}
        )

    core_wcc = int(
        wcc_ds.map_batches(_rep_component, batch_format="pyarrow", batch_size=None)
        .take_all()[0]["component"]
    )

    # (vid, f, v) union rows: f=0 SCC label, f=1 reaches-core, f=2
    # reached-from-core, f=3 weak-component label
    def _tag(f: int, val_col: str | None):
        def fn(b: pa.Table) -> pa.Table:
            vid = b["vid"].to_numpy(zero_copy_only=False)
            v = (
                b[val_col].to_numpy(zero_copy_only=False).astype(np.int64)
                if val_col is not None
                else np.zeros(vid.size, np.int64)
            )
            return pa.table(
                {
                    "vid": pa.array(vid, pa.int64()),
                    "f": pa.array(np.full(vid.size, f, np.int64)),
                    "v": pa.array(v, pa.int64()),
                    "_b": pa.array(
                        (mix64(vid.astype(np.uint64)) % np.uint64(num_buckets)).astype(
                            np.int64
                        )
                    ),
                }
            )

        return fn

    u = (
        scc_ds.map_batches(_tag(0, "scc"), batch_format="pyarrow", batch_size=None)
        .union(bwd.map_batches(_tag(1, None), batch_format="pyarrow", batch_size=None))
        .union(fwd.map_batches(_tag(2, None), batch_format="pyarrow", batch_size=None))
        .union(
            wcc_ds.map_batches(_tag(3, "component"), batch_format="pyarrow", batch_size=None)
        )
    )

    def classify(g: pd.DataFrame) -> pd.DataFrame:
        s = g[g["f"] == 0].set_index("vid")["v"]  # every vertex has an SCC row
        w = g[g["f"] == 3].set_index("vid")["v"]
        vids = s.index.to_numpy(np.int64)
        has_bwd = s.index.isin(g.loc[g["f"] == 1, "vid"])
        has_fwd = s.index.isin(g.loc[g["f"] == 2, "vid"])
        wccl = w.reindex(s.index).to_numpy(np.int64)
        cls = np.where(
            s.to_numpy(np.int64) == core_label,
            "core",
            np.where(
                has_bwd,
                "in",
                np.where(
                    has_fwd,
                    "out",
                    np.where(wccl == core_wcc, "tendril", "disconnected"),
                ),
            ),
        )
        return pd.DataFrame({"vid": vids, "bowtie_class": cls})

    schema = pa.schema([("vid", pa.int64()), ("bowtie_class", pa.string())])
    return (
        u.groupby("_b")
        .map_groups(classify, batch_format="pandas")
        .map_batches(pin_schema(schema), batch_format="pyarrow", batch_size=None)
    )


def graph_simulation(
    edges_factory,
    cache_key: str,
    pattern_attrs: dict,
    pattern_targets: dict,
    num_partitions: int = 8,
    hub_threshold: int | None = None,
    ownership=None,
    **harness_kwargs,
) -> ProgramResult:
    """Graph pattern simulation (reference Sim). The engine runs on the
    REVERSED view of the shared dual layout — see drone_ray.graph.simulation
    for why reversal is needed; no separate reversed build exists."""
    from drone_ray.graph.simulation import GraphSimulation

    m = graph_for(edges_factory, cache_key, num_partitions, hub_threshold=hub_threshold,
                  ownership=ownership)
    return _run(
        m,
        GraphSimulation,
        {"pattern_attrs": pattern_attrs, "pattern_targets": pattern_targets},
        direction="rev",
        **harness_kwargs,
    )
