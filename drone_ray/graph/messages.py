"""Message combine / routing kernels for the superstep engine.

The reference ships typed id/value pair lists over gRPC, grouped by
destination partition, and folds them with sum/min at the master copy
(SURVEY.md §2.6 G1-G4; /root/reference/src/worker/PRWorker.go:150-159,
src/worker/CCworker.go:267-280). Here a message set is a dict of aligned
numpy arrays — ``{"vid": int64[], "val": ...[], [extra key col]}`` — and all
combines are vectorized lexsort + reduceat.

Skew note (SURVEY.md §4): every sender pre-combines per (destination
partition, key) before the exchange, so a hub vertex's fan-in arrives as at
most P pre-combined rows regardless of in-degree — the same effect as
salting the key by sender partition with a final combine at the owner.
All combine ops are commutative/associative (sum/min), so arrival order
can never change results (reference ordering assumption, SURVEY.md §2.10).
"""

from __future__ import annotations

import numpy as np

from drone_ray.hashing import owner_partition

Messages = dict  # {"vid": np.int64[], "val": np.ndarray, optional extra key col}

_OPS = {"sum": np.add, "min": np.minimum, "max": np.maximum}


def combine(msgs: Messages, op: str, extra_key: str | None = None) -> Messages:
    """Group by (vid[, extra_key]) and reduce ``val`` with ``op``."""
    vid = msgs["vid"]
    if vid.size == 0:
        return msgs
    keys = [vid] if extra_key is None else [vid, msgs[extra_key]]
    # np.lexsort: last key is primary
    order = np.lexsort(keys[::-1])
    sk = [k[order] for k in keys]
    sv = msgs["val"][order]
    new_group = np.empty(vid.size, dtype=bool)
    new_group[0] = True
    diff = sk[0][1:] != sk[0][:-1]
    for k in sk[1:]:
        diff = diff | (k[1:] != k[:-1])
    new_group[1:] = diff
    starts = np.flatnonzero(new_group)
    red = _OPS[op].reduceat(sv, starts)
    out: Messages = {"vid": sk[0][starts], "val": red}
    if extra_key is not None:
        out[extra_key] = sk[1][starts]
    return out


def concat(payloads: list[Messages | None]) -> Messages | None:
    """Concatenate inbound payloads from all source partitions."""
    live = [m for m in payloads if m is not None and m["vid"].size > 0]
    if not live:
        return None
    if len(live) == 1:
        return live[0]
    return {k: np.concatenate([m[k] for m in live]) for k in live[0]}


def combine_inbound(
    payloads: list[Messages | None], op: str, extra_key: str | None = None
) -> Messages | None:
    """Final combine at the owner (reference 'master' fold,
    /root/reference/src/worker/PRWorker.go:150-159)."""
    cat = concat(payloads)
    if cat is None:
        return None
    return combine(cat, op, extra_key)


def combine_inbound_local(g, payloads: list[Messages | None], op: str) -> Messages | None:
    """Owner-side combine in the LOCAL index domain — O(rows + n) instead of
    O(rows·log rows): the receiver owns every inbound vid, so sum collapses
    to a weighted bincount and min to an unbuffered minimum.at, with the
    touched set recovered by a count bincount (no sort anywhere). This is
    the per-superstep hot path; the generic lexsort combine remains for
    multi-key messages (LPA/Sim)."""
    cat = concat(payloads)
    if cat is None:
        return None
    idx = g.local_index(cat["vid"])
    val = cat["val"]
    counts = np.bincount(idx, minlength=g.n)
    touched = np.flatnonzero(counts)
    if op == "sum":
        tot = np.bincount(idx, weights=val, minlength=g.n)
        out_val = tot[touched]
        if val.dtype.kind in "iu":
            out_val = out_val.astype(val.dtype)
    elif op == "min":
        if val.dtype.kind == "f":
            acc = np.full(g.n, np.inf)
        else:
            acc = np.full(g.n, np.iinfo(val.dtype).max, dtype=val.dtype)
        np.minimum.at(acc, idx, val)
        out_val = acc[touched]
    else:  # pragma: no cover - max unused by built-ins
        acc = np.full(g.n, -np.inf)
        np.maximum.at(acc, idx, val)
        out_val = acc[touched]
    return {"vid": g.owned[touched], "val": out_val}


def route(
    msgs: Messages | None,
    num_partitions: int,
    op: str,
    extra_key: str | None = None,
    precombine: bool = True,
) -> list[Messages | None]:
    """Split a message set by destination owner partition, optionally
    pre-combining per (destination, key) first.

    Returns a list of length P; entry q is the payload for partition q (or
    None). Replaces the reference's per-destination grouping + chunked RPC
    fan-out (/root/reference/src/worker/PRWorker.go:79-127) — Ray's object
    store is the transport.

    ``precombine`` trade-off: combining at the sender (a lexsort) shrinks
    the bytes crossing the wire but makes the rows a receiver gets scale
    with ``n_owned × P`` (one row per key per sender) instead of with its
    in-edges (∝ E/P), so per-partition work stops shrinking as P grows.
    Scalar-message programs skip it — the owner's O(rows) bincount combine
    absorbs duplicates — while multi-key programs (label counts) keep it.
    """
    empty: list[Messages | None] = [None] * num_partitions
    if msgs is None or msgs["vid"].size == 0:
        return empty
    owners = owner_partition(msgs["vid"], num_partitions)
    if precombine:
        # one lexsort with owner as the primary key: the combine's groups
        # (same vid ⇒ same owner) come out owner-contiguous, so the
        # per-destination split is a searchsorted slice — no P mask passes
        vid = msgs["vid"]
        keys = [owners, vid] + ([msgs[extra_key]] if extra_key is not None else [])
        order = np.lexsort(keys[::-1])
        sk = [k[order] for k in keys[1:]]  # vid[, extra] sorted
        sv = msgs["val"][order]
        new_group = np.empty(vid.size, dtype=bool)
        new_group[0] = True
        diff = sk[0][1:] != sk[0][:-1]
        for k in sk[1:]:
            diff = diff | (k[1:] != k[:-1])
        new_group[1:] = diff
        starts = np.flatnonzero(new_group)
        red = _OPS[op].reduceat(sv, starts)
        g_vid = sk[0][starts]
        g_owner = owners[order][starts]
        cols: Messages = {"vid": g_vid, "val": red}
        if extra_key is not None:
            cols[extra_key] = sk[1][starts]
        bounds = np.searchsorted(g_owner, np.arange(num_partitions + 1))
    else:
        order = np.argsort(owners, kind="stable")
        cols = {k: v[order] for k, v in msgs.items()}
        bounds = np.searchsorted(owners[order], np.arange(num_partitions + 1))
    out = list(empty)
    for q in range(num_partitions):
        lo, hi = int(bounds[q]), int(bounds[q + 1])
        if lo == hi:
            continue
        out[q] = {k: v[lo:hi] for k, v in cols.items()}
    return out
