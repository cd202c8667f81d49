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

from drone_ray.hashing import Ownership, owner_partition

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
    O(rows·log rows). Accepts three payload shapes, mixed freely:

      * compact dense  {"d": values, "r": remote?}  — one value per slot of
        the sender's registered static boundary (identity slots are no-ops)
      * compact sparse {"p": int32 positions, "v": values, "r": remote?}
      * global rows    {"vid": int64[], "val": values}  — hub expansions and
        checkpoint-restored payloads

    Compact payloads are positional: payload index s < P must be the payload
    from sender s, resolved against ``g`` registered maps ``idx_full[s]`` /
    ``idx_rem[s]`` (receiver-local row of each boundary slot, precomputed
    once at startup — see actor.register_inbound). Returns
    {"vid": global ids, "li": local rows, "val": combined} or None.

    A combined sum of exactly 0.0 (or a min that stayed at the identity) is
    reported as untouched — indistinguishable from receiving nothing, which
    every program treats as a no-op.
    """
    idx_full = getattr(g, "_in_idx_full", None)
    idx_rem = getattr(g, "_in_idx_rem", None)
    idx_parts: list[np.ndarray] = []
    val_parts: list[np.ndarray] = []
    for s, m in enumerate(payloads):
        if m is None:
            continue
        if "d" in m:
            imap = idx_rem[s] if m["r"] else idx_full[s]
            idx_parts.append(imap)
            val_parts.append(m["d"])
        elif "p" in m:
            imap = idx_rem[s] if m["r"] else idx_full[s]
            idx_parts.append(imap[m["p"]])
            val_parts.append(m["v"])
        elif m["vid"].size:
            idx_parts.append(g.local_index(m["vid"]))
            val_parts.append(m["val"])
    if not idx_parts:
        return None
    idx = np.concatenate(idx_parts) if len(idx_parts) > 1 else idx_parts[0]
    val = np.concatenate(val_parts) if len(val_parts) > 1 else val_parts[0]
    if op == "sum":
        if val.dtype.kind in "iu":
            # integer accumulation domain — float64 bincount weights round
            # values beyond 2^53 (see csr.push_combined)
            acc = np.zeros(g.n, dtype=val.dtype)
            np.add.at(acc, idx, val)
        else:
            acc = np.bincount(idx, weights=val, minlength=g.n)
        touched = np.flatnonzero(acc)
        out_val = acc[touched]
    elif op == "min":
        if val.dtype.kind == "f":
            acc = np.full(g.n, np.inf)
            np.minimum.at(acc, idx, val)
            touched = np.flatnonzero(np.isfinite(acc))
        else:
            sentinel = np.iinfo(val.dtype).max
            acc = np.full(g.n, sentinel, dtype=val.dtype)
            np.minimum.at(acc, idx, val)
            touched = np.flatnonzero(acc != sentinel)
        out_val = acc[touched]
    else:  # max — HyperANF register rows (2-D unsigned, identity 0) or floats
        if val.ndim == 2:
            acc = np.zeros((g.n, val.shape[1]), dtype=val.dtype)
            np.maximum.at(acc, idx, val)
            # HLL register rows always carry at least one rank ≥ 1, so a row
            # that stayed all-zero received nothing
            touched = np.flatnonzero(acc.any(axis=1))
        else:
            acc = np.full(g.n, -np.inf)
            np.maximum.at(acc, idx, val)
            touched = np.flatnonzero(np.isfinite(acc))
        out_val = acc[touched]
    return {"vid": g.owned[touched], "li": touched, "val": out_val}


def route(
    msgs: Messages | None,
    num_partitions: int,
    op: str,
    extra_key: str | None = None,
    precombine: bool = True,
    ownership: Ownership | None = None,
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
    owners = (
        ownership.of(msgs["vid"], num_partitions)
        if ownership is not None
        else owner_partition(msgs["vid"], num_partitions)
    )
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
