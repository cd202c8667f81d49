"""Stable 64-bit hashing for vertex ids and partition assignment.

The reference engine uses METIS-assigned integer partitions computed offline
(/root/reference/src/preprocess.py:2-27); we instead derive vertex ids by
hashing canonicalized URLs (SURVEY.md §2.3 M9) and assign partitions with a
stable hash so that every stage — edge build, partitioner, message routing —
agrees on ownership without any shared state.

All hashes here are deterministic across processes and Python versions
(no PYTHONHASHSEED dependence).
"""

from __future__ import annotations

import hashlib

import numpy as np

_MASK63 = (1 << 63) - 1


def hash_url(url: str, host_bits: int = 0) -> int:
    """64-bit (non-negative int64) id for a canonicalized URL.

    blake2b/8-byte keeps collision probability negligible for up to ~10^9
    distinct URLs per partition-space; ids are masked to 63 bits so they fit
    int64 without sign surprises in Arrow/parquet/DuckDB round-trips.

    With ``host_bits`` > 0 the top ``host_bits`` bits of the id are a hash
    of the URL's host and the low ``63 - host_bits`` bits hash the full URL
    — a HOST-LOCALITY id layout: all pages of one site share an id prefix,
    so :class:`Ownership` mode "host" can co-locate them on one partition
    (the reference's METIS edge-cut rationale,
    /root/reference/src/preprocess.py:2-27 — most web links are intra-site,
    so boundary message volume drops by the intra-site link fraction).
    host_bits=0 (default) is the plain page-hash id, unchanged from round 1.
    """
    h = hashlib.blake2b(url.encode("utf-8"), digest_size=8).digest()
    vid = int.from_bytes(h, "big") & _MASK63
    if host_bits <= 0:
        return vid
    hh = hashlib.blake2b(url_host(url).encode("utf-8"), digest_size=8).digest()
    prefix = int.from_bytes(hh, "big") >> (64 - host_bits)
    return (prefix << (63 - host_bits)) | (vid & ((1 << (63 - host_bits)) - 1))


def url_host(url: str) -> str:
    """Host (netloc) of a canonicalized http(s) URL — cheap split, no parse."""
    rest = url.split("://", 1)
    return rest[1].split("/", 1)[0] if len(rest) == 2 else rest[0].split("/", 1)[0]


def hash_urls(urls, host_bits: int = 0) -> np.ndarray:
    """Vectorized-ish batch version of :func:`hash_url` → int64 ndarray."""
    return np.fromiter(
        (hash_url(u, host_bits) for u in urls), dtype=np.int64, count=len(urls)
    )


# --- partition assignment ---------------------------------------------------
#
# Vertex ownership: owner(v) = splitmix64(v) % P. A finalizer-style mixer is
# used (not plain modulo) so that structured id spaces (0..n-1 in tests,
# TPC-H keys) spread uniformly. Pure numpy, O(n) per batch, no Python loop.

_C1 = np.uint64(0xBF58476D1CE4E5B9)
_C2 = np.uint64(0x94D049BB133111EB)
_GOLDEN = np.uint64(0x9E3779B97F4A7C15)


def mix64(x: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer over an int64/uint64 ndarray → uint64 ndarray."""
    z = x.astype(np.uint64, copy=True)
    with np.errstate(over="ignore"):
        z += _GOLDEN
        z ^= z >> np.uint64(30)
        z *= _C1
        z ^= z >> np.uint64(27)
        z *= _C2
        z ^= z >> np.uint64(31)
    return z


def owner_partition(vids: np.ndarray, num_partitions: int) -> np.ndarray:
    """Partition owning each vertex id → int32 ndarray in [0, P)."""
    return (mix64(np.asarray(vids)) % np.uint64(num_partitions)).astype(np.int32)


def adaptive_buckets(
    est_rows: int | None,
    floor: int,
    rows_per_bucket: int = 4_000_000,
    cap: int = 65536,
) -> int:
    """Bucket count for the hash-bucket ``groupby(_b).map_groups`` pattern.

    Each bucket materializes ~rows/B of the keyspace inside ONE task, so a
    fixed B stops scaling: per-task heap grows linearly with the input. With
    the default 4M rows/bucket a bucket of int64 pairs costs ~64 MB of task
    heap regardless of total input size. ``floor`` keeps small inputs at
    full-cluster fan-out (the historical constants 32/64 are the floors);
    ``cap`` bounds scheduler overhead on extreme inputs. Estimates only need
    to be order-of-magnitude right — callers pass cheap upper bounds
    (parquet metadata row counts, pages × fan-out priors), or None to keep
    the floor."""
    if not est_rows or est_rows <= 0:
        return floor
    need = -(-int(est_rows) // rows_per_bucket)  # ceil division
    return int(min(max(floor, need), cap))


class Ownership:
    """Pluggable vertex-ownership function, shared by every stage (edge
    build, CSR boundary indexes, message routing) so all agree without any
    lookup table.

    mode "page" (default): owner(v) = mix64(v) % P — uniform, the round-1/2
    behavior.

    mode "host": owner(v) = mix64(v >> (63 - host_bits)) % P — vertices
    sharing the top ``host_bits`` id prefix (all pages of one site under the
    :func:`hash_url` host-locality layout) land on ONE partition, so
    intra-site links never cross a partition boundary. Two skew overrides,
    both pure functions of the vid, both tiny tables in the graph manifest:

      * ``salted`` — prefixes of MEGA-HOSTS (sites too big for ANY single
        partition): their vertices fall back to the page hash and spread.
      * ``placed`` — {prefix: partition} greedy placement of the heaviest
        remaining hosts (balanced-partitioning): hash placement of a few
        hundred weighted sites leaves ~1.4× max/mean partition load, which
        gates every BSP barrier at full parallelism; packing the heavy ones
        onto the lightest bins removes it while keeping full locality.
    """

    __slots__ = ("mode", "host_bits", "salted", "placed_pref", "placed_part")

    def __init__(self, mode: str = "page", host_bits: int = 18, salted=(), placed=None):
        if mode not in ("page", "host"):
            raise ValueError(f"unknown ownership mode {mode!r}")
        if mode == "host" and not (1 <= host_bits <= 48):
            raise ValueError("host_bits must be in [1, 48]")
        self.mode = mode
        self.host_bits = int(host_bits)
        # sorted uint64 prefixes — np.isin on sorted small arrays is cheap
        self.salted = np.sort(np.asarray(list(salted), dtype=np.uint64))
        items = sorted((int(k), int(p)) for k, p in (placed or {}).items())
        self.placed_pref = np.asarray([k for k, _ in items], dtype=np.uint64)
        self.placed_part = np.asarray([p for _, p in items], dtype=np.int32)

    def of(self, vids: np.ndarray, num_partitions: int) -> np.ndarray:
        """Partition owning each vertex id → int32 ndarray in [0, P)."""
        P = np.uint64(num_partitions)
        v = np.asarray(vids)
        if self.mode == "page":
            return (mix64(v) % P).astype(np.int32)
        pref = v.astype(np.uint64) >> np.uint64(63 - self.host_bits)
        own = (mix64(pref) % P).astype(np.int32)
        if self.placed_pref.size:
            if int(self.placed_part.max()) >= num_partitions:
                # placement bakes in the partition count it was detected
                # for; silently returning an id >= P would write edges into
                # partitions no actor ever reads
                raise ValueError(
                    f"Ownership.placed assigns partition "
                    f"{int(self.placed_part.max())} but this graph has only "
                    f"{num_partitions} partitions — re-run detect_mega_hosts "
                    f"with num_partitions={num_partitions}"
                )
            idx = np.searchsorted(self.placed_pref, pref)
            idx_c = np.minimum(idx, self.placed_pref.size - 1)
            m = self.placed_pref[idx_c] == pref
            if m.any():
                own[m] = self.placed_part[idx_c[m]]
        if self.salted.size:
            m = np.isin(pref, self.salted)
            if m.any():
                own[m] = (mix64(v[m]) % P).astype(np.int32)
        return own

    def prefix_of(self, vids: np.ndarray) -> np.ndarray:
        """Host prefix (uint64) of each vid under this layout."""
        return np.asarray(vids).astype(np.uint64) >> np.uint64(63 - self.host_bits)

    # --- manifest (de)serialization ------------------------------------
    def to_dict(self) -> dict:
        return {
            "mode": self.mode,
            "host_bits": self.host_bits,
            "salted": [int(x) for x in self.salted],
            "placed": {
                str(int(k)): int(p)
                for k, p in zip(self.placed_pref, self.placed_part)
            },
        }

    @staticmethod
    def from_dict(d: dict | None) -> "Ownership":
        if not d:
            return Ownership()
        return Ownership(
            d["mode"],
            d.get("host_bits", 18),
            d.get("salted", ()),
            {int(k): int(p) for k, p in (d.get("placed") or {}).items()},
        )

    def token(self) -> str:
        """Short cache-key component (CSR caches depend on ownership)."""
        if self.mode == "page":
            return "page"
        h = hashlib.blake2b(
            self.salted.tobytes()
            + self.placed_pref.tobytes()
            + self.placed_part.tobytes(),
            digest_size=4,
        ).hexdigest()
        return f"host{self.host_bits}-{h}"
