"""M9 — URL canonicalization + 64-bit vertex-id hashing (SURVEY.md §2.3 M9).

The reference engine consumes integer vertex ids produced by an offline
partitioner (/root/reference/src/graph/graph.go:335-362); our ids are stable
hashes of canonicalized URLs so the edge build needs no id-assignment
shuffle or lookup join (SURVEY.md §2.5 J5).

Canonicalization contract (deterministic, per-row):
  * resolve relative hrefs against the page url (RFC 3986 join)
  * strip the fragment
  * keep only http/https schemes (mailto:, javascript:, data: → dropped)
  * empty / whitespace-only hrefs → dropped
"""

from __future__ import annotations

from urllib.parse import urldefrag, urljoin, urlsplit

import numpy as np
import pyarrow as pa

from drone_ray.hashing import hash_url


def canonicalize(base_url: str, href: str) -> str | None:
    href = href.strip()
    if not href:
        return None
    try:
        absolute = urljoin(base_url, href)
        absolute, _frag = urldefrag(absolute)
        scheme = urlsplit(absolute).scheme
    except ValueError:
        return None
    if scheme not in ("http", "https"):
        return None
    return absolute


def links_to_edges_batch(batch: pa.Table, host_bits: int = 0) -> pa.Table:
    """(url, links: list<string>) → link rows (src, dst, src_url, dst_url).

    Flat-map expressed inside map_batches (one output row per kept href);
    duplicates preserved — exact dedup (D3) happens at edge finalization.

    ``host_bits`` > 0 emits host-locality vids (hash_url host prefix layout)
    so the graph build can co-locate same-site pages with
    ``Ownership("host", host_bits)`` — see drone_ray.hashing.
    """
    urls = batch["url"].to_pylist()
    links = batch["links"].to_pylist()
    src_urls: list[str] = []
    dst_urls: list[str] = []
    for u, hrefs in zip(urls, links):
        for h in hrefs:
            c = canonicalize(u, h)
            if c is not None:
                src_urls.append(u)
                dst_urls.append(c)
    n = len(src_urls)
    src = np.fromiter((hash_url(u, host_bits) for u in src_urls), np.int64, count=n)
    dst = np.fromiter((hash_url(u, host_bits) for u in dst_urls), np.int64, count=n)
    return pa.table(
        {
            "src": pa.array(src, pa.int64()),
            "dst": pa.array(dst, pa.int64()),
            "src_url": pa.array(src_urls, pa.string()),
            "dst_url": pa.array(dst_urls, pa.string()),
        }
    )


def vid_batch(batch: pa.Table, url_col: str = "url") -> pa.Table:
    """Project (url → vid) for building the vertices side table."""
    urls = batch[url_col].to_pylist()
    vids = np.fromiter((hash_url(u) for u in urls), np.int64, count=len(urls))
    return pa.table({"vid": pa.array(vids, pa.int64()), "url": batch[url_col]})
