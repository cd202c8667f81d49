"""Deterministic synthetic Common-Crawl-style pages (FIXTURES.md §1).

Schema fixed by the driver's ``BASELINE.json`` ``input_hint``:
``url:string, warc_ts:timestamp[us], html:binary, text:string, lang:string``.

Every row is a pure function of ``(seed, row_index)`` — per-row
``np.random.default_rng([seed, i])`` — so any batching / parallelism /
ordering produces identical bytes (the same contract the extraction stage
must satisfy). The ``text`` column is the extraction oracle: the engine must
reproduce it byte-identically from ``html``.

Link structure: out-degree has a power-law tail (1 page in 101 is a hub with
``HUB_OUT`` links, mirroring the reference's power-law focus,
/root/reference/README.md:26-29); in-links are biased toward low page
indices (r^3 sampling) so in-degree is skewed too. Link forms exercise
canonicalization/dedup: absolute, relative, fragment, duplicate, self-link,
dangling target, mailto (dropped).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

EPOCH_US = 1_767_225_600_000_000  # 2026-01-01T00:00:00Z in microseconds
N_SITES = 64
HUB_EVERY = 101
HUB_OUT = 60
LANGS = ("en", "de", "zh")

_WORDS = {
    "en": (
        "stream shuffle vertex graph crawl anchor ranking spider cluster "
        "partition actor block batch arrow column degree label walk frontier "
        "merge index page link rank score delta cache spill heap"
    ).split(),
    "de": (
        "der die das und nicht mit einem strom scherbe knoten graph anker "
        "rang spinne gruppe teil block spalte grad marke weg rand wert"
    ).split(),
    "zh": list("图分区顶点边爬虫锚点排名集群批列度标签合并索引页链接秩分数缓存堆流"),
}

# site popularity: p(rank) ∝ (rank+1)^-1.5 over N_SITES (bounded Zipf)
_SITE_P = (1.0 / np.power(np.arange(1, N_SITES + 1), 1.5))
_SITE_P /= _SITE_P.sum()
_SITE_CDF = np.cumsum(_SITE_P)


def _site_of(rng: np.random.Generator) -> int:
    return int(np.searchsorted(_SITE_CDF, rng.random(), side="right"))


def site_index(seed: int, i: int) -> int:
    """Site of page i — pure function, callable for arbitrary i."""
    return _site_of(np.random.default_rng([seed, i, 7]))


def page_url(seed: int, i: int) -> str:
    return f"https://site{site_index(seed, i)}.example/p/{i}"


def _escape(s: str) -> str:
    return s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")


def _make_row(seed: int, i: int, n_pages: int) -> tuple[str, int, bytes, str, str]:
    rng = np.random.default_rng([seed, i])
    site = site_index(seed, i)
    url = f"https://site{site}.example/p/{i}"
    lang = LANGS[i % 3]
    words = _WORDS[lang]
    case = i % 101  # deterministic edge-case buckets

    def pick_words(lo: int, hi: int) -> list[str]:
        n = int(rng.integers(lo, hi))
        out = []
        for w in rng.choice(len(words), size=n):
            word = words[int(w)]
            r = rng.random()
            if r < 0.03:
                word = word + "&" + words[int(rng.integers(len(words)))]
            elif r < 0.05:
                word = "<" + word + ">"
            out.append(word)
        return out

    if case == 5:  # empty body
        html = "<html><head><title></title></head><body></body></html>"
        return url, EPOCH_US + i * 1_000_000, html.encode("utf-8"), "", lang

    title_words = pick_words(2, 6)
    title_plain = " ".join(title_words)

    # --- links for this page ---
    if case == 17:  # no links
        n_out = 0
    elif i % HUB_EVERY == 0:
        n_out = min(HUB_OUT, max(1, n_pages // 4))
    else:
        n_out = int(rng.integers(2, 9))

    hrefs: list[str] = []
    anchors: list[tuple[str, str]] = []  # (href, anchor_text)
    for j in range(n_out):
        target = int(n_pages * rng.random() ** 3)
        t_site = site_index(seed, target)
        form = int(rng.integers(0, 10))
        if form == 0 and t_site == site:
            href = f"/p/{target}"                      # relative
        elif form == 1:
            href = f"https://site{t_site}.example/p/{target}#sec{j}"  # fragment
        elif form == 2 and hrefs:
            href = hrefs[-1]                            # duplicate
        elif form == 3:
            href = url                                  # self-link
        elif form == 4:
            href = f"https://site{t_site}.example/missing/{target}"   # dangling
        elif form == 5:
            href = "mailto:noreply@example.com"         # dropped downstream
        else:
            href = f"https://site{t_site}.example/p/{target}"
        hrefs.append(href)
        anchors.append((href, words[int(rng.integers(len(words)))]))

    # --- paragraphs with anchors inline ---
    n_para = int(rng.integers(1, 4))
    para_html: list[str] = []
    para_plain: list[str] = []
    a_iter = iter(anchors)
    per_para = (len(anchors) // n_para + 1) if anchors else 0
    for p in range(n_para):
        w = pick_words(8, 21)
        htoks = [_escape(t) for t in w]
        ptoks = list(w)
        for _ in range(per_para):
            nxt = next(a_iter, None)
            if nxt is None:
                break
            href, atext = nxt
            pos = int(rng.integers(0, len(htoks) + 1))
            htoks.insert(pos, f'<a href="{href}">{_escape(atext)}</a>')
            ptoks.insert(pos, atext)
        body = " ".join(htoks)
        if case == 33 and p == 0:
            body = "<b>" + body  # malformed nesting (unclosed tag)
        para_html.append(f"<p>{body}</p>")
        para_plain.append(" ".join(ptoks))

    html = (
        f"<html><head><title>{_escape(title_plain)}</title></head><body>"
        + "".join(para_html)
        + "</body></html>"
    )
    text = "\n".join(s for s in [title_plain, *para_plain] if s)
    return url, EPOCH_US + i * 1_000_000, html.encode("utf-8"), text, lang


PAGES_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us")),
        ("html", pa.binary()),
        ("text", pa.string()),
        ("lang", pa.string()),
    ]
)


def pages_batch(indices: np.ndarray, n_pages: int, seed: int = 42) -> pa.Table:
    """Rows for the given global indices (order follows ``indices``)."""
    rows = [_make_row(seed, int(i), n_pages) for i in indices]
    urls, ts, htmls, texts, langs = zip(*rows) if rows else ((),) * 5
    return pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(list(ts), pa.timestamp("us")),
            "html": pa.array(htmls, pa.binary()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(langs, pa.string()),
        },
        schema=PAGES_SCHEMA,
    )


def pages_table(n_pages: int, seed: int = 42) -> pa.Table:
    """Whole fixture in one Arrow table (small scales / tests)."""
    return pages_batch(np.arange(n_pages), n_pages, seed)


def pages_dataset(n_pages: int, seed: int = 42, override_num_blocks: int | None = None):
    """Distributed generation: ray.data.range → map_batches(row fn of id)."""
    import ray.data as rd

    n_blocks = override_num_blocks or max(1, min(64, n_pages // 2000))
    base = rd.range(n_pages, override_num_blocks=n_blocks)
    return base.map_batches(
        lambda b: pages_batch(np.asarray(b["id"]), n_pages, seed),
        batch_format="numpy",
        batch_size=4096,
    )


PAGES_FORMAT_VERSION = "v1"  # bump when generator output changes


def write_pages(out_dir: str, n_pages: int, seed: int = 42, use_ray: bool = False) -> str:
    """Materialize the fixture to parquet; returns out_dir (idempotent cache,
    regenerated when the generator version changes)."""
    import shutil

    marker = os.path.join(out_dir, "_SUCCESS")
    if os.path.exists(marker):
        with open(marker) as f:
            if f.read().strip() == PAGES_FORMAT_VERSION:
                return out_dir
        shutil.rmtree(out_dir, ignore_errors=True)  # stale generator version
    os.makedirs(out_dir, exist_ok=True)
    if use_ray:
        pages_dataset(n_pages, seed).write_parquet(out_dir)
    else:
        pq.write_table(pages_table(n_pages, seed), os.path.join(out_dir, "pages.parquet"))
    with open(marker, "w") as f:
        f.write(PAGES_FORMAT_VERSION)
    return out_dir
