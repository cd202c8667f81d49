"""M8 — HTML → (text, out-links) extraction (SURVEY.md §2.3 M8).

The reference engine has no HTML stage (it consumes pre-partitioned edge
lists, /root/reference/src/graph/graph.go:332-460); the north rule adds a
Common-Crawl-style ingest. The driver invariant (BASELINE.json input_hint)
is that extracted text per url is **byte-identical at any batch size or
parallelism** — so extraction is a pure per-row function with no cross-row
state, applied inside ``map_batches``.

Extraction contract (fixed; the synthetic page generator and the oracle
``text`` column both follow it):

* preclean = HTML comments and whole ``<script>``/``<style>`` elements are
             removed first (real Common-Crawl pages; the synthetic fixture
             contains none, so its bytes are unaffected).
* text     = the normalized contents of the ``<title>`` element followed by
             the normalized contents of every ``<p>`` element, in document
             order, joined with ``"\\n"``; empty segments are dropped.
             "Normalized" = inner tags stripped, the five standard HTML
             entities unescaped (&amp; &lt; &gt; &quot; &#39;), runs of
             whitespace collapsed to one space, ends stripped.
* links    = the value of every ``href`` attribute of ``<a>`` tags in the
             precleaned HTML — quoted or bare — in document order,
             duplicates preserved (canonicalization/dedup happens
             downstream, M9/D3).
"""

from __future__ import annotations

import re

import pyarrow as pa

# Attribute-aware tag interior: quoted values may contain '>' without
# terminating the tag (real-web malformation the round-2 regexes missed)
_ATTRS = r"""(?:[^>"']|"[^"]*"|'[^']*')*"""
_TITLE_RE = re.compile(rf"<title\b{_ATTRS}>(.*?)</title\s*>", re.S | re.I)
# <p> cannot nest in HTML — an opening <p> implicitly closes the previous
# one, and an unclosed trailing <p> runs to end of document. Capture from
# each <p ...> up to the nearest </p or next <p (or EOF).
_P_RE = re.compile(rf"<p\b{_ATTRS}>((?:(?!</?p\b).)*)", re.S | re.I)
# inner-tag strip: only real tags (letter or ! after <), attribute-aware —
# a stray literal '<' in text no longer swallows everything to the next '>'
_TAG_RE = re.compile(rf"</?[A-Za-z!]{_ATTRS}>")
_WS_RE = re.compile(r"\s+")
_A_TAG_RE = re.compile(rf"<a\b({_ATTRS})>", re.S | re.I)
# href must be a standalone attribute name (data-href must not match)
_HREF_IN_RE = re.compile(
    r"""(?<![\w-])href\s*=\s*(?:"([^"]*)"|'([^']*)'|([^\s"'>]+))""", re.S | re.I
)
_COMMENT_RE = re.compile(r"<!--.*?-->", re.S)
_CDATA_RE = re.compile(r"<!\[CDATA\[.*?\]\]>", re.S)
_SCRIPT_STYLE_RE = re.compile(rf"<(script|style)\b{_ATTRS}>.*?</\1\s*>", re.S | re.I)


def preclean(html: str) -> str:
    """Drop comments, CDATA sections and script/style elements (their text
    is not content and their attribute soup would otherwise leak tags into
    segments)."""
    return _SCRIPT_STYLE_RE.sub(" ", _CDATA_RE.sub(" ", _COMMENT_RE.sub(" ", html)))

_ENTITIES = (
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&amp;", "&"),  # last, so "&amp;lt;" → "&lt;" (single-pass, per spec)
)


def _unescape(s: str, entities: str) -> str:
    """``entities="basic"``: the five standard entities — the extraction
    contract the driver's byte-hash oracle pins (default; do not change).
    ``entities="full"``: the whole HTML5 set — named (&eacute; &nbsp; …),
    decimal (&#233;) and hex (&#x1F4A9;) character references via stdlib
    ``html.unescape`` — what real Common-Crawl pages need. Opt-in so the
    byte contract stays intact."""
    if entities == "full":
        import html as _html

        return _html.unescape(s)
    for ent, ch in _ENTITIES:
        s = s.replace(ent, ch)
    return s


def normalize_segment(raw: str, entities: str = "basic") -> str:
    """Strip inner tags, unescape entities, collapse whitespace."""
    s = _TAG_RE.sub(" ", raw)
    s = _unescape(s, entities)
    return _WS_RE.sub(" ", s).strip()


def extract_text(html: str, entities: str = "basic") -> str:
    """Pure per-row text extraction following the module contract."""
    html = preclean(html)
    segments = []
    m = _TITLE_RE.search(html)
    if m:
        segments.append(normalize_segment(m.group(1), entities))
    for pm in _P_RE.finditer(html):
        segments.append(normalize_segment(pm.group(1), entities))
    return "\n".join(s for s in segments if s)


def extract_links(html: str, decode_href: bool = False) -> list[str]:
    """All raw href values of anchors, document order, dups preserved.
    Two-stage: isolate each <a ...> tag (attribute-aware, so '>' inside a
    quoted class value can't truncate the scan), then find its href.

    ``decode_href``: entity-decode attribute values (HTML spec behavior —
    real-web hrefs carry ``&amp;`` in query strings). Opt-in: the byte
    contract's links (and the edge hashes derived from them) use the raw
    attribute bytes."""
    out: list[str] = []
    for m in _A_TAG_RE.finditer(preclean(html)):
        h = _HREF_IN_RE.search(m.group(1))
        if h:
            v = h.group(1) or h.group(2) or h.group(3) or ""
            out.append(_unescape(v, "full") if decode_href else v)
    return out


# <a> cannot nest (an opening <a> implicitly closes the previous one, like
# <p> above): capture from each <a ...> up to the nearest </a or next <a
_A_FULL_RE = re.compile(rf"<a\b({_ATTRS})>((?:(?!</?a\b).)*)", re.S | re.I)


def extract_anchors(
    html: str, entities: str = "basic", decode_href: bool = False
) -> list[tuple[str, str]]:
    """(href, anchor_text) pairs, document order, duplicates preserved —
    the per-target anchor-term signal of web search (Brin & Page 1998 §2.2;
    Craswell et al., "Effective site finding using link anchor
    information", SIGIR 2001). Anchor text is normalized exactly like any
    text segment (inner tags stripped, entities unescaped, whitespace
    collapsed); anchors without an href are skipped. Same purity contract
    as extract_links: per-row, no cross-row state."""
    out: list[tuple[str, str]] = []
    for m in _A_FULL_RE.finditer(preclean(html)):
        h = _HREF_IN_RE.search(m.group(1))
        if not h:
            continue
        v = h.group(1) or h.group(2) or h.group(3) or ""
        href = _unescape(v, "full") if decode_href else v
        out.append((href, normalize_segment(m.group(2), entities)))
    return out


def anchor_batch(
    batch: pa.Table,
    entities: str = "basic",
    decode_href: bool = False,
    charset: str = "utf8",
) -> pa.Table:
    """map_batches body: pages(url, html, ...) → anchor rows
    (url, href, anchor) — one row per anchor, flat-map style."""
    htmls = batch["html"].to_pylist()
    urls = batch["url"].to_pylist()
    r_url: list[str] = []
    r_href: list[str] = []
    r_anchor: list[str] = []
    for u, raw in zip(urls, htmls):
        if isinstance(raw, (bytes, bytearray)):
            html = sniff_decode(bytes(raw)) if charset == "sniff" else raw.decode(
                "utf-8", errors="replace"
            )
        else:
            html = raw
        for href, anchor in extract_anchors(html, entities, decode_href):
            r_url.append(u)
            r_href.append(href)
            r_anchor.append(anchor)
    return pa.table(
        {
            "url": pa.array(r_url, pa.string()),
            "href": pa.array(r_href, pa.string()),
            "anchor": pa.array(r_anchor, pa.string()),
        }
    )


_BOMS = (
    (b"\xef\xbb\xbf", "utf-8-sig"),
    (b"\xff\xfe\x00\x00", "utf-32-le"),
    (b"\x00\x00\xfe\xff", "utf-32-be"),
    (b"\xff\xfe", "utf-16-le"),
    (b"\xfe\xff", "utf-16-be"),
)
# <meta charset="..."> / <meta http-equiv="Content-Type" content="...; charset=...">
# scanned over the first 1024 ASCII-decoded bytes, per the WHATWG prescan
_META_CHARSET_RE = re.compile(
    rb"""<meta[^>]+charset\s*=\s*["']?\s*([A-Za-z0-9_\-]+)""", re.I
)


def sniff_decode(payload: bytes) -> str:
    """Best-effort charset detection + decode for real crawl payloads:
    BOM first (authoritative per WHATWG), then a <meta charset> prescan of
    the first 1 KiB, else UTF-8; every path decodes with errors="replace"
    so malformed bytes cannot fail the pipeline. Opt-in
    (``charset="sniff"`` on extract_batch) — the byte contract decodes
    plain UTF-8."""
    for bom, enc in _BOMS:
        if payload[: len(bom)] == bom:
            if enc == "utf-8-sig":  # strips its own BOM
                return payload.decode(enc, errors="replace")
            # explicit-endian codecs keep a leading U+FEFF — strip the BOM
            return payload[len(bom):].decode(enc, errors="replace")
    m = _META_CHARSET_RE.search(payload[:1024])
    if m:
        enc = m.group(1).decode("ascii", errors="replace").lower()
        # WHATWG encoding-sniffing: a meta-declared utf-16 label must be
        # treated as UTF-8 (the ASCII prescan that found it proves the bytes
        # are not actually UTF-16), and x-user-defined maps to windows-1252.
        if enc in ("utf-16", "utf-16le", "utf-16be", "utf16"):
            enc = "utf-8"
        elif enc in ("x-user-defined", "x_user_defined"):
            enc = "cp1252"
        try:
            return payload.decode(enc, errors="replace")
        except LookupError:  # unknown label → spec fallback
            pass
    return payload.decode("utf-8", errors="replace")


def extract_batch(
    batch: pa.Table,
    entities: str = "basic",
    decode_href: bool = False,
    charset: str = "utf8",
) -> pa.Table:
    """map_batches body: pages(url, html, ...) → (url, text, links).

    ``links`` is a list<string> column of raw hrefs; downstream M9 resolves
    and hashes them. Row-independent ⇒ byte-identical output at any batch
    size / parallelism (driver invariant). ``entities``/``decode_href``
    extend decoding for real-web corpora (see _unescape / extract_links);
    the defaults ARE the byte contract.
    """
    htmls = batch["html"].to_pylist()
    texts: list[str] = []
    links: list[list[str]] = []
    for raw in htmls:
        if isinstance(raw, (bytes, bytearray)):
            html = sniff_decode(bytes(raw)) if charset == "sniff" else raw.decode(
                "utf-8", errors="replace"
            )
        else:
            html = raw
        texts.append(extract_text(html, entities))
        links.append(extract_links(html, decode_href))
    return pa.table(
        {
            "url": batch["url"],
            "text": pa.array(texts, type=pa.string()),
            "links": pa.array(links, type=pa.list_(pa.string())),
        }
    )
