"""Extraction + canonicalization unit tests (no Ray needed).

Covers the driver invariant: extracted text per url is byte-identical to the
oracle ``text`` column at any batch size / ordering (BASELINE.json input_hint).
"""

import numpy as np
import pyarrow as pa

from drone_ray.sources.pages import pages_batch, pages_table
from drone_ray.stages.canonicalize import canonicalize, links_to_edges_batch
from drone_ray.stages.extract import extract_batch, extract_links, extract_text


def test_text_byte_identical_any_batching():
    n = 300
    t = pages_table(n, seed=42)
    expected = t["text"].to_pylist()
    for bs in (1, 7, 64, n):
        got = []
        for off in range(0, n, bs):
            got.extend(extract_batch(t.slice(off, bs))["text"].to_pylist())
        assert got == expected, f"batch_size={bs}"


def test_generator_row_independent():
    n = 300
    full = pages_table(n, seed=42)
    sub = pages_batch(np.array([5, 17, 33, 101, 250]), n, seed=42)
    for i, idx in enumerate([5, 17, 33, 101, 250]):
        assert sub["html"][i].as_py() == full["html"][idx].as_py()
        assert sub["url"][i].as_py() == full["url"][idx].as_py()


def test_entities_and_tags():
    html = (
        "<html><head><title>A&amp;B &lt;x&gt;</title></head><body>"
        "<p>hello <a href=\"https://a.example/1\">link&amp;text</a> world</p>"
        "<p>  spaced\t\tout  </p><p></p></body></html>"
    )
    assert extract_text(html) == "A&B <x>\nhello link&text world\nspaced out"
    assert extract_links(html) == ["https://a.example/1"]


def test_empty_and_malformed():
    assert extract_text("<html><body></body></html>") == ""
    # unclosed inner tag is stripped, content kept
    assert extract_text("<p><b>bold text</p>") == "bold text"


def test_canonicalize():
    base = "https://site1.example/p/10"
    assert canonicalize(base, "/p/3") == "https://site1.example/p/3"
    assert canonicalize(base, "q/4") == "https://site1.example/p/q/4"
    assert canonicalize(base, "https://b.example/x#frag") == "https://b.example/x"
    assert canonicalize(base, "mailto:x@y.z") is None
    assert canonicalize(base, "javascript:void(0)") is None
    assert canonicalize(base, "   ") is None
    assert canonicalize(base, "#frag") == base


def test_links_to_edges_batch_dedup_preserved():
    batch = pa.table(
        {
            "url": ["https://a.example/p"],
            "links": [["/x", "/x", "mailto:q@r.s", "https://b.example/y#f"]],
        }
    )
    out = links_to_edges_batch(batch)
    # duplicates preserved (dedup is a later stage); mailto dropped
    assert out.num_rows == 3
    assert out["dst_url"].to_pylist() == [
        "https://a.example/x",
        "https://a.example/x",
        "https://b.example/y",
    ]
    assert out["src"][0].as_py() == out["src"][1].as_py()


def test_extract_real_world_html_robustness():
    # comments, script/style payloads and bare hrefs must not leak into
    # text or be missed in links (not exercised by the synthetic fixture)
    from drone_ray.stages.extract import extract_links, extract_text

    html = (
        "<html><head><title>T</title>"
        "<style>p { color: red } </style>"
        "<script>var x = '<p>not text</p>';</script></head>"
        "<body><!-- <p>commented out</p> -->"
        "<p>real <b>content</p>"
        '<script src="x.js"></script>'
        "<p>second &amp; last</p>"
        '<a href=https://bare.example/p/1>bare</a>'
        '<a href="https://quoted.example/p/2">q</a>'
        "</body></html>"
    )
    assert extract_text(html) == "T\nreal content\nsecond & last"
    assert extract_links(html) == [
        "https://bare.example/p/1",
        "https://quoted.example/p/2",
    ]


def test_extract_adversarial_malformations():
    """Round-3 hardening: nested <p>, '>' inside attribute values, unclosed
    trailing <p>, CDATA, data-href decoys — same byte contract."""
    from drone_ray.stages.extract import extract_links, extract_text

    # '>' inside a quoted attribute must not truncate the tag
    html = '<html><title>T</title><p class="a>b">keep this</p></html>'
    assert extract_text(html) == "T\nkeep this"

    # nested <p>: an opening <p> implicitly closes the previous one
    html = "<p>first<p>second</p>"
    assert extract_text(html) == "first\nsecond"

    # unclosed trailing <p> runs to end of document
    html = "<html><body><p>tail text"
    assert extract_text(html) == "tail text"

    # CDATA is not content
    html = "<p>a <![CDATA[ <p>hidden</p> ]]> b</p>"
    assert extract_text(html) == "a b"

    # '>' inside an <a> attribute; href still found. data-href is not href
    html = (
        '<a class="x>y" href="https://h.example/1">l</a>'
        '<a data-href="https://decoy.example/">d</a>'
        "<p>body</p>"
    )
    assert extract_links(html) == ["https://h.example/1"]
    assert extract_text(html) == "body"

    # stray '<' in text no longer swallows to the next '>'
    html = "<p>3 < 5 and x > 1</p>"
    assert extract_text(html) == "3 < 5 and x > 1"


def test_fixture_bytes_unchanged_by_hardening():
    # the synthetic oracle text must be reproduced byte-identically by the
    # hardened extractor (guards the driver extract_pages hash gate)
    t = pages_table(500, seed=43)
    got = extract_batch(t)["text"].to_pylist()
    assert got == t["text"].to_pylist()


def test_full_entity_decoding_opt_in():
    """entities="full" decodes named/decimal/hex references; the default
    ("basic") leaves them — the byte contract's five entities only."""
    html = (
        "<title>Caf&eacute; &#233;t&#xE9;</title>"
        "<p>A &amp;amp; B &#38; C &nbsp;D &#x1F40D;</p>"
        "<p>keep &lt;tag&gt; &quot;q&quot; &#39;s&#39;</p>"
    )
    # default: only the five standard entities decode; &eacute;/&#233;/... stay raw
    assert extract_text(html) == (
        "Caf&eacute; &#233;t&#xE9;\nA &amp; B &#38; C &nbsp;D &#x1F40D;"
        "\nkeep <tag> \"q\" 's'"
    )
    # full: HTML5 semantics (single-pass: &amp;amp; -> &amp;)
    assert extract_text(html, entities="full") == (
        "Café été\nA &amp; B & C D \U0001F40D"
        "\nkeep <tag> \"q\" 's'"
    )


def test_href_entity_decoding_opt_in():
    html = (
        '<a href="https://x.example/?a=1&amp;b=2">x</a>'
        "<a href='https://y.example/p&#47;q'>y</a>"
        "<a href=https://z.example/r&amp;s>z</a>"
    )
    # default: raw attribute bytes (edge hashes derive from these)
    assert extract_links(html) == [
        "https://x.example/?a=1&amp;b=2",
        "https://y.example/p&#47;q",
        "https://z.example/r&amp;s",
    ]
    assert extract_links(html, decode_href=True) == [
        "https://x.example/?a=1&b=2",
        "https://y.example/p/q",
        "https://z.example/r&s",
    ]


def test_full_entities_whitespace_collapse_after_decode():
    # &nbsp; decodes to U+00A0 which \s+ matches in python re — decoded
    # whitespace entities participate in the collapse, ends stripped
    html = "<p>&nbsp; a &nbsp;&nbsp; b &nbsp;</p>"
    assert extract_text(html, entities="full") == "a b"


def test_charset_sniffing_opt_in():
    from drone_ray.stages.extract import extract_batch, sniff_decode

    body = "<title>Café</title><p>hello résumé world more tokens</p>"
    # BOMs are authoritative
    assert sniff_decode(b"\xef\xbb\xbf" + body.encode("utf-8")) == body
    assert sniff_decode(b"\xff\xfe" + body.encode("utf-16-le")) == body
    assert sniff_decode(b"\xfe\xff" + body.encode("utf-16-be")) == body
    # <meta charset> prescan picks latin-1
    latin = '<meta charset="iso-8859-1"><title>Café</title>'
    assert "Café" in sniff_decode(latin.encode("latin-1"))
    # unknown label falls back to utf-8
    weird = '<meta charset="no-such-enc"><p>plain ascii</p>'
    assert "plain ascii" in sniff_decode(weird.encode("ascii"))
    # no marker: utf-8 with replacement, never raises
    assert sniff_decode(b"\xff\xfa broken") != ""

    # batch plumbing: charset="sniff" decodes a UTF-16 page; the default
    # (byte contract) mangles it
    t = pa.table(
        {
            "url": pa.array(["https://x.example/a"]),
            "html": pa.array([b"\xff\xfe" + body.encode("utf-16-le")], pa.binary()),
        }
    )
    sniffed = extract_batch(t, charset="sniff")["text"].to_pylist()[0]
    assert sniffed == "Café\nhello résumé world more tokens"
    default = extract_batch(t)["text"].to_pylist()[0]
    assert default != sniffed


def test_sniff_decode_whatwg_utf16_meta_label():
    """WHATWG encoding sniffing: a <meta charset=utf-16*> label found by the
    ASCII prescan must decode as UTF-8 (the prescan itself proved the bytes
    are ASCII-compatible); x-user-defined maps to windows-1252."""
    from drone_ray.stages.extract import sniff_decode

    body = '<meta charset="utf-16"><p>Café prescan</p>'.encode("utf-8")
    assert "Café prescan" in sniff_decode(body)
    body_be = b'<meta charset="UTF-16BE"><p>plain ascii</p>'
    assert "plain ascii" in sniff_decode(body_be)
    # x-user-defined → cp1252: 0x93/0x94 are curly quotes there
    xud = b'<meta charset="x-user-defined"><p>\x93quoted\x94</p>'
    assert "“quoted”" in sniff_decode(xud)


def test_extract_anchors_pairs_and_normalization():
    from drone_ray.stages.extract import extract_anchors

    html = (
        '<html><body><p>x <a href="/p/1">one  word</a> y '
        '<a class="z" href=\'https://a.example/p/2#s\'><b>bold</b> &amp; text</a>'
        "<a name='no-href'>skipped</a>"
        '<a href="/p/1">one word</a></p></body></html>'
    )
    got = extract_anchors(html)
    assert got == [
        ("/p/1", "one word"),
        ("https://a.example/p/2#s", "bold & text"),
        ("/p/1", "one word"),
    ]


def test_anchor_batch_flat_rows_batch_invariant():
    import pyarrow as pa

    from drone_ray.sources.pages import pages_batch
    from drone_ray.stages.extract import anchor_batch
    import numpy as np

    pages = pages_batch(np.arange(40), 40, seed=7)
    whole = anchor_batch(pages).to_pandas()
    parts = [anchor_batch(pages.slice(i, 10)).to_pandas() for i in range(0, 40, 10)]
    import pandas as pd

    joined = pd.concat(parts, ignore_index=True)
    assert whole.equals(joined)
    assert list(whole.columns) == ["url", "href", "anchor"]
    assert len(whole) > 0
