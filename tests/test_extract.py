"""Extraction invariants (SURVEY.md §5e): distributed extract_text per url
is byte-identical to the stored ``text`` column at any parallelism."""

import pyarrow.parquet as pq
import ray.data as rd

from parallel_pagerank_ray.functions.extract import (
    ExtractPages,
    extract_links,
    extract_text,
    normalize_url,
)


def test_extract_text_byte_identity_distributed(pages_dir):
    for f in pages_dir.iterdir():
        pages = rd.read_parquet(str(f)).repartition(3)
        out = pages.map_batches(ExtractPages(), batch_format="pyarrow").to_pandas()
        expected = pq.read_table(f, columns=["url", "text"]).to_pandas()
        merged = out.merge(expected, on="url", suffixes=("_got", "_want"))
        assert len(merged) == len(expected)
        assert (merged["text_got"] == merged["text_want"]).all()


def test_extract_links_document_order():
    html = (
        '<html><body><a href="/a">x</a><p>t</p>'
        '<a href="https://other.example/b#frag">y</a></body></html>'
    )
    links = extract_links("https://site.example/p/q", html)
    assert links == ["https://site.example/a", "https://other.example/b"]


def test_normalize_url():
    assert normalize_url("https://s.example/d/p", "../x") == "https://s.example/x"
    assert normalize_url("https://s.example/", "p#frag") == "https://s.example/p"


def test_extract_text_nested_and_entities():
    html = "<html><p>a &amp; b</p><div>skip</div><title>t<b>x</b>y</title></html>"
    # only title/p/a text, document order, entity-decoded
    assert extract_text(html) == "a & b\ntxy"


def test_extract_anchors_pairs_href_with_text():
    from parallel_pagerank_ray.functions.extract import extract_anchors

    html = (
        '<html><body><a href="/a">first <b>bold</b></a><p>t</p>'
        '<a href="https://other.example/b#frag">second</a>'
        "<a>no href</a></body></html>"
    )
    got = extract_anchors("https://site.example/p/q", html)
    assert got == [
        ("https://site.example/a", "first bold"),
        ("https://other.example/b", "second"),
    ]
    # consistency with extract_links (same targets, same order)
    from parallel_pagerank_ray.functions.extract import extract_links

    assert [d for d, _ in got] == extract_links("https://site.example/p/q", html)


def test_extract_anchors_distributed_matches_single(pages_dir):
    from parallel_pagerank_ray.functions.extract import ExtractAnchors, extract_anchors

    f = sorted(pages_dir.iterdir())[0]
    pages = rd.read_parquet(str(f)).repartition(3)
    out = (
        pages.map_batches(ExtractAnchors(), batch_format="pyarrow")
        .to_pandas()
        .sort_values(["src_url", "dst_url", "anchor"])
        .reset_index(drop=True)
    )
    raw = pq.read_table(f, columns=["url", "html"]).to_pandas()
    rows = []
    for u, h in zip(raw["url"], raw["html"]):
        h = h.decode("utf-8") if isinstance(h, (bytes, bytearray)) else h
        for d, a in extract_anchors(u, h):
            rows.append((u, d, a))
    import pandas as pd

    want = (
        pd.DataFrame(rows, columns=["src_url", "dst_url", "anchor"])
        .sort_values(["src_url", "dst_url", "anchor"])
        .reset_index(drop=True)
    )
    assert out.equals(want)
