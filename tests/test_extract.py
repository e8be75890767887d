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
