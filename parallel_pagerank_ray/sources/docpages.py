"""Deterministic Common-Crawl-style pages synthesized from the
``documents`` test table (BASELINE.json input_hint shape:
url, warc_ts, html, text, lang).

Each document row becomes one page whose HTML embeds the doc text and
exactly ``links_per_page`` anchors to other pages chosen by the fixed
rule ``dst = (doc_id*7 + j + 1) mod n`` — a closed-form the DuckDB
oracle reproduces in SQL, so link extraction and text extraction are
value-checked end-to-end (not just row-counted). No randomness, no
wall-clock: warc_ts derives from doc_id.

This is the engine's ingest surface at scale: ``pages_from_documents``
is a stateless map_batches stage over the column-pruned documents read;
the html column exists only between this stage and the extractor
(SURVEY.md §7 hard part 6: never carry html further).
"""

from __future__ import annotations

import datetime as _dt

import pyarrow as pa
import ray.data as rd

BASE = "https://docs.example/p"
EPOCH = _dt.datetime(2025, 12, 5, 0, 0, 0)


def doc_url(doc_id: int, hosts: int = 0) -> str:
    """``hosts > 0`` shards the corpus over that many synthetic hosts
    (``host = doc_id mod hosts`` — closed-form, oracle-reproducible);
    0 keeps the single-host corpus."""
    if hosts:
        return f"https://h{doc_id % hosts}.docs.example/p{doc_id}"
    return f"{BASE}{doc_id}"


def doc_html(
    doc_id: int,
    text: str,
    n_docs: int,
    links_per_page: int,
    hosts: int = 0,
    stride: int = 7,
) -> str:
    anchors = "".join(
        f'<a href="{doc_url((doc_id * stride + j + 1) % n_docs, hosts)}">link {j}</a>\n'
        for j in range(links_per_page)
    )
    return (
        f"<html><head><title>doc {doc_id}</title></head><body>\n"
        f"<p>{text}</p>\n{anchors}</body></html>"
    )


def expected_text(doc_id: int, text: str, links_per_page: int) -> str:
    """What the normative extractor emits for ``doc_html`` (title, p, a
    text in document order, newline-joined)."""
    return "\n".join(
        [f"doc {doc_id}", text] + [f"link {j}" for j in range(links_per_page)]
    )


class _MakePages:
    def __init__(
        self,
        n_docs: int,
        links_per_page: int,
        hosts: int = 0,
        stride: int = 7,
    ) -> None:
        self.n_docs = n_docs
        self.links = links_per_page
        self.hosts = hosts
        self.stride = stride

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        texts = batch.column("text").to_pylist()
        langs = batch.column("lang").to_pylist()
        return pa.table(
            {
                "url": pa.array(
                    [doc_url(i, self.hosts) for i in ids], type=pa.string()
                ),
                "warc_ts": pa.array(
                    [EPOCH + _dt.timedelta(seconds=int(i)) for i in ids],
                    type=pa.timestamp("us"),
                ),
                "html": pa.array(
                    [
                        doc_html(
                            i, t, self.n_docs, self.links, self.hosts,
                            self.stride,
                        ).encode("utf-8")
                        for i, t in zip(ids, texts)
                    ],
                    type=pa.binary(),
                ),
                "text": pa.array(texts, type=pa.string()),
                "lang": pa.array(langs, type=pa.string()),
            }
        )


def pages_from_documents(
    sf_dir: str, links_per_page: int = 3, hosts: int = 0, stride: int = 7
) -> tuple[rd.Dataset, int]:
    """documents.parquet -> pages Dataset; returns (pages, n_docs)."""
    import pyarrow.parquet as pq

    n_docs = pq.ParquetFile(f"{sf_dir}/documents.parquet").metadata.num_rows
    docs = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "lang"]
    )
    pages = docs.map_batches(
        _MakePages(n_docs, links_per_page, hosts, stride),
        batch_format="pyarrow",
    )
    return pages, n_docs
