"""HTML -> text / links extraction (SURVEY.md M10/M11).

The reference has no HTML extractor (it consumes pre-extracted integer
edge lists, /root/reference/pagerank_mpi/csr_graph.c:4-61); the graft's
north rule adds one and demands that the distributed run be
byte-identical per url to a single-process run. ``extract_text`` /
``extract_links`` are pure functions of (url, html) so that invariant is
trivially deterministic; the batch wrappers are the map_batches stages.

Extraction spec (normative, FIXTURES.md §1): concatenate the text
content of ``<title>``, ``<p>`` and ``<a>`` elements in document order,
separated by "\\n", no trailing newline. Links: every ``href`` value in
document order, absolutized against the page url, fragment stripped.
"""

from __future__ import annotations

from html.parser import HTMLParser
from urllib.parse import urldefrag, urljoin

import pyarrow as pa

_TEXT_TAGS = {"title", "p", "a"}


class _Extractor(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.segments: list[str] = []
        self.hrefs: list[str] = []
        self.anchors: list[tuple[str, int]] = []  # (href, segment index)
        self._stack: list[int] = []  # indexes into segments for open text tags

    def handle_starttag(self, tag: str, attrs: list[tuple[str, str | None]]) -> None:
        if tag == "a":
            for k, v in attrs:
                if k == "href" and v is not None:
                    self.hrefs.append(v)
                    # the a-element's text segment is appended right below
                    self.anchors.append((v, len(self.segments)))
        if tag in _TEXT_TAGS:
            self._stack.append(len(self.segments))
            self.segments.append("")

    def handle_endtag(self, tag: str) -> None:
        if tag in _TEXT_TAGS and self._stack:
            self._stack.pop()

    def handle_data(self, data: str) -> None:
        if self._stack:
            self.segments[self._stack[-1]] += data


def _parse(html: str) -> _Extractor:
    p = _Extractor()
    p.feed(html)
    p.close()
    return p


def extract_text(html: str) -> str:
    """Text content of title/p/a elements, '\\n'-joined, no trailing newline."""
    return "\n".join(_parse(html).segments)


def normalize_url(base_url: str, href: str) -> str:
    """Absolutize ``href`` against ``base_url``; strip the fragment."""
    return urldefrag(urljoin(base_url, href))[0]


def extract_links(url: str, html: str) -> list[str]:
    """Every href value in document order, absolutized + normalized."""
    return [normalize_url(url, h) for h in _parse(html).hrefs]


def extract_anchors(url: str, html: str) -> list[tuple[str, str]]:
    """(dst_url, anchor_text) per href in document order — the anchor
    text is the a-element's own text content (nested text included).
    Same normalization as ``extract_links``; same pure-function
    determinism, so the distributed run is byte-identical per url."""
    p = _parse(html)
    return [(normalize_url(url, h), p.segments[i]) for h, i in p.anchors]


def _as_str(v: bytes | str) -> str:
    return v.decode("utf-8") if isinstance(v, (bytes, bytearray)) else v


class ExtractPages:
    """Actor-pool map_batches stage: pages -> (url, text, n_links).

    Input batch: Arrow table with ``url: string`` and ``html: binary``.
    Output: ``url, text`` (plus passthrough columns listed at init).
    Per-row Python is unavoidable for HTML parsing (this is the payload
    op, like model inference); everything around it stays Arrow.
    """

    def __init__(self, passthrough: tuple[str, ...] = ()) -> None:
        self.passthrough = passthrough

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls = batch.column("url").to_pylist()
        htmls = batch.column("html").to_pylist()
        texts = [extract_text(_as_str(h)) for h in htmls]
        cols: dict[str, pa.Array | pa.ChunkedArray] = {
            "url": batch.column("url"),
            "text": pa.array(texts, type=pa.string()),
        }
        for name in self.passthrough:
            cols[name] = batch.column(name)
        del urls
        return pa.table(cols)


class ExtractLinks:
    """Actor-pool flat-map stage: pages -> (src_url, dst_url) link rows.

    One input page row emits k output rows (k = number of hrefs); pages
    with no links emit nothing (they become dangling vertices when the
    vertex set is built from the union of src and dst urls — mirrors the
    reference keeping unknown ids, csr_graph.c:20-27).
    """

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls = batch.column("url").to_pylist()
        htmls = batch.column("html").to_pylist()
        src: list[str] = []
        dst: list[str] = []
        for u, h in zip(urls, htmls):
            for link in extract_links(u, _as_str(h)):
                src.append(u)
                dst.append(link)
        return pa.table(
            {
                "src_url": pa.array(src, type=pa.string()),
                "dst_url": pa.array(dst, type=pa.string()),
            }
        )


class ExtractAnchors:
    """Flat-map stage: pages -> (src_url, dst_url, anchor) rows — the
    anchor-text table, the standard web-corpus side product of link
    extraction (anchor text is a first-class relevance signal). Same
    1->k row explosion as ExtractLinks with the a-element text carried
    along; html never crosses this stage."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls = batch.column("url").to_pylist()
        htmls = batch.column("html").to_pylist()
        src: list[str] = []
        dst: list[str] = []
        txt: list[str] = []
        for u, h in zip(urls, htmls):
            for link, anchor in extract_anchors(u, _as_str(h)):
                src.append(u)
                dst.append(link)
                txt.append(anchor)
        return pa.table(
            {
                "src_url": pa.array(src, type=pa.string()),
                "dst_url": pa.array(dst, type=pa.string()),
                "anchor": pa.array(txt, type=pa.string()),
            }
        )
