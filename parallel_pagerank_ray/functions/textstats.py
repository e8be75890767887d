"""Text analysis for training-data pipelines: token counting, quality
scoring, language ID, fingerprinting.

Implemented as vectorized pandas/pyarrow kernels inside a single
map_batches stage (``TextStats``), with regexes compiled once per actor.
The token regex is explicitly ``[A-Za-z0-9_]+`` (not ``\\w`` — Python
and RE2/DuckDB disagree on unicode word chars) so the DuckDB oracle SQL
can reproduce every number exactly.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd

TOKEN_RE = r"[A-Za-z0-9_]+"
# BPE-ish pre-tokenizer (GPT-2-style word/number/symbol runs with an
# optional leading space; no lookahead -> identical under Python re and
# DuckDB RE2)
BPE_RE = r" ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+"
PUNCT_RE = r"[.,;:!?]"
# tiny fixed stopword list — shared verbatim with the DuckDB oracle
STOPWORDS = ["the", "and", "of", "to", "a", "in", "is", "that", "it", "for"]


class TextStats:
    """documents batch -> per-doc stats (stateless, vectorized).

    Output columns (doc_id, n_chars, n_tokens, n_punct, stop_ratio,
    quality, lang_pred, fingerprint):

    - n_tokens: count of ``[A-Za-z0-9_]+`` matches (whitespace-ish)
    - n_tokens_bpe: count of BPE-ish pre-tokenizer matches (the token
      budget a GPT-style tokenizer would be proportional to)
    - stop_ratio: lowercase-token stopword fraction (0 when no tokens)
    - quality: mean of three [0,1] signals — length (chars/1000 capped),
      stopword ratio capped at 0.5 and rescaled, punctuation presence
    - lang_pred: 'en' if stop_ratio >= 0.08 else 'other' (n-gram-free
      stopword heuristic, reproducible in SQL)
    - fingerprint: md5 hex of the text (content hash — same function as
      DuckDB's md5())
    """

    def __init__(self) -> None:
        import re

        self.token = re.compile(TOKEN_RE)
        self.punct = re.compile(PUNCT_RE)
        self.stop = set(STOPWORDS)

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        text = batch["text"].astype(str)
        n_chars = text.str.len().astype(np.int64)
        n_tokens = text.str.count(TOKEN_RE).astype(np.int64)
        n_tokens_bpe = text.str.count(BPE_RE).astype(np.int64)
        n_punct = text.str.count(PUNCT_RE).astype(np.int64)
        toks = text.str.lower().str.findall(TOKEN_RE)
        n_stop = toks.map(lambda ws: sum(w in self.stop for w in ws)).astype(np.int64)
        stop_ratio = np.where(n_tokens > 0, n_stop / np.maximum(n_tokens, 1), 0.0)
        len_sig = np.minimum(n_chars / 1000.0, 1.0)
        stop_sig = np.minimum(stop_ratio, 0.5) * 2.0
        punct_sig = (n_punct > 0).astype(np.float64)
        quality = (len_sig + stop_sig + punct_sig) / 3.0
        return pd.DataFrame(
            {
                "doc_id": batch["doc_id"].astype(np.int64),
                "n_chars": n_chars,
                "n_tokens": n_tokens,
                "n_tokens_bpe": n_tokens_bpe,
                "n_punct": n_punct,
                "stop_ratio": stop_ratio,
                "quality": quality,
                "lang_pred": np.where(stop_ratio >= 0.08, "en", "other"),
                "fingerprint": [
                    hashlib.md5(t.encode("utf-8")).hexdigest() for t in text
                ],
            }
        )


def token_counts(docs, num_buckets: int | None = None):
    """Corpus-wide exact token frequencies: (token, cnt).

    Heavy-hitter shape: each batch pre-counts its tokens (map-side
    combine — the shuffle moves one row per DISTINCT token per batch,
    never per occurrence), then one bucketed grouped_agg sums per
    token. Top-k consumers sort the small vocabulary table."""
    import ray.data as rd  # noqa: F401  (annotation clarity)

    from parallel_pagerank_ray.stages.agg import grouped_agg

    def explode(b: pd.DataFrame) -> pd.DataFrame:
        toks = b["text"].astype(str).str.lower().str.findall(TOKEN_RE)
        arrs = [t for t in toks.to_numpy() if t]
        if not arrs:
            return pd.DataFrame(
                {"token": pd.Series([], dtype=str),
                 "cnt": pd.Series([], dtype=np.int64)}
            )
        flat = pd.Series(np.concatenate(arrs))
        vc = flat.value_counts()
        return pd.DataFrame(
            {"token": vc.index.to_numpy(), "cnt": vc.to_numpy().astype(np.int64)}
        )

    rows = docs.select_columns(["text"]).map_batches(explode, batch_format="pandas")
    return grouped_agg(rows, ["token"], {"cnt": ("cnt", "sum")}, num_buckets=num_buckets)


def bigram_counts(
    docs: "rd.Dataset", num_buckets: int | None = None
) -> "rd.Dataset":
    """Corpus bigram frequencies: (bigram, cnt) where bigram = two
    ADJACENT tokens of one document joined by a single space (no
    cross-document pairs).

    Same heavy-hitter shape as ``token_counts``: each batch pre-counts
    its bigrams vectorized (one concatenate over the per-doc token
    arrays, boundary positions masked out — no per-pair Python), the
    shuffle moves one row per distinct bigram per batch, one bucketed
    grouped_agg sums."""
    from parallel_pagerank_ray.stages.agg import grouped_agg

    def explode(b: pd.DataFrame) -> pd.DataFrame:
        toks = b["text"].astype(str).str.lower().str.findall(TOKEN_RE)
        arrs = [t for t in toks.to_numpy() if len(t) >= 2]
        empty = pd.DataFrame(
            {"bigram": pd.Series([], dtype=str),
             "cnt": pd.Series([], dtype=np.int64)}
        )
        if not arrs:
            return empty
        flat = np.concatenate(arrs)
        # mask the last token of every doc: it starts no bigram
        lens = np.array([len(a) for a in arrs], dtype=np.int64)
        ends = np.cumsum(lens) - 1
        valid = np.ones(len(flat) - 1, dtype=bool)
        valid[ends[:-1]] = False  # pairs straddling doc boundaries
        left = pd.Series(flat[:-1][valid])
        right = pd.Series(flat[1:][valid])
        if not len(left):
            return empty
        vc = (left + " " + right).value_counts()
        return pd.DataFrame(
            {"bigram": vc.index.to_numpy(), "cnt": vc.to_numpy().astype(np.int64)}
        )

    rows = docs.select_columns(["text"]).map_batches(explode, batch_format="pandas")
    return grouped_agg(rows, ["bigram"], {"cnt": ("cnt", "sum")}, num_buckets=num_buckets)


class RepetitionStats:
    """Gopher-style repetition signals per document (Rae et al. 2021,
    "Scaling Language Models" §A1.1 quality heuristics), as INTEGER
    sufficient statistics so the row is value-exact at any parallelism
    (the fractions are one driver/consumer division away):

    - n_lines, n_dup_lines (occurrences beyond each line's first),
      dup_line_chars (their char mass), total_line_chars
    - n_2grams, top_2gram_count (occurrences of the most frequent
      word 2-gram; ties don't matter — the count is unique)

    Stateless callable batch stage; all counting runs through exploded
    pandas group kernels — no per-doc Python loop. doc_id must be
    unique within the table (it is the documents primary key).
    """

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        doc = batch["doc_id"].astype(np.int64).to_numpy()
        text = batch["text"].astype(str)
        # line stats: explode -> one grouped count per (doc, line), all
        # in pandas C kernels (no per-doc Python loop)
        lines = text.str.split("\n")
        nl = lines.str.len().to_numpy()
        ldoc = np.repeat(doc, nl)
        flat = np.concatenate(lines.to_numpy()) if len(text) else np.array([], object)
        ldf = pd.DataFrame({"d": ldoc, "ln": flat})
        ldf["l"] = ldf["ln"].str.len().astype(np.int64)
        g = (
            ldf.groupby(["d", "ln"], sort=False)
            .agg(c=("l", "size"), l=("l", "first"))
            .reset_index()
        )
        g["dup"] = g["c"] - 1
        g["dupch"] = g["dup"] * g["l"]
        g["totch"] = g["c"] * g["l"]
        ls = g.groupby("d").agg(
            n_lines=("c", "sum"),
            n_dup_lines=("dup", "sum"),
            dup_line_chars=("dupch", "sum"),
            total_line_chars=("totch", "sum"),
        )
        # 2-gram stats: flat token stream + doc-boundary mask
        toks = text.str.lower().str.findall(TOKEN_RE)
        tc = toks.str.len().to_numpy()
        tdoc = np.repeat(doc, tc)
        tflat = np.concatenate(toks.to_numpy()) if len(text) else np.array([], object)
        top = pd.Series(dtype=np.int64)
        if len(tflat) > 1:
            same = tdoc[:-1] == tdoc[1:]
            gdf = pd.DataFrame(
                {
                    "d": tdoc[:-1][same],
                    "g": pd.Series(tflat[:-1][same]).str.cat(
                        pd.Series(tflat[1:][same]), sep=" "
                    ),
                }
            )
            if len(gdf):
                top = gdf.groupby(["d", "g"], sort=False).size().groupby("d").max()
        out = pd.DataFrame({"doc_id": doc}).set_index("doc_id")
        out = out.join(ls).join(top.rename("top_2gram_count"))
        out["n_2grams"] = np.maximum(tc - 1, 0)
        out = out.fillna(0).reset_index()
        cols = [
            "n_lines", "n_dup_lines", "dup_line_chars",
            "total_line_chars", "n_2grams", "top_2gram_count",
        ]
        for c in cols:
            out[c] = out[c].astype(np.int64)
        return out[["doc_id"] + cols]


def inverted_postings(docs, tokens) -> "object":
    """Posting lists for a FIXED token set: (token, doc_id, tf).

    The token set is the broadcast small side (one ray.put, read
    zero-copy per batch); documents stream through a single map — no
    shuffle at all, and tokens outside the set never leave the map
    stage. The standard inverted-index build for a selected vocabulary
    (e.g. the corpus heavy hitters)."""
    import ray

    vocab = np.array(sorted(set(tokens)))
    vocab_ref = ray.put(vocab)

    def explode(b: pd.DataFrame) -> pd.DataFrame:
        keep = ray.get(vocab_ref)
        toks = b["text"].astype(str).str.lower().str.findall(TOKEN_RE)
        ids = b["doc_id"].to_numpy()
        lens = toks.str.len().fillna(0).astype(int).to_numpy()
        empty = pd.DataFrame(
            {
                "token": pd.Series([], dtype=str),
                "doc_id": pd.Series([], dtype=np.int64),
                "tf": pd.Series([], dtype=np.int64),
            }
        )
        if lens.sum() == 0 or len(keep) == 0:
            return empty
        flat = np.concatenate([t for t in toks.to_numpy() if t])
        doc = np.repeat(ids, lens)
        pos = np.searchsorted(keep, flat)
        pos[pos >= len(keep)] = 0
        m = keep[pos] == flat
        if not m.any():
            return empty
        g = (
            pd.DataFrame({"token": flat[m], "doc_id": doc[m]})
            .groupby(["token", "doc_id"], sort=False)
            .size()
            .reset_index(name="tf")
        )
        g["tf"] = g["tf"].astype(np.int64)
        return g

    return docs.select_columns(["doc_id", "text"]).map_batches(
        explode, batch_format="pandas"
    )


def tfidf_search(
    docs,
    query_tokens: list[str],
    k: int = 20,
    scale: int = 1_000_000,
):
    """Top-k documents for a fixed query token set by INTEGER tf-idf:
    score(d) = sum over query tokens t of tf(d, t) * (scale // df(t)),
    df = number of docs containing t. Integer idf (floor division, the
    same move as the integer-HITS gate: a monotone idf surrogate keeps
    the whole scoring pipeline int64-exact and SQL-value-checkable —
    no transcendental log whose last ulp could differ between
    runtimes). Returns (pos, doc_id, score), score DESC / doc_id ASC.

    Scale shape: every intermediate is bounded by docs x |query| rows —
    per-batch tf partials for the query vocabulary only, one bucketed
    (doc_id, token) combine, a driver-side df fetch of <= |query| rows
    broadcast back as weights, one bucketed per-doc sum, sort+limit.
    The corpus text never leaves the first map.
    """
    import pyarrow as pa
    import ray

    from parallel_pagerank_ray.stages.agg import grouped_agg
    from parallel_pagerank_ray.util import drop_empty_blocks

    qset = sorted(set(query_tokens))

    def tf_partial(b: pd.DataFrame) -> pd.DataFrame:
        doc = b["doc_id"].astype(np.int64).to_numpy()
        toks = b["text"].astype(str).str.lower().str.findall(TOKEN_RE)
        nt = toks.str.len().to_numpy()
        tdoc = np.repeat(doc, nt)
        flat = (
            np.concatenate(toks.to_numpy())
            if len(toks)
            else np.array([], dtype=object)
        )
        df = pd.DataFrame({"doc_id": tdoc, "token": flat})
        df = df[df["token"].isin(qset)]
        out = (
            df.groupby(["doc_id", "token"], sort=False)
            .size()
            .reset_index(name="tf")
        )
        out["tf"] = out["tf"].astype(np.int64)
        return out

    tf = grouped_agg(
        drop_empty_blocks(
            docs.select_columns(["doc_id", "text"]).map_batches(
                tf_partial, batch_format="pandas"
            )
        ),
        ["doc_id", "token"],
        {"tf": ("tf", "sum")},
        num_buckets=32,
    ).materialize()
    # df per query token: <= |query| rows — driver-side by design
    dft = grouped_agg(
        tf, ["token"], {"df": ("doc_id", "count")}, num_buckets=8
    ).to_pandas()
    weights = {
        t: scale // int(n) for t, n in zip(dft["token"], dft["df"]) if n > 0
    }
    w_ref = ray.put(weights)

    def score_partial(b: pd.DataFrame) -> pd.DataFrame:
        w = ray.get(w_ref)
        out = pd.DataFrame(
            {
                "doc_id": b["doc_id"].astype(np.int64),
                "score": (
                    b["tf"].astype(np.int64)
                    * b["token"].map(w).astype(np.int64)
                ),
            }
        )
        return out

    scores = grouped_agg(
        tf.map_batches(score_partial, batch_format="pandas"),
        ["doc_id"],
        {"score": ("score", "sum")},
        num_buckets=32,
    )
    top = (
        scores.sort(["score", "doc_id"], descending=[True, False])
        .limit(k)
        .to_pandas()
    )
    return pa.table(
        {
            "pos": np.arange(1, len(top) + 1, dtype=np.int64),
            "doc_id": top["doc_id"].to_numpy().astype(np.int64),
            "score": top["score"].to_numpy().astype(np.int64),
        }
    )


def phrase_counts(docs, phrase: str):
    """Exact phrase search: (doc_id, n_occurrences) for every document
    containing ``phrase`` as a literal substring at least once —
    counts are non-overlapping left-to-right occurrences (Python
    ``str.count`` semantics; for phrases with no proper prefix that is
    also a suffix, identical to the replace-length SQL rule).

    Scale shape: one stateless vectorized map over the corpus — no
    shuffle at all; the match count never leaves the scan task, so a
    100 TB corpus streams through at read bandwidth."""
    import re

    pat = re.compile(re.escape(phrase))

    def count(b: pd.DataFrame) -> pd.DataFrame:
        n = b["text"].astype(str).str.count(pat).astype(np.int64)
        keep = n.to_numpy() > 0
        return pd.DataFrame(
            {
                "doc_id": b["doc_id"].astype(np.int64).to_numpy()[keep],
                "n_occurrences": n.to_numpy()[keep],
            }
        )

    return docs.select_columns(["doc_id", "text"]).map_batches(
        count, batch_format="pandas"
    )


def cooccurrence_counts(docs, vocab: list[str], window: int = 2):
    """Token co-occurrence counts within a sliding window — the
    PMI / word-embedding sufficient statistic: (tok_a, tok_b, cnt)
    for unordered vocabulary pairs at token-index distance
    1..``window`` inside one document (tok_a <= tok_b canonical;
    tok_a == tok_b counts repeated-token windows).

    Scale shape: the vocabulary is a small broadcast list (closure
    capture); each batch pairs its own token stream with shifted
    views (doc boundaries masked), pre-counts pairs map-side, and the
    shuffle moves one row per distinct surviving pair per batch —
    at most |vocab|^2/2 rows regardless of batch token count. Text
    never leaves the first map. Integer counts: value-exact vs the
    DuckDB self-join oracle.
    """
    from parallel_pagerank_ray.stages.agg import grouped_agg
    from parallel_pagerank_ray.util import drop_empty_blocks

    vset = sorted(set(vocab))

    def pair_partial(b: pd.DataFrame) -> pd.DataFrame:
        toks = b["text"].astype(str).str.lower().str.findall(TOKEN_RE)
        nt = toks.str.len().to_numpy()
        empty = pd.DataFrame(
            {
                "tok_a": pd.Series([], dtype=str),
                "tok_b": pd.Series([], dtype=str),
                "cnt": pd.Series([], dtype=np.int64),
            }
        )
        if len(toks) == 0 or nt.sum() == 0:
            return empty
        flat = np.concatenate(
            [t for t in toks.to_numpy() if t]
        )  # unicode array
        did = np.repeat(np.arange(len(nt), dtype=np.int64), nt)
        frames = []
        for d in range(1, window + 1):
            if len(flat) <= d:
                break
            a, bb = flat[:-d], flat[d:]
            ok = (
                (did[:-d] == did[d:])
                & np.isin(a, vset)
                & np.isin(bb, vset)
            )
            if not ok.any():
                continue
            av, bv = a[ok], bb[ok]
            swap = av > bv  # np.minimum has no unicode loop
            lo = np.where(swap, bv, av)
            hi = np.where(swap, av, bv)
            frames.append(pd.DataFrame({"tok_a": lo, "tok_b": hi}))
        if not frames:
            return empty
        out = (
            pd.concat(frames)
            .groupby(["tok_a", "tok_b"], sort=False)
            .size()
            .reset_index(name="cnt")
        )
        out["cnt"] = out["cnt"].astype(np.int64)
        return out

    return grouped_agg(
        drop_empty_blocks(
            docs.select_columns(["text"]).map_batches(
                pair_partial, batch_format="pandas"
            )
        ),
        ["tok_a", "tok_b"],
        {"cnt": ("cnt", "sum")},
        num_buckets=16,
    )


def vocab_growth(docs, bucket: int = 100):
    """Vocabulary growth curve (Heaps'-law statistic): scanning the
    corpus in doc_id order in buckets of ``bucket`` docs, how many
    NEVER-BEFORE-SEEN tokens each bucket introduces and the cumulative
    vocabulary size -> (bucket_start, n_new_tokens, vocab_size).

    Order-free formulation: a token is "introduced" by its global
    min doc_id, so the curve is one grouped MIN over (token ->
    first_doc) + a #buckets-sized histogram + a driver cumsum — no
    sequential scan, bit-exact at any parallelism.
    """
    from parallel_pagerank_ray.stages.agg import grouped_agg
    from parallel_pagerank_ray.util import drop_empty_blocks

    def tok_rows(b: pd.DataFrame) -> pd.DataFrame:
        toks = b["text"].astype(str).str.lower().str.findall(TOKEN_RE)
        nt = toks.str.len().to_numpy()
        out = pd.DataFrame(
            {
                "token": (
                    np.concatenate([t for t in toks.to_numpy() if t])
                    if nt.sum()
                    else np.array([], dtype=object)
                ),
                "doc_id": np.repeat(
                    b["doc_id"].astype(np.int64).to_numpy(), nt
                ),
            }
        )
        # map-side combine: one row per (token) per batch, min doc
        return (
            out.groupby("token", sort=False)["doc_id"]
            .min()
            .reset_index()
        )

    firsts = grouped_agg(
        drop_empty_blocks(
            docs.select_columns(["doc_id", "text"]).map_batches(
                tok_rows, batch_format="pandas"
            )
        ),
        ["token"],
        {"first_doc": ("doc_id", "min")},
    )

    def bucketed(t):
        import pyarrow as pa

        fd = t.column("first_doc").to_numpy(zero_copy_only=False)
        b = (fd // bucket) * bucket
        u, c = np.unique(b, return_counts=True)
        return pa.table(
            {
                "bucket_start": pa.array(u, pa.int64()),
                "n_new_tokens": pa.array(c.astype(np.int64), pa.int64()),
            }
        )

    hist = grouped_agg(
        drop_empty_blocks(
            firsts.map_batches(bucketed, batch_format="pyarrow")
        ),
        ["bucket_start"],
        {"n_new_tokens": ("n_new_tokens", "sum")},
    ).to_pandas().sort_values("bucket_start")
    import pyarrow as pa
    import ray.data as rd

    return rd.from_arrow(
        pa.table(
            {
                "bucket_start": pa.array(
                    hist["bucket_start"].to_numpy(), pa.int64()
                ),
                "n_new_tokens": pa.array(
                    hist["n_new_tokens"].to_numpy(), pa.int64()
                ),
                "vocab_size": pa.array(
                    np.cumsum(hist["n_new_tokens"].to_numpy()), pa.int64()
                ),
            }
        )
    )


def bm25_search(
    docs,
    query_tokens: list[str],
    k: int = 20,
    idf_scale: int = 1_000_000,
    prec_scale: int = 1_000,
):
    """Top-k documents for a fixed query by INTEGER BM25 (k1 = 1.2,
    b = 0.75): per query token t with document frequency df(t), doc d
    with term frequency tf, token length dl, corpus totals DLTOT =
    sum(dl) and N = #docs,

        score(d) = sum_t (idf_scale // df(t)) *
            ((88 * tf * DLTOT * prec_scale)
             // (40 * tf * DLTOT + 12 * (DLTOT + 3 * dl * N)))

    — the exact BM25 term ratio tf*(k1+1) / (tf + k1*((1-b) +
    b*dl/avgdl)) cleared of fractions (x40*DLTOT), floor-quantized at
    ``prec_scale``, with the same monotone integer-idf surrogate as
    ``tfidf_search``. Everything is int64 floor arithmetic, so the
    ranking is bit-reproducible at any parallelism and DuckDB replays
    it verbatim. Returns (pos, doc_id, score), score DESC / doc_id ASC.

    Overflow contract: 88 * tf * DLTOT * prec_scale must fit int64 —
    at a 10^13-token corpus drop prec_scale to 1 (the ratio is already
    parts-per-40*DLTOT exact); validated at runtime.

    Scale shape: one corpus scan emits per-doc token lengths (pure
    map — each doc is one row) and query-vocabulary tf partials; dl
    attaches to the docs x |query| tf table by one bounded hash join;
    df is a <= |query|-row driver fetch broadcast back as weights; one
    bucketed per-doc sum, sort + limit. Corpus text never leaves the
    first map.
    """
    import pyarrow as pa
    import ray

    from parallel_pagerank_ray.stages.agg import global_agg, grouped_agg
    from parallel_pagerank_ray.util import drop_empty_blocks, safe_join

    qset = sorted(set(query_tokens))

    def scan(b: pd.DataFrame) -> pd.DataFrame:
        doc = b["doc_id"].astype(np.int64).to_numpy()
        toks = b["text"].astype(str).str.lower().str.findall(TOKEN_RE)
        nt = toks.str.len().to_numpy()
        tdoc = np.repeat(doc, nt)
        flat = (
            np.concatenate(toks.to_numpy())
            if len(toks)
            else np.array([], dtype=object)
        )
        df = pd.DataFrame({"doc_id": tdoc, "token": flat})
        df = df[df["token"].isin(qset)]
        out = (
            df.groupby(["doc_id", "token"], sort=False)
            .size()
            .reset_index(name="tf")
        )
        out["tf"] = out["tf"].astype(np.int64)
        return out

    def lengths(b: pd.DataFrame) -> pd.DataFrame:
        toks = b["text"].astype(str).str.lower().str.findall(TOKEN_RE)
        return pd.DataFrame(
            {
                "doc_id": b["doc_id"].astype(np.int64).to_numpy(),
                "dl": toks.str.len().to_numpy().astype(np.int64),
            }
        )

    src = docs.select_columns(["doc_id", "text"]).materialize()
    tf = grouped_agg(
        drop_empty_blocks(src.map_batches(scan, batch_format="pandas")),
        ["doc_id", "token"],
        {"tf": ("tf", "sum")},
        num_buckets=32,
    ).materialize()
    dl = src.map_batches(lengths, batch_format="pandas").materialize()
    g = global_agg(dl, {"dltot": ("dl", "sum"), "n": ("dl", "count")})
    dltot, n_docs = int(g["dltot"]), int(g["n"])
    dft = grouped_agg(
        tf, ["token"], {"df": ("doc_id", "count")}, num_buckets=8
    ).to_pandas()
    weights = {
        t: idf_scale // int(c) for t, c in zip(dft["token"], dft["df"]) if c > 0
    }
    w_ref = ray.put(weights)
    max_tf = int(global_agg(tf, {"m": ("tf", "max")})["m"] or 0) if n_docs else 0
    if max_tf and 88 * max_tf * dltot > (2**63 - 1) // max(prec_scale, 1):
        raise ValueError(
            "bm25_search int64 overflow: reduce prec_scale "
            f"(88 * {max_tf} * {dltot} * {prec_scale} > 2^63)"
        )

    tfl = safe_join(
        tf,
        dl,
        join_type="inner",
        num_partitions=8,
        on=("doc_id",),
    )

    def score_partial(b: pd.DataFrame) -> pd.DataFrame:
        w = ray.get(w_ref)
        tfv = b["tf"].astype(np.int64).to_numpy()
        dlv = b["dl"].astype(np.int64).to_numpy()
        num = 88 * tfv * dltot * prec_scale
        den = 40 * tfv * dltot + 12 * (dltot + 3 * dlv * n_docs)
        ratio = num // den
        return pd.DataFrame(
            {
                "doc_id": b["doc_id"].astype(np.int64),
                "score": b["token"].map(w).astype(np.int64).to_numpy()
                * ratio,
            }
        )

    scores = grouped_agg(
        tfl.map_batches(score_partial, batch_format="pandas"),
        ["doc_id"],
        {"score": ("score", "sum")},
        num_buckets=32,
    )
    top = (
        scores.sort(["score", "doc_id"], descending=[True, False])
        .limit(k)
        .to_pandas()
    )
    return pa.table(
        {
            "pos": np.arange(1, len(top) + 1, dtype=np.int64),
            "doc_id": top["doc_id"].to_numpy().astype(np.int64),
            "score": top["score"].to_numpy().astype(np.int64),
        }
    )


def rrf_fusion(
    docs,
    query_tokens: list[str],
    k: int = 20,
    depth: int = 50,
    rrf_k: int = 60,
    rrf_scale: int = 1_000_000,
):
    """Reciprocal-rank fusion of the integer tf-idf and integer BM25
    rankings for one query — the standard zero-tuning way to combine
    retrieval runs (Cormack et al.):

        rrf(d) = sum over runs r ranking d at pos_r of
                 rrf_scale // (rrf_k + pos_r)

    (floor division keeps the fused score int64-exact; documents
    missing from a run contribute nothing). Returns the top-k fused
    (pos, doc_id, rrf), rrf DESC / doc_id ASC.

    Scale shape: both underlying runs are the bounded retrieval
    pipelines (corpus text never leaves their first map); the fusion
    itself touches only 2 x depth rows — driver-side by contract.
    """
    import pyarrow as pa

    runs = [
        tfidf_search(docs, query_tokens, k=depth).to_pandas(),
        bm25_search(docs, query_tokens, k=depth).to_pandas(),
    ]
    fused: dict[int, int] = {}
    for run in runs:
        for pos, doc in zip(run["pos"], run["doc_id"]):
            fused[int(doc)] = fused.get(int(doc), 0) + rrf_scale // (
                rrf_k + int(pos)
            )
    top = sorted(fused.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
    return pa.table(
        {
            "pos": np.arange(1, len(top) + 1, dtype=np.int64),
            "doc_id": np.array([d for d, _ in top], dtype=np.int64),
            "rrf": np.array([s for _, s in top], dtype=np.int64),
        }
    )
