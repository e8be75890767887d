"""BPE tokenizer training over a document corpus (merge-rule learning).

Beyond-reference LLM-data-pipeline capability: learn the first R
byte-pair-encoding merges from corpus word frequencies — the
production shape (HuggingFace tokenizers, SentencePiece BPE): the
corpus is reduced ONCE to the distinct-word frequency table (its
sufficient statistic — one shuffle, the only corpus pass), and every
merge round runs over that table, which is orders of magnitude smaller
than the corpus (bounded by the vocabulary, not the token count).

Semantics (matching the unrolled DuckDB oracle exactly):

    words    lowercase [a-z]+ runs; weight = total corpus occurrences
    symbols  start as single characters (space-joined internal form)
    round    count ALL adjacent symbol pairs per word (overlapping runs
             count once per position), weighted by word frequency;
             best pair = max count, ties -> (left ASC, right ASC);
             merge = greedy leftmost NON-overlapping within each word
             ("a a a a" + (a,a) -> "aa aa"), i.e. the classic BPE
             left-to-right scan — a strict left fold, reproduced in SQL
             via list_reduce (a verified strict fold in DuckDB)

Integer counts and string symbols make every round value-exact and
parallelism-independent.

Scale shape at 100 TB: the corpus pass is one vectorized map_batches +
bucketed combine (stages/agg.py grouped_agg); each merge round is two
passes over the distinct-word table; the only driver pulls are the
aggregated PAIR table (bounded by the distinct-symbol-pair count,
<= (|alphabet| + R)^2 — a few thousand rows regardless of corpus
size) and the final merge list (R rows). Per-word Python loops below
run over the vocabulary table, never the corpus — the standard BPE
trainer cost model.
"""

from __future__ import annotations

import re
from collections import Counter

import numpy as np
import pyarrow as pa
import ray.data as rd

from parallel_pagerank_ray.stages.agg import grouped_agg

_WORD_RE = re.compile(r"[a-z]+")


def word_counts(docs: rd.Dataset, text_col: str = "text") -> rd.Dataset:
    """(word, cnt) distinct-word frequency table — the corpus'
    sufficient statistic for BPE training. One vectorized extraction
    pass + one bucketed combine; text never moves again."""

    def extract(t: pa.Table) -> dict:
        import pyarrow.compute as pc

        low = pc.utf8_lower(t.column(text_col))
        # pyarrow has no findall-to-list kernel for arbitrary regex
        # capture; per-batch Python over the BATCH (not the corpus) with
        # a compiled pattern, emitting a flat partial Counter — the
        # partial keeps the shuffle at O(distinct words per batch)
        c: Counter = Counter()
        for s in low.to_pylist():
            if s:
                c.update(_WORD_RE.findall(s))
        return {
            "word": np.array(list(c.keys()), dtype=object),
            "cnt": np.array(list(c.values()), dtype=np.int64),
        }

    partial = docs.map_batches(extract, batch_format="pyarrow")
    return grouped_agg(partial, ["word"], {"cnt": ("cnt", "sum")})


def _merge_word(toks: list[str], left: str, right: str) -> list[str]:
    """Greedy leftmost non-overlapping pair merge (one BPE round on
    one word): the strict left fold the DuckDB list_reduce oracle
    replays."""
    out: list[str] = []
    pending: str | None = None
    for x in toks:
        if pending == left and x == right:
            out.append(left + right)
            pending = None
        else:
            if pending is not None:
                out.append(pending)
            pending = x
    if pending is not None:
        out.append(pending)
    return out


def _symbol_vocab(docs: rd.Dataset, text_col: str) -> rd.Dataset:
    """(syms, cnt) vocabulary table: each distinct word as a
    space-joined character-symbol string, weighted by corpus count."""
    words = word_counts(docs, text_col=text_col).materialize()

    def to_symbols(t: pa.Table) -> pa.Table:
        w = t.column("word").to_pylist()
        return pa.table(
            {
                "syms": pa.array([" ".join(x) for x in w], pa.string()),
                "cnt": t.column("cnt"),
            }
        )

    return words.map_batches(to_symbols, batch_format="pyarrow").materialize()


def _train_local(
    rows: list[tuple[str, int]], num_merges: int
) -> tuple[list[dict], list[tuple[str, int]]]:
    """Driver-local merge loop over a SMALL pulled vocabulary —
    identical semantics to ``_train`` (same pair counting, selection
    rule, and fold); used under ``vocab_driver_max``."""
    merges: list[dict] = []
    for rank in range(1, num_merges + 1):
        c: Counter = Counter()
        for s, k in rows:
            toks = s.split(" ")
            for i in range(len(toks) - 1):
                c[(toks[i], toks[i + 1])] += k
        if not c:
            break
        (left, right), cnt = min(
            c.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        merges.append(
            {"rank": rank, "left": left, "right": right, "pair_cnt": cnt}
        )
        rows = [
            (" ".join(_merge_word(s.split(" "), left, right)), k)
            for s, k in rows
        ]
    return merges, rows


def _train(
    vocab: rd.Dataset, num_merges: int, vocab_driver_max: int = 100_000
) -> tuple[list[dict], rd.Dataset]:
    """Run ``num_merges`` rounds over the vocabulary table; returns
    (merge rules, merged vocabulary). Stops early when no pair is
    left. Every round: pair-count partials -> bucketed combine -> ONE
    bounded driver pull of the distinct-pair table -> broadcastable
    (left, right) scalars applied in a map_batches fold.

    Fast path: a vocabulary at or under ``vocab_driver_max`` distinct
    words is pulled ONCE and trained driver-locally (the HF-trainer
    shape — the word table is the sufficient statistic and it is tiny
    relative to any corpus), skipping 2R rounds of cluster latency;
    semantics are identical (same counting/selection/fold), and the
    distributed path is forced in tests via vocab_driver_max=0."""
    if vocab.count() <= vocab_driver_max:  # vocab arrives materialized
        pdf = vocab.to_pandas()
        rows = list(
            zip(pdf["syms"].tolist(), (int(x) for x in pdf["cnt"]))
        )
        merges, out_rows = _train_local(rows, num_merges)
        out = rd.from_arrow(
            pa.table(
                {
                    "syms": pa.array([s for s, _ in out_rows], pa.string()),
                    "cnt": pa.array(
                        [k for _, k in out_rows], pa.int64()
                    ),
                }
            )
        )
        return merges, out
    merges: list[dict] = []
    for rank in range(1, num_merges + 1):

        def pair_partials(t: pa.Table) -> dict:
            c: Counter = Counter()
            syms = t.column("syms").to_pylist()
            cnt = t.column("cnt").to_numpy()
            for s, k in zip(syms, cnt):
                toks = s.split(" ")
                for i in range(len(toks) - 1):
                    c[(toks[i], toks[i + 1])] += int(k)
            return {
                "l": np.array([p[0] for p in c.keys()], dtype=object),
                "r": np.array([p[1] for p in c.keys()], dtype=object),
                "c": np.array(list(c.values()), dtype=np.int64),
            }

        pairs = grouped_agg(
            vocab.map_batches(pair_partials, batch_format="pyarrow"),
            ["l", "r"],
            {"c": ("c", "sum")},
        )
        # bounded driver pull: the aggregated DISTINCT-symbol-pair
        # table, <= (alphabet + merges)^2 rows at any corpus size
        pdf = pairs.to_pandas()
        if len(pdf) == 0:
            break
        pdf = pdf.sort_values(["c", "l", "r"], ascending=[False, True, True])
        best = pdf.iloc[0]
        left, right, cnt = str(best["l"]), str(best["r"]), int(best["c"])
        merges.append(
            {"rank": rank, "left": left, "right": right, "pair_cnt": cnt}
        )

        def apply_merge(t: pa.Table, L=left, R=right) -> pa.Table:
            syms = t.column("syms").to_pylist()
            out = [" ".join(_merge_word(s.split(" "), L, R)) for s in syms]
            return pa.table(
                {"syms": pa.array(out, pa.string()), "cnt": t.column("cnt")}
            )

        vocab = vocab.map_batches(
            apply_merge, batch_format="pyarrow"
        ).materialize()
    return merges, vocab


def bpe_train(
    docs: rd.Dataset,
    num_merges: int,
    text_col: str = "text",
    vocab_driver_max: int = 100_000,
) -> rd.Dataset:
    """Learn ``num_merges`` BPE merge rules; returns the small
    (rank, left, right, pair_cnt) table (rank 1-based, pair_cnt =
    the pair's weighted count when it was chosen). Stops early if the
    vocabulary runs out of pairs."""
    merges, _ = _train(
        _symbol_vocab(docs, text_col), num_merges, vocab_driver_max
    )
    if not merges:  # schema-stable empty result
        return rd.from_arrow(
            pa.table(
                {
                    "rank": pa.array([], pa.int64()),
                    "left": pa.array([], pa.string()),
                    "right": pa.array([], pa.string()),
                    "pair_cnt": pa.array([], pa.int64()),
                }
            )
        )
    return rd.from_items(merges)


def bpe_token_counts(
    docs: rd.Dataset,
    num_merges: int,
    text_col: str = "text",
    vocab_driver_max: int = 100_000,
) -> rd.Dataset:
    """(token, cnt) frequency table of the corpus tokenized with the
    first ``num_merges`` learned merges — the trained tokenizer's
    APPLY side, via the memoized distinct-word route: each DISTINCT
    word is tokenized exactly once (its merged symbol string is what
    the trainer's vocabulary table holds after R rounds), so corpus
    token counts are one unnest of that small table weighted by word
    frequency. The corpus is read once (inside word_counts) and never
    re-tokenized row by row — the standard production-tokenizer
    memoization."""
    _, vocab = _train(
        _symbol_vocab(docs, text_col), num_merges, vocab_driver_max
    )

    def unnest_tokens(t: pa.Table) -> dict:
        c: Counter = Counter()
        syms = t.column("syms").to_pylist()
        cnt = t.column("cnt").to_numpy()
        for s, k in zip(syms, cnt):
            for tok in s.split(" "):
                c[tok] += int(k)
        return {
            "token": np.array(list(c.keys()), dtype=object),
            "cnt": np.array(list(c.values()), dtype=np.int64),
        }

    return grouped_agg(
        vocab.map_batches(unnest_tokens, batch_format="pyarrow"),
        ["token"],
        {"cnt": ("cnt", "sum")},
    )
