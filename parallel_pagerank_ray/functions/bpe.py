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
        ws = np.array(list(c.keys()), dtype=object)
        return {
            "word": ws,
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


def bpe_train(
    docs: rd.Dataset,
    num_merges: int,
    text_col: str = "text",
) -> rd.Dataset:
    """Learn ``num_merges`` BPE merge rules; returns the small
    (rank, left, right, pair_cnt) table (rank 1-based, pair_cnt =
    the pair's weighted count when it was chosen). Stops early if the
    vocabulary runs out of pairs."""
    words = word_counts(docs, text_col=text_col).materialize()

    def to_symbols(t: pa.Table) -> pa.Table:
        w = t.column("word").to_pylist()
        return pa.table(
            {
                "syms": pa.array([" ".join(x) for x in w], pa.string()),
                "cnt": t.column("cnt"),
            }
        )

    vocab = words.map_batches(to_symbols, batch_format="pyarrow").materialize()
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
            ls = np.array([p[0] for p in c.keys()], dtype=object)
            rs = np.array([p[1] for p in c.keys()], dtype=object)
            return {
                "l": ls,
                "r": rs,
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
        pdf = pdf.sort_values(
            ["c", "l", "r"], ascending=[False, True, True]
        )
        best = pdf.iloc[0]
        left, right, cnt = str(best["l"]), str(best["r"]), int(best["c"])
        merges.append(
            {"rank": rank, "left": left, "right": right, "pair_cnt": cnt}
        )

        def apply_merge(t: pa.Table, L=left, R=right) -> pa.Table:
            syms = t.column("syms").to_pylist()
            out = [
                " ".join(_merge_word(s.split(" "), L, R)) for s in syms
            ]
            return pa.table(
                {"syms": pa.array(out, pa.string()), "cnt": t.column("cnt")}
            )

        vocab = vocab.map_batches(
            apply_merge, batch_format="pyarrow"
        ).materialize()
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
