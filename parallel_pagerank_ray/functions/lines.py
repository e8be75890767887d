"""C4/RefinedWeb-style line-level corpus cleaning.

The reference pipeline has no text-cleaning stage (its corpus is an
edge list); this is one of the beyond-reference training-data
operators. Two rules, both standard in public web-corpus pipelines
(C4: Raffel et al. 2020, arXiv:1910.10683 §2.2 — line word minimum;
RefinedWeb: Penedo et al. 2023, arXiv:2306.01116 — boilerplate line
removal by corpus frequency):

1. LOCAL: a line must contain at least ``min_words`` whitespace
   tokens (one vectorized regex count per batch, no shuffle).
2. GLOBAL: a line appearing in more than ``max_line_df`` distinct
   documents is boilerplate (nav bars, footers, "link N" anchors) and
   is dropped everywhere. This is inherently one corpus-wide exchange
   of (line, doc) pairs — at 100 TB the pairs table carries only the
   line text + id (never the document), the distinct + df counting is
   the engine's bucketed ``grouped_agg`` (partial combine inside each
   map task first), and the df attach is a hash join partitioned by
   line, so no driver materialization at any size.

Output: one row per input document — (id, clean_text, lines_kept,
lines_dropped) — with surviving lines re-joined in original order.
Deterministic: keep/drop is a pure function of the corpus, so the
DuckDB oracle reproduces it value-exactly.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data as rd

from parallel_pagerank_ray.stages.agg import grouped_agg
from parallel_pagerank_ray.util import drop_empty_blocks, safe_join

_WORD_RE = r"\S+"


def line_filter(
    docs: rd.Dataset,
    id_col: str = "url",
    text_col: str = "text",
    min_words: int = 2,
    max_line_df: int | None = None,
    num_buckets: int | None = None,
    num_partitions: int | None = None,
    broadcast_max: int | None = 5_000_000,
) -> rd.Dataset:
    """Drop low-quality and boilerplate lines from every document.

    ``max_line_df=None`` skips the global rule (and its shuffle)
    entirely — the local pass is then one stateless map.
    """

    def explode(b: pd.DataFrame) -> pd.DataFrame:
        if not len(b):
            return pd.DataFrame(
                {
                    id_col: pd.Series([], dtype=b[id_col].dtype),
                    "line_no": pd.Series([], dtype=np.int64),
                    "line": pd.Series([], dtype=object),
                    "words": pd.Series([], dtype=np.int64),
                }
            )
        split = b[text_col].str.split("\n")
        n = split.str.len().to_numpy(dtype=np.int64)
        flat = pd.Series(
            np.concatenate([np.asarray(x, dtype=object) for x in split])
        )
        total = int(n.sum())
        starts = np.repeat(np.cumsum(n) - n, n)
        return pd.DataFrame(
            {
                id_col: np.repeat(b[id_col].to_numpy(), n),
                "line_no": np.arange(total, dtype=np.int64) - starts,
                "line": flat.to_numpy(),
                "words": flat.str.count(_WORD_RE).to_numpy(dtype=np.int64),
            }
        )

    docs = docs.select_columns([id_col, text_col])
    if broadcast_max is not None and max_line_df is not None:
        # The broadcast fast path reads docs TWICE (df-count pass,
        # then the clean pass); pin one spillable plasma copy instead
        # of recomputing the upstream pipeline. Single-pass
        # configurations stay fully lazy/streaming.
        docs = docs.materialize()
    exploded = docs.map_batches(explode, batch_format="pandas")

    if broadcast_max is not None:
        # Broadcast fast path: boilerplate lines (df > max_line_df) are
        # FEW by the rule's nature — the df table shuffles only (line,
        # id) pairs as before, but the attach becomes one plasma
        # blocklist + np.isin, and the per-document reassembly fuses
        # into the SAME stateless map as the explode (a document's
        # lines never leave their batch, so no sort shuffle and no
        # per-group Python). Falls back to the join + map_groups path
        # when the blocklist exceeds the guard.
        n_block = 0
        df_tab = None
        if max_line_df is not None:
            per_doc = grouped_agg(
                exploded.select_columns(["line", id_col]),
                ["line", id_col],
                {"c": (id_col, "count")},
                num_buckets=num_buckets,
            )
            df_tab = grouped_agg(
                per_doc.select_columns(["line"]),
                ["line"],
                {"line_df": ("line", "count")},
                num_buckets=num_buckets,
            ).filter(expr=f"line_df > {int(max_line_df)}")
            from parallel_pagerank_ray.util import count_rows_once

            n_block, df_tab = count_rows_once(df_tab)
        if n_block <= broadcast_max:
            import ray

            blocks = (
                [
                    t.column("line").to_numpy(zero_copy_only=False)
                    for t in ray.get(df_tab.to_arrow_refs())
                    if t.num_rows
                ]
                if df_tab is not None
                else []
            )
            blocklist = (
                np.sort(np.concatenate(blocks))
                if blocks
                else np.array([], dtype=object)
            )
            block_ref = ray.put(blocklist)

            def clean(b: pd.DataFrame) -> pd.DataFrame:
                bl = ray.get(block_ref)
                if not len(b):
                    return pd.DataFrame(
                        {
                            id_col: pd.Series([], dtype=b[id_col].dtype),
                            "clean_text": pd.Series([], dtype=object),
                            "lines_kept": pd.Series([], dtype=np.int64),
                            "lines_dropped": pd.Series([], dtype=np.int64),
                        }
                    )
                split = b[text_col].str.split("\n")
                n = split.str.len().to_numpy(dtype=np.int64)
                flat = pd.Series(
                    np.concatenate(
                        [np.asarray(x, dtype=object) for x in split]
                    )
                )
                words = flat.str.count(_WORD_RE).to_numpy(dtype=np.int64)
                keep = words >= min_words
                if len(bl):
                    keep &= ~np.isin(flat.to_numpy(), bl)
                doc_idx = np.repeat(np.arange(len(b), dtype=np.int64), n)
                joined = (
                    pd.Series(flat.to_numpy()[keep])
                    .groupby(doc_idx[keep])
                    .agg("\n".join)
                    .reindex(np.arange(len(b)), fill_value="")
                )
                kept = np.bincount(
                    doc_idx[keep], minlength=len(b)
                ).astype(np.int64)
                return pd.DataFrame(
                    {
                        id_col: b[id_col].to_numpy(),
                        "clean_text": joined.to_numpy(),
                        "lines_kept": kept,
                        "lines_dropped": n - kept,
                    }
                )

            return docs.map_batches(clean, batch_format="pandas")

    if max_line_df is not None:
        # df(line) = number of DISTINCT documents containing it:
        # distinct (line, id) first, then count per line — both legs
        # are the bucketed partial-combine grouped_agg.
        per_doc = grouped_agg(
            exploded.select_columns(["line", id_col]),
            ["line", id_col],
            {"c": (id_col, "count")},
            num_buckets=num_buckets,
        )
        df_tab = grouped_agg(
            per_doc.select_columns(["line"]),
            ["line"],
            {"line_df": ("line", "count")},
            num_buckets=num_buckets,
        )
        if num_partitions is None:
            from parallel_pagerank_ray.pipelines.graph_build import (
                _default_join_partitions,
            )

            num_partitions = _default_join_partitions()
        exploded = safe_join(
            exploded,
            df_tab,
            join_type="inner",
            num_partitions=num_partitions,
            on=("line",),
        )

    def reassemble(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("line_no")
        keep = g["words"].to_numpy() >= min_words
        if max_line_df is not None:
            keep &= g["line_df"].to_numpy() <= max_line_df
        return pd.DataFrame(
            {
                id_col: [g[id_col].iloc[0]],
                "clean_text": ["\n".join(g.loc[keep, "line"])],
                "lines_kept": np.array([keep.sum()], dtype=np.int64),
                "lines_dropped": np.array(
                    [len(keep) - keep.sum()], dtype=np.int64
                ),
            }
        )

    return drop_empty_blocks(
        exploded.groupby(id_col).map_groups(
            reassemble, batch_format="pandas"
        )
    )
