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

    exploded = docs.select_columns([id_col, text_col]).map_batches(
        explode, batch_format="pandas"
    )

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
