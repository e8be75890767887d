"""DAG dynamic programming: longest path + source-path counting.

The classic critical-path / path-multiplicity DP over a directed
acyclic edge table — the reference engine has no DAG pass at all; this
is the standard companion to the SCC condensation (every digraph's
condensation is a DAG) and to any src<dst-oriented undirected graph.

Semantics, per vertex v of the edge set:

    lp(v)     = length of the LONGEST path from any source (in-degree
                0 vertex) to v — the critical-path level;
    npaths(v) = number of distinct source->v paths, mod ``mod``
                (path counts grow exponentially with depth; modular
                counts keep int64 arithmetic exact and SQL-replayable
                — the standard fingerprint move, same family as the
                engine's mod-2^31-1 hash chains).

Scale shape: level-synchronous Kahn peeling. Round k finalizes the
vertices whose in-degree has drained to zero — exactly the vertices
with lp = k — and routes their (lp+1, npaths) contributions along
their out-edges: one inner join (frontier x edges, keyed on src) plus
two bucketed combines (per-dst max/sum/count merge, accumulator
update) per round. Rounds = DAG depth; data per round = one
wavefront, so no step ever holds the graph or a full vertex state on
one worker and nothing is pulled to the driver beyond per-round row
counts. A cyclic input is detected (the frontier drains while
vertices remain pending) and raised, not looped on.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from parallel_pagerank_ray.stages.agg import grouped_agg, resolve_num_buckets
from parallel_pagerank_ray.util import anti_join, drop_empty_blocks, safe_join

_MOD_DEFAULT = (1 << 31) - 1


def _dag_paths_fast(
    edges: rd.Dataset,
    n: int,
    num_buckets: int,
    mod: int,
    max_rounds: int,
) -> rd.Dataset:
    """Broadcast fast path: O(V) dense DP state on the driver, edges
    scanned distributed once per round (one map + one bucketed combine;
    the wavefront ships via ray.put, never through a shuffle)."""
    import ray as _ray

    # in-degrees + vertex presence, one combine each way
    indeg_rows = grouped_agg(
        edges.select_columns(["dst"]),
        ["dst"],
        {"c": ("dst", "count")},
        num_buckets=num_buckets,
    )
    src_rows = grouped_agg(
        edges.select_columns(["src"]),
        ["src"],
        {"c": ("src", "count")},
        num_buckets=num_buckets,
    )
    it = pa.concat_tables(_ray.get(indeg_rows.to_arrow_refs()))
    st = pa.concat_tables(_ray.get(src_rows.to_arrow_refs()))
    indeg = np.zeros(n, dtype=np.int64)
    present = np.zeros(n, dtype=bool)
    dv = it.column("dst").to_numpy(zero_copy_only=False)
    indeg[dv] = it.column("c").to_numpy(zero_copy_only=False)
    present[dv] = True
    present[st.column("src").to_numpy(zero_copy_only=False)] = True

    lp = np.zeros(n, dtype=np.int64)
    npv = np.zeros(n, dtype=np.int64)
    frontier = np.flatnonzero(present & (indeg == 0))
    npv[frontier] = 1
    out_v: list[np.ndarray] = []
    pending = int((present & (indeg > 0)).sum())
    modn = np.int64(mod)
    rounds = 0
    while len(frontier):
        out_v.append(frontier)
        if pending == 0:
            break
        if rounds >= max_rounds:  # pragma: no cover - contract guard
            raise RuntimeError(f"dag_paths exceeded {max_rounds} rounds")
        rounds += 1
        wave = np.zeros(n, dtype=bool)
        wave[frontier] = True
        ref = _ray.put((wave, lp.copy(), npv.copy()))

        def emit(t: pa.Table) -> pa.Table:
            w, lparr, nparr = _ray.get(ref)
            s = t.column("src").to_numpy(zero_copy_only=False)
            d = t.column("dst").to_numpy(zero_copy_only=False)
            m = w[s]
            return pa.table(
                {
                    "vid": pa.array(d[m], pa.int64()),
                    "lpc": pa.array(lparr[s[m]] + 1, pa.int64()),
                    "npc": pa.array(nparr[s[m]], pa.int64()),
                }
            )

        agg = grouped_agg(
            edges.map_batches(emit, batch_format="pyarrow"),
            ["vid"],
            {
                "lpc": ("lpc", "max"),
                "npc": ("npc", "sum"),
                "dec": ("lpc", "count"),
            },
            num_buckets=num_buckets,
        )
        at = pa.concat_tables(_ray.get(agg.to_arrow_refs()))
        av = at.column("vid").to_numpy(zero_copy_only=False)
        lp[av] = np.maximum(
            lp[av], at.column("lpc").to_numpy(zero_copy_only=False)
        )
        npv[av] = (
            npv[av] + at.column("npc").to_numpy(zero_copy_only=False)
        ) % modn
        indeg[av] -= at.column("dec").to_numpy(zero_copy_only=False)
        frontier = av[indeg[av] == 0]
        pending -= len(frontier)
    if pending:
        raise ValueError(
            f"dag_paths input is not acyclic: {pending} vertices never drained"
        )
    verts = np.concatenate(out_v) if out_v else np.array([], dtype=np.int64)
    return rd.from_arrow(
        pa.table(
            {
                "vid": pa.array(verts, pa.int64()),
                "lp": pa.array(lp[verts], pa.int64()),
                "npaths_mod": pa.array(npv[verts], pa.int64()),
            }
        )
    )


def dag_paths(
    edges: rd.Dataset,
    num_buckets: int | None = None,
    mod: int = _MOD_DEFAULT,
    max_rounds: int = 100_000,
    n: int | None = None,
    broadcast_max: int = 5_000_000,
) -> rd.Dataset:
    """(vid, lp, npaths_mod) for every vertex of the directed edge
    table (columns src, dst), which must be acyclic — e.g. a canonical
    undirected edge set read as low->high orientation, or an SCC
    condensation. Deterministic, integer-exact.

    Fast path (#vertices-with-in-edges <= ``broadcast_max``): the
    O(V) DP state lives in driver numpy arrays; each round broadcasts
    the wavefront once via ``ray.put`` and runs one stateless map +
    one bucketed combine over the (never-moved) edge table — no
    per-round hash-shuffle joins. Above the bound, the Dataset ladder
    below runs the identical recurrence with joins; both are
    force-tested equal at bound 0.
    """
    if mod <= 1 or mod > _MOD_DEFAULT:
        raise ValueError("mod must be in (1, 2^31-1]")
    if num_buckets is None:
        num_buckets = resolve_num_buckets(edges)
    edges = edges.select_columns(["src", "dst"]).materialize()
    empty = rd.from_arrow(
        pa.table(
            {
                "vid": pa.array([], pa.int64()),
                "lp": pa.array([], pa.int64()),
                "npaths_mod": pa.array([], pa.int64()),
            }
        )
    )
    if edges.count() == 0:
        return empty
    if n is None:
        hi_s = edges.max("src")
        hi_d = edges.max("dst")
        n = int(max(hi_s or 0, hi_d or 0)) + 1
    if n <= broadcast_max:
        return _dag_paths_fast(edges, n, num_buckets, mod, max_rounds)

    # pending accumulator: (vid, indeg, lp, np) for every vertex with
    # at least one incoming edge
    acc = grouped_agg(
        edges.select_columns(["dst"]),
        ["dst"],
        {"indeg": ("dst", "count")},
        num_buckets=num_buckets,
    ).rename_columns({"dst": "vid"})

    def seed_acc(t: pa.Table) -> pa.Table:
        z = pa.array(np.zeros(len(t), dtype=np.int64))
        return pa.table(
            {
                "vid": t.column("vid"),
                "indeg": t.column("indeg"),
                "lp": z,
                "np": z,
            }
        )

    acc = acc.map_batches(seed_acc, batch_format="pyarrow").materialize()

    # sources = src vertices that never occur as a dst
    srcs = grouped_agg(
        edges.select_columns(["src"]),
        ["src"],
        {"c": ("src", "count")},
        num_buckets=num_buckets,
    ).select_columns(["src"]).rename_columns({"src": "vid"})
    frontier = anti_join(srcs, acc.select_columns(["vid"]), on="vid")

    def seed_frontier(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "vid": t.column("vid"),
                "lp": pa.array(np.zeros(len(t), dtype=np.int64)),
                "np": pa.array(np.ones(len(t), dtype=np.int64)),
            }
        )

    frontier = frontier.map_batches(
        seed_frontier, batch_format="pyarrow"
    ).materialize()

    done: list[rd.Dataset] = []
    pending = acc.count()
    rounds = 0
    while frontier.count():
        done.append(frontier)
        if pending == 0:
            break
        if rounds >= max_rounds:  # pragma: no cover - contract guard
            raise RuntimeError(f"dag_paths exceeded {max_rounds} rounds")
        rounds += 1
        # route contributions along out-edges of the wavefront
        contrib = safe_join(
            edges,
            frontier.rename_columns({"vid": "__f"}),
            join_type="inner",
            num_partitions=8,
            on=("src",),
            right_on=("__f",),
        )

        def emit(t: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "vid": t.column("dst"),
                    "lpc": pc.add(t.column("lp"), pa.scalar(1, pa.int64())),
                    "npc": t.column("np"),
                }
            )

        agg = grouped_agg(
            contrib.map_batches(emit, batch_format="pyarrow"),
            ["vid"],
            {"lpc": ("lpc", "max"), "npc": ("npc", "sum"), "dec": ("lpc", "count")},
            num_buckets=num_buckets,
        )
        merged = safe_join(
            acc,
            agg.rename_columns({"vid": "__v"}),
            join_type="left_outer",
            num_partitions=8,
            on=("vid",),
            right_on=("__v",),
        )

        def fold(df: pd.DataFrame) -> pd.DataFrame:
            lpc = df["lpc"].fillna(0).to_numpy().astype(np.int64)
            npc = df["npc"].fillna(0).to_numpy().astype(np.int64)
            dec = df["dec"].fillna(0).to_numpy().astype(np.int64)
            return pd.DataFrame(
                {
                    "vid": df["vid"].to_numpy().astype(np.int64),
                    "indeg": df["indeg"].to_numpy().astype(np.int64) - dec,
                    "lp": np.maximum(
                        df["lp"].to_numpy().astype(np.int64), lpc
                    ),
                    "np": (df["np"].to_numpy().astype(np.int64) + npc)
                    % np.int64(mod),
                }
            )

        state = merged.map_batches(fold, batch_format="pandas").materialize()
        frontier = state.filter(expr="indeg == 0").select_columns(
            ["vid", "lp", "np"]
        ).materialize()
        acc = state.filter(expr="indeg > 0").materialize()
        pending = acc.count()
    if pending:
        raise ValueError(
            f"dag_paths input is not acyclic: {pending} vertices never drained"
        )

    out = done[0]
    for part in done[1:]:
        out = out.union(part)
    return drop_empty_blocks(
        out.rename_columns({"np": "npaths_mod"})
    )
