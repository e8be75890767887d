"""Link prediction over an undirected graph: common-neighbor /
Jaccard / preferential-attachment scores for the top-k NON-adjacent
pairs (Liben-Nowell & Kleinberg, CIKM'03) — the classic
"recommend an edge" kernel (friend-of-friend, related-product,
related-host discovery).

Shape at scale: the wedge stage is the co-citation kernel — bucket the
symmetric closure by CENTER vertex, all-pairs of each center's
neighbor list via the vectorized in-group kernel (`pairs_within_groups`),
group size = vertex degree, capped by ``max_degree`` on skewed graphs
(same hub contract as the triangle / LSH kernels). Candidate counts
shuffle once (bucketed combine), existing edges are removed with the
broadcast-guarded anti-join, degrees attach via two hash joins, and
the global top-k is a per-batch prune + tiny sort — traffic
O(k x blocks), never the full candidate table.

All emitted values are gate-exact: cn / pref_attach are int64,
jaccard = cn / (deg_u + deg_v - cn) is ONE IEEE division of exact-int
operands (bit-reproducible at any parallelism).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data as rd

from parallel_pagerank_ray.pipelines.graph_build import Graph, undirected_edges
from parallel_pagerank_ray.stages.agg import (
    grouped_agg,
    pairs_within_groups,
    resolve_num_buckets,
)
from parallel_pagerank_ray.util import anti_join, safe_join


def link_prediction_topk(
    graph: Graph,
    k: int = 20,
    num_buckets: int | None = None,
    max_degree: int | None = None,
) -> rd.Dataset:
    """Top-k non-adjacent pairs by common-neighbor count:
    (src, dst, cn, jaccard, pref_attach), src < dst, ordered by
    (cn DESC, src, dst) — a total order, so the k-boundary is
    deterministic and SQL-reproducible.

    ``max_degree``: centers with more neighbors emit no wedges (hub
    guard — a 10^7-degree hub would emit 5*10^13 pairs); the drop is a
    pure function of degree, reproducible in SQL with one HAVING.
    """
    und = undirected_edges(graph.edges, dedup=False).materialize()
    if num_buckets is None:
        num_buckets = resolve_num_buckets(und)

    deg = grouped_agg(und, ["src"], {"deg": ("dst", "count")}, num_buckets)

    def bucketed(b: dict[str, np.ndarray]) -> dict[str, np.ndarray]:
        b["__b"] = (b["src"] % num_buckets).astype(np.int64)
        return b

    def wedge_pairs(g: pd.DataFrame) -> pd.DataFrame:
        ctr = g["src"].to_numpy()
        nbr = g["dst"].to_numpy()
        # ascending-neighbor order within each center -> a < b
        # (neighbor lists are distinct: graph.edges is deduplicated)
        a, b = pairs_within_groups((ctr, nbr), nbr, max_group=max_degree)
        if not len(a):
            return pd.DataFrame(
                {
                    "a": np.array([], dtype=np.int64),
                    "b": np.array([], dtype=np.int64),
                    "cn": np.array([], dtype=np.int64),
                }
            )
        # run-length count of identical pairs — a lexsort instead of a
        # pandas groupby (measured ~10x on dense wedge sets)
        order = np.lexsort((b, a))
        a, b = a[order], b[order]
        new = np.ones(len(a), dtype=bool)
        new[1:] = (a[1:] != a[:-1]) | (b[1:] != b[:-1])
        idx = np.nonzero(new)[0]
        cnt = np.diff(np.append(idx, len(a)))
        return pd.DataFrame(
            {"a": a[idx], "b": b[idx], "cn": cnt.astype(np.int64)}
        )

    cn = grouped_agg(
        und.map_batches(bucketed, batch_format="numpy")
        .groupby("__b")
        .map_groups(wedge_pairs, batch_format="pandas"),
        ["a", "b"],
        {"cn": ("cn", "sum")},
        num_buckets=num_buckets,
    )

    # drop pairs that are already edges. Packed single-int key keeps the
    # broadcast np.isin fast path; n^2 must fit int64 (n < 3e9 — past
    # that, swap in a two-column hash left_outer + null filter).
    n = graph.n
    if n and n <= 3_000_000_000:

        def pack(b: dict[str, np.ndarray], ka: str, kb: str):
            b["__key"] = b[ka] * np.int64(n) + b[kb]
            return b

        cand = anti_join(
            cn.map_batches(lambda b: pack(b, "a", "b"), batch_format="numpy"),
            graph.edges.map_batches(
                lambda b: pack(b, "src", "dst"), batch_format="numpy"
            ).select_columns(["__key"]),
            on="__key",
        ).select_columns(["a", "b", "cn"])
    else:  # pragma: no cover - >3e9-vertex path
        j = safe_join(
            cn,
            graph.edges.map_batches(
                lambda b: {**b, "__hit": np.ones(len(b["src"]), dtype=bool)},
                batch_format="numpy",
            ),
            join_type="left_outer",
            num_partitions=num_buckets,
            on=("a", "b"),
            right_on=("src", "dst"),
        )
        cand = j.map_batches(
            lambda b: b[b["__hit"].isna()][["a", "b", "cn"]],
            batch_format="pandas",
        )

    # per-batch prune BEFORE the attach joins: only O(k x blocks)
    # candidate rows ever reach the join / final sort
    def prune(b: pd.DataFrame) -> pd.DataFrame:
        return b.sort_values(
            ["cn", "a", "b"], ascending=[False, True, True]
        ).head(k)

    pruned = cand.map_batches(prune, batch_format="pandas")
    withu = safe_join(
        pruned,
        deg.rename_columns({"src": "a", "deg": "deg_a"}),
        join_type="inner",
        num_partitions=4,
        on=("a",),
    )
    withv = safe_join(
        withu,
        deg.rename_columns({"src": "b", "deg": "deg_b"}),
        join_type="inner",
        num_partitions=4,
        on=("b",),
    )

    def score(b: pd.DataFrame) -> pd.DataFrame:
        cnv = b["cn"].to_numpy(dtype=np.int64)
        da = b["deg_a"].to_numpy(dtype=np.int64)
        db = b["deg_b"].to_numpy(dtype=np.int64)
        return pd.DataFrame(
            {
                "src": b["a"].to_numpy(dtype=np.int64),
                "dst": b["b"].to_numpy(dtype=np.int64),
                "cn": cnv,
                # one IEEE division of exact-int operands — bit-stable
                "jaccard": cnv.astype(np.float64) / (da + db - cnv),
                "pref_attach": da * db,
            }
        )

    return (
        withv.map_batches(score, batch_format="pandas")
        .sort(["cn", "src", "dst"], descending=[True, False, False])
        .limit(k)
    )


def linkpred_training_set(
    graph: Graph,
    holdout_mod: int = 5,
    neg_attempts: int = 2,
    num_buckets: int | None = None,
) -> rd.Dataset:
    """Deterministic link-prediction training table: (src, dst, label)
    with label 1 = held-out positive edges, label 0 = hash-sampled
    verified non-edges — the standard supervised edge-classification
    dataset builder for graph-ML training.

    Rules (all md5-keyed, so a SQL oracle replays them verbatim):
      positives  canonical edges (src < dst) with
                 md5_u64("lp|src|dst") % holdout_mod == 0
      negatives  for each positive and attempt j in 1..neg_attempts,
                 u = md5_u64("lpn|src|dst|j|a") % n,
                 v = md5_u64("lpn|src|dst|j|b") % n with n = max
                 endpoint + 1; canonicalized (min, max), self-pairs
                 dropped, existing edges removed by anti-join,
                 de-duplicated. Collision rejections mean the realized
                 negative count is <= neg_attempts x positives — the
                 standard rejection-sampling contract, deterministic
                 given the graph.

    Requires ``graph.edges`` in canonical simple form (src < dst,
    distinct) — the same certificate as the triangle family.

    Scale shape: positives are one stateless filter over the edge
    scan; candidates are a bounded flat-map (neg_attempts x
    positives); the only wide step is the packed-key anti-join against
    the edge set (n < 3e9 for the packed key — the two-column
    hash-join fallback in link_prediction_topk applies past it).
    """
    import pyarrow as pa

    from parallel_pagerank_ray.functions.hashing import md5_u64
    from parallel_pagerank_ray.pipelines.graph_build import dedup_edges
    from parallel_pagerank_ray.stages.agg import global_agg

    if num_buckets is None:
        num_buckets = resolve_num_buckets(graph.edges)
    edges = graph.edges.select_columns(["src", "dst"]).materialize()
    mx = global_agg(
        edges, {"ms": ("src", "max"), "md": ("dst", "max")}
    )
    if mx["ms"] is None:
        return rd.from_arrow(
            pa.table(
                {
                    "src": pa.array([], pa.int64()),
                    "dst": pa.array([], pa.int64()),
                    "label": pa.array([], pa.int64()),
                }
            )
        )
    n = max(int(mx["ms"]), int(mx["md"])) + 1

    def pos_filter(t: pa.Table) -> pa.Table:
        s = t.column("src").to_numpy(zero_copy_only=False)
        d = t.column("dst").to_numpy(zero_copy_only=False)
        keep = np.fromiter(
            (
                md5_u64(f"lp|{a}|{b}") % holdout_mod == 0
                for a, b in zip(s, d)
            ),
            bool,
            len(s),
        )
        return t.filter(pa.array(keep))

    pos = edges.map_batches(pos_filter, batch_format="pyarrow").materialize()

    def neg_cands(t: pa.Table) -> pa.Table:
        s = t.column("src").to_numpy(zero_copy_only=False)
        d = t.column("dst").to_numpy(zero_copy_only=False)
        us, vs = [], []
        for a, b in zip(s, d):
            for j in range(1, neg_attempts + 1):
                us.append(md5_u64(f"lpn|{a}|{b}|{j}|a") % n)
                vs.append(md5_u64(f"lpn|{a}|{b}|{j}|b") % n)
        u = np.asarray(us, dtype=np.int64)
        v = np.asarray(vs, dtype=np.int64)
        lo = np.minimum(u, v)
        hi = np.maximum(u, v)
        m = lo != hi
        return pa.table(
            {"src": pa.array(lo[m], pa.int64()),
             "dst": pa.array(hi[m], pa.int64())}
        )

    cand = dedup_edges(
        pos.map_batches(neg_cands, batch_format="pyarrow"),
        num_buckets=num_buckets,
    )

    def pack(b: dict[str, np.ndarray]) -> dict[str, np.ndarray]:
        b["__key"] = b["src"] * np.int64(n) + b["dst"]
        return b

    if n > 3_000_000_000:  # pragma: no cover - packed key needs n < 3e9
        raise ValueError(
            "linkpred_training_set packed anti-join needs n < 3e9; "
            "swap in the two-column hash-join fallback"
        )
    neg = anti_join(
        cand.map_batches(pack, batch_format="numpy"),
        edges.map_batches(pack, batch_format="numpy").select_columns(
            ["__key"]
        ),
        on="__key",
    ).select_columns(["src", "dst"])

    def lab(const: int):
        def fn(t: pa.Table) -> pa.Table:
            return t.append_column(
                "label",
                pa.array(np.full(t.num_rows, const, np.int64), pa.int64()),
            )

        return fn

    return pos.map_batches(lab(1), batch_format="pyarrow").union(
        neg.map_batches(lab(0), batch_format="pyarrow")
    )


def linkpred_auc(
    graph: Graph,
    holdout_mod: int = 5,
    neg_attempts: int = 2,
    num_buckets: int | None = None,
    broadcast_max: int = 50_000_000,
) -> rd.Dataset:
    """Exact ROC-AUC of the common-neighbor scorer on the held-out
    link-prediction split — the standard evaluation loop closing the
    ``linkpred_training_set`` builder: positives/negatives from the
    same md5 rules, every pair scored |N(s) ∩ N(d)| over the RESIDUAL
    graph (held-out positives removed, so no test-edge leakage), and

        concordant2 = sum over positives p of
                      (2 * #neg scored below s_p + #neg tied with s_p)
        auc         = concordant2 / (2 * n_pos * n_neg)

    computed exactly from the integer (score, label) histogram; auc is
    the single float division of exact int64s (SQL-reproducible
    bit-for-bit). One row: (n_pos, n_neg, concordant2, auc).

    Scale shape: the train build is the bounded flat-map + packed
    anti-join of linkpred_training_set; the residual graph is one
    stateless filter; scoring broadcasts the residual closure once
    (sorted src array + dst array + packed key array, 24 B/closure
    edge in plasma, zero-copy per task) and runs one ragged gather +
    searchsorted membership per batch — no per-pair Python; the AUC
    fold moves only the (score, label) histogram (<= max_degree rows).
    Requires n < 3e9 (packed keys, the linkpred family contract).
    """
    import pyarrow as pa
    import ray

    from parallel_pagerank_ray.functions.hashing import md5_u64

    if num_buckets is None:
        num_buckets = resolve_num_buckets(graph.edges)
    n = graph.n
    train = linkpred_training_set(
        graph,
        holdout_mod=holdout_mod,
        neg_attempts=neg_attempts,
        num_buckets=num_buckets,
    ).materialize()

    def residual(t: pa.Table) -> pa.Table:
        s = t.column("src").to_numpy(zero_copy_only=False)
        d = t.column("dst").to_numpy(zero_copy_only=False)
        keep = np.fromiter(
            (
                md5_u64(f"lp|{a}|{b}") % holdout_mod != 0
                for a, b in zip(s, d)
            ),
            bool,
            len(s),
        )
        return t.filter(pa.array(keep))

    res = (
        graph.edges.select_columns(["src", "dst"])
        .map_batches(residual, batch_format="pyarrow")
        .materialize()
    )
    from parallel_pagerank_ray.util import count_rows_once, pull_table

    und = undirected_edges(res, dedup=False).materialize()
    n_und, und = count_rows_once(und)
    if n_und > broadcast_max:
        scored = _score_cn_join(train, und, n, num_buckets)
        return _auc_fold(scored, num_buckets)
    rt = pull_table(und, ["src", "dst"])
    us = rt.column("src").to_numpy(zero_copy_only=False)
    ud = rt.column("dst").to_numpy(zero_copy_only=False)
    order = np.lexsort((ud, us))
    us, ud = us[order], ud[order]
    keys = us * np.int64(n) + ud  # sorted (closure sorted by (src,dst))
    ref = ray.put((us, ud, keys))

    def score(t: pa.Table) -> pa.Table:
        cs, cd, ck = ray.get(ref)
        s = t.column("src").to_numpy(zero_copy_only=False)
        d = t.column("dst").to_numpy(zero_copy_only=False)
        lo = np.searchsorted(cs, s, "left")
        hi = np.searchsorted(cs, s, "right")
        deg = hi - lo
        total = int(deg.sum())
        sc = np.zeros(len(s), dtype=np.int64)
        if total and len(ck):
            csum = np.concatenate(([0], np.cumsum(deg)[:-1]))
            owner = np.repeat(np.arange(len(s)), deg)
            pos = (
                np.arange(total)
                - np.repeat(csum, deg)
                + np.repeat(lo, deg)
            )
            x = cd[pos]
            k = d[owner] * np.int64(n) + x
            p = np.minimum(np.searchsorted(ck, k), len(ck) - 1)
            found = (ck[p] == k).astype(np.int64)
            np.add.at(sc, owner, found)
        return pa.table(
            {
                "score": pa.array(sc, pa.int64()),
                "label": t.column("label"),
            }
        )

    return _auc_fold(
        train.map_batches(score, batch_format="pyarrow"), num_buckets
    )


def _score_cn_join(
    train: rd.Dataset, und: rd.Dataset, n: int, num_buckets: int
) -> rd.Dataset:
    """Join-path scorer (above the closure broadcast bound): expand
    each pair by N(src) via one hash join, then count surviving
    (dst, x) closure memberships via a packed-key inner join -- the
    same exact |N(s) & N(d)| as the broadcast kernel (forced-bound
    parity test)."""
    import pyarrow as pa

    from parallel_pagerank_ray.util import safe_join

    def with_id(t: pa.Table) -> pa.Table:
        # pair key is (src, dst) packed -- unique in the train table
        s = t.column("src").to_numpy(zero_copy_only=False)
        d = t.column("dst").to_numpy(zero_copy_only=False)
        return t.append_column(
            "pid", pa.array(s * np.int64(n) + d, pa.int64())
        )

    tid = train.map_batches(with_id, batch_format="pyarrow").materialize()
    exp = safe_join(
        tid.select_columns(["pid", "src", "dst"]),
        und.rename_columns({"src": "__s", "dst": "x"}),
        join_type="inner",
        num_partitions=8,
        on=("src",),
        right_on=("__s",),
    )

    def pack(t: pa.Table) -> pa.Table:
        d = t.column("dst").to_numpy(zero_copy_only=False)
        x = t.column("x").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "pid": t.column("pid"),
                "k": pa.array(d * np.int64(n) + x, pa.int64()),
            }
        )

    def ckeys(t: pa.Table) -> pa.Table:
        s = t.column("src").to_numpy(zero_copy_only=False)
        d = t.column("dst").to_numpy(zero_copy_only=False)
        return pa.table({"__k": pa.array(s * np.int64(n) + d, pa.int64())})

    hits = safe_join(
        exp.map_batches(pack, batch_format="pyarrow"),
        und.map_batches(ckeys, batch_format="pyarrow"),
        join_type="inner",
        num_partitions=8,
        on=("k",),
        right_on=("__k",),
    )
    cn = grouped_agg(
        hits.select_columns(["pid", "k"]),
        ["pid"],
        {"score": ("k", "count")},
        num_buckets=num_buckets,
    )
    j = safe_join(
        tid.select_columns(["pid", "label"]),
        cn.rename_columns({"pid": "__p"}),
        join_type="left_outer",
        num_partitions=8,
        on=("pid",),
        right_on=("__p",),
    )

    def fill(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return pa.table(
            {
                "score": pc.coalesce(
                    t.column("score"), pa.scalar(0, pa.int64())
                ),
                "label": t.column("label"),
            }
        )

    return j.map_batches(fill, batch_format="pyarrow")


def _auc_fold(scored: rd.Dataset, num_buckets: int) -> rd.Dataset:
    """(score, label) histogram -> exact concordant2 / auc one-row
    table (shared by both scorer paths)."""
    import pyarrow as pa

    from parallel_pagerank_ray.util import pull_table

    hist = grouped_agg(
        scored.map_batches(
            lambda t: t.append_column(
                "one",
                pa.array(np.ones(t.num_rows, dtype=np.int64), pa.int64()),
            ),
            batch_format="pyarrow",
        ),
        ["score", "label"],
        {"c": ("one", "sum")},
        num_buckets=num_buckets,
    )
    ht = pull_table(hist, ["score", "label", "c"])
    sc = ht.column("score").to_numpy(zero_copy_only=False)
    lab = ht.column("label").to_numpy(zero_copy_only=False)
    cnt = ht.column("c").to_numpy(zero_copy_only=False)
    order = np.argsort(sc, kind="stable")
    sc, lab, cnt = sc[order], lab[order], cnt[order]
    uniq = np.unique(sc)
    p_at = np.zeros(len(uniq), dtype=np.int64)
    n_at = np.zeros(len(uniq), dtype=np.int64)
    idx = np.searchsorted(uniq, sc)
    np.add.at(p_at, idx[lab == 1], cnt[lab == 1])
    np.add.at(n_at, idx[lab == 0], cnt[lab == 0])
    neg_below = np.concatenate(([0], np.cumsum(n_at)[:-1]))
    concordant2 = int((p_at * (2 * neg_below + n_at)).sum())
    n_pos = int(p_at.sum())
    n_neg = int(n_at.sum())
    auc = (
        concordant2 / float(2 * n_pos * n_neg)
        if n_pos and n_neg
        else 0.0
    )
    return rd.from_arrow(
        pa.table(
            {
                "n_pos": pa.array([n_pos], pa.int64()),
                "n_neg": pa.array([n_neg], pa.int64()),
                "concordant2": pa.array([concordant2], pa.int64()),
                "auc": pa.array([auc], pa.float64()),
            }
        )
    )
