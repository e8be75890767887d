"""Dedup suite: planted exact/near duplicates must be found."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from parallel_pagerank_ray.pipelines import dedup

BASE = (
    "the quick brown fox jumps over the lazy dog while the band plays "
    "a long tune about rivers and maps and the old stone bridge"
)


@pytest.fixture(scope="module")
def docs_ds():
    rng = np.random.default_rng(7)
    words = BASE.split()
    texts, sources = [], []
    for i in range(40):
        texts.append(" ".join(rng.permutation(words)))
        sources.append(f"s{i % 4}")
    # planted: 40+41 exact dups; 42 near-dup of 0 (one word changed)
    texts.append(texts[0])
    sources.append(sources[0])
    texts.append(texts[0])
    sources.append(sources[0])
    near = texts[1].split()
    near[3] = "NEAR"
    texts.append(" ".join(near))
    sources.append(sources[1])
    t = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), type=pa.int64()),
            "text": pa.array(texts),
            "source": pa.array(sources),
        }
    )
    return rd.from_arrow(t)


def test_exact_dedup_groups(docs_ds):
    df = dedup.exact_dedup(docs_ds).to_pandas()
    dups = df[df["n_dups"] > 1]
    assert len(dups) == 1
    assert int(dups["keeper"].iloc[0]) == 0
    assert int(dups["n_dups"].iloc[0]) == 3  # docs 0, 40, 41


def test_shingle_jaccard_finds_near_dup(docs_ds):
    pairs = dedup.shingle_jaccard_pairs(docs_ds, k=5, group_col="source").to_pandas()
    exact = pairs[(pairs.doc_a == 0) & (pairs.doc_b == 40)]
    assert len(exact) == 1 and exact["jaccard"].iloc[0] == 1.0
    near = pairs[(pairs.doc_a == 1) & (pairs.doc_b == 42)]
    assert len(near) == 1 and near["jaccard"].iloc[0] > 0.8


def test_minhash_lsh_recalls_planted_pairs(docs_ds):
    cand = dedup.minhash_lsh_candidates(docs_ds, num_perm=128, bands=32).to_pandas()
    got = set(zip(cand.doc_a, cand.doc_b))
    assert (0, 40) in got and (0, 41) in got and (40, 41) in got
    assert (1, 42) in got  # near-dup caught by at least one band


def test_simhash_candidates(docs_ds):
    cand = dedup.simhash_candidates(docs_ds, max_hamming=3).to_pandas()
    got = set(zip(cand.doc_a, cand.doc_b))
    assert (0, 40) in got and (0, 41) in got
    ham0 = cand[(cand.doc_a == 0) & (cand.doc_b == 40)]["hamming"].iloc[0]
    assert ham0 == 0  # identical text -> identical simhash


def test_embedding_near_dup_planted():
    rng = np.random.default_rng(3)
    vecs = rng.standard_normal((30, 16)).astype(np.float32)
    vecs[17] = vecs[4] + rng.standard_normal(16).astype(np.float32) * 0.01
    t = pa.table(
        {
            "vec_id": pa.array(range(30), type=pa.int64()),
            "embedding": pa.array([list(map(float, v)) for v in vecs]),
            "label": pa.array([i % 2 for i in range(30)], type=pa.int32()),
        }
    )
    # 4 and 17 share label parity (both even? 4%2=0, 17%2=1) -> force same bucket
    labels = [0] * 30
    t = t.set_column(2, "label", pa.array(labels, type=pa.int32()))
    out = dedup.embedding_near_dup(rd.from_arrow(t), threshold=0.98).to_pandas()
    got = set(zip(out.vec_a, out.vec_b))
    assert (4, 17) in got


def test_contamination_flags_planted():
    """A doc quoting a 16-char span of a benchmark doc is flagged with
    the exact positional hit count; clean docs are not."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from parallel_pagerank_ray.pipelines.dedup import contamination_flags

    bench_text = "the secret benchmark answer key sequence"
    docs = pd.DataFrame(
        {
            "doc_id": np.arange(4, dtype=np.int64),
            "text": [
                bench_text,                                   # the benchmark itself
                "prefix " + bench_text[5:27] + " suffix",     # quotes a span
                "completely unrelated wording here none",     # clean
                "xyz",                                        # shorter than k
            ],
        }
    )
    ds = rd.from_arrow(pa.Table.from_pandas(docs)).repartition(2)
    bench = ds.filter(expr="doc_id == 0")
    got = (
        contamination_flags(ds, bench, k=16)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert got["contaminated"].tolist() == [True, True, False, False]
    # doc 0 hits at every position; doc 1: 7 grams inside the quoted
    # 22-char span + 1 boundary gram ('enchmark answer ') whose
    # trailing space from " suffix" also matches the benchmark = 8
    assert got["n_hits"][0] == len(bench_text) - 16 + 1
    assert got["n_hits"][1] == 8
    assert got["n_hits"][2] == 0 and got["n_hits"][3] == 0


def test_dedup_keepers_clusters_and_isolated():
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from parallel_pagerank_ray.pipelines.dedup import dedup_keepers

    docs = pd.DataFrame(
        {"doc_id": np.arange(7, dtype=np.int64), "text": ["x"] * 7}
    )
    # clusters: {0,3,5} via chained pairs, {2,6}; isolated: 1, 4
    pairs = pd.DataFrame(
        {"doc_a": [0, 3, 2], "doc_b": [3, 5, 6]}, dtype=np.int64
    )
    got = (
        dedup_keepers(
            rd.from_arrow(pa.Table.from_pandas(docs)),
            rd.from_arrow(pa.Table.from_pandas(pairs)).repartition(2),
        )
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert got["doc_id"].tolist() == list(range(7))
    assert got["keeper"].tolist() == [0, 1, 2, 0, 4, 0, 2]


def test_pairs_within_groups_max_group():
    from parallel_pagerank_ray.stages.agg import pairs_within_groups

    # groups: key 1 -> 2 rows, key 2 -> 4 rows (hub), key 3 -> 3 rows
    keys = np.array([1, 1, 2, 2, 2, 2, 3, 3, 3], dtype=np.int64)
    vals = np.array([10, 11, 20, 21, 22, 23, 30, 31, 32], dtype=np.int64)
    a, b = pairs_within_groups((keys, vals), vals, max_group=3)
    got = set(zip(a.tolist(), b.tolist()))
    # the 4-row hub emits nothing; the <=3-row groups emit all pairs
    assert got == {(10, 11), (30, 31), (30, 32), (31, 32)}
    # no cap -> hub pairs included
    a2, b2 = pairs_within_groups((keys, vals), vals)
    assert len(a2) == 1 + 6 + 3


def _hub_docs(n_hub: int = 12, n_uniq: int = 6):
    """Corpus with one templated 'boilerplate' text shared by n_hub docs
    plus n_uniq unique docs."""
    rng = np.random.default_rng(11)
    words = BASE.split()
    texts = ["identical boilerplate license header text " * 3] * n_hub
    texts += [" ".join(rng.permutation(words)) for _ in range(n_uniq)]
    t = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), type=pa.int64()),
            "text": pa.array(texts),
        }
    )
    return rd.from_arrow(t)


def test_minhash_lsh_max_bucket_caps_hub():
    docs = _hub_docs()
    uncapped = dedup.minhash_lsh_candidates(docs, num_perm=32, bands=8).to_pandas()
    # the 12-doc hub forms 66 pairs without a cap
    assert len(uncapped) >= 66
    capped = dedup.minhash_lsh_candidates(
        docs, num_perm=32, bands=8, max_bucket=8
    ).to_pandas()
    # every hub bucket has 12 > 8 docs -> dropped
    assert capped.empty or (
        (capped["doc_a"] >= 12) | (capped["doc_b"] >= 12)
    ).all()
    over = dedup.lsh_bucket_overflow(
        docs, num_perm=32, bands=8, max_bucket=8
    ).to_pandas()
    assert len(over) == 8  # one overflowing bucket per band
    assert (over["size"] == 12).all()


def test_winnow_max_df_caps_hub_and_overflow():
    docs = _hub_docs()
    uncapped = dedup.winnow_candidates(docs, k=8, w=4, min_shared=1).to_pandas()
    assert len(uncapped[(uncapped.doc_a < 12) & (uncapped.doc_b < 12)]) == 66
    capped = dedup.winnow_candidates(
        docs, k=8, w=4, min_shared=1, max_df=8
    ).to_pandas()
    assert capped.empty or (
        (capped["doc_a"] >= 12) | (capped["doc_b"] >= 12)
    ).all()
    over = dedup.winnow_overflow(docs, k=8, w=4, max_df=8).to_pandas()
    assert len(over) > 0 and (over["df"] == 12).all()
    # a fingerprint df <= cap (unique docs) never appears in overflow
    assert (over["df"] > 8).all()


def test_assign_int_ids_dense_and_deterministic():
    from parallel_pagerank_ray.pipelines.graph_build import assign_int_ids

    ids = np.array([10**15 + 7, 3, 999, 10**15 + 7, 42, 3], dtype=np.int64)
    ds = rd.from_arrow(pa.table({"doc_id": pa.array(ids)})).repartition(3)
    got = assign_int_ids(ds).to_pandas().sort_values("doc_id")
    assert sorted(got["vid"].tolist()) == [0, 1, 2, 3]  # dense 0..N-1
    assert len(got) == 4
    # deterministic across runs / partitionings
    got2 = (
        assign_int_ids(ds.repartition(1)).to_pandas().sort_values("doc_id")
    )
    assert got["vid"].tolist() == got2["vid"].tolist()


def test_dedup_keepers_sparse_ids_and_join_fallback():
    """Sparse 64-bit doc_ids must not inflate the CC vectors or emit
    phantom rows; the hash-join fallback (broadcast_max=0 forces it)
    must produce identical results."""
    import pandas as pd

    from parallel_pagerank_ray.pipelines.dedup import dedup_keepers

    big = 10**15
    doc_ids = np.array([big, big + 5, 3, 7, big + 9], dtype=np.int64)
    docs = rd.from_arrow(
        pa.table({"doc_id": pa.array(doc_ids), "text": pa.array(["x"] * 5)})
    )
    # cluster {big, big+5, 3}; isolated: 7, big+9
    pairs = rd.from_arrow(
        pa.table(
            {
                "doc_a": pa.array([big, 3], type=pa.int64()),
                "doc_b": pa.array([big + 5, big], type=pa.int64()),
            }
        )
    ).repartition(2)
    want = {big: 3, big + 5: 3, 3: 3, 7: 7, big + 9: big + 9}
    for bmax in (5_000_000, 0):
        got = (
            dedup_keepers(docs, pairs, broadcast_max=bmax)
            .to_pandas()
            .sort_values("doc_id")
        )
        assert len(got) == 5  # exactly the docs, no phantom vids
        assert {int(d): int(k) for d, k in zip(got.doc_id, got.keeper)} == want


def test_dedup_keepers_empty_docs():
    from parallel_pagerank_ray.pipelines.dedup import dedup_keepers

    empty = rd.from_arrow(
        pa.table({"doc_id": pa.array([], type=pa.int64()), "text": pa.array([], type=pa.string())})
    )
    pairs = rd.from_arrow(
        pa.table({"doc_a": pa.array([], type=pa.int64()), "doc_b": pa.array([], type=pa.int64())})
    )
    out = dedup_keepers(empty, pairs)
    # Dataset-level schema must survive the empty corpus (to_pandas on
    # an all-empty Dataset drops columns — a Ray quirk, not ours)
    assert out.schema().names == ["doc_id", "keeper"]
    assert out.count() == 0


def test_contamination_flags_chunked_fallback_matches():
    """A tiny broadcast_max forces the hash-range-chunked path; results
    must equal the single-chunk broadcast path exactly."""
    import pandas as pd

    from parallel_pagerank_ray.pipelines.dedup import contamination_flags

    rng = np.random.default_rng(5)
    words = BASE.split()
    texts = [" ".join(rng.permutation(words)) for _ in range(12)]
    docs = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(12), type=pa.int64()),
                "text": pa.array(texts),
            }
        )
    ).repartition(3)
    bench = docs.filter(expr="doc_id <= 2")
    one = (
        contamination_flags(docs, bench, k=16)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    chunked = (
        contamination_flags(docs, bench, k=16, broadcast_max=7)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(one, chunked)
    assert bool(one["contaminated"][0]) is True  # bench doc flags itself


def test_dup_span_stats_brute_oracle(docs_ds):
    """dup_span_stats must equal the brute-force per-position rule:
    a k-window position is duplicated iff its hash occurs >= 2 times
    corpus-wide (the planted exact dups give whole-doc dup_frac 1.0)."""
    from collections import Counter

    from parallel_pagerank_ray.functions import hashing as H

    k = 12
    res = (
        dedup.dup_span_stats(docs_ds, k=k, num_buckets=8)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    docs = docs_ds.to_pandas().sort_values("doc_id")
    hashes = {
        int(d): H.shingle_hashes31(t, k)
        for d, t in zip(docs["doc_id"], docs["text"])
    }
    tot = Counter()
    for h in hashes.values():
        tot.update(h.tolist())
    for _, row in res.iterrows():
        h = hashes[int(row.doc_id)]
        assert row.n_windows == len(h)
        dup = sum(1 for x in h.tolist() if tot[x] >= 2)
        assert row.dup_windows == dup
        assert row.dup_frac == dup / len(h)
    # planted exact duplicates (0, 40, 41) are 100% duplicated mass
    full = res.set_index("doc_id")
    assert full.loc[0, "dup_frac"] == 1.0
    assert full.loc[40, "dup_frac"] == 1.0
    assert full.loc[41, "dup_frac"] == 1.0
    # permuted docs are not fully duplicated
    assert full.loc[5, "dup_frac"] < 1.0


def test_shingle_novelty_semantics():
    import pyarrow as pa
    import ray.data as rd

    from parallel_pagerank_ray.pipelines.dedup import shingle_novelty

    docs = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([0, 1, 2], pa.int64()),
                "text": pa.array(
                    [
                        "abcdefgh",          # all novel (first doc)
                        "abcdefgh",          # exact dup -> novelty 0
                        "abcdXYZW",          # shares the 'abcd…' prefix
                    ],
                    pa.string(),
                ),
            }
        )
    ).repartition(2)
    got = (
        shingle_novelty(docs, k=5)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    # 8-char text -> 4 windows of k=5
    assert got["n_shingles"].tolist() == [4, 4, 4]
    # doc2 windows: abcdX bcdXY cdXYZ dXYZW — none equal doc0's -> 4
    assert got["n_novel"].tolist() == [4, 0, 4]
    assert got.loc[0, "novelty"] == 1.0 and got.loc[1, "novelty"] == 0.0


def _naive_set_join(texts, k, tau_num, tau_den):
    """O(n^2) reference for set_similarity_join (word k-shingles)."""
    import re

    sets = []
    for t in texts:
        toks = re.findall(r"[A-Za-z0-9_]+", t.lower())
        sets.append(
            {" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)}
        )
    out = []
    for i in range(len(sets)):
        for j in range(i + 1, len(sets)):
            inter = len(sets[i] & sets[j])
            union = len(sets[i]) + len(sets[j]) - inter
            if union and inter * tau_den >= tau_num * union:
                out.append((i, j, inter, len(sets[i]), len(sets[j])))
    return sorted(out)


def _rows(ds):
    df = ds.to_pandas()
    return sorted(
        zip(
            df["doc_a"].astype(int),
            df["doc_b"].astype(int),
            df["inter"].astype(int),
            df["size_a"].astype(int),
            df["size_b"].astype(int),
        )
    )


def test_set_similarity_join_exact(docs_ds):
    """Prefix-filtered join == naive all-pairs (planted dups found)."""
    texts = docs_ds.to_pandas().sort_values("doc_id")["text"].tolist()
    exp = _naive_set_join(texts, 3, 1, 2)
    got = _rows(dedup.set_similarity_join(docs_ds, k=3, tau_num=1, tau_den=2))
    assert got == exp
    # the planted exact dups (0,40,41) and near-dup (1,42) must appear
    pairs = {(a, b) for a, b, *_ in got}
    assert (0, 40) in pairs and (0, 41) in pairs and (40, 41) in pairs
    assert (1, 42) in pairs


def test_set_similarity_join_path_parity(docs_ds):
    """Distributed tail (broadcast_max=0) == driver fast path."""
    fast = _rows(dedup.set_similarity_join(docs_ds, k=3, tau_num=7, tau_den=10))
    dist = _rows(
        dedup.set_similarity_join(
            docs_ds, k=3, tau_num=7, tau_den=10, broadcast_max=0
        )
    )
    assert fast == dist


def test_set_similarity_join_max_group_caps_hub():
    """A boilerplate shingle shared by every doc emits no pairs when its
    prefix group exceeds max_group; disjoint docs are unaffected."""
    boiler = "alpha beta gamma delta epsilon"
    texts = [f"{boiler} unique{i} tail{i} word{i} row{i} end{i}" for i in range(30)]
    ds = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(30), pa.int64()),
                "text": pa.array(texts),
            }
        )
    )
    uncapped = dedup.set_similarity_join(ds, k=5, tau_num=1, tau_den=12)
    capped = dedup.set_similarity_join(
        ds, k=5, tau_num=1, tau_den=12, max_group=5
    )
    # every pair shares exactly the boilerplate shingle; with the cap the
    # shared-prefix group (size 30) is dropped, so no candidates survive
    assert uncapped.count() == 30 * 29 // 2
    assert capped.count() == 0


def test_set_similarity_join_empty_and_tau_validation():
    ds = rd.from_arrow(
        pa.table(
            {"doc_id": pa.array([], pa.int64()), "text": pa.array([], pa.string())}
        )
    )
    assert dedup.set_similarity_join(ds).count() == 0
    with pytest.raises(ValueError):
        dedup.set_similarity_join(ds, tau_num=0)
    with pytest.raises(ValueError):
        dedup.set_similarity_join(ds, tau_num=3, tau_den=2)


def test_contrastive_pairs_structure(ray_session):
    import pandas as pd

    from parallel_pagerank_ray.pipelines.dedup import (
        contrastive_pairs,
        minhash_lsh_candidates,
    )

    # near-dup docs: pairs of nearly identical texts + unique fillers
    texts = []
    for i in range(8):
        base = f"the quick brown fox jumps over dog number {i} " * 4
        texts.append(base)
        texts.append(base + "tail")
    for i in range(30):
        texts.append(f"completely unique document {i} " * 5 + str(i * 7))
    docs = rd.from_pandas(
        pd.DataFrame(
            {
                "doc_id": np.arange(len(texts), dtype=np.int64),
                "text": texts,
            }
        )
    ).repartition(3)
    out = contrastive_pairs(docs).to_pandas()
    pos = out[out.label == 1]
    neg = out[out.label == 0]
    cand = minhash_lsh_candidates(docs).to_pandas()
    cand_set = {(a, b) for a, b in zip(cand.doc_a, cand.doc_b)}
    assert {(a, b) for a, b in zip(pos.doc_a, pos.doc_b)} == cand_set
    assert len(pos) > 0
    # negatives: canonical, non-self, verified NOT candidates, bounded
    assert len(neg) <= 2 * len(pos)
    assert (neg.doc_a < neg.doc_b).all()
    assert not any(
        (a, b) in cand_set for a, b in zip(neg.doc_a, neg.doc_b)
    )
    # determinism across partitionings
    out2 = contrastive_pairs(docs.repartition(7)).to_pandas()
    key = lambda df: sorted(map(tuple, df[["doc_a", "doc_b", "label"]].to_numpy()))  # noqa: E731
    assert key(out) == key(out2)


def test_paragraph_dedup_matches_bruteforce(ray_session):
    """paragraph_dedup == first-occurrence-wins brute force, including
    a doc stripped to the empty string; broadcast and join-fallback
    paths agree (forced via broadcast_max=0)."""
    import pandas as pd
    import ray.data as rd

    from parallel_pagerank_ray.pipelines.dedup import paragraph_dedup

    docs = [
        (0, "boiler\nalpha\nbeta"),
        (1, "boiler\ngamma\nalpha"),
        (2, "boiler"),          # strips to ''
        (3, "delta\nboiler\ndelta"),
        (4, "epsilon"),
    ]
    seen: set[str] = set()
    want = {}
    for did, text in docs:
        kept = []
        for p in text.split("\n"):
            if p not in seen:
                seen.add(p)
                kept.append(p)
        want[did] = "\n".join(kept)
    ds = rd.from_items(
        [{"doc_id": d, "text": t} for d, t in docs]
    ).repartition(3)
    for kw in ({}, {"broadcast_max": 0}):
        got = (
            paragraph_dedup(ds, **kw)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        assert dict(zip(got["doc_id"], got["text"])) == want
