"""BPE tokenizer training (functions/bpe.py) vs a sequential oracle."""

import numpy as np
import ray.data as rd

from parallel_pagerank_ray.functions.bpe import _merge_word, bpe_train


def _brute_bpe(texts, num_merges):
    """Sequential reference: dict-of-words BPE trainer with the same
    semantics (all adjacent pairs counted, max-count / lexicographic
    tie-break, greedy leftmost non-overlapping merge)."""
    import re
    from collections import Counter

    wc = Counter()
    for t in texts:
        wc.update(re.findall(r"[a-z]+", t.lower()))
    vocab = {tuple(w): c for w, c in wc.items()}
    merges = []
    for rank in range(1, num_merges + 1):
        pc = Counter()
        for toks, c in vocab.items():
            for i in range(len(toks) - 1):
                pc[(toks[i], toks[i + 1])] += c
        if not pc:
            break
        best = min(pc.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        (l, r), c = best
        merges.append((rank, l, r, c))
        vocab = {
            tuple(_merge_word(list(toks), l, r)): cnt
            for toks, cnt in vocab.items()
        }
    return merges


def test_merge_word_run_semantics():
    # greedy leftmost non-overlapping: classic BPE run behavior
    assert _merge_word(list("aaaa"), "a", "a") == ["aa", "aa"]
    assert _merge_word(list("aaa"), "a", "a") == ["aa", "a"]
    assert _merge_word(["x", "a", "a", "a"], "a", "a") == ["x", "aa", "a"]
    assert _merge_word(["ab", "c", "ab"], "ab", "c") == ["abc", "ab"]
    assert _merge_word(list("abc"), "z", "q") == ["a", "b", "c"]


def test_bpe_train_matches_sequential_reference():
    texts = [
        "the cat sat on the mat",
        "the bat and the rat chat",
        "batch batch batch stream stream",
        "aaaa aaa aa banana bandana",
    ] * 3
    docs = rd.from_items([{"text": t} for t in texts])
    got = (
        bpe_train(docs, 6)
        .to_pandas()
        .sort_values("rank")[["rank", "left", "right", "pair_cnt"]]
        .itertuples(index=False)
    )
    got = [tuple(x) for x in got]
    want = _brute_bpe(texts, 6)
    assert got == want


def test_bpe_train_early_stop_and_empty():
    # single-character words: no pairs anywhere -> 0 merges, stable schema
    docs = rd.from_items([{"text": "a b c d e"}])
    out = bpe_train(docs, 4)
    assert out.count() == 0
    assert set(out.schema().names) == {"rank", "left", "right", "pair_cnt"}
    # vocabulary exhausts mid-run: 'ab ab' fully merges after 1 round
    docs2 = rd.from_items([{"text": "ab ab ab"}])
    m = bpe_train(docs2, 5).to_pandas()
    assert list(m["rank"]) == [1]
    assert (m["left"][0], m["right"][0], m["pair_cnt"][0]) == ("a", "b", 3)


def test_bpe_train_partition_invariant_distributed_path():
    """vocab_driver_max=0 forces the distributed merge loop; results
    must equal the sequential reference (and thus the driver-local
    fast path) at any block count."""
    rng = np.random.default_rng(3)
    words = ["alpha", "beta", "gamma", "delta", "aaa", "abab", "banana"]
    texts = [
        " ".join(rng.choice(words, size=rng.integers(3, 12)))
        for _ in range(40)
    ]
    want = _brute_bpe(texts, 5)
    for nblocks in (1, 4):
        docs = rd.from_items([{"text": t} for t in texts]).repartition(
            nblocks
        )
        got = [
            tuple(x)
            for x in bpe_train(docs, 5, vocab_driver_max=0)
            .to_pandas()
            .sort_values("rank")[["rank", "left", "right", "pair_cnt"]]
            .itertuples(index=False)
        ]
        assert got == want, nblocks


def test_bpe_token_counts_paths_agree():
    from parallel_pagerank_ray.functions.bpe import bpe_token_counts

    texts = ["the cat sat", "batch batch stream", "aaaa aaa the the"] * 2
    docs = rd.from_items([{"text": t} for t in texts])
    fast = (
        bpe_token_counts(docs, 4)
        .to_pandas()
        .sort_values("token")
        .reset_index(drop=True)
    )
    dist = (
        bpe_token_counts(docs, 4, vocab_driver_max=0)
        .to_pandas()
        .sort_values("token")
        .reset_index(drop=True)
    )
    assert fast.equals(dist)
    # spot-check one known token: 'the' occurs 6 times in the corpus
    # and must either be fully merged into one token or remain split
    # consistently
    assert int(fast.loc[fast["token"] == "the", "cnt"].sum()) in (0, 6)
