"""Property-based checks (hypothesis) for the vectorized kernels: the
numpy fast paths must equal brute-force Python references on arbitrary
inputs — these kernels underpin the SQL-value-checked sketches, so a
silent vectorization bug would surface as a gate mismatch much later.

No Ray needed: pure numpy/python.
"""

from __future__ import annotations

import hashlib

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from parallel_pagerank_ray.functions import hashing as H
from parallel_pagerank_ray.stages.agg import pairs_within_groups

TEXTS = st.text(
    alphabet=st.characters(min_codepoint=32, max_codepoint=0x2FF), max_size=64
)


@settings(max_examples=60, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(0, 5), st.integers(0, 3), st.integers(-100, 100)
        ),
        max_size=40,
    )
)
def test_pairs_within_groups_matches_bruteforce(rows):
    g1 = np.array([r[0] for r in rows], dtype=np.int64)
    g2 = np.array([r[1] for r in rows], dtype=np.int64)
    vals = np.array([r[2] for r in rows], dtype=np.int64)
    a, b = pairs_within_groups((g1, g2, vals), vals)
    got = sorted(zip(a.tolist(), b.tolist()))
    # brute force: all i<j pairs (in (g1,g2,val)-sorted order) per group
    order = sorted(range(len(rows)), key=lambda i: (g1[i], g2[i], vals[i]))
    exp = []
    for x in range(len(order)):
        for y in range(x + 1, len(order)):
            i, j = order[x], order[y]
            if g1[i] == g1[j] and g2[i] == g2[j]:
                exp.append((int(vals[i]), int(vals[j])))
    assert got == sorted(exp)


def _shingle_ref(text: str, k: int) -> list[int]:
    codes = [ord(c) for c in text]
    if len(codes) < k:
        codes = codes + [0] * (k - len(codes))
    p, r = int(H.P31), int(H.SHINGLE_R)
    out = []
    for i in range(len(codes) - k + 1):
        h = 0
        for c in codes[i : i + k]:
            h = (h * r + c) % p
        out.append(h)
    return out


@settings(max_examples=80, deadline=None)
@given(TEXTS)
def test_shingle_hashes31_matches_reference(text):
    got = H.shingle_hashes31(text, 5).tolist()
    assert got == _shingle_ref(text, 5)


@settings(max_examples=40, deadline=None)
@given(st.lists(TEXTS, max_size=12))
def test_minhash_signatures31_match_per_doc(texts):
    a, b = H.minhash_params31(16)
    hl = [H.shingle_hashes31(t, 5) for t in texts]
    sig = H.minhash_signatures31(hl, a, b)
    p = int(H.P31)
    for d, hs in enumerate(hl):
        for j in range(16):
            want = min((int(x) * int(a[j]) + int(b[j])) % p for x in hs)
            assert int(sig[d, j]) == want


@settings(max_examples=40, deadline=None)
@given(
    st.lists(
        st.lists(st.text(alphabet="abcXYZ019_", min_size=1, max_size=6), max_size=8),
        max_size=6,
    )
)
def test_simhash_batch_matches_per_doc(token_lists):
    fp = H.simhash_batch(token_lists)
    for d, toks in enumerate(token_lists):
        if not toks:
            assert fp[d] == 0
            continue
        votes = [0] * 64
        for t in toks:
            h = int.from_bytes(
                hashlib.md5(t.encode("utf-8")).digest()[:8], "big"
            )
            for bit in range(64):
                votes[bit] += 1 if (h >> bit) & 1 else -1
        want = sum(1 << bit for bit in range(64) if votes[bit] > 0)
        assert int(fp[d]) == want


@settings(max_examples=40, deadline=None)
@given(
    st.lists(st.tuples(st.integers(0, 30), st.integers(0, 30)), max_size=80),
    st.integers(1, 6),
)
def test_kcore_oracle_is_peeling_fixpoint(pairs, k):
    """oracle.kcore must be the synchronous-peeling fixpoint: every
    member has >= k alive neighbors, and no removed vertex does when
    added back alone (maximality of the k-core)."""
    from parallel_pagerank_ray import oracle

    e = np.array([p for p in pairs if p[0] != p[1]], dtype=np.int64).reshape(-1, 2)
    n = 31
    alive = oracle.kcore(n, e, k)
    und = set()
    for u, v in e:
        und.add((min(u, v), max(u, v)))
    adj = {i: set() for i in range(n)}
    for u, v in und:
        adj[u].add(v)
        adj[v].add(u)
    members = set(np.nonzero(alive)[0].tolist())
    for v in members:
        assert len(adj[v] & members) >= k
    for v in set(range(n)) - members:
        assert len(adj[v] & members) < k  # maximality


@settings(max_examples=40, deadline=None)
@given(
    st.lists(st.tuples(st.integers(0, 25), st.integers(0, 25)), max_size=60),
    st.lists(st.integers(0, 25), min_size=1, max_size=4),
    st.booleans(),
)
def test_bfs_oracle_triangle_inequality(pairs, sources, directed):
    """dist obeys: sources at 0; every edge (u,v) with dist[u] >= 0 has
    dist[v] <= dist[u] + 1; every reached non-source vertex has an
    in-neighbor exactly one closer."""
    from parallel_pagerank_ray import oracle

    e = np.array([p for p in pairs if p[0] != p[1]], dtype=np.int64).reshape(-1, 2)
    n = 26
    dist = oracle.bfs_distances(n, e, sources, directed=directed)
    for s in sources:
        assert dist[s] == 0
    fwd = [tuple(r) for r in e]
    arcs = fwd if directed else fwd + [(v, u) for u, v in fwd]
    for u, v in arcs:
        if dist[u] >= 0:
            assert 0 <= dist[v] <= dist[u] + 1
    preds = {v: set() for v in range(n)}
    for u, v in arcs:
        preds[v].add(u)
    for v in range(n):
        if dist[v] > 0:
            assert any(dist[u] == dist[v] - 1 for u in preds[v])


@settings(max_examples=30, deadline=None)
@given(
    st.lists(st.integers(0, 10_000), min_size=1, max_size=300),
    st.sampled_from([0.125, 0.25, 0.5, 0.75, 0.875, 1.0]),
)
def test_quantile_rule_matches_duckdb(vals, q):
    """The ceil(q*n)-1 index rule used by stages.agg.exact_quantiles
    equals DuckDB quantile_disc on arbitrary integer multisets."""
    import math

    import duckdb

    con = duckdb.connect()
    con.execute("CREATE TABLE t AS SELECT unnest(?) AS x", [vals])
    want = con.execute(f"SELECT quantile_disc(x, {q}) FROM t").fetchone()[0]
    s = sorted(vals)
    got = s[max(0, math.ceil(q * len(s)) - 1)]
    assert got == want


# ---------------------------------------------------------------------------
# round-2-close kernels: chunking window rule, bloom positions/packing,
# walk-hash SQL-arithmetic identity
# ---------------------------------------------------------------------------


@settings(max_examples=60, deadline=None)
@given(TEXTS, st.integers(1, 20), st.integers(0, 19))
def test_chunk_windows_cover_and_reassemble(text, size, overlap):
    import pyarrow as pa

    from parallel_pagerank_ray.functions.chunking import ChunkDocuments

    if overlap >= size:
        overlap = size - 1
    t = pa.table({"doc_id": [0], "text": [text]})
    out = ChunkDocuments(size=size, overlap=overlap)(t)
    chunks = out.column("chunk").to_pylist()
    stride = size - overlap
    if not text:
        assert chunks == []
        return
    # window rule: chunk k == text[k*stride : k*stride+size], count exact
    assert len(chunks) == -(-len(text) // stride)
    for k, c in enumerate(chunks):
        assert c == text[k * stride : k * stride + size]
    # overlap-stripped reassembly reproduces the original text
    stitched = chunks[0] + "".join(c[overlap:] for c in chunks[1:])
    assert stitched == text


@settings(max_examples=40, deadline=None)
@given(
    st.lists(TEXTS, min_size=0, max_size=25, unique=True),
    st.lists(TEXTS, min_size=0, max_size=25),
    st.sampled_from([16, 64, 257, 1 << 14]),
)
def test_bloom_positions_never_false_negative(corpus, probes, m):
    from parallel_pagerank_ray.functions.bloom import bit_positions
    from parallel_pagerank_ray.functions.hashing import md5_u64

    ck = np.array([md5_u64(t) for t in corpus], dtype=np.uint64)
    pk = np.array([md5_u64(t) for t in probes], dtype=np.uint64)
    bits = np.zeros(m, dtype=bool)
    if len(ck):
        bits[bit_positions(ck, m).astype(np.int64)] = True
    packed = np.packbits(bits, bitorder="little")
    member = set(corpus)
    for t, key in zip(probes, pk):
        pos = bit_positions(np.array([key], dtype=np.uint64), m)[0].astype(
            np.int64
        )
        hit_bool = bool(bits[pos].all())
        hit_packed = bool((((packed[pos >> 3] >> (pos & 7).astype(np.uint8)) & 1) == 1).all())
        assert hit_bool == hit_packed  # packing is lossless
        if t in member:
            assert hit_bool  # no false negatives, ever


@settings(max_examples=60, deadline=None)
@given(
    st.integers(0, 10**12),
    st.integers(0, 63),
    st.integers(1, 50),
    st.integers(0, 10**12),
)
def test_walk_hash_matches_pure_int_chain(seed, widx, step, vid):
    from parallel_pagerank_ray.pipelines.random_walk import salt64, walk_hash

    p = (1 << 31) - 1
    s64 = salt64("rw")
    got = int(
        walk_hash(
            s64,
            np.array([seed], dtype=np.int64),
            np.array([widx], dtype=np.int64),
            step,
            np.array([vid], dtype=np.int64),
        )[0]
    )
    # the SQL oracle's expression, pure ints
    x = (seed % p) * 1000151 % p
    x = (x + widx * 31 + step) % p
    x = x * 1000121 % p
    x = (x + vid % p) % p
    x = (x + s64) % p
    assert got == (x * x + x) % p


def test_winnow_select_matches_naive_reference():
    """winnow_select == the literal SIGMOD'03 rule (window min,
    rightmost tie, distinct selections) on tie-heavy random inputs,
    including empty and shorter-than-window sequences."""
    import numpy as np

    from parallel_pagerank_ray.functions.hashing import winnow_select

    def ref(h, w):
        n = len(h)
        if n == 0:
            return []
        ww = min(w, n)
        seen = {}
        for i in range(n - ww + 1):
            win = h[i : i + ww]
            m = win.min()
            pos = i + max(j for j in range(ww) if win[j] == m)
            seen[pos] = h[pos]
        return sorted(seen.items())

    rng = np.random.default_rng(0)
    for _ in range(300):
        n = int(rng.integers(0, 40))
        h = rng.integers(0, 8, size=n).astype(np.uint64)  # dense ties
        p, f = winnow_select(h, 4)
        assert list(zip(p.tolist(), f.tolist())) == ref(h, 4)


def test_winnow_coverage_guarantee():
    """Every window of w consecutive k-gram hashes contains a selected
    position — the winnowing guarantee that any sufficiently long
    shared substring yields a shared fingerprint."""
    import numpy as np

    from parallel_pagerank_ray.functions.hashing import winnow_select

    rng = np.random.default_rng(1)
    for _ in range(50):
        n = int(rng.integers(8, 200))
        w = int(rng.integers(2, 9))
        h = rng.integers(0, 1 << 31, size=n).astype(np.uint64)
        pos, _ = winnow_select(h, w)
        ps = set(pos.tolist())
        for i in range(n - w + 1):
            assert any(j in ps for j in range(i, i + w)), (i, w)


def _brute_lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i] + [0] * len(b)
        for j, cb in enumerate(b, 1):
            cur[j] = min(
                prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)
            )
        prev = cur
    return prev[-1]


ASCII_WORD = st.text(
    alphabet=st.characters(min_codepoint=33, max_codepoint=126),
    min_size=0,
    max_size=12,
)


@settings(max_examples=300, deadline=None)
@given(st.lists(st.tuples(ASCII_WORD, ASCII_WORD), min_size=1, max_size=20))
def test_lev_band2_matches_brute_dp(pairs):
    """The vectorized 5-band Levenshtein<=2 kernel agrees with the full
    DP on arbitrary ascii pairs, per (len, len) class — including
    transpositions, double indels, and the empty string."""
    from parallel_pagerank_ray.pipelines.fuzzy import (
        _lev_band2,
        _pack_matrix,
    )

    s1 = np.array([a for a, _ in pairs], dtype=object)
    s2 = np.array([b for _, b in pairs], dtype=object)
    for la, lb in {(len(a), len(b)) for a, b in pairs}:
        if abs(la - lb) > 2:
            continue
        idx = [
            i
            for i, (a, b) in enumerate(pairs)
            if len(a) == la and len(b) == lb
        ]
        got = _lev_band2(
            _pack_matrix(s1[idx], la), _pack_matrix(s2[idx], lb)
        )
        want = np.array(
            [_brute_lev(s1[i], s2[i]) <= 2 for i in idx]
        )
        assert np.array_equal(got, want)


@settings(max_examples=100, deadline=None)
@given(
    st.integers(2, 40),
    st.lists(st.tuples(st.integers(0, 39), st.integers(0, 39)), max_size=120),
    st.integers(0, 2**31 - 1),
)
def test_scc_local_matches_kosaraju(n, edges, seed):
    """_scc_local (color/sweep) == the Kosaraju oracle on arbitrary
    digraphs including self loops and duplicates."""
    from parallel_pagerank_ray import oracle
    from parallel_pagerank_ray.pipelines.scc import _scc_local

    e = np.array(
        [(a % n, b % n) for a, b in edges], dtype=np.int64
    ).reshape(-1, 2)
    got, _ = _scc_local(
        e[:, 0] if len(e) else np.array([], dtype=np.int64),
        e[:, 1] if len(e) else np.array([], dtype=np.int64),
        n,
        max_outer=100_000,
    )
    want = oracle.strongly_connected_components(n, e)
    assert np.array_equal(got, want)


@settings(max_examples=100, deadline=None)
@given(
    st.integers(1, 40),
    st.lists(st.tuples(st.integers(0, 39), st.integers(0, 39)), max_size=120),
)
def test_cc_min_label_matches_oracle(n, edges):
    """_cc_min_label (min propagation + pointer jumping) == the
    union-find oracle on arbitrary undirected graphs."""
    from parallel_pagerank_ray import oracle
    from parallel_pagerank_ray.pipelines.biconnectivity import _cc_min_label

    e = np.array(
        [(a % n, b % n) for a, b in edges], dtype=np.int64
    ).reshape(-1, 2)
    got = _cc_min_label(
        e[:, 0] if len(e) else np.array([], dtype=np.int64),
        e[:, 1] if len(e) else np.array([], dtype=np.int64),
        n,
    )
    want = oracle.connected_components(n, e)
    assert np.array_equal(got, want)
