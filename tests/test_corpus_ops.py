"""token_counts / kmv_distinct / exact_quantiles vs direct computation."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd


def _docs(texts):
    return rd.from_arrow(
        pa.table(
            {"doc_id": pa.array(range(len(texts)), pa.int64()), "text": texts}
        )
    ).repartition(3)


def test_token_counts_exact():
    import re

    from parallel_pagerank_ray.functions.textstats import TOKEN_RE, token_counts

    texts = [
        "The cat sat on the mat",
        "the DOG and the cat",
        "punctuation, only! tokens_1 and 42",
        "",
    ]
    out = token_counts(_docs(texts)).to_pandas()
    got = dict(zip(out["token"], out["cnt"]))
    want: dict[str, int] = {}
    for t in texts:
        for tok in re.findall(TOKEN_RE, t.lower()):
            want[tok] = want.get(tok, 0) + 1
    assert got == want
    assert got["the"] == 4 and got["cat"] == 2 and got["42"] == 1


def test_kmv_distinct_exact_below_k():
    from parallel_pagerank_ray.functions.sketch import kmv_distinct

    ds = rd.from_pandas(
        pd.DataFrame({"v": [str(i % 37) for i in range(500)]})
    ).repartition(4)
    row = kmv_distinct(ds, "v", k=512).to_pandas().iloc[0]
    assert row["n_kept"] == 37
    assert row["n_distinct_est"] == 37.0


def test_kmv_distinct_estimates():
    import hashlib

    from parallel_pagerank_ray.functions.sketch import kmv_distinct

    n = 20_000
    ds = rd.from_pandas(pd.DataFrame({"v": np.arange(n)})).repartition(8)
    k = 256
    row = kmv_distinct(ds, "v", k=k).to_pandas().iloc[0]
    # reference computation, single process
    hs = sorted(
        int.from_bytes(hashlib.md5(str(i).encode()).digest()[:8], "big") >> 1
        for i in range(n)
    )
    kth = hs[k - 1]
    assert row["kth_min"] == kth
    assert row["n_distinct_est"] == (k - 1) * float(2**63) / float(kth)
    # a k=256 KMV is within ~13% relative error w.h.p.
    assert abs(row["n_distinct_est"] - n) / n < 0.2


def test_kmv_partitioning_invariant():
    from parallel_pagerank_ray.functions.sketch import kmv_distinct

    vals = pd.DataFrame({"v": [f"u{i}" for i in range(3000)]})
    rows = [
        kmv_distinct(rd.from_pandas(vals).repartition(p), "v", k=64)
        .to_pandas()
        .iloc[0]
        for p in (1, 7)
    ]
    assert rows[0]["kth_min"] == rows[1]["kth_min"]
    assert rows[0]["n_distinct_est"] == rows[1]["n_distinct_est"]


def test_exact_quantiles_matches_duckdb():
    import duckdb

    from parallel_pagerank_ray.stages.agg import exact_quantiles

    rng = np.random.default_rng(4)
    vals = rng.integers(0, 5000, size=9973).astype(np.int64)
    qs = [0.125, 0.25, 0.5, 0.75, 0.875, 1.0]
    ds = rd.from_pandas(pd.DataFrame({"x": vals})).repartition(5)
    out = exact_quantiles(ds, "x", qs).to_pandas().sort_values("q")
    con = duckdb.connect()
    con.execute("CREATE TABLE t AS SELECT unnest(?) AS x", [vals.tolist()])
    for q, v in zip(out["q"], out["value"]):
        want = con.execute(f"SELECT quantile_disc(x, {q}) FROM t").fetchone()[0]
        assert v == want, q


def test_exact_quantiles_duplicates_and_small():
    from parallel_pagerank_ray.stages.agg import exact_quantiles

    ds = rd.from_pandas(pd.DataFrame({"x": [7, 7, 7, 1]})).repartition(2)
    out = exact_quantiles(ds, "x", [0.25, 0.5, 1.0]).to_pandas()
    assert dict(zip(out["q"], out["value"])) == {0.25: 1, 0.5: 7, 1.0: 7}


def test_repetition_stats_exact():
    from parallel_pagerank_ray.functions.textstats import RepetitionStats

    texts = [
        "a b a b\nx\nx\nx",        # dup lines + repeated 2-grams
        "hello world",              # trivial
        "",                         # empty
        "same\nsame\nsame\nother",  # heavy line dup
    ]
    out = (
        _docs(texts)
        .map_batches(RepetitionStats(), batch_format="pandas")
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert out["n_lines"].tolist() == [4, 1, 1, 4]
    assert out["n_dup_lines"].tolist() == [2, 0, 0, 2]
    assert out["dup_line_chars"].tolist() == [2, 0, 0, 8]
    assert out["total_line_chars"].tolist() == [10, 11, 0, 17]
    assert out["n_2grams"].tolist() == [6, 1, 0, 3]
    assert out["top_2gram_count"].tolist() == [2, 1, 0, 2]


# ---------------------------------------------------------------------------
# sliding-window chunking
# ---------------------------------------------------------------------------


def test_chunk_documents_window_rule():
    import pyarrow as pa

    from parallel_pagerank_ray.functions.chunking import ChunkDocuments

    t = pa.table({"doc_id": [1, 2, 3], "text": ["abcdefghij", "xy", ""]})
    out = ChunkDocuments(size=8, overlap=4)(t)
    rows = list(
        zip(
            out.column("doc_id").to_pylist(),
            out.column("chunk_id").to_pylist(),
            out.column("chunk").to_pylist(),
        )
    )
    # stride 4: ceil(10/4)=3 windows; empty doc emits nothing
    assert rows == [
        (1, 0, "abcdefgh"),
        (1, 1, "efghij"),
        (1, 2, "ij"),
        (2, 0, "xy"),
    ]


def test_chunk_documents_unicode_codepoints():
    import pyarrow as pa

    from parallel_pagerank_ray.functions.chunking import ChunkDocuments

    text = "héllo wörld ünïcode"  # multibyte codepoints
    t = pa.table({"doc_id": [0], "text": [text]})
    out = ChunkDocuments(size=6, overlap=2)(t)
    chunks = out.column("chunk").to_pylist()
    assert chunks[0] == text[:6] and chunks[1] == text[4:10]
    # every codepoint position appears at least once, in order
    stitched = chunks[0] + "".join(c[2:] for c in chunks[1:])
    assert stitched.startswith(text[: len(stitched)])


def test_chunk_documents_validation():
    import pytest

    from parallel_pagerank_ray.functions.chunking import ChunkDocuments

    with pytest.raises(ValueError):
        ChunkDocuments(size=0)
    with pytest.raises(ValueError):
        ChunkDocuments(size=4, overlap=4)


def test_chunk_documents_distributed_matches_single():
    from parallel_pagerank_ray.functions.chunking import ChunkDocuments

    docs = rd.read_parquet(
        "/root/testdata/sf0.001/documents.parquet", columns=["doc_id", "text"]
    )
    got = (
        docs.repartition(5)
        .map_batches(ChunkDocuments(size=120, overlap=20), batch_format="pyarrow")
        .to_pandas()
        .sort_values(["doc_id", "chunk_id"])
        .reset_index(drop=True)
    )
    import pandas as pd

    raw = docs.to_pandas()
    rows = []
    for i, t in zip(raw["doc_id"], raw["text"]):
        k = 0
        while k * 100 < len(t):
            rows.append((i, k, t[k * 100 : k * 100 + 120]))
            k += 1
    want = (
        pd.DataFrame(rows, columns=["doc_id", "chunk_id", "chunk"])
        .sort_values(["doc_id", "chunk_id"])
        .reset_index(drop=True)
    )
    assert got.astype({"chunk_id": "int64"}).equals(want.astype({"chunk_id": "int64"}))


def test_inverted_postings_exact():
    import re

    from parallel_pagerank_ray.functions.textstats import (
        TOKEN_RE,
        inverted_postings,
    )

    texts = [
        "the cat sat on the the mat",
        "a dog and the cat",
        "tokens_1 tokens_1 and 42",
        "",
    ]
    vocab = ["the", "cat", "tokens_1", "absent"]
    out = (
        inverted_postings(_docs(texts), vocab)
        .to_pandas()
        .sort_values(["token", "doc_id"])
        .reset_index(drop=True)
    )
    want = {}
    for i, t in enumerate(texts):
        for tok in re.findall(TOKEN_RE, t.lower()):
            if tok in vocab:
                want[(tok, i)] = want.get((tok, i), 0) + 1
    got = {
        (r["token"], r["doc_id"]): r["tf"] for _, r in out.iterrows()
    }
    assert got == want
    assert "absent" not in set(out["token"])


def test_tfidf_search_matches_pandas_reference():
    import re

    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from parallel_pagerank_ray.functions.textstats import tfidf_search

    docs = pd.DataFrame(
        {
            "doc_id": np.arange(6, dtype=np.int64),
            "text": [
                "hash join hash join stream",
                "window sort window",
                "the quick brown fox",          # no query tokens
                "hash",
                "stream stream stream sort",
                "join window hash sort stream",
            ],
        }
    )
    got = tfidf_search(
        rd.from_arrow(pa.Table.from_pandas(docs)).repartition(3),
        ["hash", "join", "stream", "window", "sort"],
        k=4,
    ).to_pandas()

    # literal integer-idf reference
    tok = re.compile(r"[A-Za-z0-9_]+")
    q = {"hash", "join", "stream", "window", "sort"}
    tf: dict = {}
    for d, t in zip(docs["doc_id"], docs["text"]):
        for w in tok.findall(t.lower()):
            if w in q:
                tf[(d, w)] = tf.get((d, w), 0) + 1
    df: dict = {}
    for (_, w) in tf:
        df[w] = df.get(w, 0) + 1
    score: dict = {}
    for (d, w), c in tf.items():
        score[d] = score.get(d, 0) + c * (1_000_000 // df[w])
    want = sorted(score.items(), key=lambda kv: (-kv[1], kv[0]))[:4]
    assert got["doc_id"].tolist() == [d for d, _ in want]
    assert got["score"].tolist() == [s for _, s in want]
    assert got["pos"].tolist() == [1, 2, 3, 4]


def test_pii_scan_and_redact():
    """Planted-example PII: counts per category and byte-exact
    redaction with the fixed email->ipv4->phone rule order."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from parallel_pagerank_ray.functions.pii import pii_redact, pii_scan

    docs = pd.DataFrame(
        {
            "doc_id": np.arange(5, dtype=np.int64),
            "text": [
                "reach me at alice.b-c+x@sub.example.org today",
                "server 192.168.1.254 and 10.0.0.1 are up",
                "call 555-123-4567 or 555.987.6543 now",
                "clean document with no contact data",
                "bob@x.io pinged 8.8.8.8 then dialed 111-222-3333",
            ],
        }
    )
    ds = rd.from_arrow(pa.Table.from_pandas(docs)).repartition(2)
    got = pii_scan(ds).to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert got["n_emails"].tolist() == [1, 0, 0, 0, 1]
    assert got["n_ipv4"].tolist() == [0, 2, 0, 0, 1]
    assert got["n_phones"].tolist() == [0, 0, 2, 0, 1]
    assert got["has_pii"].tolist() == [True, True, True, False, True]

    red = (
        pii_redact(ds).to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    assert red["text"][0] == "reach me at <EMAIL> today"
    assert red["text"][1] == "server <IPV4> and <IPV4> are up"
    assert red["text"][2] == "call <PHONE> or <PHONE> now"
    assert red["text"][3] == "clean document with no contact data"
    assert red["text"][4] == "<EMAIL> pinged <IPV4> then dialed <PHONE>"


def test_bigram_counts_planted():
    """Bigrams never cross document boundaries; counts are exact."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from parallel_pagerank_ray.functions.textstats import bigram_counts

    docs = pd.DataFrame(
        {
            "doc_id": np.arange(4, dtype=np.int64),
            "text": [
                "the cat sat",        # the cat / cat sat
                "the cat",            # the cat
                "sat",                # no bigram (1 token)
                "CAT sat the cat",    # cat sat / sat the / the cat (lowered)
            ],
        }
    )
    ds = rd.from_arrow(pa.Table.from_pandas(docs)).repartition(2)
    got = bigram_counts(ds).to_pandas().set_index("bigram")["cnt"].to_dict()
    assert got == {"the cat": 3, "cat sat": 2, "sat the": 1}


def test_pack_docs_laws_and_invariance():
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from parallel_pagerank_ray.functions.chunking import pack_docs

    rng = np.random.default_rng(9)
    n = 300
    df = pd.DataFrame(
        {
            "doc_id": np.arange(n, dtype=np.int64),
            "source": np.array([f"s{i}" for i in rng.integers(0, 7, n)]),
            "n_chars": rng.integers(10, 900, n).astype(np.int64),
        }
    )
    budget = 1000
    got = (
        pack_docs(rd.from_pandas(df), budget=budget)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert len(got) == n
    merged = got.merge(df, on=["doc_id", "source"])
    for (_, b), g in merged.groupby(["source", "bin_id"]):
        # a bin is within budget unless it is a single oversized doc
        assert g["n_chars"].sum() <= budget or len(g) == 1
    # greedy rule: within a source, bin ids are nondecreasing in doc_id
    for _, g in merged.sort_values("doc_id").groupby("source"):
        b = g["bin_id"].to_numpy()
        assert (np.diff(b) >= 0).all()
        assert b[0] == 0
        # first-fit: the first doc of bin k+1 did NOT fit into bin k
        lens = g["n_chars"].to_numpy()
        for k in range(b.max()):
            in_k = lens[b == k].sum()
            first_next = lens[b == k + 1][0]
            assert in_k + first_next > budget
    # partition invariance
    again = (
        pack_docs(rd.from_pandas(df).repartition(9), budget=budget)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert got.equals(again)


def test_balance_sources_flattens_skew():
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from parallel_pagerank_ray.functions.sampling import balance_sources

    df = pd.DataFrame(
        {
            "doc_id": np.arange(1000, dtype=np.int64),
            "source": np.array(
                ["big"] * 800 + ["mid"] * 150 + ["small"] * 50
            ),
        }
    )
    got = balance_sources(rd.from_pandas(df)).to_pandas()
    by = got.groupby("source").size()
    # every group lands near the smallest group's size (md5 is uniform;
    # floor-percent rates undershoot slightly, never overshoot by much)
    assert by["small"] <= 50
    for s in ("big", "mid"):
        assert by[s] <= 62  # 50 * 1.25 slack for hash variance
        assert by[s] >= 30
    # determinism: same input -> identical kept set
    again = balance_sources(rd.from_pandas(df).repartition(6)).to_pandas()
    assert sorted(got["doc_id"]) == sorted(again["doc_id"])


def test_balance_sources_integer_group_col():
    # the cluster_balanced_sample composition groups by an int64
    # cluster label instead of a string source
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from parallel_pagerank_ray.functions.sampling import balance_sources

    df = pd.DataFrame(
        {
            "vec_id": np.arange(600, dtype=np.int64),
            "cluster": np.array([0] * 400 + [1] * 150 + [2] * 50),
        }
    )
    got = balance_sources(
        rd.from_pandas(df), key_col="vec_id", group_col="cluster"
    ).to_pandas()
    by = got.groupby("cluster").size()
    assert by[2] <= 50
    assert by[0] <= 65 and by[0] >= 30
    again = balance_sources(
        rd.from_pandas(df).repartition(5), key_col="vec_id",
        group_col="cluster",
    ).to_pandas()
    assert sorted(got["vec_id"]) == sorted(again["vec_id"])


def test_split_corpus_disjoint_exhaustive():
    import numpy as np
    import pandas as pd
    import pytest
    import ray.data as rd

    from parallel_pagerank_ray.functions.sampling import (
        hash_sample,
        split_corpus,
    )

    df = pd.DataFrame({"doc_id": np.arange(2000, dtype=np.int64)})
    got = split_corpus(rd.from_pandas(df), "doc_id").to_pandas()
    assert len(got) == 2000 and got["doc_id"].is_unique
    frac = got["split"].value_counts(normalize=True)
    assert 0.95 < frac["train"] < 1.0
    assert frac.get("val", 0) > 0 and frac.get("test", 0) > 0
    # consistent with hash_sample's bucket: rate 98 == the train split
    kept = set(
        hash_sample(rd.from_pandas(df), "doc_id", 98).to_pandas()["doc_id"]
    )
    assert set(got[got.split == "train"]["doc_id"]) == kept
    # partition invariance
    again = split_corpus(
        rd.from_pandas(df).repartition(7), "doc_id"
    ).to_pandas()
    assert got.sort_values("doc_id").reset_index(drop=True).equals(
        again.sort_values("doc_id").reset_index(drop=True)
    )
    with pytest.raises(ValueError, match="sum to 100"):
        split_corpus(rd.from_pandas(df), "doc_id", splits=(("a", 60),))


def test_phrase_counts_literal_and_regex_safety():
    from parallel_pagerank_ray.functions.textstats import phrase_counts

    docs = rd.from_pandas(
        pd.DataFrame(
            {
                "doc_id": np.arange(5, dtype=np.int64),
                "text": [
                    "a.b a.b end",      # regex metachars must stay literal
                    "xxabab ab",        # 'ab' occurs 3 times
                    "nothing here",
                    "a.b",
                    "ababab",           # non-overlapping: 3
                ],
            }
        )
    )
    got = (
        phrase_counts(docs, "a.b")
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert got["doc_id"].tolist() == [0, 3]
    assert got["n_occurrences"].tolist() == [2, 1]
    # 'axb' must NOT match 'a.b' (escaped pattern)
    got2 = phrase_counts(
        rd.from_pandas(
            pd.DataFrame({"doc_id": [0], "text": ["axb axb"]})
        ),
        "a.b",
    ).to_pandas()
    assert len(got2) == 0
    got3 = (
        phrase_counts(docs, "ab").to_pandas().sort_values("doc_id")
    )
    assert got3.set_index("doc_id")["n_occurrences"].to_dict() == {
        1: 3,
        4: 3,
    }


def test_vocab_growth_curve():
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from parallel_pagerank_ray.functions.textstats import vocab_growth

    # each bucket of 2 docs introduces exactly its own tokens
    docs = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(list(range(6)), pa.int64()),
                "text": pa.array(
                    [
                        "a b", "a b c",        # bucket 0: a b c
                        "c d", "d e",          # bucket 2: d e
                        "a e", "f",            # bucket 4: f
                    ],
                    pa.string(),
                ),
            }
        )
    ).repartition(3)
    got = vocab_growth(docs, bucket=2).to_pandas()
    assert got["bucket_start"].tolist() == [0, 2, 4]
    assert got["n_new_tokens"].tolist() == [3, 2, 1]
    assert got["vocab_size"].tolist() == [3, 5, 6]


def test_bm25_search_matches_integer_reference():
    import re

    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from parallel_pagerank_ray.functions.textstats import bm25_search

    docs = pd.DataFrame(
        {
            "doc_id": np.arange(6, dtype=np.int64),
            "text": [
                "hash join hash join stream",
                "window sort window",
                "the quick brown fox jumps over the lazy dog",
                "hash",
                "stream stream stream sort padding padding padding",
                "join window hash sort stream",
            ],
        }
    )
    got = bm25_search(
        rd.from_arrow(pa.Table.from_pandas(docs)).repartition(3),
        ["hash", "join", "stream", "window", "sort"],
        k=5,
    ).to_pandas()

    tok = re.compile(r"[A-Za-z0-9_]+")
    q = {"hash", "join", "stream", "window", "sort"}
    dl: dict = {}
    tf: dict = {}
    for d, t in zip(docs["doc_id"], docs["text"]):
        words = tok.findall(t.lower())
        dl[d] = len(words)
        for w in words:
            if w in q:
                tf[(d, w)] = tf.get((d, w), 0) + 1
    df: dict = {}
    for (_, w) in tf:
        df[w] = df.get(w, 0) + 1
    dltot = sum(dl.values())
    n = len(dl)
    score: dict = {}
    for (d, w), c in tf.items():
        ratio = (88 * c * dltot * 1000) // (
            40 * c * dltot + 12 * (dltot + 3 * dl[d] * n)
        )
        score[d] = score.get(d, 0) + (1_000_000 // df[w]) * ratio
    want = sorted(score.items(), key=lambda kv: (-kv[1], kv[0]))[:5]
    assert got["doc_id"].tolist() == [d for d, _ in want]
    assert got["score"].tolist() == [s for _, s in want]
    # BM25 law: doc 4's padding dilutes 'sort' relative to the same tf
    # in a shorter doc — length normalization must be in effect
    assert score[4] < score[0]


def test_bm25_overflow_guard():
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pytest
    import ray.data as rd

    from parallel_pagerank_ray.functions.textstats import bm25_search

    docs = pd.DataFrame(
        {"doc_id": np.arange(2, dtype=np.int64),
         "text": ["hash " * 50, "join hash"]}
    )
    with pytest.raises(ValueError, match="overflow"):
        bm25_search(
            rd.from_arrow(pa.Table.from_pandas(docs)),
            ["hash", "join"],
            prec_scale=10**17,
        )


def test_rrf_fusion_matches_reference():
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from parallel_pagerank_ray.functions.textstats import (
        bm25_search,
        rrf_fusion,
        tfidf_search,
    )

    docs = pd.DataFrame(
        {
            "doc_id": np.arange(8, dtype=np.int64),
            "text": [
                "hash join hash join stream",
                "window sort window",
                "no query tokens here at all",
                "hash",
                "stream stream stream sort pad pad pad",
                "join window hash sort stream",
                "sort sort sort",
                "window window hash",
            ],
        }
    )
    ds = rd.from_arrow(pa.Table.from_pandas(docs)).repartition(3)
    q = ["hash", "join", "stream", "window", "sort"]
    got = rrf_fusion(ds, q, k=5, depth=6).to_pandas()
    fused: dict = {}
    for run in (
        tfidf_search(ds, q, k=6).to_pandas(),
        bm25_search(ds, q, k=6).to_pandas(),
    ):
        for pos, doc in zip(run["pos"], run["doc_id"]):
            fused[int(doc)] = fused.get(int(doc), 0) + 1_000_000 // (
                60 + int(pos)
            )
    want = sorted(fused.items(), key=lambda kv: (-kv[1], kv[0]))[:5]
    assert got["doc_id"].tolist() == [d for d, _ in want]
    assert got["rrf"].tolist() == [s for _, s in want]
