"""Count-min sketch — CM guarantees vs exact counts."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from parallel_pagerank_ray.functions import sketch as S


def _docs(texts: list[str]) -> rd.Dataset:
    return rd.from_arrow(
        pa.table({"text": pa.array(texts, pa.string())})
    ).repartition(3)


def test_countmin_upper_bound_and_exactness():
    rng = np.random.default_rng(3)
    vocab = [f"tok{i}" for i in range(300)]
    words = rng.choice(vocab, p=None, size=5000).tolist()
    texts = [" ".join(words[i : i + 50]) for i in range(0, 5000, 50)]
    truth: dict[str, int] = {}
    for w in words:
        truth[w] = truth.get(w, 0) + 1
    est = S.countmin_estimates(_docs(texts), vocab).to_pandas()
    got = dict(zip(est["token"], est["est"]))
    assert set(got) == set(vocab)
    # CM never underestimates, and total mass bounds the error
    for t in vocab:
        assert got[t] >= truth.get(t, 0), t
    # cells sum to d * total token count
    cells = S.countmin_cells(_docs(texts)).to_pandas()
    assert int(cells["c"].sum()) == len(S.CM_PARAMS) * 5000
    assert (cells["pos"] < S.CM_W).all() and (cells["pos"] >= 0).all()


def test_countmin_partition_invariance():
    texts = [f"alpha beta gamma{i % 7}" for i in range(200)]
    a = (
        S.countmin_cells(_docs(texts))
        .to_pandas()
        .sort_values(["j", "pos"])
        .reset_index(drop=True)
    )
    b = (
        S.countmin_cells(rd.from_arrow(
            pa.table({"text": pa.array(texts, pa.string())})
        ).repartition(11))
        .to_pandas()
        .sort_values(["j", "pos"])
        .reset_index(drop=True)
    )
    assert a.equals(b)


def test_cooccurrence_window_semantics():
    from parallel_pagerank_ray.functions.textstats import (
        cooccurrence_counts,
    )

    texts = [
        "a b c a",  # d1: (a,b)(b,c)(a,c*no: c,a) ; d2: (a,c)(a,b)
        "b b",      # d1: (b,b)
        "z a",      # z not in vocab -> only if vocab includes z
    ]
    got = (
        cooccurrence_counts(_docs(texts), ["a", "b", "c"], window=2)
        .to_pandas()
        .set_index(["tok_a", "tok_b"])["cnt"]
        .to_dict()
    )
    # doc0 d=1: (a,b),(b,c),(a,c); d=2: (a,c),(a,b)  doc1 d=1: (b,b)
    assert got == {
        ("a", "b"): 2,
        ("b", "c"): 1,
        ("a", "c"): 2,
        ("b", "b"): 1,
    }
    # window never crosses doc boundaries: "z a" contributes nothing
    got2 = (
        cooccurrence_counts(_docs(["a b", "c d"]), ["a", "b", "c", "d"])
        .to_pandas()
    )
    assert len(got2) == 2  # (a,b) and (c,d) only — no (b,c) cross-doc


def test_table_checksum_laws():
    import pyarrow as pa

    from parallel_pagerank_ray.functions.sketch import table_checksum

    def tbl(rows, parts):
        return rd.from_arrow(
            pa.table(
                {
                    "a": pa.array([r[0] for r in rows], pa.int64()),
                    "b": pa.array([r[1] for r in rows], pa.int64()),
                }
            )
        ).repartition(parts)

    rows = [(i, i * 31 % 97) for i in range(1000)]
    r1 = table_checksum(tbl(rows, 1), ["a", "b"]).to_pandas().iloc[0]
    r7 = table_checksum(tbl(rows, 7), ["a", "b"]).to_pandas().iloc[0]
    # partition- and order-invariant
    rrev = (
        table_checksum(tbl(rows[::-1], 3), ["a", "b"]).to_pandas().iloc[0]
    )
    assert (r1["n_rows"], r1["checksum"]) == (r7["n_rows"], r7["checksum"])
    assert (r1["n_rows"], r1["checksum"]) == (
        rrev["n_rows"],
        rrev["checksum"],
    )
    assert r1["n_rows"] == 1000
    # sensitive to a single-cell change
    rows2 = rows[:500] + [(500, (rows[500][1] + 1) % 97)] + rows[501:]
    r2 = table_checksum(tbl(rows2, 7), ["a", "b"]).to_pandas().iloc[0]
    assert r2["checksum"] != r1["checksum"]
    # column order matters (keyed fold, not a bag of cells)
    rba = table_checksum(tbl(rows, 4), ["b", "a"]).to_pandas().iloc[0]
    assert rba["checksum"] != r1["checksum"]
