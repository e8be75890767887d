"""line_filter vs a pure-Python mirror: local min-words rule, global
boilerplate-df rule, order preservation, partition invariance."""

import pandas as pd
import pyarrow as pa
import ray.data as rd

from parallel_pagerank_ray.functions.lines import line_filter

DOCS = {
    "d0": "alpha beta gamma\nfooter line\nx\nalpha beta",
    "d1": "footer line\nsolo\ndelta epsilon zeta",
    "d2": "footer line\nunique here now\n",
    "d3": "alpha beta gamma\nfooter line",
}


def _mirror(min_words, max_df):
    lines = {u: t.split("\n") for u, t in DOCS.items()}
    df = {}
    for u, ls in lines.items():
        for ln in set(ls):
            df[ln] = df.get(ln, 0) + 1
    out = {}
    for u, ls in lines.items():
        keep = [
            ln
            for ln in ls
            if len(ln.split()) >= min_words
            and (max_df is None or df[ln] <= max_df)
        ]
        out[u] = (
            "\n".join(keep),
            len(keep),
            len(ls) - len(keep),
        )
    return out


def _run(blocks, **kw):
    ds = rd.from_arrow(
        pa.table(
            {
                "url": list(DOCS),
                "text": [DOCS[u] for u in DOCS],
            }
        )
    ).repartition(blocks)
    res = line_filter(ds, **kw).to_pandas().sort_values("url")
    return {
        r.url: (r.clean_text, r.lines_kept, r.lines_dropped)
        for r in res.itertuples()
    }


def test_line_filter_global_rule_and_partition_invariance():
    want = _mirror(2, 2)  # "footer line" is in 4 docs -> dropped
    assert _run(1, min_words=2, max_line_df=2) == want
    assert _run(4, min_words=2, max_line_df=2, num_buckets=3) == want
    # boilerplate really dropped, real content kept
    assert "footer line" not in _run(2, min_words=2, max_line_df=2)["d1"][0]
    assert "delta epsilon zeta" in _run(2, min_words=2, max_line_df=2)["d1"][0]


def test_line_filter_local_only():
    want = _mirror(3, None)
    got = _run(2, min_words=3, max_line_df=None)
    assert got == want
    # d2's trailing empty line counts as dropped
    assert got["d2"][2] >= 1


def test_line_filter_all_dropped_doc():
    got = _run(2, min_words=100, max_line_df=None)
    assert all(v[0] == "" and v[1] == 0 for v in got.values())


def test_line_filter_join_fallback_parity():
    # broadcast_max=None forces the join + map_groups path
    want = _run(3, min_words=2, max_line_df=2)
    slow = _run(3, min_words=2, max_line_df=2, broadcast_max=None)
    assert slow == want
    # and a guard of -1 (blocklist larger than guard) also falls back
    slow2 = _run(3, min_words=2, max_line_df=2, broadcast_max=-1)
    assert slow2 == want
