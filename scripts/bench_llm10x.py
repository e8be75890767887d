"""Standing 10x-corpus legs for the LLM-data pipelines (VERDICT r4
item 6): fuzzy dedup end-to-end (MinHash-LSH candidates -> candidate
graph CC -> keepers) and DSIR importance weights, on a 50k-document
deterministic corpus (10x the sf0.1 documents table; same vocabulary
family + seeded near-dup injection so LSH has real work). Prints one
JSON line with walls, row counts, and the np.sort host probe (the
BASELINE C3 host-variance control).

Usage: PYTHONPATH=/root/repo python scripts/bench_llm10x.py [n_docs]
"""
import json
import os
import sys
import time

import numpy as np

import ray

ray.init(
    address="local",
    num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
    include_dashboard=False,
    logging_level="ERROR",
)
import logging

logging.getLogger("ray.data").setLevel(logging.ERROR)
from ray.data import DataContext

DataContext.get_current().enable_progress_bars = False

import pyarrow as pa
import pyarrow.parquet as pq
import ray.data as rd


def host_probe() -> float:
    x = np.random.default_rng(0).integers(0, 1 << 62, 50_000_000)
    t0 = time.time()
    np.sort(x)
    return round(time.time() - t0, 2)


WORDS = (
    "key agg row scan slow fast table value part hash merge batch spark "
    "the line sort window join shuffle block rank node edge graph token "
    "stream filter map group count index store actor plasma object"
).split()


def gen_corpus(n_docs: int, path: str) -> None:
    rng = np.random.default_rng(42)
    texts = []
    langs = []
    for i in range(n_docs):
        if i >= 10 and rng.random() < 0.1:
            # near-duplicate of an earlier doc: 1-2 word substitutions
            base = texts[int(rng.integers(0, i))].split()
            for _ in range(int(rng.integers(1, 3))):
                base[int(rng.integers(0, len(base)))] = str(
                    rng.choice(WORDS)
                )
            texts.append(" ".join(base))
        else:
            texts.append(
                " ".join(rng.choice(WORDS, size=int(rng.integers(20, 40))))
            )
        langs.append("en" if rng.random() < 0.5 else "xx")
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(n_docs), pa.int64()),
                "text": pa.array(texts),
                "lang": pa.array(langs),
            }
        ),
        path,
    )


n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000
path = "/tmp/ppr_llm10x/documents.parquet"
os.makedirs(os.path.dirname(path), exist_ok=True)
probe0 = host_probe()
t0 = time.time()
gen_corpus(n_docs, path)
gen_s = time.time() - t0

from parallel_pagerank_ray.functions.dsir import dsir_affinity
from parallel_pagerank_ray.pipelines.dedup import (
    dedup_keepers,
    minhash_lsh_candidates,
)

docs = rd.read_parquet(path, columns=["doc_id", "text"]).materialize()
t0 = time.time()
cands = minhash_lsh_candidates(docs)
keepers = dedup_keepers(docs, cands).materialize()
n_keep_rows = keepers.count()
n_collapsed = n_keep_rows - keepers.filter(
    expr="doc_id == keeper"
).count()
dedup_s = time.time() - t0

docs_l = rd.read_parquet(path, columns=["doc_id", "text", "lang"]).materialize()
t0 = time.time()
target = docs_l.filter(expr="lang == 'en'").select_columns(
    ["doc_id", "text"]
)
w = dsir_affinity(
    docs_l.select_columns(["doc_id", "text"]), target
).materialize()
n_w = w.count()
dsir_s = time.time() - t0

from parallel_pagerank_ray.pipelines.dedup import paragraph_dedup

# composite 5-doc paragraphs (the paragraph_dedup gate's construction)
t0 = time.time()
import pandas as pd


def build(g: "pd.DataFrame") -> "pd.DataFrame":
    rows = []
    for gid, grp in g.sort_values("doc_id").groupby("gid", sort=True):
        rows.append(
            (int(gid), "\n".join(["boiler nav"] + grp["text"].tolist()))
        )
    return pd.DataFrame(rows, columns=["doc_id", "text"])


def bucketed(df: "pd.DataFrame") -> "pd.DataFrame":
    df = df.copy()
    df["gid"] = df["doc_id"] // 5
    df["__b"] = df["gid"] % 32
    return df


comp = (
    docs.map_batches(bucketed, batch_format="pandas")
    .groupby("__b")
    .map_groups(build, batch_format="pandas")
)
pd_rows = paragraph_dedup(comp).materialize().count()
para_s = time.time() - t0

# ANN at 10x: 500k synthetic embeddings (64-dim, deterministic), 100
# queries; brute cosine top-10 vs IVF (nprobe/n_cells pruned scan) +
# recall of the pruned path
import pyarrow as pa
import ray.data as rd

from parallel_pagerank_ray.pipelines.similarity import knn_brute, knn_ivf

n_vec = 10 * n_docs
rng = np.random.default_rng(7)
centers = rng.normal(size=(32, 64))
assign = rng.integers(0, 32, n_vec)
mat = (centers[assign] + 0.3 * rng.normal(size=(n_vec, 64))).astype(
    np.float32
)
emb_path = "/tmp/ppr_llm10x/embeddings.parquet"
pq.write_table(
    pa.table(
        {
            "vec_id": pa.array(range(n_vec), pa.int64()),
            "embedding": pa.array(list(mat), pa.list_(pa.float32())),
        }
    ),
    emb_path,
)
embs = rd.read_parquet(emb_path).materialize()
q_ids = np.arange(100, dtype=np.int64)
q_mat = mat[:100].astype(np.float64)
t0 = time.time()
brute = knn_brute(embs, (q_ids, q_mat), k=10).materialize()
brute_s = time.time() - t0
t0 = time.time()
ivf = knn_ivf(embs, (q_ids, q_mat), k=10, n_cells=64, nprobe=4).materialize()
ivf_s = time.time() - t0
bp = brute.to_pandas()
ip = ivf.to_pandas()
bset = set(map(tuple, bp[["query_id", "neighbor_id"]].to_numpy()))
iset = set(map(tuple, ip[["query_id", "neighbor_id"]].to_numpy()))
recall = len(bset & iset) / max(1, len(bset))
probe1 = host_probe()

print(
    json.dumps(
        {
            "n_docs": n_docs,
            "gen_sec": round(gen_s, 1),
            "dedup_keepers_sec": round(dedup_s, 1),
            "dedup_rows": int(n_keep_rows),
            "dedup_collapsed": int(n_collapsed),
            "dsir_weights_sec": round(dsir_s, 1),
            "dsir_rows": int(n_w),
            "paragraph_dedup_sec": round(para_s, 1),
            "paragraph_docs": int(pd_rows),
            "ann_n_vectors": int(n_vec),
            "knn_brute_sec": round(brute_s, 1),
            "knn_ivf_sec": round(ivf_s, 1),
            "ivf_recall_at10": round(recall, 3),
            "host_probe_sort50M_sec": [probe0, probe1],
        }
    )
)
ray.shutdown()
