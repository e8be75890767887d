"""Driver-simulator: run every __ray_entry__ query and its DuckDB oracle
side-by-side and compare row count + schema + order-insensitive values.

Usage: python scripts/check_oracle.py [sf_dir] [query ...]

Mirrors the round driver's correctness gate so mismatches are caught
locally before a round ends. Float columns are compared for exact
equality (the engine's oracle-matched outputs are restricted to
bit-reproducible arithmetic).
"""

from __future__ import annotations

import os
import sys
import time

import duckdb
import numpy as np
import pandas as pd

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def to_pandas(res) -> pd.DataFrame:
    import pyarrow as pa
    import ray.data as rd

    if isinstance(res, rd.Dataset):
        df = res.to_pandas()
        if len(df) == 0 and len(df.columns) == 0:
            # Ray 2.49 quirk: to_pandas() of an all-empty Dataset drops
            # the columns even though ds.schema() knows them (seen on
            # kcore at sf0.001, whose 80-core is legitimately empty)
            try:
                df = pd.DataFrame({c: [] for c in res.schema().names})
            except Exception:
                pass
        return df
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def compare(name: str, ray_df: pd.DataFrame, sql_df: pd.DataFrame) -> list[str]:
    problems = []
    if len(ray_df) != len(sql_df):
        problems.append(f"rows {len(ray_df)} != {len(sql_df)}")
    rc, sc = sorted(ray_df.columns), sorted(sql_df.columns)
    if rc != sc:
        problems.append(f"cols {rc} != {sc}")
        return problems
    a, b = canon(ray_df), canon(sql_df)
    if len(a) == len(b):
        for c in a.columns:
            av, bv = a[c].to_numpy(), b[c].to_numpy()
            if np.issubdtype(av.dtype, np.floating) or np.issubdtype(
                bv.dtype, np.floating
            ):
                eq = np.array_equal(
                    av.astype(np.float64), bv.astype(np.float64), equal_nan=True
                )
            else:
                eq = (av.astype(str) == bv.astype(str)).all()
            if not eq:
                idx = None
                try:
                    neq = av != bv
                    idx = int(np.nonzero(neq)[0][0])
                except Exception:
                    pass
                detail = f" first diff @{idx}: {av[idx]!r} vs {bv[idx]!r}" if idx is not None else ""
                problems.append(f"col {c} values differ{detail}")
    return problems


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])
    summary: dict[str, dict] = {}

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False)
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    sys.path.insert(0, ".")
    import __ray_entry__ as E

    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs = E.queries()
    oracles = E.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            ray_df = to_pandas(fn(sf_dir))
        except Exception as ex:
            print(f"FAIL {name}: ray side raised {type(ex).__name__}: {ex}")
            failures += 1
            summary[name] = {"match": False, "err": f"{type(ex).__name__}: {ex}"[:200]}
            continue
        t_ray = time.time() - t0
        if name not in oracles:
            print(f"ok   {name}: rows-only ({len(ray_df)} rows, {t_ray:.1f}s)")
            summary[name] = {
                "rows": len(ray_df), "match": "rows-only",
                "ray_secs": round(t_ray, 2),
            }
            continue
        t1 = time.time()
        try:
            sql_df = con.sql(oracles[name]).df()
        except Exception as ex:
            print(f"FAIL {name}: oracle SQL raised {type(ex).__name__}: {ex}")
            failures += 1
            summary[name] = {"match": False, "err": f"oracle {type(ex).__name__}: {ex}"[:200]}
            continue
        t_sql = time.time() - t1
        problems = compare(name, ray_df, sql_df)
        if problems:
            print(f"FAIL {name}: {'; '.join(problems)}")
            failures += 1
            summary[name] = {
                "rows": len(ray_df), "match": False,
                "ray_secs": round(t_ray, 2), "sql_secs": round(t_sql, 2),
                "err": "; ".join(problems)[:200],
            }
        else:
            print(
                f"ok   {name}: {len(ray_df)} rows match "
                f"(ray {t_ray:.1f}s, sql {t_sql:.1f}s)"
            )
            summary[name] = {
                "rows": len(ray_df), "match": True,
                "ray_secs": round(t_ray, 2), "sql_secs": round(t_sql, 2),
            }
    out = os.environ.get("SWEEP_SUMMARY_OUT")
    if out and not only:
        import json

        with open(out, "w") as f:
            json.dump(
                {
                    "sf_dir": sf_dir,
                    "n_queries": len(summary),
                    "n_green": sum(
                        1 for v in summary.values() if v.get("match")
                    ),
                    "queries": summary,
                },
                f, indent=1,
            )
        print(f"summary written: {out}")
    ray.shutdown()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
