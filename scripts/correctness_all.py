"""Full-registry correctness matrix (VERDICT r4 missing #3 / ask #5).

The grading driver's CORRECTNESS snapshot caps at 50 rows, so part of
the registry never gets a standing driver record. This script runs
EVERY ``queries()`` entry against its ``oracle_sql()`` with the
driver's protocol — row count, sorted-column-name schema, and a value
hash over rows sorted by all columns with floats rounded to 6dp — and
writes ``CORRECTNESS_full_r{N}.json`` at the repo root. Entries with
no SQL oracle get the driver's weaker rows-only check
(``hash_match: null``).

Usage:  python scripts/correctness_all.py [--round 5] [--sf-dir DIR]
(owns its Ray session; never run while a bench is running)
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os
import sys
import time

import duckdb
import numpy as np
import pandas as pd

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def _to_pandas(result) -> pd.DataFrame:
    if isinstance(result, pd.DataFrame):
        return result
    try:
        import pyarrow as pa

        if isinstance(result, pa.Table):
            return result.to_pandas()
    except ImportError:
        pass
    return result.to_pandas()


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            # Empty-aggregate edge case: a Ray global aggregate over 0
            # rows yields Python None (object dtype) where DuckDB
            # yields float64 NaN — canonicalize numeric-or-null object
            # columns to float64 so both sides hash identically.
            try:
                df[c] = pd.to_numeric(df[c])
            except (ValueError, TypeError):
                df[c] = df[c].astype(str)
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].round(6)
        elif str(df[c].dtype).startswith("datetime"):
            df[c] = df[c].astype("int64")
    df = df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)
    for c in df.columns:
        if pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
    return df


def _value_hash(df: pd.DataFrame) -> str:
    h = hashlib.md5()
    for c in df.columns:
        col = df[c]
        if pd.api.types.is_float_dtype(col):
            # 6dp-rounded repr so -0.0/0.0 and ulp noise can't differ
            vals = np.round(col.to_numpy(dtype=np.float64), 6)
            vals = np.where(vals == 0.0, 0.0, vals)
            h.update(np.array2string(vals, threshold=1 << 31).encode())
        else:
            h.update("\x1f".join(map(str, col.tolist())).encode())
        h.update(b"\x1e")
    return h.hexdigest()


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--round", type=int, default=5)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--only", default=None, help="comma-list of query names")
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
            include_dashboard=False,
            logging_level="ERROR",
            log_to_driver=False,
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as E

    qs = E.queries()
    sqls = E.oracle_sql()
    only = set(args.only.split(",")) if args.only else None

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{args.sf_dir}/{t}.parquet')"
        )

    out: dict[str, dict] = {}
    t_start = time.time()
    for name, fn in qs.items():
        if only and name not in only:
            continue
        rec: dict = {
            "rows_match": None,
            "schema_match": None,
            "hash_match": None,
            "spark_rows": None,
            "oracle_rows": None,
            "err": None,
        }
        try:
            got = _normalize(_to_pandas(fn(args.sf_dir)))
            rec["spark_rows"] = int(len(got))
            sql = sqls.get(name)
            if sql is None:
                rec["rows_match"] = len(got) > 0
            else:
                want = _normalize(con.execute(sql).fetchdf())
                rec["oracle_rows"] = int(len(want))
                rec["rows_match"] = len(got) == len(want)
                rec["schema_match"] = list(got.columns) == list(want.columns)
                if rec["rows_match"] and rec["schema_match"]:
                    rec["hash_match"] = _value_hash(got) == _value_hash(want)
                else:
                    rec["hash_match"] = False
        except Exception as exc:  # noqa: BLE001 — record, don't abort the matrix
            rec["err"] = f"{type(exc).__name__}: {exc}"[:400]
        out[name] = rec
        flag = (
            "ok"
            if rec["err"] is None
            and rec["rows_match"]
            and rec["hash_match"] in (True, None)
            else "FAIL"
        )
        print(f"[{flag}] {name}: {rec}", file=sys.stderr)

    path = os.path.join(REPO, f"CORRECTNESS_full_r{args.round}.json")
    if only and os.path.exists(path):
        # --only runs merge into the standing artifact instead of clobbering
        # the full matrix.
        with open(path) as f:
            merged = json.load(f)
        merged.update(out)
        out = merged
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    n_ok = sum(
        1
        for r in out.values()
        if r["err"] is None and r["rows_match"] and r["hash_match"] in (True, None)
    )
    print(
        json.dumps(
            {
                "total": len(out),
                "green": n_ok,
                "sql_checked": sum(1 for r in out.values() if r["hash_match"] is not None),
                "seconds": round(time.time() - t_start, 1),
                "path": path,
            }
        )
    )
    ray.shutdown()
    return 0 if n_ok == len(out) else 1


if __name__ == "__main__":
    raise SystemExit(main())
