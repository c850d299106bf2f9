"""Local replica of the driver's correctness gate.

Runs every `__ray_entry__.queries()` callable at a given sf dir and,
where `oracle_sql()` provides SQL, the DuckDB oracle over the same
parquet views — then compares rows / schema / values (columns sorted by
name, exact equality).  Queries without SQL get a rows-only smoke check,
mirroring CORRECTNESS_r{N}.json.

Usage:  python tools/check_driver.py [sf_dir] [query ...]
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np
import pandas as pd

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def _to_pandas(obj) -> pd.DataFrame:
    import pyarrow as pa

    if isinstance(obj, pd.DataFrame):
        return obj.reset_index(drop=True)
    if isinstance(obj, pa.Table):
        return obj.to_pandas()
    return obj.to_pandas()  # ray Dataset


def compare(name: str, got: pd.DataFrame, want: pd.DataFrame) -> dict:
    res = {"rows_match": None, "schema_match": None, "values_match": None,
           "spark_rows": len(got), "oracle_rows": len(want), "err": None}

    def _norm(df: pd.DataFrame) -> pd.DataFrame:
        df = df[sorted(df.columns)].reset_index(drop=True)
        for c in df.columns:  # datetime unit differences are not value diffs
            if df[c].dtype.kind == "M":
                df[c] = df[c].astype("datetime64[us]")
        if len(df.columns):  # driver hashing is row-order-insensitive
            df = df.sort_values(list(df.columns)).reset_index(drop=True)
        return df

    got, want = _norm(got), _norm(want)
    res["rows_match"] = len(got) == len(want)
    res["schema_match"] = list(got.columns) == list(want.columns)
    if not (res["rows_match"] and res["schema_match"]):
        res["values_match"] = False
        if not res["schema_match"]:
            res["err"] = f"schema {list(got.columns)} vs {list(want.columns)}"
        return res
    ok = True
    for c in got.columns:
        a, b = got[c].to_numpy(), want[c].to_numpy()
        if a.dtype.kind == "f" or b.dtype.kind == "f":
            # Both sides round before registering (e.g. betweenness at 6
            # decimals), but independently-ordered float sums can land a
            # hair on opposite sides of a rounding boundary — compare with
            # an atol one decade under the rounding step, not exactly.
            af, bf = a.astype(np.float64), b.astype(np.float64)
            same = af.shape == bf.shape and bool(
                np.allclose(af, bf, rtol=0.0, atol=1e-9, equal_nan=True))
        else:
            same = bool((pd.Series(a) == pd.Series(b)).all()) and a.dtype == b.dtype
            if a.dtype != b.dtype:
                res["err"] = f"col {c}: dtype {a.dtype} vs {b.dtype}"
        if not same:
            ok = False
            if res["err"] is None:
                bad = np.nonzero(~(pd.Series(a) == pd.Series(b)).to_numpy())[0][:3]
                res["err"] = f"col {c}: first diffs at rows {bad.tolist()}: " + ", ".join(
                    f"{a[i]!r}!={b[i]!r}" for i in bad
                )
    res["values_match"] = ok
    return res


def run_gate(sf_dir: str, only: set[str] | None = None,
             quiet: bool = False) -> tuple[dict, list[str]]:
    """Run the gate against an ALREADY-INITIALIZED Ray session.

    Sets FORA_ORACLE_SF_DIR so oracle_sql() regenerates its golden layer
    for `sf_dir` (the external driver runs without the override and gets
    the pinned sf0.01 paths).  Returns (results, failed_names)."""
    import duckdb

    os.environ["FORA_ORACLE_SF_DIR"] = sf_dir
    try:
        import __ray_entry__ as e

        qs = e.queries()
        sqls = e.oracle_sql()
    finally:
        os.environ.pop("FORA_ORACLE_SF_DIR", None)

    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    results: dict[str, dict] = {}
    failed = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            got = _to_pandas(fn(sf_dir))
        except Exception as ex:  # noqa: BLE001
            results[name] = {"err": f"query raised: {ex!r}"}
            failed.append(name)
            print(f"FAIL {name}: query raised {ex!r}")
            continue
        if name not in sqls:
            results[name] = {"spark_rows": len(got), "err": "no_oracle"}
            if not quiet:
                print(f"  ok {name}: rows={len(got)} (no_oracle)")
            continue
        try:
            want = con.execute(sqls[name]).df()
        except Exception as ex:  # noqa: BLE001
            results[name] = {"err": f"oracle raised: {ex!r}"}
            failed.append(name)
            print(f"FAIL {name}: oracle raised {ex!r}")
            continue
        r = compare(name, got, want)
        results[name] = r
        if not r["values_match"]:
            failed.append(name)
        if not quiet or not r["values_match"]:
            status = "PASS" if r["values_match"] else "FAIL"
            print(f"{status} {name}: rows {r['spark_rows']}/{r['oracle_rows']}"
                  + (f"  [{r['err']}]" if r["err"] else ""))
    n_oracle = sum(1 for r in results.values() if "values_match" in r)
    print(f"\n{len(results)} queries, {n_oracle} oracled, {len(failed)} failed"
          + (f": {failed}" if failed else ""))
    with open("/tmp/check_driver_last.json", "w") as f:
        json.dump(results, f, indent=1, default=str)
    return results, failed


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    _results, failed = run_gate(sf_dir, only or None)
    ray.shutdown()
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
