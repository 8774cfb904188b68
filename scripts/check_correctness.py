"""Local replica of the driver's correctness gate.

Runs every ``__ray_entry__.queries()`` entry against its
``oracle_sql()`` string (DuckDB over the same parquet tables) at a
given sf dir, the way the external driver does: row count, column-name
set, and a value hash computed after sorting columns by name and rows
by every column.  Use before handing the repo to the driver:

    python scripts/check_correctness.py [/root/testdata/sf0.01] [--strict] \
        [--oracle-timeout SECS] [name ...]

Exit code 1 if any oracle-checked query mismatches.
"""
from __future__ import annotations

import hashlib
import json
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

# same worker-log override the bench uses: Ray Data re-applies its own
# dictConfig per data task, so the yaml (not a logging hook) is the only
# thing that keeps the schema-hash WARNING spam out of audit output
os.environ.setdefault(
    "RAY_DATA_LOGGING_CONFIG", os.path.join(_REPO, "ray_data_logging.yaml")
)

import numpy as np
import pandas as pd


def _to_pandas(res) -> pd.DataFrame:
    if isinstance(res, pd.DataFrame):
        return res
    if hasattr(res, "to_pandas"):  # Dataset or pyarrow.Table
        return res.to_pandas()
    raise TypeError(type(res))


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_float_dtype(s):
            df[c] = np.round(s.astype("float64"), 9)
        elif pd.api.types.is_integer_dtype(s):
            df[c] = s.astype("float64") if s.isna().any() else s.astype("int64")
        elif pd.api.types.is_datetime64_any_dtype(s):
            df[c] = s.astype("datetime64[us]").astype("int64")
        elif s.dtype == object or pd.api.types.is_string_dtype(s):
            df[c] = s.map(
                lambda v: json.dumps(list(v))
                if isinstance(v, (list, np.ndarray))
                else (None if v is None or v is pd.NA else str(v))
            )
    if len(df):
        df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def _vhash(df: pd.DataFrame) -> str:
    h = hashlib.md5()
    h.update(df.to_csv(index=False, float_format="%.9g").encode())
    return h.hexdigest()


def _dtype_kind(s: pd.Series) -> str:
    """Coarse dtype class for the strict check: the driver's value hash
    distinguishes int-vs-float (and datetime/string) renderings, so a
    DuckDB HUGEINT→float64 oracle vs an engine int64 is a latent red row
    even when every value is equal."""
    if pd.api.types.is_float_dtype(s):
        return "float"
    if pd.api.types.is_bool_dtype(s):
        return "bool"
    if pd.api.types.is_integer_dtype(s):
        return "int"
    if pd.api.types.is_datetime64_any_dtype(s):
        return "datetime"
    return "object"


def main() -> int:
    argv = [a for a in sys.argv[1:] if a != "--strict"]
    strict = "--strict" in sys.argv[1:]
    oracle_timeout = None
    if "--oracle-timeout" in argv:
        i = argv.index("--oracle-timeout")
        oracle_timeout = float(argv[i + 1])
        del argv[i : i + 2]
    argv = [a for a in argv if a != "--only"]  # optional separator token
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    only = set(argv[1:])

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False)
    import duckdb

    import __ray_entry__ as m

    con = duckdb.connect()
    for t in ("region nation customer supplier part orders lineitem "
              "events documents embeddings").split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs, osql = m.queries(), m.oracle_sql()
    bad: list[str] = []
    n_run = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        n_run += 1
        t0 = time.time()
        try:
            ray_df = _to_pandas(fn(sf_dir))
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: ray error {type(e).__name__}: {e}")
            bad.append(name)
            continue
        wall = time.time() - t0
        if name not in osql:
            print(f"  ok {name}: rows={len(ray_df)} (no oracle) [{wall:.1f}s]")
            continue
        try:
            timer = None
            if oracle_timeout:
                import threading

                timer = threading.Timer(oracle_timeout, con.interrupt)
                timer.start()
            try:
                o_df = con.execute(osql[name]).df()
            finally:
                if timer is not None:
                    timer.cancel()
        except Exception as e:  # noqa: BLE001
            msg = str(e)
            if oracle_timeout and "INTERRUPT" in msg.upper():
                # quadratic all-pairs oracles (documented in BASELINE.md)
                # are intractable at sf0.1 — a timeout is recorded, not
                # counted as a red row
                print(f"  to {name}: oracle exceeded {oracle_timeout}s "
                      f"(skipped, see BASELINE.md quadratic-oracle note)")
                continue
            print(f"FAIL {name}: oracle error {e}")
            bad.append(name)
            continue
        rows = len(ray_df) == len(o_df)
        schema = sorted(map(str, ray_df.columns)) == sorted(map(str, o_df.columns))
        if strict and rows and schema:
            kinds = [
                (c, _dtype_kind(ray_df[c]), _dtype_kind(o_df[c]))
                for c in sorted(map(str, ray_df.columns))
                if _dtype_kind(ray_df[c]) != _dtype_kind(o_df[c])
            ]
            if kinds:
                print(f"     STRICT dtype-kind diff: {kinds}")
                schema = False
        vh = False
        if rows and schema:
            a, b = _canon(ray_df), _canon(o_df)
            vh = _vhash(a) == _vhash(b)
            if not vh:
                neq = [
                    c for c in a.columns
                    if not a[c].fillna("~N~").equals(b[c].fillna("~N~"))
                ]
                print(f"     diff cols: {neq}")
                for c in neq[:2]:
                    mask = ~(a[c].fillna("~N~") == b[c].fillna("~N~"))
                    print(f"     {c}: ray={a.loc[mask, c].head(3).tolist()} "
                          f"oracle={b.loc[mask, c].head(3).tolist()}")
        status = "  ok" if (rows and schema and vh) else "FAIL"
        if status == "FAIL":
            bad.append(name)
        print(f"{status} {name}: rows={len(ray_df)}/{len(o_df)} "
              f"schema={schema} hash={vh} [{wall:.1f}s]")

    # count what was ATTEMPTED (an --only subset run must not claim the
    # full suite green)
    print(f"\n{n_run - len(bad)}/{n_run} green; failures: {bad}")
    if only:
        missing = sorted(only - set(qs))
        if missing:
            print(f"unknown query names (not run): {missing}")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
