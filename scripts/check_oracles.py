"""Local stand-in for the driver's correctness gate: run each
``queries()`` entry and its ``oracle_sql()`` twin on the same sf dir,
compare row count, column names, and order-insensitive values.

Usage: python scripts/check_oracles.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys

import duckdb
import pandas as pd
import ray

sys.path.insert(0, "/root/repo")


def to_pandas(result) -> pd.DataFrame:
    import pyarrow as pa
    import ray.data

    if isinstance(result, ray.data.Dataset):
        df = result.to_pandas()
        if len(df.columns) == 0:
            # Ray 2.49's to_pandas drops ALL columns for 0-row
            # datasets even when ds.schema() knows them; rebuild the
            # empty frame from the schema so column comparison works.
            sch = result.schema()
            if sch is not None and sch.names:
                df = pa.schema(list(zip(sch.names, sch.types))).empty_table().to_pandas()
        return df
    if isinstance(result, pa.Table):
        return result.to_pandas()
    return result


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for col in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[col]):
            df[col] = df[col].astype("datetime64[us]")
        elif pd.api.types.is_float_dtype(df[col]):
            df[col] = df[col].round(6)
        elif pd.api.types.is_integer_dtype(df[col]):
            df[col] = df[col].astype("int64")
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    # The extraction-aggregate pseudo-oracles bind their golden-table
    # path at oracle_sql() time; point them at the sf dir under check
    # (the driver's gate runs at sf0.01, the module default).
    import os

    os.environ["SMART_OCR_ORACLE_SF"] = sf_dir

    ray.init(address="local", num_cpus=8, include_dashboard=False, logging_level="ERROR")
    import __ray_entry__ as entry

    con = duckdb.connect()
    for table in (
        "region nation customer supplier part orders lineitem events documents embeddings"
    ).split():
        con.execute(
            f"CREATE VIEW {table} AS SELECT * FROM read_parquet('{sf_dir}/{table}.parquet')"
        )

    queries = entry.queries()
    oracles = entry.oracle_sql()
    failures = 0
    for name, fn in queries.items():
        if only and name not in only:
            continue
        try:
            ours = canon(to_pandas(fn(sf_dir)))
        except Exception as exc:
            print(f"FAIL  {name}: query raised {type(exc).__name__}: {exc}")
            import traceback

            traceback.print_exc()
            failures += 1
            continue
        sql = oracles.get(name)
        if sql is None:
            print(f"ok    {name}: rows-only ({len(ours)} rows)")
            continue
        try:
            theirs = canon(con.execute(sql).fetchdf())
        except Exception as exc:
            print(f"FAIL  {name}: oracle SQL raised {exc}")
            failures += 1
            continue
        if list(ours.columns) != list(theirs.columns):
            print(f"FAIL  {name}: columns {list(ours.columns)} vs {list(theirs.columns)}")
            failures += 1
            continue
        if len(ours) != len(theirs):
            print(f"FAIL  {name}: rows {len(ours)} vs {len(theirs)}")
            failures += 1
            continue
        diff_cols = []
        for col in ours.columns:
            a, b = ours[col], theirs[col]
            if pd.api.types.is_float_dtype(a) or pd.api.types.is_float_dtype(b):
                equal = all(
                    (math.isnan(x) and math.isnan(y)) or abs(float(x) - float(y)) <= 1e-9
                    for x, y in zip(a, b)
                )
            else:
                equal = a.astype(str).tolist() == b.astype(str).tolist()
            if not equal:
                diff_cols.append(col)
        if diff_cols:
            print(f"FAIL  {name}: value mismatch in {diff_cols}")
            for col in diff_cols[:2]:
                mask = ours[col].astype(str) != theirs[col].astype(str)
                print(ours[mask].head(3))
                print(theirs[mask].head(3))
            failures += 1
        else:
            print(f"ok    {name}: {len(ours)} rows match oracle")

    ray.shutdown()
    print(f"\n{failures} failures")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
