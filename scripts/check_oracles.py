"""Local stand-in for the driver's correctness gate: run each
``queries()`` entry and its ``oracle_sql()`` twin on the same sf dir,
compare row count, column names, and order-insensitive values.

Usage: python scripts/check_oracles.py [sf_dir] [query ...]
       python scripts/check_oracles.py [sf_dir] --changed-since REF

``--changed-since REF`` selects only the queries affected by the git
diff against REF (e.g. ``HEAD``, ``HEAD~3``, ``main``): changed
``smart_ocr_ray/`` modules are expanded to their transitive reverse
import closure, a query is selected when its callable lives in (or its
source references) an affected module, and queries whose names appear
in changed hunks of ``__ray_entry__.py`` (touched oracle SQL or
registration) are selected too. The full 152-query sweep still runs at
round close — this mode exists so every working session can afford a
full-fidelity check of what it touched (r3 advice item 8).
"""

from __future__ import annotations

import math
import sys

import duckdb
import pandas as pd
import ray

sys.path.insert(0, "/root/repo")


def _changed_query_names(ref: str, queries: dict) -> set[str]:
    """Queries affected by the diff vs ``ref`` — see module docstring."""
    import inspect
    import re
    import subprocess
    from pathlib import Path

    repo = Path("/root/repo")
    changed = subprocess.check_output(
        ["git", "diff", "--name-only", ref, "--"], cwd=repo, text=True
    ).split()

    pkg_files = [p.relative_to(repo) for p in (repo / "smart_ocr_ray").rglob("*.py")]
    # Module import graph over the package (regex on import statements
    # is enough: the package only uses `from .x import` / `from ..y.z
    # import` / `from smart_ocr_ray.a.b import` forms).
    imports: dict[str, set[str]] = {}
    mod_of = {}
    for f in pkg_files:
        mod = str(f)[:-3].replace("/", ".").removesuffix(".__init__")
        mod_of[str(f)] = mod
        src = (repo / f).read_text()
        deps = set()
        pkg_parts = mod.split(".")
        for m in re.finditer(
            r"^\s*from\s+([.\w]+)\s+import\s+([\w, ]+)", src, re.M
        ):
            base, names = m.group(1), m.group(2)
            if base.startswith("."):
                ndots = len(base) - len(base.lstrip("."))
                root = pkg_parts[: len(pkg_parts) - ndots]
                rel = base.lstrip(".")
                base = ".".join(root + ([rel] if rel else []))
            if not base.startswith("smart_ocr_ray"):
                continue
            deps.add(base)
            for name in names.split(","):
                deps.add(f"{base}.{name.strip()}")
        imports[mod] = deps

    seed = {
        mod_of[f]
        for f in changed
        if f in mod_of
    }
    # reverse transitive closure: anything importing an affected module
    # (deps hold both module paths and module.attr entries — a dep hits
    # when it, or its parent module, is affected)
    affected = set(seed)
    grew = True
    while grew:
        grew = False
        for mod, deps in imports.items():
            if mod in affected:
                continue
            if any(
                d in affected or d.rsplit(".", 1)[0] in affected for d in deps
            ):
                affected.add(mod)
                grew = True
    leaf_names = {m.rsplit(".", 1)[-1] for m in affected}

    sel = set()
    for name, fn in queries.items():
        target = inspect.unwrap(fn)
        mod = getattr(target, "__module__", "")
        if mod in affected:
            sel.add(name)
            continue
        try:
            src = inspect.getsource(target)
        except (OSError, TypeError):
            sel.add(name)  # unknown provenance: run it
            continue
        if any(m in src for m in affected) or any(
            re.search(rf"\bimport\s+.*\b{re.escape(leaf)}\b", src)
            or re.search(rf"\b{re.escape(leaf)}\.\w+", src)
            for leaf in leaf_names
        ):
            sel.add(name)

    # Queries whose name shows up in touched hunks of __ray_entry__.py
    # (edited oracle SQL, registration, or helper).
    if "__ray_entry__.py" in changed:
        hunks = subprocess.check_output(
            ["git", "diff", "-U2", ref, "--", "__ray_entry__.py"],
            cwd=repo,
            text=True,
        )
        for name in queries:
            if f'"{name}"' in hunks:
                sel.add(name)
    return sel


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
    args = sys.argv[1:]
    since = None
    if "--changed-since" in args:
        i = args.index("--changed-since")
        since = args[i + 1]
        args = args[:i] + args[i + 2 :]
    sf_dir = args[0] if args else "/root/testdata/sf0.001"
    only = set(args[1:])

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
    if since is not None:
        sel = _changed_query_names(since, queries)
        skipped = len(queries) - len(sel)
        print(
            f"--changed-since {since}: {len(sel)} affected queries "
            f"({skipped} unaffected skipped): {' '.join(sorted(sel)) or '-'}"
        )
        if not sel:
            ray.shutdown()
            print("\n0 failures")
            return 0
        only = sel if not only else (only & sel)
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
