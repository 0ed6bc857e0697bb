"""Command-line entry points (the ``socr process`` analog).

    python -m smart_ocr_ray.cli extract --input DIR_OR_FILE --output DIR \\
        [--partitions N] [--multi-extractor] [--resume/--no-resume]
    python -m smart_ocr_ray.cli score --extracted DIR --golden FILE
    python -m smart_ocr_ray.cli query NAME --sf DIR [--output DIR] [--list]
    python -m smart_ocr_ray.cli convert --input SHARD_DIR --output DIR \\
        [--format warc|jsonl]
    python -m smart_ocr_ray.cli fixtures --rows 1000 --output FILE

Owns the Ray session (guarded init, per the repo's session contract);
exits with the session shut down so the next run starts clean.
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def _ensure_ray(num_cpus: int | None) -> None:
    """Guarded init honoring the deployment context: under ``ray job
    submit`` (or any pre-provisioned cluster) ``RAY_ADDRESS`` points at
    the running cluster and we CONNECT — starting a private local
    cluster inside a job driver would silently run the pipeline on one
    node. Only a genuinely local session takes ``num_cpus``."""
    import os

    import ray

    if not ray.is_initialized():
        address = os.environ.get("RAY_ADDRESS", "local")
        kwargs = {"address": address, "include_dashboard": False}
        if num_cpus and address == "local":
            kwargs["num_cpus"] = num_cpus
        ray.init(**kwargs)


def cmd_extract(args: argparse.Namespace) -> int:
    _ensure_ray(args.num_cpus)
    from .state.manifests import run_partitioned

    summary = run_partitioned(
        args.input,
        args.output,
        num_partitions=args.partitions,
        input_sig=args.input_sig,
        multi_extractor=args.multi_extractor,
    )
    # post-run report (the reference's ui/ panel surface, rendered from
    # the lineage manifests): written next to the shards + printed
    from .ui import report_from_manifests

    report = report_from_manifests(args.output)
    report_path = os.path.join(args.output, "report.txt")
    with open(report_path, "w") as f:
        f.write(report)
    print(report, file=sys.stderr)
    summary["report"] = report_path
    print(json.dumps(summary))
    return 0


def cmd_score(args: argparse.Namespace) -> int:
    _ensure_ray(args.num_cpus)
    import pyarrow.parquet as pq

    from .pipelines.score import rollup_by_extractor, score_against_golden
    from .state.manifests import read_extracted

    golden_table = pq.read_table(args.golden)
    golden = dict(
        zip(
            golden_table.column("url").to_pylist(),
            golden_table.column("extracted_text").to_pylist(),
        )
    )
    extracted = read_extracted(args.extracted)
    if extracted is None:
        print(
            f"error: no committed partitions under {args.extracted} "
            "(run `extract` first)",
            file=sys.stderr,
        )
        return 1
    rollup = rollup_by_extractor(score_against_golden(extracted, golden))
    for row in rollup.take_all():
        print(json.dumps(row))
    return 0


def cmd_convert(args: argparse.Namespace) -> int:
    """Raw corpus shards → Parquet (the ingest step ahead of
    ``extract`` / the documents-table operators): one parse task per
    shard, written as one parquet file per output block so downstream
    readers keep the file-per-block parallelism unit. ``--format
    warc`` (default) yields the pages schema; ``--format jsonl`` the
    documents schema."""
    _ensure_ray(args.num_cpus)
    if args.format == "jsonl":
        from .sources.jsonl import read_jsonl_docs as _read
    else:
        from .sources.warc import read_warc as _read

    ds = _read(args.input)
    ds.write_parquet(args.output)
    print(json.dumps({"out": args.output, "format": args.format}))
    return 0


def cmd_fixtures(args: argparse.Namespace) -> int:
    import pyarrow.parquet as pq

    from .fixtures import generate_pages

    table = generate_pages(args.rows, seed=args.seed)
    pq.write_table(table, args.output)
    print(f"wrote {table.num_rows} rows to {args.output}")
    return 0


def _load_entry():
    """Import the repo-root ``__ray_entry__`` driver-contract module
    (the one place every query pipeline is registered) relative to the
    package, so the CLI finds it from any working directory."""
    import importlib.util
    from pathlib import Path

    path = Path(__file__).resolve().parent.parent / "__ray_entry__.py"
    spec = importlib.util.spec_from_file_location("__ray_entry__", path)
    module = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(module)
    return module


def cmd_query(args: argparse.Namespace) -> int:
    """Run any registered query pipeline by name over an sf-style table
    directory — the generic entry point for the ops catalog (dedup,
    similarity, link graph, events, sampling, ...), so a user does not
    need to write a driver script per operator."""
    entry = _load_entry()
    names = entry.queries()
    if args.list:
        print("\n".join(sorted(names)))
        return 0
    if not args.name or args.name not in names:
        print(
            f"unknown query {args.name!r} — `query --list` prints the "
            f"{len(names)} available names",
            file=sys.stderr,
        )
        return 2
    if not args.sf:
        print("--sf DIR is required to run a query", file=sys.stderr)
        return 2
    _ensure_ray(args.num_cpus)
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data

    result = names[args.name](args.sf)
    summary = {"query": args.name}
    if isinstance(result, ray.data.Dataset):
        if args.output:
            result.write_parquet(args.output)
            summary["output"] = args.output
        summary["rows"] = result.count()
    else:
        table = result if isinstance(result, pa.Table) else pa.Table.from_pandas(result)
        if args.output:
            out = args.output
            if not out.endswith(".parquet"):
                import os

                os.makedirs(out, exist_ok=True)
                out = f"{out}/result.parquet"
            pq.write_table(table, out)
            summary["output"] = out
        summary["rows"] = table.num_rows
    print(json.dumps(summary))
    return 0


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(prog="smart_ocr_ray")
    parser.add_argument("--num-cpus", type=int, default=None)
    sub = parser.add_subparsers(dest="command", required=True)

    p = sub.add_parser("extract", help="run the extraction pipeline, resumably")
    p.add_argument("--input", required=True, help="pages parquet file or directory")
    p.add_argument("--output", required=True, help="output directory (partitioned)")
    p.add_argument("--partitions", type=int, default=None,
                   help="partition count; default: auto-sized from corpus bytes vs object-store budget")
    p.add_argument("--input-sig", default="", help="input fingerprint for resume validity")
    p.add_argument("--multi-extractor", action="store_true")
    p.set_defaults(fn=cmd_extract)

    p = sub.add_parser("score", help="WER/CER/NES vs a golden table")
    p.add_argument("--extracted", required=True)
    p.add_argument("--golden", required=True)
    p.set_defaults(fn=cmd_score)

    p = sub.add_parser("convert", help="WARC/JSONL shards -> parquet")
    p.add_argument("--input", required=True, help="shard file(s) or directory")
    p.add_argument("--output", required=True, help="parquet output directory")
    p.add_argument("--format", choices=("warc", "jsonl"), default="warc")
    p.set_defaults(fn=cmd_convert)

    p = sub.add_parser("query", help="run a registered query pipeline by name")
    p.add_argument("name", nargs="?", default=None, help="query name (see --list)")
    p.add_argument("--sf", default=None, help="table directory (documents/events/... parquet)")
    p.add_argument("--output", default=None, help="write the result as parquet here")
    p.add_argument("--list", action="store_true", help="print available query names")
    p.set_defaults(fn=cmd_query)

    p = sub.add_parser("fixtures", help="generate a synthetic pages table")
    p.add_argument("--rows", type=int, default=1000)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--output", required=True)
    p.set_defaults(fn=cmd_fixtures)

    args = parser.parse_args(argv)
    try:
        return args.fn(args)
    finally:
        import ray

        if ray.is_initialized():
            ray.shutdown()


if __name__ == "__main__":
    sys.exit(main())
