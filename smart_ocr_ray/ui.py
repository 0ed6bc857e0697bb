"""Run-report rendering — the Ray-native analog of the reference's
terminal UI layer (``/root/reference/src/socr/ui/progress.py``
``panels.py`` ``theme.py``: rich Live progress bars, ``StagePanel``
per-stage result lines, ``SummaryPanel`` run stats / engine usage /
output paths).

In the reference, a driver-attached CLI paints live panels while a
sequential loop processes files. On a Ray cluster, live per-task
progress already belongs to Ray Data's own progress bars and the
dashboard — duplicating them would fight the executor — so the analog
surface here is the POST-RUN REPORT: per-partition stage lines (rows,
wall, throughput, pass rate, failure-mode counts) assembled from the
same lineage manifests ``state.manifests.run_partitioned`` commits,
plus a per-operator wall breakdown parsed best-effort from
``Dataset.stats()``. Plain text (no terminal-styling dependency),
deterministic ordering, so reports diff cleanly across runs and can be
committed next to the output shards.

Scale shape: the report reads ONLY the O(partitions) manifest JSONs —
never the output shards — so rendering cost is independent of corpus
size.
"""

from __future__ import annotations

import re

_BAR_WIDTH = 24


def _bar(frac: float, width: int = _BAR_WIDTH) -> str:
    """The reference's minimal progress-line glyph (panels.py
    ``add_progress_line``) rendered as plain text."""
    frac = min(max(frac, 0.0), 1.0)
    fill = int(round(frac * width))
    return "[" + "#" * fill + "-" * (width - fill) + "]"


class RunReport:
    """Accumulates stage lines and metrics, renders one text block —
    the ``StagePanel`` + ``SummaryPanel`` shapes without a live
    terminal."""

    def __init__(self, title: str) -> None:
        self.title = title
        self._lines: list[str] = []

    def add_stage(self, num: int, name: str, subtitle: str = "") -> None:
        head = f"stage {num}: {name}"
        if subtitle:
            head += f" — {subtitle}"
        self._lines.append("")
        self._lines.append(head)

    def add_metric(self, label: str, value) -> None:
        self._lines.append(f"    {label}: {value}")

    def add_result(self, item: str, status: str, message: str = "") -> None:
        icon = {"ok": "+", "skip": "~", "fail": "x"}.get(status, ".")
        line = f"    [{icon}] {item}"
        if message:
            line += f"  {message}"
        self._lines.append(line)

    def add_progress(self, current: int, total: int, label: str = "") -> None:
        frac = current / total if total else 1.0
        self._lines.append(
            f"    {_bar(frac)} {current}/{total}" + (f" {label}" if label else "")
        )

    def render(self) -> str:
        rule = "=" * max(len(self.title), 8)
        return "\n".join([rule, self.title, rule, *self._lines, ""])


def stats_breakdown(stats: str) -> list[tuple[str, float]]:
    """Best-effort (operator, wall seconds) pairs from a
    ``Dataset.stats()`` string — the per-stage timing view the
    reference's live bars provide per engine. Unparseable input yields
    an empty list rather than an error (the stats format is not a
    stable API)."""
    out: list[tuple[str, float]] = []
    for m in re.finditer(
        r"^Operator \d+ (.+?): .*? in ([0-9.]+)s", stats, re.M
    ):
        out.append((m.group(1), float(m.group(2))))
    return out


def report_from_manifests(out_dir: str, title: str = "extract run") -> str:
    """Render the post-run report for a ``run_partitioned`` output
    directory from its committed lineage manifests: one stage line per
    partition (rows, wall, docs/s, pass rate, failure modes) and a
    summary panel (totals, engine-failure rollup, output path) —
    the ``SummaryPanel.set_stats`` surface."""
    from .state.manifests import committed_parts, load_manifest

    parts = committed_parts(out_dir)
    rep = RunReport(title)
    total_rows = 0
    total_wall_ms = 0.0
    total_passed = 0
    failures: dict[str, int] = {}
    for i, part in enumerate(parts, start=1):
        man = load_manifest(out_dir, part) or {}
        rows = int(man.get("row_count", 0))
        wall_ms = float(man.get("wall_ms", 0.0))
        met = man.get("metrics", {}) or {}
        total_rows += rows
        total_wall_ms += wall_ms
        total_passed += int(met.get("n_passed", 0))
        for k, v in (met.get("failure_counts", {}) or {}).items():
            failures[k] = failures.get(k, 0) + int(v)
        rate = f"{rows / (wall_ms / 1000.0):,.0f} docs/s" if wall_ms else "cached"
        rep.add_stage(i, f"partition {part}")
        rep.add_metric("rows", f"{rows:,}")
        rep.add_metric("wall", f"{wall_ms / 1000.0:.2f}s ({rate})")
        if rows:
            rep.add_metric(
                "pass_rate", f"{met.get('pass_rate', 0.0):.4f}"
            )
        for mode, cnt in sorted((met.get("failure_counts", {}) or {}).items()):
            rep.add_result(mode, "fail", f"x{cnt}")

    rep.add_stage(len(parts) + 1, "summary")
    rep.add_metric("partitions", len(parts))
    rep.add_progress(len(parts), len(parts), "committed")
    rep.add_metric("total_rows", f"{total_rows:,}")
    rep.add_metric("total_wall", f"{total_wall_ms / 1000.0:.2f}s")
    if total_wall_ms:
        rep.add_metric(
            "throughput",
            f"{total_rows / (total_wall_ms / 1000.0):,.0f} docs/s",
        )
    if total_rows:
        rep.add_metric("passed", f"{total_passed:,} / {total_rows:,}")
    for mode, cnt in sorted(failures.items()):
        rep.add_result(mode, "fail", f"x{cnt}")
    rep.add_metric("output", out_dir)
    return rep.render()
