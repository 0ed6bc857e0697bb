"""The integer-grid convention shared by every driver-gate surface.

Float aggregates cross the Ray↔DuckDB engine boundary only as
integer-scaled values summed/floor-divided identically on both sides
(the r1 lesson: `round()` on both sides still diverges with summation
order and engine rounding modes). Every producer of an ``*_e6`` column
MUST use this one helper so the grid can never drift between the
golden writer, the aggregation queries, and the scoring pipeline.
"""

from __future__ import annotations


def e6(x: float) -> int:
    """Scale onto the 1e-6 integer grid (Python bankers' rounding —
    the same call everywhere, so both engines aggregate identical
    integers)."""
    return int(round(float(x) * 1_000_000))
