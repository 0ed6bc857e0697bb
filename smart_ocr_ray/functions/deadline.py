"""Cooperative per-row deadline (X4).

The reference bounds pathological pages with SIGALRM
(/root/reference/src/socr/figures/extractor.py:22-45); SIGALRM is
unusable off the main thread (Ray workers), so the Ray-native analog is
cooperative: the extract stage arms a thread-local deadline before
processing a row, and the parse loops (layout page loop, HTML
tokenizer, repair-loop attempt boundaries) poll ``check()`` — a single
``perf_counter`` read — raising ``DeadlineExceeded`` so the worker
aborts the stall *while it is happening*, not after.

Contract (per ADVICE r1): a row that completes is NEVER discarded for
having been slow — timeout rows appear only when work was actually
aborted mid-parse, keeping output independent of wall-clock load and
preserving the determinism/byte-identity contract.
"""

from __future__ import annotations

import threading
import time


class DeadlineExceeded(Exception):
    """Raised by ``check()`` when the armed deadline has passed."""


_local = threading.local()


def arm(seconds: float) -> None:
    """Arm a deadline ``seconds`` from now for this thread."""
    _local.deadline = time.perf_counter() + seconds


def disarm() -> None:
    _local.deadline = None


def check() -> None:
    """Raise ``DeadlineExceeded`` if an armed deadline has passed.

    No-op when no deadline is armed (oracle/tests/CLI paths), so pure
    functions stay pure."""
    deadline = getattr(_local, "deadline", None)
    if deadline is not None and time.perf_counter() > deadline:
        raise DeadlineExceeded
