"""Phase timing / profiling.

Reference parity: the tracing spans on the prover hot phases
(info_span! around commit/quotient/open, #[instrument] on the FRI prover and
grind — SURVEY.md §5). Here: a lightweight span stack with wall-clock
aggregation, optionally annotating jax profiler traces via
jax.profiler.TraceAnnotation.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict

_totals: dict[str, float] = defaultdict(float)
_counts: dict[str, int] = defaultdict(int)
_enabled = False


def enable(flag: bool = True) -> None:
    global _enabled
    _enabled = flag


def enabled() -> bool:
    return _enabled


def reset() -> None:
    _totals.clear()
    _counts.clear()


def report() -> dict[str, dict[str, float]]:
    return {
        name: {"total_s": _totals[name], "calls": _counts[name]}
        for name in sorted(_totals)
    }


@contextlib.contextmanager
def span(name: str):
    if not _enabled:
        yield
        return
    try:
        import jax.profiler

        annot = jax.profiler.TraceAnnotation(name)
    except Exception:  # pragma: no cover
        annot = contextlib.nullcontext()
    t0 = time.perf_counter()
    with annot:
        yield
    _totals[name] += time.perf_counter() - t0
    _counts[name] += 1
