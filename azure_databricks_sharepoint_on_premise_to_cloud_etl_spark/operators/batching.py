"""Batching / retry control flow (SURVEY.md 2.12 R1-R3).

The reference batches API payloads with ``np.array_split``
(code/ukg_open_census.py:549-554), retries a failed batch
element-by-element (``generate_err_batchs`` with size 1, :434-474,
:580-585), and skips-and-logs persistent failures
(code/ukg_wrkload_dtl.py:219-230).  These are *control-plane* utilities
— they batch driver-side API calls, not Spark data — so plain Python
is the right level; the data plane never loops.
"""

from __future__ import annotations

from collections.abc import Callable, Iterable, Sequence
from dataclasses import dataclass, field
from typing import Any


def generate_batches(items: Sequence[Any], batch_size: int) -> list[list[Any]]:
    """Split into contiguous batches of at most ``batch_size`` (R1)."""
    if batch_size <= 0:
        raise ValueError("batch_size must be positive")
    return [list(items[i : i + batch_size]) for i in range(0, len(items), batch_size)]


@dataclass
class BatchReport:
    """Outcome ledger for a batched, retried run (R2/R3)."""

    succeeded: list[Any] = field(default_factory=list)
    failed: list[tuple[Any, str]] = field(default_factory=list)

    @property
    def ok(self) -> bool:
        return not self.failed


def run_batched_with_retry(
    items: Sequence[Any],
    action: Callable[[list[Any]], Any],
    batch_size: int,
    error_batch_size: int = 1,
) -> BatchReport:
    """Apply ``action`` per batch; on failure, re-try that batch's
    elements in ``error_batch_size`` chunks (the reference's
    shrink-to-1 policy); persistent failures are recorded and skipped,
    never raised (R3 skip-and-log)."""
    report = BatchReport()
    for batch in generate_batches(items, batch_size):
        try:
            action(batch)
            report.succeeded.extend(batch)
        except Exception:
            for retry_batch in generate_batches(batch, error_batch_size):
                try:
                    action(retry_batch)
                    report.succeeded.extend(retry_batch)
                except Exception as e:  # noqa: BLE001 - ledger, not crash
                    report.failed.extend((x, str(e)) for x in retry_batch)
    return report


def foreach_partition_batched(
    df, action: Callable[[list[dict]], None], batch_size: int = 100
) -> None:
    """Scale path for side-effecting sinks (K5 at volume): fan the
    batched action out per partition instead of collecting to the
    driver.  ``action`` must be serializable and idempotent (a
    partition can be retried by Spark)."""

    def run_partition(rows: Iterable) -> None:
        buf: list[dict] = []
        for row in rows:
            buf.append(row.asDict())
            if len(buf) >= batch_size:
                action(buf)
                buf = []
        if buf:
            action(buf)

    df.foreachPartition(run_partition)
