"""Resumable partition backfill — the orchestration primitive for
"re-process two years of history" jobs.

The reference schedules its whole-table re-extract through Airflow
(dags/dag.py:284-342, one monolithic 12-hourly run); at 100 TB a
backfill must instead walk the partition list in bounded units of
work, survive a crash mid-way, and NEVER re-process a completed
partition (the transforms may not be idempotent, and even idempotent
ones shouldn't pay twice). This module is that loop, deliberately
driver-side and tiny:

- work units are PARTITION IDS (strings — dates, key buckets, region
  codes); the caller's ``process(partition_id)`` does the actual
  Spark work (read partition → transform → write partition);
- completion state is an append-only ledger file (one id per line,
  written via atomic rename AFTER ``process`` returns) — a crash
  between processing and recording re-runs exactly that one
  partition on resume, the standard at-least-once boundary every
  checkpointed system has; callers needing exactly-once make
  ``process`` idempotent per partition (merge_upsert, manifest
  publish) exactly as foreachBatch sinks do;
- ``max_per_run`` bounds one invocation (run it from cron/a scheduler
  until ``remaining == 0``), keeping each run's blast radius and
  cluster reservation small.

The ledger is deliberately NOT a Spark table: it is driver-metadata
(thousands of lines at most), read once per run, and must be cheap to
inspect/edit operationally (`cat`-able, one id per line).
"""

from __future__ import annotations

import os
from collections.abc import Callable, Sequence


def _read_ledger(path: str) -> list[str]:
    if not os.path.exists(path):
        return []
    with open(path) as fh:
        return [ln.strip() for ln in fh if ln.strip()]


def _append_ledger(path: str, entry: str) -> None:
    # atomic append: write full new content to a tmp file, rename over
    # — a crash mid-write leaves the old ledger intact, never a torn
    # line (POSIX rename; for object stores keep the ledger on the
    # driver's durable volume or a manifest-published dir)
    done = _read_ledger(path)
    tmp = path + ".tmp"
    with open(tmp, "w") as fh:
        fh.write("".join(f"{d}\n" for d in [*done, entry]))
    os.replace(tmp, path)


def backfill_run(
    partitions: Sequence[str],
    ledger_path: str,
    process: Callable[[str], None],
    max_per_run: int | None = None,
) -> dict:
    """Process every partition id in ``partitions`` not yet recorded
    in the ledger, in the given order, recording each AFTER its
    ``process`` call returns. Returns a summary dict:
    ``{"processed": [...], "skipped": n_prior, "remaining": n_left}``.

    A raising ``process`` stops the run with that partition
    unrecorded — the next invocation resumes AT the failed partition.
    Unknown ledger entries (partitions renamed/removed from the list)
    are ignored rather than fatal: the ledger records history, the
    partition list defines the current goal.
    """
    ids = list(partitions)
    if len(set(ids)) != len(ids):
        raise ValueError("backfill_run: duplicate partition ids")
    done = set(_read_ledger(ledger_path))
    todo = [p for p in ids if p not in done]
    budget = len(todo) if max_per_run is None else max(0, max_per_run)
    processed: list[str] = []
    for pid in todo[:budget]:
        process(pid)
        _append_ledger(ledger_path, pid)
        processed.append(pid)
    return {
        "processed": processed,
        "skipped": len(ids) - len(todo),
        "remaining": len(todo) - len(processed),
    }
