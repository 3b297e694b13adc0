"""tqdm-style progress for the CLI.

Reference parity: ``ct-db print`` / ``to_json`` pipe the record stream
through tqdm with the header's declared record count as the bar total
(``/root/reference/src/ceneton_database_utils/_cli.py:77-80``). tqdm is
a reference dependency but is not baked into this container, so
``_FallbackProgress`` provides the same surface (iterable wrapping,
``total``, ``update``, ``close``) on plain stderr; when tqdm IS
importable it is used directly.

The reference is single-process, so its record stream passes through
the driver by construction. Here ``print``'s count and ``to_json
--output`` run distributed, with no driver-side record stream to wrap —
``stage_progress`` instead polls ``SparkContext.statusTracker()`` (the
public monitoring API — a listener, not a collect) from a daemon thread
and renders completed/total tasks scaled to the header's record count.
"""

from __future__ import annotations

import contextlib
import sys
import threading

try:  # pragma: no cover - tqdm not present in this container
    from tqdm import tqdm as _tqdm
except ImportError:
    _tqdm = None


class _FallbackProgress:
    """Minimal tqdm stand-in: carriage-return progress line on stderr."""

    def __init__(self, iterable=None, total=None, desc="records", file=None):
        self.iterable = iterable
        self.total = total
        self.n = 0
        self.desc = desc
        self.file = file if file is not None else sys.stderr

    def __iter__(self):
        for item in self.iterable:
            yield item
            self.update(1)
        self.close()

    def update(self, n=1):
        self.n += n
        self.refresh()

    def refresh(self):
        if self.total:
            pct = min(100, 100 * self.n // self.total)
            line = f"{self.desc}: {self.n}/{self.total} {pct}%"
        else:
            line = f"{self.desc}: {self.n}"
        print(f"\r{line}", end="", file=self.file, flush=True)

    def close(self):
        self.refresh()
        print(file=self.file, flush=True)


def progress(iterable=None, total=None, desc="records"):
    """tqdm when available, stderr fallback otherwise."""
    if _tqdm is not None:  # pragma: no cover
        return _tqdm(iterable, total=total, desc=desc)
    return _FallbackProgress(iterable, total=total, desc=desc)


@contextlib.contextmanager
def stage_progress(spark, total_records: int | None, desc: str = "records"):
    """Progress for a distributed action with no driver-side stream.

    Polls the status tracker while the action runs inside the ``with``
    body; completed/total task fraction is scaled to ``total_records``
    (the FMP header's declared count). On clean exit the bar is driven
    to the total and closed, so even sub-poll-interval jobs render
    once; if the body raises, the bar closes at its last observed
    count instead of claiming completion.
    """
    bar = progress(total=total_records, desc=desc)
    stop = threading.Event()

    def _poll():
        tracker = spark.sparkContext.statusTracker()
        while not stop.wait(0.2):
            try:
                done = tasks = 0
                for sid in tracker.getActiveStageIds():
                    info = tracker.getStageInfo(sid)
                    if info is not None:
                        done += info.numCompletedTasks
                        tasks += info.numTasks
                if tasks:
                    bar.n = (
                        int(total_records * done / tasks) if total_records else done
                    )
                    bar.refresh()
            except Exception:  # tracker races with job teardown
                pass

    poller = threading.Thread(target=_poll, daemon=True)
    poller.start()
    completed = False
    try:
        yield bar
        completed = True
    finally:
        stop.set()
        poller.join(timeout=1.0)
        if completed and total_records is not None:
            # Only a clean exit snaps to 100%; a raised Spark action
            # leaves the bar at its last observed count.
            bar.n = total_records
        bar.close()
