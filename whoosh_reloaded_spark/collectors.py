"""Collector utilities: time-limited search.

The reference's TimeLimitCollector (collectors.py:1012-1110) arms a timer
thread + SIGALRM and aborts the matcher loop, keeping partial results.  The
Spark-native equivalent cancels the distributed JOB: the collect runs in a
worker thread under its own job group; when the limit fires the job group
is cancelled (tasks are interrupted) and :class:`TimeLimit` raises.

Partial results are deliberately NOT returned: a cancelled distributed
top-k has no meaningful partial state (unlike the reference's sequential
docnum scan, which has visited a docid prefix).  Callers wanting partial
answers should search a docid-range subset instead — at 100 TB that is the
sound "budget" pattern (bounded work, exact over the subset).
"""

from __future__ import annotations

import threading
import uuid
from typing import Optional

from pyspark.sql import DataFrame


class TimeLimit(Exception):
    """Raised when a time-limited search exceeds its budget."""


def collect_with_time_limit(df: DataFrame, timelimit: float):
    """Collect `df` with a wall-clock budget; cancels the Spark job group
    and raises TimeLimit when exceeded."""
    spark = df.sparkSession
    sc = spark.sparkContext
    group = f"timelimit-{uuid.uuid4().hex[:12]}"
    out: dict = {}

    def run():
        # job-group assignment is thread-local; interruptOnCancel interrupts
        # running tasks instead of waiting them out
        sc.setJobGroup(group, "time-limited search", interruptOnCancel=True)
        try:
            out["rows"] = df.collect()
        except Exception as e:  # cancelled jobs surface as exceptions
            out["error"] = e
        finally:
            sc.setJobGroup(None, None)

    t = threading.Thread(target=run, daemon=True)
    t.start()
    t.join(timelimit)
    if t.is_alive():
        sc.cancelJobGroup(group)
        t.join(5.0)
        raise TimeLimit(f"search exceeded {timelimit}s")
    if "error" in out:
        raise out["error"]
    return out["rows"]


def search_with_time_limit(searcher, q, timelimit: float,
                           limit: Optional[int] = 10):
    """TimeLimitCollector analogue: top-k rows or TimeLimit.

    >>> try:
    ...     rows = search_with_time_limit(s, q, timelimit=5.8)
    ... except TimeLimit:
    ...     print("The search ran out of time!")
    """
    return collect_with_time_limit(searcher.search(q, limit=limit), timelimit)
