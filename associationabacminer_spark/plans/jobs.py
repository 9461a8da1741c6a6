"""Sliding calendar-window job planner.

Mirrors the reference's window generator — 30-day observation + 1-day
operation windows sliding daily over [calendar_start, calendar_end)
(/root/reference/src/job/WindowGenerator.py:13-24, defaults at
/root/reference/src/job/job_generator.py:132-136) — as a plain function
producing (obs_start, obs_end, opr_end) bounds.  The per-window work is
then one filtered DataFrame program; Catalyst turns the time predicate
into parquet row-group / partition pruning (the reference relied on a
Mongo B-tree index for the same effect, SURVEY.md §4 O1).
"""

from __future__ import annotations

from datetime import datetime, timedelta


def sliding_windows(
    start: datetime,
    end: datetime,
    obs_days: int = 30,
    opr_days: int = 1,
    slide_days: int = 1,
):
    """Yield (obs_start, obs_end, opr_end) triples; obs_end is also the
    operation-period start, matching the reference's layout."""
    cur = start
    while cur + timedelta(days=obs_days + opr_days) <= end:
        obs_end = cur + timedelta(days=obs_days)
        yield cur, obs_end, obs_end + timedelta(days=opr_days)
        cur = cur + timedelta(days=slide_days)
