"""Driver-visibility ordering invariants.

The driver's correctness gate samples the first ``_DRIVER_WINDOW`` entries of
``__spark_entry__.queries()``. These tests pin the contract:

- importing ``cloudfloe_spark.queries`` does NOT mutate registration order
  (the reorder is an explicit hook, not an import side effect);
- the window leads with failed rows, then never-checked entries, then
  proven greens STALEST-FIRST so regressions to green operators are
  re-checked within a bounded number of rounds;
- a re-verified entry moves to the back of the staleness order.
"""

from __future__ import annotations

import glob
import json
import os

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _latest_status() -> dict[str, bool]:
    latest: dict[str, bool] = {}
    for path in sorted(glob.glob(os.path.join(ROOT, "CORRECTNESS_r*.json"))):
        with open(path) as f:
            data = json.load(f)
        for name, row in data.items():
            if isinstance(row, dict):
                latest[name] = bool(
                    row.get("rows_match")
                    and row.get("schema_match")
                    and row.get("hash_match")
                    and not row.get("err")
                )
    return latest


def test_import_does_not_reorder():
    # A fresh interpreter would be the clean check; within pytest the best
    # proxy is that the priority order differs from plain registration order
    # while all_queries() (pre-hook) can still be reordered idempotently.
    from cloudfloe_spark import queries as q

    order = q.driver_priority_order()
    assert sorted(order) == sorted(q.all_queries().keys())
    # Calling the hook twice is idempotent.
    q.apply_driver_ordering()
    first = list(q.all_queries())
    q.apply_driver_ordering()
    assert list(q.all_queries()) == first
    assert first == order


def test_window_leads_failed_then_pending_then_green_sample():
    from cloudfloe_spark import queries as q

    latest = _latest_status()
    if not latest:  # no recorded rounds — nothing to pin
        return
    order = q.driver_priority_order()
    window = order[: q._DRIVER_WINDOW]
    red = [n for n in window if latest.get(n) is False]
    pending = [n for n in window if n not in latest]
    greens = [n for n in window if latest.get(n)]
    # Failed rows must all be inside (and at the very front of) the window.
    all_red = [n for n in order if latest.get(n) is False]
    assert window[: len(all_red)] == red == all_red
    # Pending entries follow the reds contiguously.
    assert window[len(red) : len(red) + len(pending)] == pending
    # Any leftover slots are filled by proven greens (rotating sample).
    assert len(red) + len(pending) + len(greens) == len(window)


def test_green_reverification_is_stale_first(monkeypatch):
    """r13: proven greens order STALEST-FIRST — the window always
    re-verifies the entries whose last driver check is oldest, so no
    family drifts unverified while fresher ones re-enter the sample."""
    from cloudfloe_spark import queries as q

    latest = _latest_status()
    if not any(latest.values()):
        return
    base_green = {n for n, ok in latest.items() if ok}
    base_red = {n for n, ok in latest.items() if not ok}
    # synthetic staleness: alternate entries checked at round 0 vs 9
    names = sorted(base_green)
    last = {n: (0 if i % 2 == 0 else 9) for i, n in enumerate(names)}
    monkeypatch.setattr(
        q, "_driver_row_status", lambda: (base_green, base_red, last)
    )
    order = q.driver_priority_order()
    greens = [n for n in order if n in base_green]
    stale_count = sum(1 for n in names if last[n] == 0)
    assert all(last[n] == 0 for n in greens[:stale_count])
    assert all(last[n] == 9 for n in greens[stale_count:])
    # a re-check updates staleness and pushes the entry to the back
    bumped = dict(last)
    bumped[greens[0]] = 10
    monkeypatch.setattr(
        q, "_driver_row_status", lambda: (base_green, base_red, bumped)
    )
    order2 = q.driver_priority_order()
    greens2 = [n for n in order2 if n in base_green]
    assert greens2[-1] == greens[0]
    # Every order is a permutation of the catalog regardless of staleness.
    assert sorted(order) == sorted(q.all_queries().keys())
