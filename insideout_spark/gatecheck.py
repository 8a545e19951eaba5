"""Shared result-comparison normalization for the correctness gates.

ONE definition used by both the committed gate replica
(jobs/local_gate.py) and the pytest replica (tests/test_entry_contract
.py) — the two previously carried copy-pasted twins, and the NULL-safe
sort-key fix had to be applied in both (review r05): any future tweak
(new cell type, different NaN policy) now lands in one place.
"""

from __future__ import annotations

import math


def norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v  # exact equality required
    if isinstance(v, bool):
        return bool(v)
    return v


def normalize(cols, rows):
    """Column-name-sorted, row-sorted normalization with a TOTAL row
    order even for NULL-bearing / mixed-type cells (crawl_diff's
    nullable doc ids): sort key is (is_null, str) per cell; equality
    still compares the exact values."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    names = [cols[i] for i in order]
    data = sorted(
        (tuple(norm_cell(r[i]) for i in order) for r in rows),
        key=lambda row: tuple((c is None, str(c)) for c in row),
    )
    return names, data
