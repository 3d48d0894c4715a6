"""THE order-insensitive result normalization the driver's hash
comparison is modeled on -- shared by tests/driver_gate_check.py and
tests/oracle_probe.py so the two verdicts can never drift."""

from __future__ import annotations

import math


def canon(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])

    def norm(v):
        if v is None or (isinstance(v, float) and math.isnan(v)):
            return "<null>"
        if isinstance(v, bool):
            return str(v)
        if isinstance(v, float):
            return f"{v:.6f}"
        return str(v)

    return sorted(tuple(norm(r[i]) for i in order) for r in rows)
