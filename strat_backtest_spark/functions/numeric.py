"""Numeric parity helpers.

The oracle mirrors round floating scores with SQL ``round()``, which
in both Spark (java BigDecimal HALF_UP) and DuckDB rounds a half tie
AWAY FROM ZERO. ``np.round`` is banker's half-to-even — a score
landing exactly on a .5 tie at the rounded digit would round the other
way and flip a ``>= threshold`` filter against the oracle. Any numpy
code whose rounded output feeds an oracle-checked comparison or column
must round through this helper instead.
"""

from __future__ import annotations

import numpy as np


def round_half_up(x: np.ndarray, decimals: int) -> np.ndarray:
    """Element-wise round-half-away-from-zero, matching Spark
    ``F.round`` / DuckDB ``round()`` semantics (sign-aware: HALF_UP
    on negatives rounds -2.5 to -3, where ``np.floor(x + 0.5)``
    alone would give -2)."""
    scale = 10.0 ** decimals
    return np.sign(x) * np.floor(np.abs(x) * scale + 0.5) / scale
