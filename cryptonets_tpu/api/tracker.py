"""CryptoTracker: noise-budget watchdog (ref `HE Wrapper/CryptoTracker.cs`).

Probes the invariant noise budget of live ciphertexts, records the minimum
seen, warns on new minima, and raises when the budget hits zero — the
reference's DEBUG-mode behavior (`CryptoTracker.cs:42-52`)."""

from __future__ import annotations

import numpy as np

from ..crypto.bfv import Ciphertext
from ..crypto.noise import invariant_noise_budget


class BudgetExhausted(RuntimeError):
    pass


class CryptoTracker:
    min_budget_so_far: int | None = None
    enabled = True

    @classmethod
    def reset(cls):
        cls.min_budget_so_far = None

    @classmethod
    def test_vector_budget(cls, vec, warn: bool = True) -> int | None:
        """Minimum budget across plain primes and blocks of an HEVector."""
        if not cls.enabled or not getattr(vec, "is_encrypted", False):
            return None
        fac = vec.factory
        worst = None
        for pi in range(fac.P):
            for c in range(vec.data.shape[1]):
                b = invariant_noise_budget(
                    fac.bfv[pi], fac.keys, Ciphertext(vec.data[pi, c])
                )
                worst = b if worst is None else min(worst, b)
        if worst is not None:
            if cls.min_budget_so_far is None or worst < cls.min_budget_so_far:
                cls.min_budget_so_far = worst
                if warn:
                    print(f"Warning: noise budget decreased to {worst} bits")
            if worst <= 0:
                raise BudgetExhausted("noise budget exhausted (0 bits)")
        return worst


def test_budget(matrix, factory) -> int | None:
    """Budget of column 0 of a layer output (ref `BaseLayer.cs:38`)."""
    col = None
    if hasattr(matrix, "vectors"):
        col = matrix.vectors[0]
    elif hasattr(matrix, "is_encrypted"):
        col = matrix
    if col is None or not getattr(col, "is_encrypted", False):
        return None
    return CryptoTracker.test_vector_budget(col)
