"""Invariant-noise budget (host, exact) — SEAL's Decryptor.InvariantNoiseBudget.

The reference's CryptoTracker probes this at every decrypt in DEBUG builds
and throws at 0 (`HE Wrapper/CryptoTracker.cs:42-52`).  Same semantics here:
for w = [c(s)]_q (centered), the invariant noise is v with t*w/q = round + v,
and budget = -log2(2*max|v|) bits; decryption is correct while budget > 0.

Vectorized object-int math: the CRT compose and t*w mod q run as numpy
object-array expressions (one C-level loop over Python-int ops), not a
Python double loop — n=16384 probes cost ~0.1 s instead of minutes, so
verbose-mode per-layer budget tracking is usable at production ring sizes.
"""

from __future__ import annotations

import numpy as np

from .bfv import BFV, Ciphertext, KeySet


def noise_residues_budget(p, limbs: np.ndarray) -> int:
    """Budget from raw decrypt residues [k, N] (uint32 numpy)."""
    t, q = p.t, p.q_big
    acc = None
    for r, inv, punct, m in zip(
        limbs.astype(object),
        p.crt_q.inv_punctured,
        p.crt_q.punctured,
        p.crt_q.moduli,
    ):
        term = ((r * inv) % m) * punct
        acc = term if acc is None else acc + term
    w = acc % q
    r = (t * w) % q
    r = np.where(r > q >> 1, q - r, r)
    worst = int(max(r))
    if worst == 0:
        return q.bit_length() - 1
    # budget = floor(log2(q) - log2(2 * worst))
    return max(0, q.bit_length() - 1 - worst.bit_length())


def invariant_noise_budget(bfv: BFV, keys: KeySet, ct: Ciphertext) -> int:
    limbs = np.asarray(bfv.raw_decrypt_residues(keys, ct))
    assert limbs.ndim == 2, "pass a single ciphertext [size, k, N]"
    return noise_residues_budget(bfv.p, limbs)
