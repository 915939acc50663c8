"""Invariant-noise budget (host, exact) — SEAL's Decryptor.InvariantNoiseBudget.

The reference's CryptoTracker probes this at every decrypt in DEBUG builds
and throws at 0 (`HE Wrapper/CryptoTracker.cs:42-52`).  Same semantics here:
for w = [c(s)]_q (centered), the invariant noise is v with t*w/q = round + v,
and budget = -log2(2*max|v|) bits; decryption is correct while budget > 0.
"""

from __future__ import annotations

import numpy as np

from .bfv import BFV, Ciphertext, KeySet


def invariant_noise_budget(bfv: BFV, keys: KeySet, ct: Ciphertext) -> int:
    p = bfv.p
    limbs = np.asarray(bfv.raw_decrypt_residues(keys, ct)).astype(object)
    t, q, crt = p.t, p.q_big, p.crt_q
    worst = 0
    for idx in range(p.n):
        w = crt.compose([int(limbs[l, idx]) for l in range(p.k)])
        r = (t * w) % q
        if r > q // 2:
            r = q - r
        worst = max(worst, r)
    if worst == 0:
        return q.bit_length() - 1
    # budget = floor(log2(q) - log2(2 * worst))
    return max(0, q.bit_length() - 1 - worst.bit_length())
