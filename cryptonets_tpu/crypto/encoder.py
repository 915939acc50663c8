"""Batch encoder: Z_t^n SIMD slots <-> plaintext polynomial (ref BatchEncoder).

Implements SEAL's slot layout — a 2 x (n/2) matrix whose rows rotate under
the Galois element 3^steps and swap under 2n-1 (`AtomicSealBfvVector.cs:
1114-1170`; the packing layers Duplicate/Interleave/SumAllSlots depend on
this exact structure, SURVEY.md "hard parts" #4).

Encoding runs CLIENT-side (host): a length-n negacyclic NTT over Z_t.
For t < 2**31 we use vectorized numpy uint64 (exact: products < 2**62).
For the reference's large plain primes (up to ~40 bits, e.g. CryptoNets'
549764251649) the same algorithm runs over object-dtype exact ints, with
a native C++ fast path in runtime/ when built.
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np

from .hostmath import bit_reverse, modinv
from .primes import min_primitive_2n_root


@lru_cache(maxsize=None)
def _host_tables(n: int, t: int):
    """psi-power tables (bit-reversed) + slot index map for modulus t."""
    logn = n.bit_length() - 1
    psi = min_primitive_2n_root(t, n)
    ipsi = modinv(psi, t)
    pf = np.empty(n, dtype=object)
    pi = np.empty(n, dtype=object)
    cf = ci = 1
    for i in range(n):
        pf[i] = cf
        pi[i] = ci
        cf = cf * psi % t
        ci = ci * ipsi % t
    rev = np.array([bit_reverse(i, logn) for i in range(n)])
    # SEAL matrix_reps_index_map: slot i of row r -> coefficient position
    m = 2 * n
    row = n // 2
    pos = 1
    index_map = np.empty(n, np.int64)
    for i in range(row):
        index_map[i] = bit_reverse((pos - 1) >> 1, logn)
        index_map[i + row] = bit_reverse((m - pos - 1) >> 1, logn)
        pos = pos * 3 % m
    return pf[rev], pi[rev], modinv(n, t), index_map


def _ntt_host(x, table, t):
    """Forward negacyclic NTT (standard in, bit-reversed out), vectorized
    numpy; dtype is uint64 (t < 2**31) or object (exact big ints)."""
    n = x.shape[-1]
    logn = n.bit_length() - 1
    for s in range(logn):
        mblk = 1 << s
        half = n >> (s + 1)
        v = x.reshape(*x.shape[:-1], mblk, 2, half)
        u, w = v[..., 0, :], v[..., 1, :]
        tw = table[mblk : 2 * mblk].reshape(mblk, 1)
        wv = (w * tw) % t
        # (u + t - wv): avoid uint64 underflow; u, wv < t < 2**31
        v2 = np.stack([(u + wv) % t, (u + t - wv) % t], axis=-2)
        x = v2.reshape(*x.shape)
    return x


def _intt_host(x, table, n_inv, t):
    """Inverse (bit-reversed in, standard out)."""
    n = x.shape[-1]
    logn = n.bit_length() - 1
    for s in range(logn):
        hblk = n >> (s + 1)
        half = n // (2 * hblk)
        v = x.reshape(*x.shape[:-1], hblk, 2, half)
        u, w = v[..., 0, :], v[..., 1, :]
        tw = table[hblk : 2 * hblk].reshape(hblk, 1)
        v2 = np.stack([(u + w) % t, (((u + t - w) % t) * tw) % t], axis=-2)
        x = v2.reshape(*x.shape)
    return (x * n_inv) % t


class BatchEncoder:
    """values[0:n/2] = row 0, values[n/2:n] = row 1 (SEAL slot order)."""

    def __init__(self, n: int, t: int):
        if (t - 1) % (2 * n) != 0:
            raise ValueError(
                f"plain modulus {t} does not support batching for n={n}"
            )
        self.n, self.t = n, t
        self.slot_count = n
        pf, pi, n_inv, index_map = _host_tables(n, t)
        self._small = t < (1 << 31)
        if self._small:
            self.pf = pf.astype(np.uint64)
            self.pi = pi.astype(np.uint64)
        else:
            self.pf, self.pi = pf, pi
            if t < (1 << 63):  # native C++ 128-bit path tables
                self.pf64 = np.array([int(v) for v in pf], np.uint64)
                self.pi64 = np.array([int(v) for v in pi], np.uint64)
        self.n_inv = n_inv
        self.index_map = index_map

    def _cast(self, x):
        return x.astype(np.uint64) if self._small else x.astype(object)

    def encode(self, values) -> np.ndarray:
        """values (ints, len <= n, signed ok) -> poly coeffs int64/object [n]."""
        v = np.asarray(values, dtype=object) % self.t
        if not self._small and self.t < (1 << 63):
            from ..runtime import hostcrypto

            buf = np.zeros(self.n, np.uint64)
            buf[self.index_map[: len(v)]] = np.array(
                [int(x) for x in v], np.uint64
            )
            out = hostcrypto.ntt_inverse(buf, self.pi64, self.n_inv, self.t)
            if out is not None:
                return out.astype(object)
        buf = np.zeros(self.n, dtype=np.uint64 if self._small else object)
        buf[self.index_map[: len(v)]] = (
            v.astype(np.uint64) if self._small else v
        )
        coeffs = _intt_host(self._cast(buf), self.pi, self.n_inv, self.t)
        return coeffs.astype(np.int64) if self._small else coeffs

    def decode(self, coeffs) -> np.ndarray:
        """poly coeffs -> slot values, object ints in [0, t)."""
        cobj = np.asarray(coeffs, dtype=object) % self.t
        if not self._small and self.t < (1 << 63):
            from ..runtime import hostcrypto

            buf = np.array([int(x) for x in cobj], np.uint64)
            out = hostcrypto.ntt_forward(buf, self.pf64, self.t)
            if out is not None:
                return out.astype(object)[self.index_map]
        c = self._cast(cobj)
        evals = _ntt_host(c, self.pf, self.t)
        return np.asarray(evals, dtype=object)[self.index_map]

    def encode_int_big(self, values: np.ndarray) -> np.ndarray | None:
        """Fast encode for big t in [2**31, 2**62): int64 slot values ->
        uint64 coefficient array via the native C++ 128-bit NTT, no object
        arithmetic.  Returns None when the native runtime is unavailable
        (callers fall back to the exact object path)."""
        assert not self._small and self.t < (1 << 62)
        if not hasattr(self, "pi64"):
            return None
        from ..runtime import hostcrypto

        if hostcrypto.get_lib() is None:
            return None
        v = np.asarray(values).astype(np.int64) % self.t
        buf = np.zeros(self.n, np.uint64)
        buf[self.index_map[: len(v)]] = v.astype(np.uint64)
        return hostcrypto.ntt_inverse(buf, self.pi64, self.n_inv, self.t)

    def encode_int_batch(self, values: np.ndarray) -> np.ndarray:
        """Vectorized encode for integer slot arrays [..., <=n] (t < 2**31):
        one batched uint64 numpy NTT instead of per-row object math."""
        assert self._small
        v = np.asarray(values)
        assert v.dtype != object
        buf = np.zeros(v.shape[:-1] + (self.n,), np.uint64)
        buf[..., self.index_map[: v.shape[-1]]] = (
            v.astype(np.int64) % self.t
        ).astype(np.uint64)
        coeffs = _intt_host(buf, self.pi, self.n_inv, self.t)
        return coeffs.astype(np.int64)

    def decode_int(self, coeffs: np.ndarray) -> np.ndarray:
        """Fast vectorized decode for integer coeff arrays (t < 2**31):
        uint64 numpy NTT, no object arithmetic.  Supports leading batch
        axes: [..., n] -> [..., n] int64 slot values."""
        assert self._small, "fast decode requires t < 2**31"
        c = (coeffs.astype(np.int64) % self.t).astype(np.uint64)
        evals = _ntt_host(c, self.pf, self.t)
        return evals[..., self.index_map].astype(np.int64)
