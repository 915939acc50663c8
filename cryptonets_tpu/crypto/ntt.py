"""Negacyclic NTT/iNTT over uint32 RNS limb tensors.

Longa-Naehrig merged-psi butterflies (the same factorization SEAL's native
`seal::util::ntt_negacyclic_harvey` uses behind every `Evaluator` call,
SURVEY.md section 2.1): forward Cooley-Tukey takes standard order to
bit-reversed, inverse Gentleman-Sande takes bit-reversed back to standard,
with the 2n-th root psi folded into the twiddles so no separate pre/post
scaling pass is needed.

Layout: x has shape [..., L, N] (L = RNS limbs, N = ring degree). Each
stage is a fully-vectorized reshape + Shoup constant multiply; the whole
transform is log2(N) such stages, which XLA fuses aggressively. An MXU
formulation (4-step NTT as exact digit-plane matmuls, its own evaluation
ordering) lives in cryptonets_tpu/kernels/matmul_ntt.py.

All twiddles carry Shoup companions, so a butterfly costs 6 hardware
multiplies; everything stays uint32-exact.
"""

from __future__ import annotations

from functools import lru_cache

import jax
import numpy as np
import jax.numpy as jnp

from .hostmath import bit_reverse, modinv
from .modular import add_mod, mul_const_mod, sub_mod
from .primes import min_primitive_2n_root


@lru_cache(maxsize=None)
def _tables_one(n: int, q: int):
    """Host: (psi_brev, ipsi_brev, n_inv) power tables for one modulus."""
    logn = n.bit_length() - 1
    psi = min_primitive_2n_root(q, n)
    ipsi = modinv(psi, q)
    # powers[i] = psi^i, cheap iterative build
    pow_f = np.empty(n, dtype=np.uint64)
    pow_i = np.empty(n, dtype=np.uint64)
    cf = ci = 1
    for i in range(n):
        pow_f[i] = cf
        pow_i[i] = ci
        cf = cf * psi % q
        ci = ci * ipsi % q
    rev = np.array([bit_reverse(i, logn) for i in range(n)])
    return pow_f[rev], pow_i[rev], modinv(n, q)


def _shoup_np(w: np.ndarray, q: int) -> np.ndarray:
    return ((w.astype(object) << 32) // q).astype(np.uint64).astype(np.uint32)


@lru_cache(maxsize=None)
def ntt_automorphism_perm(n: int, g: int) -> np.ndarray:
    """NTT-domain index permutation realizing a(x) -> a(x^g).

    In the evaluation domain the Galois automorphism is a PURE index
    permutation (no negacyclic sign flips — those exist only in the
    coefficient representation): position j of this butterfly ordering
    holds the evaluation at psi^(2*brv(j)+1), and sigma_g moves the
    evaluation at omega to position of omega^g, so

        NTT(sigma_g(x))[j] = NTT(x)[perm[j]],
        e(perm[j]) = e(j) * g  (mod 2n),  e(j) = 2*brv(j) + 1.

    This is the hoisting primitive (Halevi-Shoup): one digit decompose +
    NTT of a ciphertext serves EVERY subsequent rotation as a gather
    (tests/test_ntt.py validates against the coefficient-domain
    automorphism per Galois element)."""
    logn = n.bit_length() - 1
    j = np.arange(n)
    brv = np.array([bit_reverse(int(i), logn) for i in range(n)])
    e = 2 * brv + 1
    target = (e * g) % (2 * n)
    # invert e: position holding evaluation exponent t
    pos_of_e = np.empty(2 * n, np.int64)
    pos_of_e[e] = j
    return pos_of_e[target].astype(np.int32)


_CONTEXT_CACHE: dict = {}


def get_ntt_context(n: int, moduli) -> "NTTContext":
    """Interned contexts: sharing across BFVParams instances dedupes
    twiddle tables AND the per-shape jit caches of the transforms."""
    key = (n, tuple(int(m) for m in moduli))
    if key not in _CONTEXT_CACHE:
        _CONTEXT_CACHE[key] = NTTContext(n, key[1])
    return _CONTEXT_CACHE[key]


# dispatch to the butterfly pipeline once this many transforms batch
# into one call (leading axes x limbs); below it the VMEM-resident
# pallas kernel wins.  Measured crossover is between B=1 (pallas ~5%
# faster) and B=64 (butterfly 3.1x faster) at n=8192 x 7 limbs.
HYBRID_BATCH_THRESHOLD = 16


class HybridNTTContext:
    """Batch-size dispatch between the pallas fused kernel and the XLA
    butterfly pipeline.  Both implement the identical Longa-Naehrig
    ordering, so outputs (and NTT-domain keys) are bit-interchangeable;
    the choice is made at trace time from the static operand shape."""

    def __init__(self, n: int, moduli: tuple[int, ...]):
        from ..kernels.pallas_ntt import get_pallas_ntt_context

        self.n = n
        self.moduli = tuple(int(m) for m in moduli)
        self.small = get_pallas_ntt_context(n, self.moduli)
        self.big = get_ntt_context(n, self.moduli)

    def _pick(self, x):
        batch = 1
        for d in x.shape[:-2]:
            batch *= int(d)
        return self.big if batch >= HYBRID_BATCH_THRESHOLD else self.small

    def forward(self, x):
        return self._pick(x).forward(x)

    def inverse(self, x):
        return self._pick(x).inverse(x)


def get_hybrid_ntt_context(n: int, moduli) -> "HybridNTTContext":
    key = ("hybrid", n, tuple(int(m) for m in moduli))
    if key not in _CONTEXT_CACHE:
        _CONTEXT_CACHE[key] = HybridNTTContext(n, key[2])
    return _CONTEXT_CACHE[key]


class NTTContext:
    """Precomputed twiddle tables for a (ring degree, modulus chain) pair.

    Tables are stacked over the limb axis so one jitted transform covers
    every RNS limb; the limb axis is also the natural sharding axis.
    """

    def __init__(self, n: int, moduli: tuple[int, ...]):
        assert n & (n - 1) == 0, "ring degree must be a power of two"
        self.n = n
        self.logn = n.bit_length() - 1
        self.moduli = tuple(int(q) for q in moduli)
        L = len(self.moduli)

        psi = np.empty((L, n), np.uint32)
        psi_sh = np.empty((L, n), np.uint32)
        ipsi = np.empty((L, n), np.uint32)
        ipsi_sh = np.empty((L, n), np.uint32)
        ninv = np.empty((L, 1), np.uint32)
        ninv_sh = np.empty((L, 1), np.uint32)
        for i, q in enumerate(self.moduli):
            f, inv, n_inv = _tables_one(n, q)
            psi[i] = f.astype(np.uint32)
            psi_sh[i] = _shoup_np(f, q)
            ipsi[i] = inv.astype(np.uint32)
            ipsi_sh[i] = _shoup_np(inv, q)
            ninv[i, 0] = n_inv
            ninv_sh[i, 0] = ((n_inv << 32) // q)
        self.psi = jnp.asarray(psi)
        self.psi_sh = jnp.asarray(psi_sh)
        self.ipsi = jnp.asarray(ipsi)
        self.ipsi_sh = jnp.asarray(ipsi_sh)
        self.ninv = jnp.asarray(ninv)
        self.ninv_sh = jnp.asarray(ninv_sh)
        self.q = jnp.asarray(
            np.array(self.moduli, np.uint32).reshape(L, 1)
        )

        # jit for eager callers (per-stage eager dispatch would cost one
        # relay round trip per op); INLINE under an enclosing trace so
        # the twiddle tables hoist to shared program arguments instead
        # of baking into every shape-instance as literals (utils/hoist).
        from ..utils.hoist import trace_inline_jit

        self.forward = trace_inline_jit(self._forward)
        self.inverse = trace_inline_jit(self._inverse)

    # -- forward: standard order in, bit-reversed out ----------------------
    def _forward(self, x):
        """NTT along the last axis of x: [..., L, N] uint32."""
        n, q = self.n, self.q
        for m in (1 << s for s in range(self.logn)):
            t = n // (2 * m)
            v = x.reshape(*x.shape[:-1], m, 2, t)
            u, w_in = v[..., 0, :], v[..., 1, :]
            tw = self.psi[:, m : 2 * m].reshape(-1, m, 1)
            tw_sh = self.psi_sh[:, m : 2 * m].reshape(-1, m, 1)
            wv = mul_const_mod(w_in, tw, tw_sh, q[..., None])
            x = jnp.stack(
                [add_mod(u, wv, q[..., None]), sub_mod(u, wv, q[..., None])],
                axis=-2,
            ).reshape(*x.shape)
        return x

    # -- inverse: bit-reversed in, standard order out ----------------------
    def _inverse(self, x):
        n, q = self.n, self.q
        for h in (n >> (s + 1) for s in range(self.logn)):
            # h blocks of paired halves of length t = n/(2h)
            t = n // (2 * h)
            v = x.reshape(*x.shape[:-1], h, 2, t)
            u, w_in = v[..., 0, :], v[..., 1, :]
            tw = self.ipsi[:, h : 2 * h].reshape(-1, h, 1)
            tw_sh = self.ipsi_sh[:, h : 2 * h].reshape(-1, h, 1)
            x = jnp.stack(
                [
                    add_mod(u, w_in, q[..., None]),
                    mul_const_mod(
                        sub_mod(u, w_in, q[..., None]), tw, tw_sh, q[..., None]
                    ),
                ],
                axis=-2,
            ).reshape(*x.shape)
        return mul_const_mod(x, self.ninv, self.ninv_sh, q)
