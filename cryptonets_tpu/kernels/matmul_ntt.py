"""4-step NTT as exact MXU matmuls (the systolic-array formulation).

The negacyclic transform X[j] = sum_i x_i psi^{(2j+1)i} factors as a
psi-pre-twiddle followed by a cyclic DFT_N; with N = N1*N2 the DFT is two
small dense matrix multiplies around an elementwise twiddle — exactly the
MXU's shape.  Exactness on f32 hardware: operands are split into 4x 8-bit
digit planes, every f32 matmul then accumulates values < 2**25 (exact in
f32 over contractions up to 128 long), and planes recombine with Shoup
constant multiplies mod q.

Output ordering differs from the butterfly NTTContext (it is a fixed
permutation of evaluation points); forward/inverse are mutually
consistent, which is all pointwise ciphertext algebra requires.  A whole
factory must use ONE implementation (keys are stored in NTT domain).

~50 MFLOP per 8192-point limb -> microseconds at MXU rates, vs the
bandwidth-bound VPU butterfly path.
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np
import jax
import jax.numpy as jnp

from ..crypto.hostmath import modinv
from ..crypto.modular import add_mod, mul_const_mod
from ..crypto.primes import min_primitive_2n_root


def _split4(n: int) -> tuple[int, int]:
    """N = N1 * N2 with N2 >= N1, both <= 128 where possible."""
    log = n.bit_length() - 1
    l2 = (log + 1) // 2
    return 1 << (log - l2), 1 << l2  # (N1, N2)


def _digit_planes_np(m: np.ndarray) -> np.ndarray:
    """uint32 matrix -> [4, ...] bf16 planes of 8-bit digits.

    bf16 holds 8 significand bits, so digits 0..255 are exact; the MXU
    then runs these matmuls at its native bf16 rate (f32 operands would
    be decomposed into multiple bf16 passes, measured ~6x slower at
    identical results — bench_data/roofline_batched_*.json r4 vs r5)."""
    import jax.numpy as jnp  # numpy has no bfloat16; go via jnp dtype

    return np.stack(
        [((m >> (8 * d)) & 0xFF).astype(np.float32) for d in range(4)]
    ).astype(jnp.bfloat16.dtype)


def _shoup_np(w, q):
    return ((w.astype(object) << 32) // int(q)).astype(np.uint64).astype(
        np.uint32
    )


@lru_cache(maxsize=None)
def _tables(n: int, moduli: tuple[int, ...]):
    N1, N2 = _split4(n)
    L = len(moduli)
    Wa = np.zeros((L, N2, N2), np.uint32)   # omega^(N1*i2*j2)
    Wb = np.zeros((L, N1, N1), np.uint32)   # omega^(N2*i1*j1)
    Wai = np.zeros((L, N2, N2), np.uint32)
    Wbi = np.zeros((L, N1, N1), np.uint32)
    tw = np.zeros((L, N2, N1), np.uint32)   # omega^(i1*j2)
    twi = np.zeros((L, N2, N1), np.uint32)
    pre = np.zeros((L, n), np.uint32)       # psi^i
    post = np.zeros((L, n), np.uint32)      # psi^-i * N^-1
    for li, q in enumerate(moduli):
        psi = min_primitive_2n_root(q, n)
        om = psi * psi % q
        omi = modinv(om, q)
        psii = modinv(psi, q)
        ninv = modinv(n, q)
        pw = np.empty(n, dtype=object)
        pwi = np.empty(n, dtype=object)
        c = ci = 1
        for i in range(n):
            pw[i] = c
            pwi[i] = ci
            c = c * om % q
            ci = ci * omi % q
        idx = lambda a, b, s: (a * b * s) % n  # noqa: E731
        for a in range(N2):
            for b in range(N2):
                Wa[li, a, b] = pw[(N1 * a * b) % n]
                Wai[li, a, b] = pwi[(N1 * a * b) % n]
        for a in range(N1):
            for b in range(N1):
                Wb[li, a, b] = pw[(N2 * a * b) % n]
                Wbi[li, a, b] = pwi[(N2 * a * b) % n]
        for j2 in range(N2):
            for i1 in range(N1):
                tw[li, j2, i1] = pw[(i1 * j2) % n]
                twi[li, j2, i1] = pwi[(i1 * j2) % n]
        pc = 1
        for i in range(n):
            pre[li, i] = pc
            pc = pc * psi % q
        pic = 1
        for i in range(n):
            post[li, i] = pic * ninv % q
            pic = pic * psii % q
    qcol = np.array(moduli, np.uint32).reshape(L, 1)

    def sh(x, shape_q):
        out = np.zeros_like(x)
        for li, q in enumerate(moduli):
            out[li] = _shoup_np(x[li], q)
        return out

    pow8 = np.zeros((7, L), np.uint32)      # 2^(8s) mod q
    pow8_sh = np.zeros((7, L), np.uint32)
    for s in range(7):
        for li, q in enumerate(moduli):
            v = (1 << (8 * s)) % q
            pow8[s, li] = v
            pow8_sh[s, li] = (v << 32) // q
    j = jnp.asarray
    return dict(
        N1=N1, N2=N2,
        Wa=j(_digit_planes_np(Wa)), Wb=j(_digit_planes_np(Wb)),
        Wai=j(_digit_planes_np(Wai)), Wbi=j(_digit_planes_np(Wbi)),
        tw=j(tw), tw_sh=j(sh(tw, None)),
        twi=j(twi), twi_sh=j(sh(twi, None)),
        pre=j(pre), pre_sh=j(sh(pre, None)),
        post=j(post), post_sh=j(sh(post, None)),
        q=j(qcol),
        pow8=j(pow8), pow8_sh=j(pow8_sh),
    )


def _data_planes(x):
    """uint32 [..., L, A, B] -> bf16 [4, ..., L, A, B] (8-bit digits are
    exact in bf16; see _digit_planes_np)."""
    return jnp.stack(
        [((x >> (8 * d)) & jnp.uint32(0xFF)).astype(jnp.bfloat16)
         for d in range(4)]
    )


def _exact_modmat(W_planes, x, q, pow8, pow8_sh, left: bool):
    """Exact (W @ x) mod q (left=True: contract x's -2 axis with W's -1)
    or (x @ W) (left=False: contract x's -1 axis with W's -2).

    W_planes: [4, L, A, B] f32; x: uint32 [..., L, ?, ?]."""
    xp = _data_planes(x)  # [4, ..., L, A, B]
    # each matmul accumulates 8-bit x 8-bit products over <= 128 terms:
    # < 2**24, exact in f32.  Partials with equal digit-sum s combine in
    # uint32 (f32 is only integer-exact to 2**24).
    sums = [None] * 7
    for di in range(4):
        for dj in range(4):
            if left:
                m = jnp.einsum(
                    "lab,...lbc->...lac", W_planes[di], xp[dj],
                    preferred_element_type=jnp.float32,
                )
            else:
                m = jnp.einsum(
                    "...lab,lbc->...lac", xp[dj], W_planes[di],
                    preferred_element_type=jnp.float32,
                )
            mu = m.astype(jnp.uint32)
            s = di + dj
            sums[s] = mu if sums[s] is None else sums[s] + mu
    acc = None
    L = q.shape[0]
    for s in range(7):
        u = sums[s]
        term = mul_const_mod(
            u,
            pow8[s].reshape(L, 1, 1),
            pow8_sh[s].reshape(L, 1, 1),
            q[..., None],
        )
        acc = term if acc is None else add_mod(acc, term, q[..., None])
    return acc


_MM_CACHE: dict = {}


def get_matmul_ntt_context(n: int, moduli) -> "MatmulNTTContext":
    """Interned contexts (twiddle tables + per-shape jit caches shared)."""
    key = (n, tuple(int(m) for m in moduli))
    if key not in _MM_CACHE:
        _MM_CACHE[key] = MatmulNTTContext(n, key[1])
    return _MM_CACHE[key]


class MatmulNTTContext:
    """Drop-in alternative to NTTContext with MXU matmul internals.

    Same (n, moduli) API; its evaluation-point ordering is its own, so
    use one implementation consistently per factory."""

    def __init__(self, n: int, moduli: tuple[int, ...]):
        self.n = n
        self.moduli = tuple(int(m) for m in moduli)
        self.t = _tables(n, self.moduli)
        self.q = self.t["q"]
        from ..utils.hoist import trace_inline_jit

        self.forward = trace_inline_jit(self._forward)
        self.inverse = trace_inline_jit(self._inverse)

    def _forward(self, x):
        t = self.t
        N1, N2 = t["N1"], t["N2"]
        L = len(self.moduli)
        y = mul_const_mod(x, t["pre"], t["pre_sh"], t["q"])  # psi^i * x
        y = y.reshape(*y.shape[:-1], N2, N1)
        b = _exact_modmat(t["Wa"], y, t["q"], t["pow8"], t["pow8_sh"], True)
        c = mul_const_mod(b, t["tw"], t["tw_sh"], t["q"][..., None])
        o = _exact_modmat(t["Wb"], c, t["q"], t["pow8"], t["pow8_sh"], False)
        return o.reshape(*x.shape)

    def _inverse(self, x):
        t = self.t
        N1, N2 = t["N1"], t["N2"]
        y = x.reshape(*x.shape[:-1], N2, N1)
        d = _exact_modmat(t["Wbi"], y, t["q"], t["pow8"], t["pow8_sh"], False)
        e = mul_const_mod(d, t["twi"], t["twi_sh"], t["q"][..., None])
        a = _exact_modmat(t["Wai"], e, t["q"], t["pow8"], t["pow8_sh"], True)
        a = a.reshape(*x.shape)
        return mul_const_mod(a, t["post"], t["post_sh"], t["q"])
