"""Pallas fused negacyclic NTT: the whole transform in one kernel, the
polynomial resident in VMEM across all log2(n) stages.

The stage loop in `crypto/ntt.py` is semantically identical but runs as
log2(n) XLA ops whose odd-shaped reshapes defeat fusion, so each stage
round-trips the limb tensor through HBM.  Here the poly block is loaded
once, all butterflies run on VMEM registers, and the result is stored
once — the transform becomes HBM-bandwidth-bound on exactly one
read + one write of the data.

Butterfly formulation (identical math to `NTTContext`, so outputs are
bit-exact and keys are interchangeable): at stage s the partner distance
is t = n >> (s+1) and position i is in the odd half iff bit t of i is
set, so each stage is two lane-rolls, one Shoup multiply, and a select —
no reshapes:

    xw   = x * tw mod q          (Shoup; only odd lanes meaningful)
    down = roll(xw, -t)          (partner's xw, for even lanes)
    up   = roll(x,  +t)          (partner's u, for odd lanes)
    x    = where(odd, up - xw, x + down)   mod q

Twiddles are pre-expanded host-side to full (stage, limb, n) tensors so
the kernel does zero gathers; limbs are processed in blocks of K_BLK so
the expanded tables fit VMEM at every ring degree (tables scale as
log2(n) * K_BLK * n * 8 bytes per direction).

Reference counterpart: SEAL 3.2's `seal::util::ntt_negacyclic_harvey`
(SURVEY.md section 2.1) — one cache-resident transform per call.
"""

from __future__ import annotations

from functools import partial

import jax
import numpy as np
import jax.numpy as jnp

from ..crypto.modular import add_mod, mul_const_mod, sub_mod
from ..crypto.ntt import _shoup_np, _tables_one


def _vmem_blk(n: int, logn: int) -> int:
    """Largest limb-block size whose expanded tables stay under ~4 MB
    (Pallas double-buffers blocks, so the live footprint is ~2x).

    A second cap bounds the kernel's Mosaic *stack*: the fully-unrolled
    stage loop keeps ~10 live u32 temporaries of K*n lanes per stage,
    and at n=16384 the 14-stage kernel measured 18.5 MB scoped VMEM
    with K=2 — past the 16 MB limit — so K*n is held to one 16384-lane
    row there.  n <= 8192 keeps its empirically-validated blocks
    (changing them would also invalidate the persistent compile cache)."""
    cap = 2**15 if n <= 8192 else n  # => K=1 for n >= 16384
    for k in (8, 4, 2, 1):
        if 2 * logn * k * n * 4 <= 4 * 2**20 and k * n <= cap:
            return k
    return 1


def _expand_stage_tables(n, logn, tab, tab_sh, inverse):
    """Full-width per-stage twiddle planes: (logn, L, n) uint32."""
    L = tab.shape[0]
    tw = np.empty((logn, L, n), np.uint32)
    sh = np.empty((logn, L, n), np.uint32)
    for s in range(logn):
        if inverse:
            h, t = n >> (s + 1), 1 << s
            sl = slice(h, 2 * h)
        else:
            m, t = 1 << s, n >> (s + 1)
            sl = slice(m, 2 * m)
        tw[s] = np.repeat(tab[:, sl], 2 * t, axis=1)
        sh[s] = np.repeat(tab_sh[:, sl], 2 * t, axis=1)
    return tw, sh


_CACHE: dict = {}


def get_pallas_ntt_context(n: int, moduli) -> "PallasNTTContext":
    """Interned contexts (tables + per-shape jit caches shared)."""
    key = (n, tuple(int(m) for m in moduli))
    if key not in _CACHE:
        _CACHE[key] = PallasNTTContext(n, key[1])
    return _CACHE[key]


class PallasNTTContext:
    """Drop-in for `NTTContext` with a single fused kernel per transform.

    Bit-exact with the butterfly implementation (same Longa-Naehrig
    factorization, same bit-reversed forward ordering), so factories may
    treat 'butterfly' and 'pallas' keys interchangeably.
    """

    def __init__(self, n: int, moduli: tuple[int, ...]):
        assert n & (n - 1) == 0
        self.n = n
        self.logn = n.bit_length() - 1
        self.moduli = tuple(int(q) for q in moduli)
        L = len(self.moduli)
        # interpret mode off TPU (CPU tests / virtual meshes)
        self.interpret = jax.default_backend() != "tpu"

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
            ninv_sh[i, 0] = (int(n_inv) << 32) // q

        self.blk = _vmem_blk(n, self.logn)
        self.Lp = -(-L // self.blk) * self.blk  # limbs padded to block
        pad = self.Lp - L

        def padq(a, fill=0):
            return np.pad(a, [(0, pad)] + [(0, 0)] * (a.ndim - 1),
                          constant_values=fill)

        ftw, fsh = _expand_stage_tables(n, self.logn, psi, psi_sh, False)
        itw, ish = _expand_stage_tables(n, self.logn, ipsi, ipsi_sh, True)
        pads = [(0, 0), (0, pad), (0, 0)]
        self.ftw = jnp.asarray(np.pad(ftw, pads))
        self.fsh = jnp.asarray(np.pad(fsh, pads))
        self.itw = jnp.asarray(np.pad(itw, pads))
        self.ish = jnp.asarray(np.pad(ish, pads))
        self.ninv = jnp.asarray(padq(ninv, 1))
        self.ninv_sh = jnp.asarray(padq(ninv_sh))
        # padded limbs use modulus 3: all ops stay defined, results dropped
        self.qp = jnp.asarray(
            padq(np.array(self.moduli, np.uint32).reshape(L, 1), 3)
        )
        self.q = jnp.asarray(
            np.array(self.moduli, np.uint32).reshape(L, 1)
        )

        from ..utils.hoist import trace_inline_jit

        self.forward = trace_inline_jit(partial(self._transform, False))
        self.inverse = trace_inline_jit(partial(self._transform, True))

    # ------------------------------------------------------------- kernels
    def _roll(self, v, shift):
        if self.interpret:
            return jnp.roll(v, shift, axis=-1)
        from jax.experimental.pallas import tpu as pltpu

        return pltpu.roll(v, shift % self.n, axis=v.ndim - 1)

    def _fwd_kernel(self, x_ref, tw_ref, sh_ref, q_ref, o_ref):
        n = self.n
        x = x_ref[0, 0]
        q = q_ref[0]
        idx = jax.lax.broadcasted_iota(jnp.int32, x.shape, x.ndim - 1)
        for s in range(self.logn):
            t = n >> (s + 1)
            xw = mul_const_mod(x, tw_ref[s, 0], sh_ref[s, 0], q)
            down = self._roll(xw, -t)
            up = self._roll(x, t)
            odd = (idx & t) != 0
            x = jnp.where(odd, sub_mod(up, xw, q), add_mod(x, down, q))
        o_ref[0, 0] = x

    def _inv_kernel(self, x_ref, tw_ref, sh_ref, q_ref, nv_ref, o_ref):
        x = x_ref[0, 0]
        q = q_ref[0]
        idx = jax.lax.broadcasted_iota(jnp.int32, x.shape, x.ndim - 1)
        for s in range(self.logn):
            t = 1 << s
            down = self._roll(x, -t)
            up = self._roll(x, t)
            odd = (idx & t) != 0
            x = jnp.where(
                odd,
                mul_const_mod(sub_mod(up, x, q), tw_ref[s, 0], sh_ref[s, 0], q),
                add_mod(x, down, q),
            )
        o_ref[0, 0] = mul_const_mod(
            x, nv_ref[0, :, :1], nv_ref[0, :, 1:], q
        )
    # ------------------------------------------------------------ dispatch

    def _transform(self, inverse: bool, x):
        """NTT along the last axis of x: [..., L, n] uint32."""
        from jax.experimental import pallas as pl

        n, L, S, K = self.n, len(self.moduli), self.logn, self.blk
        G = self.Lp // K  # limb blocks
        lead = x.shape[:-2]
        B = int(np.prod(lead)) if lead else 1
        xr = x.astype(jnp.uint32).reshape(B, L, n)
        if self.Lp != L:
            xr = jnp.pad(xr, [(0, 0), (0, self.Lp - L), (0, 0)])
        # fold the limb-block axis out of the block shape: Mosaic wants
        # the last two block dims divisible by (8, 128) or equal to the
        # array dims, so blocks are exactly (.., K, n) of (.., G, K, n)
        xr = xr.reshape(B, G, K, n)
        tw, sh = (self.itw, self.ish) if inverse else (self.ftw, self.fsh)
        tw = tw.reshape(S, G, K, n)
        sh = sh.reshape(S, G, K, n)
        kern = self._inv_kernel if inverse else self._fwd_kernel
        ins = [xr, tw, sh, self.qp.reshape(G, K, 1)]
        in_specs = [
            pl.BlockSpec((1, 1, K, n), lambda b, l: (b, l, 0, 0)),
            pl.BlockSpec((S, 1, K, n), lambda b, l: (0, l, 0, 0)),
            pl.BlockSpec((S, 1, K, n), lambda b, l: (0, l, 0, 0)),
            pl.BlockSpec((1, K, 1), lambda b, l: (l, 0, 0)),
        ]
        if inverse:
            nv = jnp.concatenate([self.ninv, self.ninv_sh], axis=1)
            ins.append(nv.reshape(G, K, 2))
            in_specs.append(pl.BlockSpec((1, K, 2), lambda b, l: (l, 0, 0)))
        out = pl.pallas_call(
            kern,
            grid=(B, G),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((1, 1, K, n), lambda b, l: (b, l, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((B, G, K, n), jnp.uint32),
            interpret=self.interpret,
        )(*ins)
        return out.reshape(B, self.Lp, n)[:, :L].reshape(*lead, L, n)
