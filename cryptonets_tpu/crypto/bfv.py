"""The BFV scheme over uint32 RNS limb tensors (replaces SEAL 3.2, ref L0).

Re-implements, TPU-first, the exact SEAL surface the reference consumes
(SURVEY.md section 2.1): parameter/keygen, public-key encryption, decrypt,
add/sub, plaintext multiply, ciphertext multiply (BEHZ full-RNS variant,
the same algorithm family SEAL 3.2's `Evaluator.Multiply` uses) with
digit-decomposition relinearization, and Galois rotations.

Design points that differ deliberately from SEAL (documented TPU choices):
  * All RNS limb moduli are < 2**31 (see primes.py) so residues live on
    uint32 lanes; the chain has proportionally more limbs at the same
    128-bit-security total width.
  * One secret key is shared across the plaintext-CRT "double decker"
    (the reference generates an independent SEAL context per plain prime,
    `EncryptedSealBfvVector.cs:92-102`; sharing s keeps the plain-prime
    dimension a pure vmap axis).
  * Every op accepts arbitrary leading batch axes ([..., size, L, N]);
    the reference's thread pools become pure vectorization.

Everything here is jit-compatible; ciphertexts are NamedTuple pytrees.
"""

from __future__ import annotations

import math
from functools import lru_cache
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from . import sampling
from .hostmath import CRT, center, modinv
from .modular import (
    add_mod,
    mont_mul,
    mont_precompute_host,
    mul_const_mod,
    neg_mod,
    shoup_precompute_host,
    sub_mod,
)
from .ntt import NTTContext, get_ntt_context
from .primes import aux_base_primes, default_coeff_modulus_128


def _col(vals, dtype=np.uint32):
    return jnp.asarray(np.array(vals, dtype).reshape(-1, 1))


_MOD_CHAIN_CACHE: dict = {}


def get_mod_chain(moduli) -> "ModChain":
    """Interned ModChains: a factory builds one BFVParams per plain
    prime, but the q/Bsk chain tables are t-INDEPENDENT — sharing them
    avoids re-uploading identical constant columns per prime (each
    device_put costs a relay round trip on remote-attached TPUs).  The
    cache key includes the current default device so the host-CPU
    keygen clone (api/factory.py) gets its own CPU-resident tables."""
    key = (
        tuple(int(m) for m in moduli),
        jax.default_backend(),
        str(jax.config.jax_default_device),
    )
    if key not in _MOD_CHAIN_CACHE:
        _MOD_CHAIN_CACHE[key] = ModChain(key[0])
    return _MOD_CHAIN_CACHE[key]


class ModChain:
    """Device-constant bundle for a base (list of moduli): the modulus
    column plus Montgomery/Shoup companions, shaped [L, 1] for broadcasting
    against [..., L, N] residue tensors."""

    def __init__(self, moduli):
        self.moduli = tuple(int(m) for m in moduli)
        mont = [mont_precompute_host(m) for m in self.moduli]
        self.q = _col(self.moduli)
        self.qinv_neg = _col([c["qinv_neg"] for c in mont])
        self.r_mod = _col([c["r_mod"] for c in mont])
        self.r_shoup = _col([c["r_shoup"] for c in mont])
        self.one_shoup = _col([(1 << 32) // m for m in self.moduli])

    def __len__(self):
        return len(self.moduli)

    def shoup_col(self, vals):
        """Per-limb constants with Shoup companions, as ([L,1], [L,1])."""
        vals = [int(v) % m for v, m in zip(vals, self.moduli)]
        return _col(vals), _col(
            [shoup_precompute_host(v, m) for v, m in zip(vals, self.moduli)]
        )

    def scalar_shoup_col(self, value):
        """One integer reduced into every limb, with companions."""
        return self.shoup_col([value] * len(self.moduli))

    def to_mont(self, x):
        return mul_const_mod(x, self.r_mod, self.r_shoup, self.q)

    def mont_mul(self, a, b):
        return mont_mul(a, b, self.q, self.qinv_neg)

    def mul(self, a, b):
        """General a*b mod q (lift a to Montgomery, REDC against b)."""
        return self.mont_mul(self.to_mont(a), b)

    def reduce_u32(self, x):
        """Arbitrary uint32 -> [0, q) per limb."""
        return mul_const_mod(x, jnp.uint32(1), self.one_shoup, self.q)


def mod_sum(x, q, axis):
    """Modular sum over `axis` (entries < q) by pairwise tree reduction."""
    axis = axis % x.ndim
    n = x.shape[axis]
    while n > 1:
        half = n // 2
        a = lax.slice_in_dim(x, 0, half, axis=axis)
        b = lax.slice_in_dim(x, half, 2 * half, axis=axis)
        s = add_mod(a, b, q)
        if n > 2 * half:
            rest = lax.slice_in_dim(x, 2 * half, n, axis=axis)
            s = jnp.concatenate([s, rest], axis=axis)
        x = s
        n = x.shape[axis]
    return jnp.squeeze(x, axis)


class BFVParams:
    """All trace-time precomputation for one (n, t, q-chain) triple.

    Mirrors SEAL's `SEALContext` + `EncryptionParameters`
    (`AtomicSealBfvVector.cs:140-161`): ring degree n, plain modulus t
    (up to ~60 bits; host-side big-int paths cover t >= 2**31), RNS
    coefficient chain, BEHZ auxiliary base, and key-switch digit width.
    """

    def __init__(
        self,
        n: int,
        plain_modulus: int,
        coeff_modulus: tuple[int, ...] | None = None,
        dbc: int = 16,
        seed: int = 0,
        n_special: int = 0,
        ks_alpha: int = 0,
        ntt_impl: str = "butterfly",
    ):
        self.n = n
        self.t = int(plain_modulus)
        qs = tuple(coeff_modulus) if coeff_modulus else default_coeff_modulus_128(n)
        self.q_list = qs
        self.k = len(qs)
        self.dbc = dbc
        self.seed = seed
        # Ciphertext-side NTT implementation: 'butterfly' (VPU stage loop)
        # or 'matmul' (4-step MXU digit-plane formulation, its own
        # evaluation ordering).  Keys are stored in NTT domain, so one
        # factory must use ONE impl for its lifetime; the encoder slot
        # NTTs over Z_t stay butterfly (their ordering is tied to the
        # SEAL index_map).
        self.ntt_impl = ntt_impl
        if ntt_impl == "matmul":
            from ..kernels.matmul_ntt import get_matmul_ntt_context

            self._make_ntt = get_matmul_ntt_context
        elif ntt_impl == "pallas":
            # fused single-kernel transform, bit-exact with 'butterfly'
            # (same Longa-Naehrig ordering, so keys are interchangeable)
            from ..kernels.pallas_ntt import get_pallas_ntt_context

            self._make_ntt = get_pallas_ntt_context
        elif ntt_impl == "hybrid":
            # batch-size dispatch between the two bit-identical impls:
            # the pallas kernel wins in the single-ciphertext regime
            # (whole transform VMEM-resident), the XLA-fused butterfly
            # stage pipeline wins ~3x in the batched regime (measured
            # 0.87 ms vs 2.72 ms per pair at B=64, n=8192 x 7 limbs —
            # bench_data/roofline_batched_n8192_b64.json)
            from .ntt import get_hybrid_ntt_context

            self._make_ntt = get_hybrid_ntt_context
        else:
            self._make_ntt = get_ntt_context
        # Key-switch mode.  n_special > 0 selects hybrid (special-prime)
        # key switching with RNS groups of data limbs; ks_alpha > 0 with
        # n_special == 0 selects P-less RNS-group switching (groups of
        # ks_alpha limbs, no modulus extension: fewer NTTs than digit
        # decomposition at ~31*alpha bits of key-switch noise — for
        # networks whose budget slack dwarfs it).  Both 0 keeps
        # SEAL-3.2-style digit decomposition (DBC).
        # See _switch_key_inner_hybrid.
        self.n_special = int(n_special)
        self.ks_alpha = int(ks_alpha) if ks_alpha else int(n_special)
        self.ks_hybrid = self.n_special > 0 or self.ks_alpha > 0
        assert (1 << dbc) < min(qs), "digit width must fit smallest limb"
        self.digits_per_limb = -(-max(q.bit_length() for q in qs) // dbc)

        self.chain_q = get_mod_chain(qs)
        self.ntt_q = self._make_ntt(n, qs)
        self.crt_q = CRT(list(qs))
        self.q_big = self.crt_q.product
        self.delta = self.q_big // self.t  # floor(q/t)
        self.delta_col = self.chain_q.shoup_col(
            [self.delta % q for q in qs]
        )

        # ---- BEHZ multiply bases: Bsk = B + m_sk, plus m_tilde.
        # The fast floor / Shenoy-Kumaresan back-conversion are exact only
        # while |floor(t*c/q)| fits Bsk; tensor-product coefficients c of
        # two base-q polys reach ~n*q^2, so size prod(Bsk) >= 16*t*n*q
        # (SEAL gets the same headroom by using 61-bit Bsk primes over
        # <=60-bit data primes; with uniform ~31-bit limbs the base needs
        # extra primes once t*n exceeds ~2**27).
        need = 16 * self.t * n * self.q_big
        n_aux = max(self.k + 1, -(-need.bit_length() // 31))
        aux = aux_base_primes(n, n_aux, avoid=qs)
        while math.prod(aux) < need:
            n_aux += 1
            aux = aux_base_primes(n, n_aux, avoid=qs)
        self.B_list, self.msk = aux[:-1], aux[-1]
        bsk = self.B_list + (self.msk,)
        self.bsk_list = bsk
        self.chain_bsk = get_mod_chain(bsk)
        self.ntt_bsk = self._make_ntt(n, bsk)
        self.crt_B = CRT(list(self.B_list))
        self.m_tilde = 1 << 16

        q_big, B_big = self.q_big, self.crt_B.product
        # q -> Bsk (and m_tilde) conversion tables
        self.inv_punct_q = self.chain_q.shoup_col(self.crt_q.inv_punctured)
        self.punct_q_to_bsk = self._punct_matrix(
            self.crt_q.punctured, self.chain_bsk
        )
        self.punct_q_to_mtilde = jnp.asarray(
            np.array(
                [p % self.m_tilde for p in self.crt_q.punctured], np.uint32
            ).reshape(-1, 1, 1)
        )
        self.neg_qinv_mtilde = jnp.uint32(
            (-modinv(q_big % self.m_tilde, self.m_tilde)) % self.m_tilde
        )
        self.q_mod_bsk = self.chain_bsk.shoup_col([q_big] * len(bsk))
        self.mtilde_inv_bsk = self.chain_bsk.shoup_col(
            [modinv(self.m_tilde, m) for m in bsk]
        )
        self.mtilde_mod_q = self.chain_q.scalar_shoup_col(self.m_tilde)
        self.t_mod_q = self.chain_q.scalar_shoup_col(self.t)
        self.t_mod_bsk = self.chain_bsk.scalar_shoup_col(self.t)
        self.qinv_mod_bsk = self.chain_bsk.shoup_col(
            [modinv(q_big % m, m) for m in bsk]
        )
        # ---- BEHZ gamma-correction decrypt (device scale-and-round):
        # valid when t < 2**31 (the LoLa/Caltech/default configs); larger
        # plain moduli (CryptoNets/CIFAR, t < 2**62) use the two-plane
        # variant below: W = round(t*x/q) mod {2^32 (wrap), m2}, corrected
        # by gamma, joined exactly on host in vectorized int64.
        self.gamma = None
        self.big_gamma = None
        if self.t >= (1 << 31) and self.t < (1 << 62):
            from .primes import ntt_primes

            cand = ntt_primes(n, 31, self.k + len(aux) + 6)
            picks = [c for c in cand if c not in qs and c not in aux][:2]
            m2, g = picks[0], picks[1]  # descending scan => g < m2
            self.big_gamma, self.big_m2 = g, m2
            self.chain_g2 = get_mod_chain([m2, g])
            self.big_gt_mod_q = self.chain_q.scalar_shoup_col(self.t * g)
            self.punct_q_to_g2 = self._punct_matrix(
                self.crt_q.punctured, self.chain_g2
            )
            M32 = 1 << 32
            self.punct_q_to_m1 = jnp.asarray(
                np.array(
                    [int(p) % M32 for p in self.crt_q.punctured],
                    np.uint32,
                ).reshape(-1, 1)
            )
            m2c = get_mod_chain([m2])
            self.big_m2_chain = m2c
            # gamma plane: s_g = -conv_y * q^{-1} mod gamma (gt*x = 0 mod g)
            self.big_neg_qinv_g = get_mod_chain([g]).scalar_shoup_col(
                (-modinv(self.q_big % g, g)) % g
            )
            # m2 / 2^32 planes carry V' = (gt*conv_x - conv_y) * q^{-1}
            self.big_gt_m2 = m2c.scalar_shoup_col(self.t * g)
            self.big_qinv_m2 = m2c.scalar_shoup_col(
                modinv(self.q_big % m2, m2)
            )
            self.big_gamma_mod_m2 = m2c.scalar_shoup_col(g)
            self.big_ginv_m2 = m2c.scalar_shoup_col(modinv(g % m2, m2))
            self.big_gt_m1 = jnp.uint32((self.t * g) % M32)
            self.big_qinv_m1 = jnp.uint32(modinv(self.q_big % M32, M32))
            self.big_ginv_m1 = jnp.uint32(modinv(g, M32))
        if self.t < (1 << 31):
            from .primes import ntt_primes

            cand = ntt_primes(n, 31, self.k + len(aux) + 4)
            g = next(
                c
                for c in cand
                if c not in qs and c not in aux and c != self.t
            )
            self.gamma = g
            self.chain_tg = get_mod_chain([self.t, g])
            self.gt_mod_q = self.chain_q.scalar_shoup_col(self.t * g)
            self.punct_q_to_tg = self._punct_matrix(
                self.crt_q.punctured, self.chain_tg
            )
            self.neg_qinv_tg = self.chain_tg.shoup_col(
                [
                    (-modinv(self.q_big % self.t, self.t)) % self.t,
                    (-modinv(self.q_big % g, g)) % g,
                ]
            )
            self.chain_t = get_mod_chain([self.t])
            self.gamma_mod_t = self.chain_t.scalar_shoup_col(g)
            self.gamma_inv_t = self.chain_t.scalar_shoup_col(
                modinv(g % self.t, self.t)
            )

        # B -> q back-conversion (Shenoy-Kumaresan with m_sk)
        self.chain_B = get_mod_chain(self.B_list)
        self.inv_punct_B = self.chain_B.shoup_col(self.crt_B.inv_punctured)
        self.punct_B_to_q = self._punct_matrix(
            self.crt_B.punctured, self.chain_q
        )
        self.punct_B_to_msk = self._punct_matrix(
            self.crt_B.punctured, get_mod_chain([self.msk])
        )
        self.msk_chain = get_mod_chain([self.msk])
        self.Binv_mod_msk = self.msk_chain.shoup_col(
            [modinv(B_big % self.msk, self.msk)]
        )
        self.B_mod_q = self.chain_q.scalar_shoup_col(B_big)

        # ---- hybrid (special-prime) key switching (GHS/HPS style).
        # Switch keys live mod Q*P (P = n_special extra primes); the input
        # poly is decomposed into omega RNS groups of n_special data limbs,
        # each base-extended to Q*P — omega*(k+a) limb NTTs per switch vs
        # k*D*k for digit decomposition, and ~2^dbc less key-switch noise.
        # (SEAL >= 3.4 uses the same construction; SEAL 3.2 = digit mode.)
        if self.ks_hybrid:
            a = self.n_special
            g = self.ks_alpha
            # selection must depend only on (n, qs): the CRT plain-prime
            # factory shares ONE key set across plain moduli, so every
            # BFVParams in it must agree on the special primes (t and
            # gamma never meet P in any op, so collisions are harmless)
            used = set(qs) | set(aux)
            from .primes import ntt_primes

            pool = ntt_primes(n, 31, self.k + len(aux) + a + 8)
            sp = tuple(c for c in pool if c not in used)[:a]
            assert len(sp) == a, "not enough special primes"
            self.sp_list = sp
            qp = qs + sp
            self.qp_list = qp
            self.chain_qp = get_mod_chain(qp)
            self.ntt_qp = self._make_ntt(n, qp)
            self.P_big = 1
            for m in sp:
                self.P_big *= m
            # groups of data limbs
            self.ks_groups = [
                (i0, min(i0 + g, self.k)) for i0 in range(0, self.k, g)
            ]
            self.ks_omega = len(self.ks_groups)
            # per-limb inverse of the within-group punctured product
            inv_grp = []
            grp_w = np.zeros((self.k, len(qp)), np.uint32)
            grp_w_sh = np.zeros_like(grp_w)
            pqt = np.zeros((self.ks_omega, len(qp)), np.uint32)
            pqt_sh = np.zeros_like(pqt)
            for gi, (i0, i1) in enumerate(self.ks_groups):
                Qj = 1
                for i in range(i0, i1):
                    Qj *= qs[i]
                for i in range(i0, i1):
                    pj = Qj // qs[i]
                    inv_grp.append(modinv(pj % qs[i], qs[i]))
                    for mi, m in enumerate(qp):
                        v = pj % m
                        grp_w[i, mi] = v
                        grp_w_sh[i, mi] = shoup_precompute_host(v, m)
                # P * Q~_j mod each qp limb (Q~_j = CRT unit of group j)
                Qoj = self.q_big // Qj
                Qtilde = Qoj * modinv(Qoj % Qj, Qj)
                val = self.P_big * Qtilde
                for mi, m in enumerate(qp):
                    v = val % m
                    pqt[gi, mi] = v
                    pqt_sh[gi, mi] = shoup_precompute_host(v, m)
            self.ks_inv_punct_grp = self.chain_q.shoup_col(inv_grp)
            self.ks_grp_conv = (
                jnp.asarray(grp_w[:, :, None]),
                jnp.asarray(grp_w_sh[:, :, None]),
            )
            self.ks_pqt = (
                jnp.asarray(pqt[:, :, None]),
                jnp.asarray(pqt_sh[:, :, None]),
            )
            # mod-down P -> q tables (rounded division by P); P-less
            # (ks_alpha) mode has no extension and skips the mod-down
            if a > 0:
                self.chain_sp = get_mod_chain(sp)
                crt_sp = CRT(list(sp))
                self.ks_inv_punct_sp = self.chain_sp.shoup_col(
                    crt_sp.inv_punctured
                )
                self.ks_punct_sp_to_q = self._punct_matrix(
                    crt_sp.punctured, self.chain_q
                )
                ph = self.P_big >> 1
                self.ks_phalf_sp = self.chain_sp.shoup_col([ph] * a)[0]
                self.ks_phalf_q = self.chain_q.shoup_col([ph] * self.k)[0]
                self.ks_pinv_q = self.chain_q.shoup_col(
                    [modinv(self.P_big % q, q) for q in qs]
                )

    def _punct_matrix(self, punctured, to_chain: ModChain):
        """[Lf, Lt, 1] constant matrix |punct_i|_{m_t} with Shoup, for
        FastBConv accumulation against [..., Lf, 1, N] inputs."""
        vals = np.array(
            [[int(p) % m for m in to_chain.moduli] for p in punctured],
            np.uint32,
        )
        sh = np.array(
            [
                [
                    shoup_precompute_host(int(p) % m, m)
                    for m in to_chain.moduli
                ]
                for p in punctured
            ],
            np.uint32,
        )
        return (
            jnp.asarray(vals[:, :, None]),
            jnp.asarray(sh[:, :, None]),
        )

    # -- host-side plaintext residue helpers --------------------------------
    def plain_to_residues(self, coeffs) -> np.ndarray:
        """Plain poly coeffs (ints mod t) -> [..., k, N] uint32; supports
        leading batch axes and a vectorized int64 fast path for t < 2**31."""
        c = np.asarray(coeffs)
        if self.t < (1 << 31) and c.dtype != object:
            c64 = c.astype(np.int64) % self.t
            return np.stack(
                [(c64 % q).astype(np.uint32) for q in self.q_list], axis=-2
            )
        if self.t < (1 << 62) and c.dtype != object:
            # big-t fast path: coeffs in [0, t) fit uint64 exactly
            cu = (c.astype(np.int64) % self.t).astype(np.uint64)
            return np.stack(
                [
                    (cu % np.uint64(q)).astype(np.uint32)
                    for q in self.q_list
                ],
                axis=-2,
            )
        c = np.asarray(coeffs, dtype=object) % self.t
        return np.stack(
            [
                (c % q).astype(np.uint64).astype(np.uint32)
                for q in self.q_list
            ],
            axis=-2,
        )


class Ciphertext(NamedTuple):
    """BFV ciphertext: uint32 [size, L, N] in coefficient domain."""

    data: jnp.ndarray

    @property
    def size(self):
        return self.data.shape[-3]


class SwitchKeys(NamedTuple):
    """Key-switching keys: digit-decomposed encryptions of w_ij * target,
    stored in NTT+Montgomery domain, stacked over (limb i, digit j)."""

    k0: jnp.ndarray  # [k*D, k, N]
    k1: jnp.ndarray  # [k*D, k, N]


class KeySet(NamedTuple):
    s_hat_mont: jnp.ndarray      # NTT(s) in Montgomery domain [k, N]
    s2_hat_mont: jnp.ndarray     # NTT(s^2) in Montgomery domain
    p0_hat_mont: jnp.ndarray     # public key polys, NTT+Montgomery
    p1_hat_mont: jnp.ndarray
    relin: SwitchKeys
    galois: dict                  # galois element -> SwitchKeys
    s_small: jnp.ndarray          # ternary secret, int32 [N] (host/debug)


@lru_cache(maxsize=None)
def _automorphism_tables_np(n: int, g: int):
    """Host-side gather indices + negate mask for a(x) -> a(x^g)."""
    i = np.arange(n, dtype=np.int64)
    r = (i * g) % (2 * n)
    pos = r % n
    src = np.empty(n, np.int32)
    neg = np.empty(n, bool)
    src[pos] = i
    neg[pos] = r >= n
    return src, neg


def _automorphism_tables(n: int, g: int):
    """Gather indices + negate mask for a(x) -> a(x^g) mod x^n + 1."""
    src, neg = _automorphism_tables_np(n, g)
    return jnp.asarray(src), jnp.asarray(neg)


class BFV:
    """Evaluator/Encryptor/Decryptor/KeyGenerator in one (SEAL splits these;
    here they share one params object and all ops are pure functions)."""

    def __init__(self, params: BFVParams):
        self.p = params
        # trace_inline_jit: compiled once per shape for EAGER callers,
        # but inlined under an enclosing trace — a plain nested jit would
        # bake the NTT/chain tables into every shape-instance of the
        # callee as literals, which the constant hoister cannot lift
        # (utils/hoist.py; the CIFAR program hit 1.3 GB of StableHLO).
        from ..utils.hoist import trace_inline_jit

        self.multiply = trace_inline_jit(self.multiply)
        self._switch_key_inner = trace_inline_jit(self._switch_key_inner)
        self.mul_plain = trace_inline_jit(self.mul_plain)
        self._make_switch_keys_batched = jax.jit(self._make_switch_keys_batched)
        self._make_switch_keys_batched_hybrid = jax.jit(
            self._make_switch_keys_batched_hybrid
        )
        # whole keygen as ONE program: on relay-attached TPUs every eager
        # dispatch costs ~40 ms, so the old op-by-op keygen spent ~40 s on
        # launch overhead alone.  The compiled program is key-value
        # independent (PRNG key + automorphism tables are arguments), so
        # the persistent compile cache serves every factory of the same
        # geometry.
        self._keygen_impl = jax.jit(
            self._keygen_impl, static_argnames=("g_list",)
        )

    # ------------------------------------------------------------------ keys
    def keygen(self, seed: int | None = None, rot_steps=(), column_key=True):
        """Generate all keys in a single compiled program. `rot_steps`:
        extra Galois keys beyond the power-of-two ladder (SEAL's
        GaloisKeys default is the pow2 ladder, composed for arbitrary
        steps)."""
        p = self.p
        key = jax.random.key(p.seed if seed is None else seed)

        row = p.n // 2
        steps_set = set()
        for j in range(int(math.log2(row))):
            steps_set.add(1 << j)
            steps_set.add(row - (1 << j))  # negative pow2 rotations
        steps_set.update(s % row for s in rot_steps if s % row)
        g_list = [self.galois_elt_rows(st) for st in sorted(steps_set)]
        if column_key:
            g_list.append(2 * p.n - 1)

        if g_list:
            tabs = [_automorphism_tables_np(p.n, g) for g in g_list]
            srcg = jnp.asarray(np.stack([t[0] for t in tabs]))
            negm = jnp.asarray(np.stack([t[1] for t in tabs]))
        else:
            srcg = jnp.zeros((0, p.n), jnp.int32)
            negm = jnp.zeros((0, p.n), bool)
        return self._keygen_impl(key, srcg, negm, g_list=tuple(g_list))

    def _keygen_impl(self, key, srcg, negm, *, g_list):
        p = self.p
        ks = iter(jax.random.split(key, 4096))

        s_small = sampling.ternary(next(ks), (p.n,))
        s_res = sampling.small_to_residues(s_small, p.chain_q.q)
        s_hat = p.ntt_q.forward(s_res)
        s_mont = p.chain_q.to_mont(s_hat)
        s2_hat = p.chain_q.mont_mul(s_hat, s_mont)
        s2_mont = p.chain_q.to_mont(s2_hat)

        # public key
        a_hat = self._uniform_ntt(next(ks))
        e_hat = p.ntt_q.forward(
            sampling.small_to_residues(sampling.gauss(next(ks), (p.n,)), p.chain_q.q)
        )
        p0_hat = neg_mod(
            add_mod(p.chain_q.mont_mul(a_hat, s_mont), e_hat, p.chain_q.q),
            p.chain_q.q,
        )

        # all switch-key targets at once: s^2 then sigma_g(s) per element
        hybrid = p.ks_hybrid
        if hybrid:
            # switch keys live mod Q*P: targets and s over the extended base
            ck = p.chain_qp
            nttk = p.ntt_qp
            sk_hat = nttk.forward(
                sampling.small_to_residues(s_small, ck.q)
            )
            sk_mont = ck.to_mont(sk_hat)
            tgt_s2 = ck.mont_mul(sk_hat, sk_mont)
        else:
            ck, nttk, sk_mont, tgt_s2 = (
                p.chain_q, p.ntt_q, s_mont, s2_hat
            )
        if g_list:
            sg = jnp.take(s_small, srcg, axis=0)  # [G, N]
            sg_smalls = jnp.where(negm, -sg, sg)
        targets = jnp.concatenate(
            [
                tgt_s2[None],
                nttk.forward(
                    sampling.small_to_residues(sg_smalls, ck.q)
                )
                if g_list
                else jnp.zeros((0,) + tgt_s2.shape, tgt_s2.dtype),
            ]
        )
        maker = (
            self._make_switch_keys_batched_hybrid
            if hybrid
            else self._make_switch_keys_batched
        )
        k0_all, k1_all = maker(targets, sk_mont, next(ks))
        relin = SwitchKeys(k0=k0_all[0], k1=k1_all[0])
        galois = {
            g: SwitchKeys(k0=k0_all[gi + 1], k1=k1_all[gi + 1])
            for gi, g in enumerate(g_list)
        }

        return KeySet(
            s_hat_mont=s_mont,
            s2_hat_mont=s2_mont,
            p0_hat_mont=p.chain_q.to_mont(p0_hat),
            p1_hat_mont=p.chain_q.to_mont(a_hat),
            relin=relin,
            galois=galois,
            s_small=s_small,
        )

    def galois_elt_rows(self, steps: int) -> int:
        """Galois element realizing a row rotation by `steps` slots."""
        return pow(3, steps % (self.p.n // 2), 2 * self.p.n)

    def _uniform_ntt(self, key):
        """Uniform poly mod q, sampled directly in NTT domain [k, N]."""
        p = self.p
        c = p.chain_q
        return sampling.uniform_mod_q(
            key, (p.k, p.n), c.q, c.r_mod, c.r_shoup, c.one_shoup
        )

    def _digit_w_tables(self):
        """[kD, k, 1] constants w_ij = 2^(dbc*j) * delta_i with Shoup."""
        p = self.p
        w = np.zeros((p.k * p.digits_per_limb, p.k), np.uint32)
        wsh = np.zeros_like(w)
        idx = 0
        for i in range(p.k):
            for j in range(p.digits_per_limb):
                val = (1 << (p.dbc * j)) % p.q_list[i]
                w[idx, i] = val
                wsh[idx, i] = shoup_precompute_host(val, p.q_list[i])
                idx += 1
        return jnp.asarray(w[:, :, None]), jnp.asarray(wsh[:, :, None])

    def _make_switch_keys_batched(self, targets_hat, s_mont, key):
        """Batched keygen: keys for ALL targets (relin + every Galois
        element) and all (limb, digit) components in one traced program.
        K_ij = (-(a s + e) + target * 2^(dbc*j) * delta_i, a); delta_i is
        the CRT unit of limb i, so sum_ij digit_ij(x) * K_ij decrypts to
        x * target."""
        p = self.p
        c = p.chain_q
        G = targets_hat.shape[0]
        kD = p.k * p.digits_per_limb
        k1, k2 = jax.random.split(key)
        a_hat = sampling.uniform_mod_q(
            k1, (G, kD, p.k, p.n), c.q, c.r_mod, c.r_shoup, c.one_shoup
        )
        e_hat = p.ntt_q.forward(
            sampling.small_to_residues(
                sampling.gauss(k2, (G, kD, p.n)), c.q
            )
        )
        w, w_sh = self._digit_w_tables()
        k0 = add_mod(
            neg_mod(add_mod(c.mont_mul(a_hat, s_mont), e_hat, c.q), c.q),
            mul_const_mod(targets_hat[:, None], w, w_sh, c.q),
            c.q,
        )
        return c.to_mont(k0), c.to_mont(a_hat)

    def _make_switch_keys_batched_hybrid(self, targets_hat, s_mont_qp, key):
        """Hybrid keygen over Q*P: K_j = (-(a s + e) + P * Qtilde_j * T, a)
        for each RNS group j, all targets batched.  targets_hat / s_mont_qp
        are NTT-domain over the extended qp chain."""
        p = self.p
        c = p.chain_qp
        G = targets_hat.shape[0]
        kp = len(p.qp_list)
        k1, k2 = jax.random.split(key)
        a_hat = sampling.uniform_mod_q(
            k1, (G, p.ks_omega, kp, p.n), c.q, c.r_mod, c.r_shoup, c.one_shoup
        )
        e_hat = p.ntt_qp.forward(
            sampling.small_to_residues(
                sampling.gauss(k2, (G, p.ks_omega, p.n)), c.q
            )
        )
        w, w_sh = p.ks_pqt  # [omega, kp, 1]
        k0 = add_mod(
            neg_mod(add_mod(c.mont_mul(a_hat, s_mont_qp), e_hat, c.q), c.q),
            mul_const_mod(targets_hat[:, None], w, w_sh, c.q),
            c.q,
        )
        return c.to_mont(k0), c.to_mont(a_hat)

    # --------------------------------------------------------------- encrypt
    def encrypt(self, keys: KeySet, pt_residues, rng_key) -> Ciphertext:
        """Public-key encryption of plaintext residues [k, N]."""
        p = self.p
        c = p.chain_q
        lead = pt_residues.shape[:-2]
        k1, k2, k3 = jax.random.split(rng_key, 3)
        u_hat = p.ntt_q.forward(
            sampling.small_to_residues(sampling.ternary(k1, lead + (p.n,)), c.q)
        )
        e1 = sampling.small_to_residues(sampling.gauss(k2, lead + (p.n,)), c.q)
        e2 = sampling.small_to_residues(sampling.gauss(k3, lead + (p.n,)), c.q)
        c0 = p.ntt_q.inverse(c.mont_mul(u_hat, keys.p0_hat_mont))
        c1 = p.ntt_q.inverse(c.mont_mul(u_hat, keys.p1_hat_mont))
        dm = mul_const_mod(pt_residues, *p.delta_col, c.q)
        c0 = add_mod(add_mod(c0, e1, c.q), dm, c.q)
        c1 = add_mod(c1, e2, c.q)
        return Ciphertext(jnp.stack([c0, c1], axis=-3))

    def encrypt_zero_symmetric_free(self, pt_residues) -> Ciphertext:
        """A 'transparent' no-noise encoding (c1 = 0): for plaintext data
        flowing through encrypted networks on the Raw path; not secure."""
        p = self.p
        dm = mul_const_mod(pt_residues, *p.delta_col, p.chain_q.q)
        return Ciphertext(jnp.stack([dm, jnp.zeros_like(dm)], axis=-3))

    # --------------------------------------------------------------- decrypt
    def raw_decrypt_residues(self, keys: KeySet, ct: Ciphertext):
        """Device part of decrypt: [c0 + c1 s (+ c2 s^2)]_q -> [k, N]."""
        p = self.p
        c = p.chain_q
        d = ct.data
        acc = c.mont_mul(p.ntt_q.forward(d[..., 1, :, :]), keys.s_hat_mont)
        if ct.size == 3:
            acc = add_mod(
                acc,
                c.mont_mul(p.ntt_q.forward(d[..., 2, :, :]), keys.s2_hat_mont),
                c.q,
            )
        return add_mod(d[..., 0, :, :], p.ntt_q.inverse(acc), c.q)

    def decrypt_residues_mod_t(self, keys: KeySet, ct: Ciphertext):
        """DEVICE scale-and-round decrypt (BEHZ gamma correction): returns
        plaintext coefficients mod t as uint32 [..., N].  Replaces the
        exact host big-int path when t < 2**31 — this is what keeps
        decrypt off the host critical path (SEAL does the same in native
        C++ behind Decryptor.Decrypt)."""
        p = self.p
        assert p.gamma is not None, "device decrypt needs t < 2**31"
        x = self.raw_decrypt_residues(keys, ct)          # [..., k, N]
        xs = mul_const_mod(x, *p.gt_mod_q, p.chain_q.q)  # |gamma*t*x|_q
        y = mul_const_mod(xs, *p.inv_punct_q, p.chain_q.q)
        w, w_sh = p.punct_q_to_tg
        terms = mul_const_mod(
            y[..., :, None, :], w, w_sh, p.chain_tg.q[None, :, :]
        )
        conv = mod_sum(terms, p.chain_tg.q, axis=-3)     # [..., 2, N]
        s = mul_const_mod(conv, *p.neg_qinv_tg, p.chain_tg.q)
        s_t, s_g = s[..., 0, :], s[..., 1, :]
        # reduce s_gamma into Z_t, centered: s_g > gamma/2 means negative
        tq = p.chain_t.q[0]  # scalar-ish [1] -> broadcastable
        s_g_red = mul_const_mod(
            s_g, jnp.uint32(1), p.chain_t.one_shoup[0], tq
        )
        neg = s_g > jnp.uint32(p.gamma >> 1)
        gm, gm_sh = p.gamma_mod_t
        s_g_cent = jnp.where(
            neg, sub_mod(s_g_red, gm[0], tq), s_g_red
        )
        diff = sub_mod(s_t, s_g_cent, tq)
        gi, gi_sh = p.gamma_inv_t
        return mul_const_mod(diff, gi[0], gi_sh[0], tq)

    def decrypt_big_t_planes(self, keys: KeySet, ct: Ciphertext):
        """DEVICE scale-and-round decrypt for 2**31 <= t < 2**62: returns
        (W' mod 2^32, W' mod m2) uint32 planes with W' = round(t*x/q) + t*e2
        (0 <= e2 < k from the approximate base conversion of x; it cancels
        mod t).  join_big_t_planes() composes W' exactly on host and
        reduces mod t — no host big-int path (the gamma trick alone only
        yields W mod {t, gamma} because gamma*t*x vanishes there; the
        extra planes need x itself base-converted)."""
        p = self.p
        assert p.big_gamma is not None, "big-t decrypt needs 2^31<=t<2^62"
        g = p.big_gamma
        cq = p.chain_q
        x = self.raw_decrypt_residues(keys, ct)            # [..., k, N]
        xs = mul_const_mod(x, *p.big_gt_mod_q, cq.q)       # |g*t*x|_q
        y = mul_const_mod(xs, *p.inv_punct_q, cq.q)
        yx = mul_const_mod(x, *p.inv_punct_q, cq.q)
        # conv_y over {m2, gamma}; conv_x over {m2}
        w, w_sh = p.punct_q_to_g2
        g2q = p.chain_g2.q[None, :, :]
        conv_y = mod_sum(
            mul_const_mod(y[..., :, None, :], w, w_sh, g2q),
            p.chain_g2.q, axis=-3,
        )                                                   # [..., 2, N]
        conv_x_m2 = mod_sum(
            mul_const_mod(
                yx[..., :, None, :], w[:, :1], w_sh[:, :1], g2q[:, :1]
            ),
            p.chain_g2.q[:1], axis=-3,
        )[..., 0, :]
        m2q = p.big_m2_chain.q[0]
        # gamma plane: s_g = V mod gamma, V = Z - e  (g*t*x = 0 mod g)
        s_g = mul_const_mod(
            conv_y[..., 1, :], p.big_neg_qinv_g[0][0],
            p.big_neg_qinv_g[1][0], jnp.uint32(g),
        )
        # V' mod m2 = (g*t*conv_x - conv_y) * q^{-1}
        v_m2 = mul_const_mod(
            sub_mod(
                mul_const_mod(
                    conv_x_m2, p.big_gt_m2[0][0], p.big_gt_m2[1][0], m2q
                ),
                conv_y[..., 0, :],
                m2q,
            ),
            p.big_qinv_m2[0][0], p.big_qinv_m2[1][0], m2q,
        )
        # V' mod 2^32: wrap-around arithmetic
        conv_y_m1 = jnp.sum(y * p.punct_q_to_m1, axis=-2, dtype=jnp.uint32)
        conv_x_m1 = jnp.sum(yx * p.punct_q_to_m1, axis=-2, dtype=jnp.uint32)
        v_m1 = (conv_x_m1 * p.big_gt_m1 - conv_y_m1) * p.big_qinv_m1
        # center the gamma residue and divide by gamma: W' = (V' - v) / g
        neg = s_g > jnp.uint32(g >> 1)
        gm, _ = p.big_gamma_mod_m2
        e_m2 = jnp.where(neg, sub_mod(s_g, gm[0], m2q), s_g)
        w_m2 = mul_const_mod(
            sub_mod(v_m2, e_m2, m2q), p.big_ginv_m2[0][0],
            p.big_ginv_m2[1][0], m2q,
        )
        e_m1 = s_g - jnp.where(neg, jnp.uint32(g), jnp.uint32(0))
        w_lo = (v_m1 - e_m1) * p.big_ginv_m1
        return w_lo, w_m2

    def join_big_t_planes(self, w_lo, w_m2) -> np.ndarray:
        """Host: (W' mod 2^32, W' mod m2) -> exact uint64 W' (< t*(k+1)
        < 2^63), reduced mod t.  All arithmetic fits int64: the high digit
        u = W' >> 32 < 2^31 <= m2 is recovered exactly mod m2."""
        p = self.p
        m2 = p.big_m2
        inv32 = modinv((1 << 32) % m2, m2)
        lo = np.asarray(w_lo).astype(np.int64)
        r2 = np.asarray(w_m2).astype(np.int64)
        d = (r2 - (lo % m2)) % m2
        u = (d * inv32) % m2            # < 2^31; product < 2^62 fits
        return ((lo + (u << 32)).astype(np.uint64)) % np.uint64(p.t)

    def decrypt(self, keys: KeySet, ct: Ciphertext) -> np.ndarray:
        """Full decrypt -> plaintext coeffs as Python-int numpy [N] in [0,t)."""
        p = self.p
        limbs = np.asarray(self.raw_decrypt_residues(keys, ct)).astype(object)
        lead = limbs.shape[:-2]
        flat = limbs.reshape(-1, p.k, p.n)
        out = np.empty((flat.shape[0], p.n), dtype=object)
        t, q = p.t, p.q_big
        crt = p.crt_q
        for b in range(flat.shape[0]):
            for idx in range(p.n):
                w = crt.compose_centered(
                    [int(flat[b, l, idx]) for l in range(p.k)]
                )
                out[b, idx] = ((2 * t * w + q) // (2 * q)) % t
        return out.reshape(*lead, p.n)

    # -------------------------------------------------------------- add/sub
    def _match_size(self, a: Ciphertext, b: Ciphertext):
        da, db = a.data, b.data
        if da.shape[-3] < db.shape[-3]:
            pad = jnp.zeros(
                da.shape[:-3] + (db.shape[-3] - da.shape[-3],) + da.shape[-2:],
                da.dtype,
            )
            da = jnp.concatenate([da, pad], axis=-3)
        elif db.shape[-3] < da.shape[-3]:
            pad = jnp.zeros(
                db.shape[:-3] + (da.shape[-3] - db.shape[-3],) + db.shape[-2:],
                db.dtype,
            )
            db = jnp.concatenate([db, pad], axis=-3)
        return da, db

    def add(self, a: Ciphertext, b: Ciphertext) -> Ciphertext:
        da, db = self._match_size(a, b)
        return Ciphertext(add_mod(da, db, self.p.chain_q.q))

    def sub(self, a: Ciphertext, b: Ciphertext) -> Ciphertext:
        da, db = self._match_size(a, b)
        return Ciphertext(sub_mod(da, db, self.p.chain_q.q))

    def neg(self, a: Ciphertext) -> Ciphertext:
        return Ciphertext(neg_mod(a.data, self.p.chain_q.q))

    def add_plain(self, a: Ciphertext, pt_residues) -> Ciphertext:
        dm = mul_const_mod(pt_residues, *self.p.delta_col, self.p.chain_q.q)
        d = a.data.at[..., 0, :, :].set(
            add_mod(a.data[..., 0, :, :], dm, self.p.chain_q.q)
        )
        return Ciphertext(d)

    def sub_plain(self, a: Ciphertext, pt_residues) -> Ciphertext:
        dm = mul_const_mod(pt_residues, *self.p.delta_col, self.p.chain_q.q)
        d = a.data.at[..., 0, :, :].set(
            sub_mod(a.data[..., 0, :, :], dm, self.p.chain_q.q)
        )
        return Ciphertext(d)

    # ---------------------------------------------------------- plain mult
    def prepare_plain_mult(self, pt_residues):
        """Plaintext poly -> NTT+Montgomery domain [k, N] (do once per
        weight at network-prepare time, ref PoolLayer.cs:101-111)."""
        return self.p.chain_q.to_mont(self.p.ntt_q.forward(pt_residues))

    def mul_plain(self, a: Ciphertext, pt_hat_mont) -> Ciphertext:
        p = self.p
        out = p.ntt_q.inverse(
            p.chain_q.mont_mul(p.ntt_q.forward(a.data), pt_hat_mont)
        )
        return Ciphertext(out)

    # ------------------------------------------------------------- multiply
    def _fast_bconv(self, y, punct, to_chain: ModChain):
        """y: [..., Lf, N] (already * inv_punct per source limb);
        -> [..., Lt, N] = sum_i y_i * |punct_i|_m  mod m."""
        w, w_sh = punct
        terms = mul_const_mod(
            y[..., :, None, :], w, w_sh, to_chain.q[None, :, :]
        )
        return mod_sum(terms, to_chain.q, axis=-3)

    def _lift_to_bsk(self, x_q):
        """BEHZ input lift with m_tilde correction: x (base q, [..., k, N])
        -> exact |x|_q (+ small q-multiple) in base Bsk [..., k+1, N]."""
        p = self.p
        cq, cb = p.chain_q, p.chain_bsk
        mt_mask = jnp.uint32(p.m_tilde - 1)
        xt = mul_const_mod(x_q, *p.mtilde_mod_q, cq.q)  # |m_tilde * x|_q
        y = mul_const_mod(xt, *p.inv_punct_q, cq.q)
        conv = self._fast_bconv(y, p.punct_q_to_bsk, cb)
        # residue mod m_tilde: plain wrap-around sum masked to 16 bits
        conv_mt = jnp.sum(
            (y[..., :, None, :] * p.punct_q_to_mtilde) & mt_mask, axis=-3
        ).astype(jnp.uint32) & mt_mask
        conv_mt = jnp.squeeze(conv_mt, axis=-2)
        r = (conv_mt * p.neg_qinv_mtilde) & mt_mask
        r_c = r.astype(jnp.int32) - jnp.where(
            r >= (p.m_tilde >> 1), jnp.int32(p.m_tilde), 0
        )
        # r_c (small, centered) broadcast over the Bsk limb axis
        r_resb = jnp.where(
            (r_c < 0)[..., None, :],
            (r_c[..., None, :].astype(jnp.uint32) + cb.q),
            r_c[..., None, :].astype(jnp.uint32),
        )
        corr = mul_const_mod(r_resb, *p.q_mod_bsk, cb.q)
        return mul_const_mod(
            add_mod(conv, corr, cb.q), *p.mtilde_inv_bsk, cb.q
        )

    def multiply(self, a: Ciphertext, b: Ciphertext) -> Ciphertext:
        """BFV ciphertext multiply (BEHZ full-RNS): returns size-3 ct;
        call relinearize() to reduce (mirrors Evaluator.Multiply +
        Relinearize, `AtomicSealBfvVector.cs:839-840`)."""
        p = self.p
        cq, cb = p.chain_q, p.chain_bsk
        assert a.size == 2 and b.size == 2

        a_bsk = self._lift_to_bsk(a.data)
        b_bsk = self._lift_to_bsk(b.data)

        def tensor(x, y, ntt, chain):
            xh = ntt.forward(x)
            yh = chain.to_mont(ntt.forward(y))
            x0, x1 = xh[..., 0, :, :], xh[..., 1, :, :]
            y0, y1 = yh[..., 0, :, :], yh[..., 1, :, :]
            c0 = chain.mont_mul(x0, y0)
            c1 = add_mod(
                chain.mont_mul(x0, y1), chain.mont_mul(x1, y0), chain.q
            )
            c2 = chain.mont_mul(x1, y1)
            return ntt.inverse(jnp.stack([c0, c1, c2], axis=-3))

        c_q = tensor(a.data, b.data, p.ntt_q, cq)
        c_bsk = tensor(a_bsk, b_bsk, p.ntt_bsk, cb)

        # scale by t/q with fast floor
        tc_q = mul_const_mod(c_q, *p.t_mod_q, cq.q)
        tc_bsk = mul_const_mod(c_bsk, *p.t_mod_bsk, cb.q)
        y = mul_const_mod(tc_q, *p.inv_punct_q, cq.q)
        u = self._fast_bconv(y, p.punct_q_to_bsk, cb)
        fl = mul_const_mod(
            sub_mod(tc_bsk, u, cb.q), *p.qinv_mod_bsk, cb.q
        )

        # Shenoy-Kumaresan back-conversion Bsk -> q
        nB = len(p.B_list)
        y_B, y_msk = fl[..., :nB, :], fl[..., nB, :]  # [..., s, nB, N], [..., s, N]
        z = mul_const_mod(y_B, *p.inv_punct_B, p.chain_B.q)
        conv_q = self._fast_bconv(z, p.punct_B_to_q, cq)
        conv_msk = self._fast_bconv(z, p.punct_B_to_msk, p.msk_chain)
        alpha = mul_const_mod(
            sub_mod(conv_msk, y_msk[..., None, :], p.msk_chain.q),
            *p.Binv_mod_msk,
            p.msk_chain.q,
        )  # [..., 1, N] residue mod msk, value is small & centered
        half = jnp.uint32(p.msk >> 1)
        a_small = alpha  # [...,1,N]
        big = a_small > half
        pos = cq.reduce_u32(a_small)            # alpha mod q_j (alpha small)
        negv = neg_mod(cq.reduce_u32(jnp.uint32(p.msk) - a_small), cq.q)
        alpha_res = jnp.where(big, negv, pos)
        out = sub_mod(
            conv_q, mul_const_mod(alpha_res, *p.B_mod_q, cq.q), cq.q
        )
        return Ciphertext(out)

    def square(self, a: Ciphertext) -> Ciphertext:
        return self.multiply(a, a)

    # ----------------------------------------------------------- key switch
    def _decompose_digits(self, poly):
        """poly [k, N] -> digits [k*D, k, N]: base-2^dbc digits of each limb
        residue, broadcast across the limb axis (valid residues everywhere
        since 2^dbc < min q)."""
        p = self.p
        mask = jnp.uint32((1 << p.dbc) - 1)
        ds = []
        for i in range(p.k):
            for j in range(p.digits_per_limb):
                d = (poly[..., i, :] >> (p.dbc * j)) & mask  # [..., N]
                ds.append(
                    jnp.broadcast_to(d[..., None, :], poly.shape)
                )
        return jnp.stack(ds)

    def _switch_key_inner(self, poly, keys: SwitchKeys):
        """Core key-switch -> two polys [..., 2, k, N] (coefficient domain).
        This is the rotation/relin hot loop (ref `AtomicSealBfvVector`
        relin/rotate call sites).  Dispatches digit vs hybrid mode."""
        if self.p.ks_hybrid:
            return self._switch_key_inner_hybrid(poly, keys)
        p = self.p
        cq = p.chain_q
        kD = p.k * p.digits_per_limb
        lead = int(np.prod(poly.shape[:-2], dtype=np.int64))
        if 4 * kD * lead * p.k * p.n > (1 << 31):
            # big batched switches: lax.scan over the kD digits,
            # accumulating — identical math to the stacked path with
            # ~kD x smaller peak memory (see the hybrid variant), and a
            # kD x smaller traced program than the old unrolled Python
            # loop (one digit body instead of 28 at dbc=8; the unrolled
            # form was the bulk of the ~100 s per-process trace/lower
            # cost of the LoLa whole-network program).
            mask = jnp.uint32((1 << p.dbc) - 1)
            limb_idx = jnp.asarray(
                np.repeat(np.arange(p.k, dtype=np.int32),
                          p.digits_per_limb)
            )
            shifts = jnp.asarray(
                np.tile(
                    np.uint32(p.dbc) * np.arange(
                        p.digits_per_limb, dtype=np.uint32
                    ),
                    p.k,
                )
            )
            zero = jnp.zeros(poly.shape, jnp.uint32)

            def digit_body(carry, xs):
                t0, t1 = carry
                li, sh, k0_d, k1_d = xs
                dig = (
                    jnp.take(poly, li, axis=-2) >> sh
                ) & mask  # [..., N]
                dhat = p.ntt_q.forward(
                    jnp.broadcast_to(dig[..., None, :], poly.shape)
                )
                t0 = add_mod(t0, cq.mont_mul(dhat, k0_d), cq.q)
                t1 = add_mod(t1, cq.mont_mul(dhat, k1_d), cq.q)
                return (t0, t1), None

            (t0, t1), _ = jax.lax.scan(
                digit_body,
                (zero, zero),
                (limb_idx, shifts, keys.k0, keys.k1),
            )
            return p.ntt_q.inverse(jnp.stack([t0, t1], axis=-3))
        dhat = p.ntt_q.forward(self._decompose_digits(poly))  # [kD, ..., k, N]
        extra = dhat.ndim - 3  # leading batch dims of poly
        kshape = (keys.k0.shape[0],) + (1,) * extra + keys.k0.shape[1:]
        k0 = keys.k0.reshape(kshape)
        k1 = keys.k1.reshape(kshape)
        t0 = mod_sum(cq.mont_mul(dhat, k0), cq.q, axis=0)
        t1 = mod_sum(cq.mont_mul(dhat, k1), cq.q, axis=0)
        return p.ntt_q.inverse(jnp.stack([t0, t1], axis=-3))

    def _switch_key_inner_hybrid(self, poly, keys: SwitchKeys):
        """Hybrid key switch: omega RNS groups, each base-extended to Q*P
        (approximate FastBConv), one inner product over the extended chain,
        then rounded division by P back to Q.  omega*(k+a) + 2*(k+a) limb
        NTTs per switch vs k*D*(k+2) for digit mode, and key-switch noise
        ~ omega*a*n*B instead of ~ k*D*2^dbc*n*B."""
        p = self.p
        cq, cqp = p.chain_q, p.chain_qp
        y = mul_const_mod(poly, *p.ks_inv_punct_grp, cq.q)  # [..., k, N]
        w, w_sh = p.ks_grp_conv  # [k, kp, 1]
        kp = len(p.qp_list)
        lead = int(np.prod(poly.shape[:-2], dtype=np.int64))
        # the stacked [omega, ..., kp, N] digit tensor costs omega*kp/k
        # more HBM than the input; for big batched rotations (e.g. the
        # CIFAR 112-row sum tree) loop groups and accumulate instead —
        # identical math, ~omega x smaller peak memory.
        stack_bytes = 4 * p.ks_omega * lead * kp * p.n
        if stack_bytes > (1 << 31):
            t0 = t1 = None
            for gi, (i0, i1) in enumerate(p.ks_groups):
                seg = mul_const_mod(
                    y[..., i0:i1, None, :],
                    w[i0:i1],
                    w_sh[i0:i1],
                    cqp.q[None, :, :],
                )  # [..., g, kp, N]
                d = (
                    mod_sum(seg, cqp.q, axis=-3)
                    if i1 - i0 > 1
                    else seg[..., 0, :, :]
                )
                dhat = p.ntt_qp.forward(d)
                a0 = cqp.mont_mul(dhat, keys.k0[gi])
                a1 = cqp.mont_mul(dhat, keys.k1[gi])
                t0 = a0 if t0 is None else add_mod(t0, a0, cqp.q)
                t1 = a1 if t1 is None else add_mod(t1, a1, cqp.q)
        else:
            terms = mul_const_mod(
                y[..., :, None, :], w, w_sh, cqp.q[None, :, :]
            )  # [..., k, kp, N]
            ds = []
            for i0, i1 in p.ks_groups:
                seg = terms[..., i0:i1, :, :]
                ds.append(
                    mod_sum(seg, cqp.q, axis=-3)
                    if i1 - i0 > 1
                    else seg[..., 0, :, :]
                )
            d = jnp.stack(ds, axis=0)  # [omega, ..., kp, N]
            dhat = p.ntt_qp.forward(d)
            extra = dhat.ndim - 3
            kshape = (keys.k0.shape[0],) + (1,) * extra + keys.k0.shape[1:]
            k0 = keys.k0.reshape(kshape)
            k1 = keys.k1.reshape(kshape)
            t0 = mod_sum(cqp.mont_mul(dhat, k0), cqp.q, axis=0)
            t1 = mod_sum(cqp.mont_mul(dhat, k1), cqp.q, axis=0)
        tt = p.ntt_qp.inverse(jnp.stack([t0, t1], axis=-3))  # [..., 2, kp, N]
        if p.n_special == 0:
            return tt  # P-less mode: keys live mod Q, no mod-down
        t_q, t_sp = tt[..., : p.k, :], tt[..., p.k :, :]
        # rounded division by P: (t + P/2 - [(t + P/2) mod P]) / P
        csp = p.chain_sp
        z = add_mod(t_sp, p.ks_phalf_sp, csp.q)
        y2 = mul_const_mod(z, *p.ks_inv_punct_sp, csp.q)
        conv = self._fast_bconv(y2, p.ks_punct_sp_to_q, cq)
        num = sub_mod(add_mod(t_q, p.ks_phalf_q, cq.q), conv, cq.q)
        return mul_const_mod(num, *p.ks_pinv_q, cq.q)

    def relinearize(self, ct: Ciphertext, keys: KeySet) -> Ciphertext:
        if ct.size == 2:
            return ct
        p = self.p
        ks = self._switch_key_inner(ct.data[..., 2, :, :], keys.relin)
        return Ciphertext(
            add_mod(ct.data[..., :2, :, :], ks, p.chain_q.q)
        )

    # ------------------------------------------------------------ rotations
    def apply_galois(self, ct: Ciphertext, g: int, keys: KeySet) -> Ciphertext:
        p = self.p
        src, negm = _automorphism_tables(p.n, g)
        d = ct.data[..., src]
        d = jnp.where(negm, neg_mod(d, p.chain_q.q), d)
        ks = self._switch_key_inner(d[..., 1, :, :], keys.galois[g])
        c0 = add_mod(d[..., 0, :, :], ks[..., 0, :, :], p.chain_q.q)
        return Ciphertext(jnp.stack([c0, ks[..., 1, :, :]], axis=-3))

    def rotate_rows(self, ct: Ciphertext, steps: int, keys: KeySet) -> Ciphertext:
        """Rotate the two (n/2)-slot rows by `steps` (ref RotateRows).
        Decomposes into available power-of-two Galois keys."""
        p = self.p
        row = p.n // 2
        steps %= row
        if steps == 0:
            return ct
        g = self.galois_elt_rows(steps)
        if g in keys.galois:
            return self.apply_galois(ct, g, keys)
        rem = steps
        out = ct
        bit = 1
        while rem:
            if rem & 1:
                out = self.apply_galois(out, self.galois_elt_rows(bit), keys)
            rem >>= 1
            bit <<= 1
        return out

    def rotate_columns(self, ct: Ciphertext, keys: KeySet) -> Ciphertext:
        """Swap the two slot rows (ref RotateColumns): galois elt 2n-1."""
        return self.apply_galois(ct, 2 * self.p.n - 1, keys)

    def rotate_accumulate_scan(self, data, stacked) -> jnp.ndarray:
        """acc <- acc + rotate(acc, g_l) for a stacked ladder of Galois
        elements, as ONE lax.scan whose body is a single automorphism +
        key switch (the log2-rotation sum tree of SumAllSlots,
        ref `AtomicSealBfvVector.cs:871-955`, and Duplicate's ladder).

        `stacked` = (src [L, N] int32, negm [L, N] bool, k0/k1 stacked
        switch keys [L, ...]) — prepared once per ladder by the factory
        (api/factory.py stacked_galois).  Tracing one level instead of
        L was the other half of the per-process trace-cost fix (10-13
        levels per dense-layer sum tree in LoLa/CryptoNets)."""
        p = self.p
        cq = p.chain_q
        srcs, negms, k0s, k1s = stacked

        def level(acc, xs):
            src, negm, k0, k1 = xs
            d = acc[..., src]
            d = jnp.where(negm, neg_mod(d, cq.q), d)
            ks = self._switch_key_inner(
                d[..., 1, :, :], SwitchKeys(k0, k1)
            )
            c0 = add_mod(d[..., 0, :, :], ks[..., 0, :, :], cq.q)
            rot = jnp.stack([c0, ks[..., 1, :, :]], axis=-3)
            return add_mod(acc, rot, cq.q), None

        acc, _ = jax.lax.scan(level, data, (srcs, negms, k0s, k1s))
        return acc
