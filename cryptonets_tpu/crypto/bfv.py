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
    ):
        self.n = n
        self.t = int(plain_modulus)
        qs = tuple(coeff_modulus) if coeff_modulus else default_coeff_modulus_128(n)
        self.q_list = qs
        self.k = len(qs)
        self.dbc = dbc
        self.seed = seed
        assert (1 << dbc) < min(qs), "digit width must fit smallest limb"
        self.digits_per_limb = -(-max(q.bit_length() for q in qs) // dbc)

        self.chain_q = ModChain(qs)
        self.ntt_q = get_ntt_context(n, qs)
        self.crt_q = CRT(list(qs))
        self.q_big = self.crt_q.product
        self.delta = self.q_big // self.t  # floor(q/t)
        self.delta_col = self.chain_q.shoup_col(
            [self.delta % q for q in qs]
        )

        # ---- BEHZ multiply bases: Bsk = B (k primes) + m_sk, plus m_tilde.
        aux = aux_base_primes(n, self.k + 1, avoid=qs)
        self.B_list, self.msk = aux[: self.k], aux[self.k]
        bsk = self.B_list + (self.msk,)
        self.bsk_list = bsk
        self.chain_bsk = ModChain(bsk)
        self.ntt_bsk = get_ntt_context(n, bsk)
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
        # plain moduli use the exact host path.
        self.gamma = None
        if self.t < (1 << 31):
            from .primes import ntt_primes

            cand = ntt_primes(n, 31, self.k + len(aux) + 4)
            g = next(
                c
                for c in cand
                if c not in qs and c not in aux and c != self.t
            )
            self.gamma = g
            self.chain_tg = ModChain([self.t, g])
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
            self.chain_t = ModChain([self.t])
            self.gamma_mod_t = self.chain_t.scalar_shoup_col(g)
            self.gamma_inv_t = self.chain_t.scalar_shoup_col(
                modinv(g % self.t, self.t)
            )

        # B -> q back-conversion (Shenoy-Kumaresan with m_sk)
        self.chain_B = ModChain(self.B_list)
        self.inv_punct_B = self.chain_B.shoup_col(self.crt_B.inv_punctured)
        self.punct_B_to_q = self._punct_matrix(
            self.crt_B.punctured, self.chain_q
        )
        self.punct_B_to_msk = self._punct_matrix(
            self.crt_B.punctured, ModChain([self.msk])
        )
        self.msk_chain = ModChain([self.msk])
        self.Binv_mod_msk = self.msk_chain.shoup_col(
            [modinv(B_big % self.msk, self.msk)]
        )
        self.B_mod_q = self.chain_q.scalar_shoup_col(B_big)

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
def _automorphism_tables(n: int, g: int):
    """Gather indices + negate mask for a(x) -> a(x^g) mod x^n + 1."""
    i = np.arange(n, dtype=np.int64)
    r = (i * g) % (2 * n)
    pos = r % n
    src = np.empty(n, np.int32)
    neg = np.empty(n, bool)
    src[pos] = i
    neg[pos] = r >= n
    return jnp.asarray(src), jnp.asarray(neg)


class BFV:
    """Evaluator/Encryptor/Decryptor/KeyGenerator in one (SEAL splits these;
    here they share one params object and all ops are pure functions)."""

    def __init__(self, params: BFVParams):
        self.p = params
        # nested jit: these compound ops appear many times in a network
        # trace; wrapping them makes each a single (cached) call primitive
        # in the outer jaxpr instead of thousands of inlined ops.
        self.multiply = jax.jit(self.multiply)
        self._switch_key_inner = jax.jit(self._switch_key_inner)
        self.mul_plain = jax.jit(self.mul_plain)
        self._make_switch_keys_batched = jax.jit(self._make_switch_keys_batched)

    # ------------------------------------------------------------------ keys
    def keygen(self, seed: int | None = None, rot_steps=(), column_key=True):
        """Generate all keys. `rot_steps`: extra Galois keys beyond the
        power-of-two ladder (SEAL's GaloisKeys default is the pow2 ladder,
        composed for arbitrary steps)."""
        p = self.p
        key = jax.random.key(p.seed if seed is None else seed)
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

        galois = {}
        row = p.n // 2
        steps_set = set()
        for j in range(int(math.log2(row))):
            steps_set.add(1 << j)
            steps_set.add(row - (1 << j))  # negative pow2 rotations
        steps_set.update(s % row for s in rot_steps if s % row)
        for st in sorted(steps_set):
            galois[self.galois_elt_rows(st)] = None
        if column_key:
            galois[2 * p.n - 1] = None
        g_list = list(galois)

        # all switch-key targets at once: s^2 then sigma_g(s) per element
        sg_smalls = []
        for g in g_list:
            srcg, negm = _automorphism_tables(p.n, g)
            sg_smalls.append(jnp.where(negm, -s_small[srcg], s_small[srcg]))
        targets = jnp.concatenate(
            [
                s2_hat[None],
                p.ntt_q.forward(
                    sampling.small_to_residues(
                        jnp.stack(sg_smalls), p.chain_q.q
                    )
                )
                if g_list
                else jnp.zeros((0,) + s2_hat.shape, s2_hat.dtype),
            ]
        )
        k0_all, k1_all = self._make_switch_keys_batched(
            targets, s_mont, next(ks)
        )
        relin = SwitchKeys(k0=k0_all[0], k1=k1_all[0])
        for gi, g in enumerate(g_list):
            galois[g] = SwitchKeys(k0=k0_all[gi + 1], k1=k1_all[gi + 1])

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
        y_B, y_msk = fl[..., : p.k, :], fl[..., p.k, :]  # [..., s, k, N], [..., s, N]
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
        """Core key-switch: sum_ij NTT(digit_ij) * K_ij -> two polys [k,N]
        (coefficient domain).  This is the rotation/relin hot loop
        (ref `AtomicSealBfvVector` relin/rotate call sites)."""
        p = self.p
        cq = p.chain_q
        dhat = p.ntt_q.forward(self._decompose_digits(poly))  # [kD, ..., k, N]
        extra = dhat.ndim - 3  # leading batch dims of poly
        kshape = (keys.k0.shape[0],) + (1,) * extra + keys.k0.shape[1:]
        k0 = keys.k0.reshape(kshape)
        k1 = keys.k1.reshape(kshape)
        t0 = mod_sum(cq.mont_mul(dhat, k0), cq.q, axis=0)
        t1 = mod_sum(cq.mont_mul(dhat, k1), cq.q, axis=0)
        return p.ntt_q.inverse(jnp.stack([t0, t1], axis=-3))

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
