"""Exact modular arithmetic on uint32 lanes (the TPU field-math substrate).

TPUs have no widening 32x32->64 integer multiply, so every primitive here
builds exact 64-bit products out of 16x16->32 partial products and reduces
with Shoup (constant multiplier) or Montgomery (general) arithmetic.  All
moduli are odd primes < 2**31 so every intermediate fits uint32 and the
single-conditional-subtract bounds hold.

These functions are plain jnp expressions: they trace into XLA (where the
elementwise chains fuse) and are equally usable inside Pallas kernel bodies.
Moduli and precomputed companions are passed as broadcastable uint32 arrays,
so one call vectorizes over the RNS limb axis (modulus per limb) as well as
coefficients/batch.

Reference counterpart: SEAL 3.2's `seal::util::multiply_uint_mod` /
`MultiplyUIntModOperand` (native C++, behind every `Evaluator.*` call noted
in SURVEY.md section 2.1).
"""

from __future__ import annotations

import jax.numpy as jnp

import numpy as np

U32 = jnp.uint32
# numpy scalars (not jnp arrays): they inline as literals in traced code,
# so Pallas kernel bodies can use these helpers without captured consts.
_MASK16 = np.uint32(0xFFFF)


def mul32_hilo(a, b):
    """Exact 64-bit product of uint32 a,b as (hi32, lo32)."""
    a = a.astype(U32) if hasattr(a, "astype") else jnp.asarray(a, U32)
    b = b.astype(U32) if hasattr(b, "astype") else jnp.asarray(b, U32)
    al = a & _MASK16
    ah = a >> 16
    bl = b & _MASK16
    bh = b >> 16
    ll = al * bl
    lh = al * bh
    hl = ah * bl
    hh = ah * bh
    # mid < 3 * 2**16: fits uint32 exactly.
    mid = (ll >> 16) + (lh & _MASK16) + (hl & _MASK16)
    hi = hh + (lh >> 16) + (hl >> 16) + (mid >> 16)
    lo = (mid << 16) | (ll & _MASK16)
    return hi, lo


def mul32_hi(a, b):
    """High 32 bits of the 64-bit product (same partials, no lo recombine)."""
    a = jnp.asarray(a, U32)
    b = jnp.asarray(b, U32)
    al = a & _MASK16
    ah = a >> 16
    bl = b & _MASK16
    bh = b >> 16
    mid = ((al * bl) >> 16) + ((al * bh) & _MASK16) + ((ah * bl) & _MASK16)
    return ah * bh + ((al * bh) >> 16) + ((ah * bl) >> 16) + (mid >> 16)


def cond_sub(x, q):
    """x - q if x >= q else x (x < 2q)."""
    return x - jnp.where(x >= q, q, np.uint32(0)).astype(U32)


def add_mod(a, b, q):
    """(a + b) mod q for a,b in [0,q), q < 2**31."""
    return cond_sub(a + b, q)


def sub_mod(a, b, q):
    """(a - b) mod q for a,b in [0,q)."""
    d = a - b  # wraps; add q where it underflowed
    return d + jnp.where(a < b, q, np.uint32(0)).astype(U32)


def neg_mod(a, q):
    """(-a) mod q for a in [0,q)."""
    return jnp.where(a == 0, np.uint32(0), q - a).astype(U32)


# ---------------------------------------------------------------------------
# Shoup multiplication: one operand is a precomputed constant w < q with
# companion w' = floor(w * 2**32 / q).  Valid for ANY x < 2**32; result < q
# after one conditional subtract.  6 hardware multiplies.
# ---------------------------------------------------------------------------

def shoup_precompute_host(w: int, q: int) -> int:
    """Host: the Shoup companion floor(w << 32 / q)."""
    assert 0 <= w < q < (1 << 31), (w, q)
    return (w << 32) // q


def mul_const_mod(x, w, w_shoup, q):
    """x * w mod q via Shoup; x may be any uint32, w < q constant."""
    hi = mul32_hi(x, w_shoup)
    r = x * w - hi * q  # wrap arithmetic: true value < 2q < 2**32
    return cond_sub(r, q)


def mul_const_mod_lazy(x, w, w_shoup, q):
    """Like mul_const_mod but returns a value < 2q (skip the final subtract)."""
    hi = mul32_hi(x, w_shoup)
    return x * w - hi * q


# ---------------------------------------------------------------------------
# Montgomery arithmetic, R = 2**32: general (data x data) products.
# ---------------------------------------------------------------------------

def mont_precompute_host(q: int) -> dict:
    """Host: Montgomery constants for modulus q (odd, < 2**31)."""
    from .hostmath import modinv

    r = 1 << 32
    qinv_neg = (-modinv(q, r)) % r
    r_mod = r % q
    r2_mod = r * r % q
    return {
        "qinv_neg": qinv_neg,          # -q^{-1} mod 2^32
        "r_mod": r_mod,                # R mod q   (to-Montgomery constant)
        "r_shoup": shoup_precompute_host(r_mod, q),
        "r2_mod": r2_mod,
        "r2_shoup": shoup_precompute_host(r2_mod, q),
    }


def mont_mul(a, b, q, qinv_neg):
    """REDC(a*b) = a*b*R^{-1} mod q.  9 hardware multiplies."""
    hi, lo = mul32_hilo(a, b)
    m = lo * qinv_neg  # low 32 bits only
    mhi = mul32_hi(m, q)
    # t = (a*b + m*q) / 2^32; low halves cancel, carry = (lo != 0)
    t = hi + mhi + jnp.where(lo != 0, np.uint32(1), np.uint32(0))
    return cond_sub(t, q)


def to_mont(x, q, r_mod, r_shoup):
    """x -> x*R mod q (Shoup by the constant R mod q)."""
    return mul_const_mod(x, r_mod, r_shoup, q)


def mul_mod(a, b, q, qinv_neg, r_mod, r_shoup):
    """General a*b mod q for data-dependent a,b (15 multiplies).

    Lift a into the Montgomery domain with the constant R mod q (Shoup),
    then REDC((a*R) * b) = a*b mod q.
    """
    a_m = mul_const_mod(a, r_mod, r_shoup, q)  # a*R mod q
    return mont_mul(a_m, b, q, qinv_neg)


def pow_mod_host(base: int, exp: int, q: int) -> int:
    return pow(base, exp, q)
