"""RLWE randomness, sampled on device with jax.random (deterministic keys).

Reference counterpart: SEAL's ClippedNormalDistribution + uniform sampler
behind `Encryptor`/`KeyGenerator` (native, SURVEY.md 2.1).  Distributions:
uniform-mod-q per RNS limb (CRT bijection makes independent per-limb
uniforms exactly uniform mod q = prod(q_i)), uniform ternary secrets, and
a clipped rounded Gaussian with sigma = 3.2 (SEAL's default error).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .modular import add_mod, mul_const_mod

SIGMA = 3.2
GAUSS_CLIP = 19  # ~6 sigma, mirroring SEAL's clipped normal


def uniform_mod_q(key, shape, q_col, pow32_mod, pow32_shoup, one_shoup):
    """Uniform residues in [0, q) per limb; shape must include the limb axis
    aligned with q_col ([L, 1]-style broadcast).  Uses 64 random bits per
    residue: value = (hi * 2^32 + lo) mod q, modulo bias < 2^-33.
    """
    hi = jax.random.bits(key, shape, jnp.uint32)
    lo = jax.random.bits(jax.random.fold_in(key, 1), shape, jnp.uint32)
    hi_red = mul_const_mod(hi, pow32_mod, pow32_shoup, q_col)
    lo_red = mul_const_mod(lo, jnp.uint32(1), one_shoup, q_col)
    return add_mod(hi_red, lo_red, q_col)


def ternary(key, shape):
    """Uniform in {-1, 0, 1} as int32."""
    return jax.random.randint(key, shape, -1, 2, dtype=jnp.int32)


def gauss(key, shape):
    """Rounded, clipped Gaussian (sigma=3.2) as int32."""
    x = jax.random.normal(key, shape, jnp.float32) * SIGMA
    return jnp.clip(jnp.round(x), -GAUSS_CLIP, GAUSS_CLIP).astype(jnp.int32)


def small_to_residues(x, q_col):
    """Small signed int32 values -> uint32 residues mod each limb modulus.

    x: [..., N] with NO limb axis; q_col: [L, 1].  Returns [..., L, N].
    """
    x = x[..., None, :]
    xu = x.astype(jnp.uint32)
    return jnp.where(x < 0, xu + q_col, xu).astype(jnp.uint32)
