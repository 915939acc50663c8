"""NTT correctness: round-trip and negacyclic convolution vs exact ints."""

import numpy as np
import jax.numpy as jnp
import pytest

from cryptonets_tpu.crypto import modular as M
from cryptonets_tpu.crypto.ntt import NTTContext
from cryptonets_tpu.crypto.primes import ntt_primes

RNG = np.random.default_rng(42)


def rand_poly(qs, n, batch=()):
    return np.stack(
        [RNG.integers(0, q, size=batch + (n,), dtype=np.uint32) for q in qs],
        axis=len(batch),
    )


@pytest.mark.parametrize("n", [16, 256, 4096])
def test_roundtrip(n):
    qs = ntt_primes(n, 30, 3)
    ctx = NTTContext(n, qs)
    x = rand_poly(qs, n)
    y = ctx.inverse(ctx.forward(jnp.asarray(x)))
    np.testing.assert_array_equal(np.asarray(y), x)


def naive_negacyclic(a, b, q):
    """Exact negacyclic convolution via Python ints."""
    n = len(a)
    out = [0] * n
    for i, ai in enumerate(a):
        ai = int(ai)
        for j, bj in enumerate(b):
            k = i + j
            if k < n:
                out[k] = (out[k] + ai * int(bj)) % q
            else:
                out[k - n] = (out[k - n] - ai * int(bj)) % q
    return np.array(out, dtype=np.uint32)


@pytest.mark.parametrize("n", [16, 64])
def test_polymul_matches_naive(n):
    qs = ntt_primes(n, 29, 2)
    ctx = NTTContext(n, qs)
    consts = [M.mont_precompute_host(q) for q in qs]
    qv = ctx.q
    qinv = jnp.asarray(
        np.array([c["qinv_neg"] for c in consts], np.uint32).reshape(-1, 1)
    )
    rm = jnp.asarray(np.array([c["r_mod"] for c in consts], np.uint32).reshape(-1, 1))
    rs = jnp.asarray(np.array([c["r_shoup"] for c in consts], np.uint32).reshape(-1, 1))

    a = rand_poly(qs, n)
    b = rand_poly(qs, n)
    fa = ctx.forward(jnp.asarray(a))
    fb = ctx.forward(jnp.asarray(b))
    prod = M.mul_mod(fa, fb, qv, qinv, rm, rs)
    c = np.asarray(ctx.inverse(prod))
    for li, q in enumerate(qs):
        np.testing.assert_array_equal(c[li], naive_negacyclic(a[li], b[li], q))


def test_batch_axes():
    n = 64
    qs = ntt_primes(n, 30, 2)
    ctx = NTTContext(n, qs)
    x = rand_poly(qs, n, batch=(5,))  # [5, L, N]
    y = np.asarray(ctx.forward(jnp.asarray(x)))
    for i in range(5):
        yi = np.asarray(ctx.forward(jnp.asarray(x[i])))
        np.testing.assert_array_equal(y[i], yi)


def test_linearity():
    n = 256
    qs = ntt_primes(n, 30, 2)
    ctx = NTTContext(n, qs)
    a = rand_poly(qs, n)
    b = rand_poly(qs, n)
    fa = ctx.forward(jnp.asarray(a))
    fb = ctx.forward(jnp.asarray(b))
    fsum = ctx.forward(M.add_mod(jnp.asarray(a), jnp.asarray(b), ctx.q))
    np.testing.assert_array_equal(
        np.asarray(fsum), np.asarray(M.add_mod(fa, fb, ctx.q))
    )


def test_ntt_automorphism_perm():
    """NTT-domain automorphism = pure gather: NTT(sigma_g(x)) ==
    NTT(x)[perm] for every Galois element used by rotations (the
    hoisting primitive behind api/bsgs.py's hoisted baby steps)."""
    from cryptonets_tpu.crypto.bfv import _automorphism_tables_np
    from cryptonets_tpu.crypto.ntt import ntt_automorphism_perm

    n = 256
    qs = ntt_primes(n, 30, 2)
    ctx = NTTContext(n, qs)
    x = rand_poly(qs, n)
    fx = np.asarray(ctx.forward(jnp.asarray(x)))
    for g in [3, 9, pow(3, 7, 2 * n), 2 * n - 1, pow(3, n // 2 - 1, 2 * n)]:
        src, neg = _automorphism_tables_np(n, g)
        sx = x[..., src].copy()
        for li, q in enumerate(qs):
            sxl = sx[li]
            sxl[neg] = (q - sxl[neg]) % q
        fsx = np.asarray(ctx.forward(jnp.asarray(sx)))
        perm = ntt_automorphism_perm(n, g)
        np.testing.assert_array_equal(fsx, fx[..., perm])
