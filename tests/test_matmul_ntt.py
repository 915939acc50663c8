"""MXU matmul-NTT: round-trip and negacyclic product vs bigint oracle
(order-free properties — the 4-step layout permutes evaluation points)."""

import numpy as np
import jax.numpy as jnp
import pytest

from cryptonets_tpu.crypto import modular as M
from cryptonets_tpu.crypto.primes import ntt_primes
from cryptonets_tpu.kernels.matmul_ntt import MatmulNTTContext

RNG = np.random.default_rng(3)


def rand_poly(qs, n, batch=()):
    return np.stack(
        [RNG.integers(0, q, size=batch + (n,), dtype=np.uint32) for q in qs],
        axis=len(batch),
    )


@pytest.mark.parametrize("n", [64, 256, 4096])
def test_roundtrip(n):
    qs = ntt_primes(n, 30, 3)
    ctx = MatmulNTTContext(n, qs)
    x = rand_poly(qs, n)
    y = ctx.inverse(ctx.forward(jnp.asarray(x)))
    np.testing.assert_array_equal(np.asarray(y), x)


@pytest.mark.parametrize("n", [64, 256])
def test_negacyclic_product(n):
    qs = ntt_primes(n, 29, 2)
    ctx = MatmulNTTContext(n, qs)
    consts = [M.mont_precompute_host(q) for q in qs]
    col = lambda k: jnp.asarray(  # noqa: E731
        np.array([c[k] for c in consts], np.uint32).reshape(-1, 1)
    )
    a = rand_poly(qs, n)
    b = rand_poly(qs, n)
    prod = M.mul_mod(
        ctx.forward(jnp.asarray(a)), ctx.forward(jnp.asarray(b)),
        ctx.q, col("qinv_neg"), col("r_mod"), col("r_shoup"),
    )
    c = np.asarray(ctx.inverse(prod))
    for li, q in enumerate(qs):
        pa = np.array(a[li], dtype=object)
        pb = np.array(b[li], dtype=object)
        full = np.convolve(pa, pb)
        want = (full[:n] - np.concatenate([full[n:], [0]])) % q
        np.testing.assert_array_equal(c[li].astype(object), want)


def test_batched_matches_single():
    n = 256
    qs = ntt_primes(n, 30, 2)
    ctx = MatmulNTTContext(n, qs)
    x = rand_poly(qs, n, batch=(3, 2))
    y = np.asarray(ctx.forward(jnp.asarray(x)))
    for i in range(3):
        for j in range(2):
            np.testing.assert_array_equal(
                y[i, j], np.asarray(ctx.forward(jnp.asarray(x[i, j])))
            )


def test_max_value_exactness():
    """All-max inputs stress the digit-plane accumulation bounds."""
    n = 256
    qs = ntt_primes(n, 31, 2)  # largest limbs
    ctx = MatmulNTTContext(n, qs)
    x = np.stack([np.full(n, q - 1, np.uint32) for q in qs])
    y = ctx.inverse(ctx.forward(jnp.asarray(x)))
    np.testing.assert_array_equal(np.asarray(y), x)
