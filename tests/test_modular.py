"""Property tests: uint32 modular primitives vs exact Python ints."""

import numpy as np
import jax.numpy as jnp
import pytest

from cryptonets_tpu.crypto import modular as M
from cryptonets_tpu.crypto.primes import ntt_primes

RNG = np.random.default_rng(0)
PRIMES = [ntt_primes(4096, 30, 2)[0], ntt_primes(4096, 20, 1)[0], (1 << 31) - 1]
# (1<<31)-1 is prime (Mersenne) — good stress case near the 2**31 bound.


def rand_u32(shape, hi):
    return RNG.integers(0, hi, size=shape, dtype=np.uint32)


def test_mul32_hilo_exact():
    a = rand_u32((4096,), 1 << 32)
    b = rand_u32((4096,), 1 << 32)
    hi, lo = M.mul32_hilo(jnp.asarray(a), jnp.asarray(b))
    prod = a.astype(object) * b.astype(object)
    np.testing.assert_array_equal(np.asarray(hi).astype(object), prod >> 32)
    np.testing.assert_array_equal(
        np.asarray(lo).astype(object), prod & 0xFFFFFFFF
    )
    hi2 = M.mul32_hi(jnp.asarray(a), jnp.asarray(b))
    np.testing.assert_array_equal(np.asarray(hi2).astype(object), prod >> 32)


@pytest.mark.parametrize("q", PRIMES)
def test_add_sub_neg_mod(q):
    a = rand_u32((1024,), q)
    b = rand_u32((1024,), q)
    qa = jnp.uint32(q)
    np.testing.assert_array_equal(
        np.asarray(M.add_mod(jnp.asarray(a), jnp.asarray(b), qa)),
        ((a.astype(np.uint64) + b) % q).astype(np.uint32),
    )
    np.testing.assert_array_equal(
        np.asarray(M.sub_mod(jnp.asarray(a), jnp.asarray(b), qa)),
        ((a.astype(np.int64) - b) % q).astype(np.uint32),
    )
    np.testing.assert_array_equal(
        np.asarray(M.neg_mod(jnp.asarray(a), qa)),
        ((-a.astype(np.int64)) % q).astype(np.uint32),
    )


@pytest.mark.parametrize("q", PRIMES)
def test_shoup_mul_const(q):
    # x may be ANY uint32 (lazy inputs), w < q.
    x = rand_u32((4096,), 1 << 32)
    for w in [0, 1, int(q) - 1, int(RNG.integers(0, q))]:
        ws = M.shoup_precompute_host(w, q)
        got = M.mul_const_mod(
            jnp.asarray(x), jnp.uint32(w), jnp.uint32(ws), jnp.uint32(q)
        )
        want = (x.astype(object) * w % q).astype(np.uint64).astype(np.uint32)
        np.testing.assert_array_equal(np.asarray(got), want)
        lazy = M.mul_const_mod_lazy(
            jnp.asarray(x), jnp.uint32(w), jnp.uint32(ws), jnp.uint32(q)
        )
        assert (np.asarray(lazy).astype(np.uint64) < 2 * q).all()
        np.testing.assert_array_equal(np.asarray(lazy) % q, want)


@pytest.mark.parametrize("q", PRIMES)
def test_montgomery_general_mul(q):
    c = M.mont_precompute_host(q)
    a = rand_u32((4096,), q)
    b = rand_u32((4096,), q)
    got = M.mul_mod(
        jnp.asarray(a),
        jnp.asarray(b),
        jnp.uint32(q),
        jnp.uint32(c["qinv_neg"]),
        jnp.uint32(c["r_mod"]),
        jnp.uint32(c["r_shoup"]),
    )
    want = (a.astype(object) * b.astype(object) % q).astype(np.uint64)
    np.testing.assert_array_equal(np.asarray(got).astype(np.uint64), want)


def test_limb_axis_broadcast():
    """One call covers all limbs: q shaped [L,1] against x [L,N]."""
    qs = np.array(ntt_primes(4096, 30, 4), dtype=np.uint32).reshape(4, 1)
    a = np.stack([rand_u32((8,), int(q)) for q in qs[:, 0]])
    b = np.stack([rand_u32((8,), int(q)) for q in qs[:, 0]])
    got = M.add_mod(jnp.asarray(a), jnp.asarray(b), jnp.asarray(qs))
    want = (a.astype(np.uint64) + b) % qs.astype(np.uint64)
    np.testing.assert_array_equal(np.asarray(got).astype(np.uint64), want)


def test_mont_mul_edge_values():
    q = PRIMES[0]
    c = M.mont_precompute_host(q)
    edge = np.array([0, 1, q - 1, q // 2, q // 2 + 1], dtype=np.uint32)
    a, b = np.meshgrid(edge, edge)
    a, b = a.ravel(), b.ravel()
    # mont_mul(aR, b) == a*b mod q path via mul_mod
    got = M.mul_mod(
        jnp.asarray(a), jnp.asarray(b), jnp.uint32(q),
        jnp.uint32(c["qinv_neg"]), jnp.uint32(c["r_mod"]), jnp.uint32(c["r_shoup"]),
    )
    want = (a.astype(object) * b.astype(object) % q).astype(np.uint64)
    np.testing.assert_array_equal(np.asarray(got).astype(np.uint64), want)
