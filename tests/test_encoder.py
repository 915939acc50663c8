"""Batch encoder: round-trip, SIMD semantics under HE ops, and the
2 x (n/2) row-rotation structure (ref BasicOperations rotation tests)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cryptonets_tpu.crypto.bfv import BFV, BFVParams
from cryptonets_tpu.crypto.encoder import BatchEncoder
from cryptonets_tpu.crypto.primes import ntt_primes

N = 1024
T = ntt_primes(N, 20, 1)[0]
RNG = np.random.default_rng(5)


@pytest.fixture(scope="module")
def ctx():
    params = BFVParams(N, T, coeff_modulus=ntt_primes(N, 30, 3), dbc=16)
    bfv = BFV(params)
    keys = bfv.keygen(seed=77)
    enc = BatchEncoder(N, T)
    return bfv, keys, enc


def encrypt_slots(bfv, keys, enc, values, seed=0):
    coeffs = enc.encode(values)
    res = jnp.asarray(bfv.p.plain_to_residues(coeffs))
    return bfv.encrypt(keys, res, jax.random.key(seed))


def decrypt_slots(bfv, keys, enc, ct):
    return enc.decode(bfv.decrypt(keys, ct)).astype(np.int64)


def test_encode_decode_roundtrip(ctx):
    _, _, enc = ctx
    v = RNG.integers(0, T, N, dtype=np.int64)
    np.testing.assert_array_equal(enc.decode(enc.encode(v)).astype(np.int64), v)


def test_large_t_roundtrip():
    """Object-int path for a 40-bit plain modulus (CryptoNets-scale)."""
    n = 256
    t = ntt_primes(n, 40, 1)[0]
    enc = BatchEncoder(n, t)
    v = [int(x) for x in RNG.integers(0, 1 << 39, n)]
    got = enc.decode(enc.encode(v))
    assert [int(x) for x in got] == [x % t for x in v]


def test_simd_add_and_multiply(ctx):
    bfv, keys, enc = ctx
    a = RNG.integers(0, 1000, N, dtype=np.int64)
    b = RNG.integers(0, 1000, N, dtype=np.int64)
    ca = encrypt_slots(bfv, keys, enc, a, 1)
    cb = encrypt_slots(bfv, keys, enc, b, 2)
    np.testing.assert_array_equal(
        decrypt_slots(bfv, keys, enc, bfv.add(ca, cb)), (a + b) % T
    )
    prod = bfv.relinearize(bfv.multiply(ca, cb), keys)
    np.testing.assert_array_equal(
        decrypt_slots(bfv, keys, enc, prod), (a * b) % T
    )


def test_rotate_rows_semantics(ctx):
    """rotate_rows(k) cyclically shifts each (n/2)-row; columns swap rows."""
    bfv, keys, enc = ctx
    row = N // 2
    v = RNG.integers(0, 1000, N, dtype=np.int64)
    ct = encrypt_slots(bfv, keys, enc, v, 3)
    for steps in (1, 2, 7, row - 1):
        got = decrypt_slots(
            bfv, keys, enc, bfv.rotate_rows(ct, steps, keys)
        )
        want = np.concatenate(
            [np.roll(v[:row], -steps), np.roll(v[row:], -steps)]
        )
        np.testing.assert_array_equal(got, want, err_msg=f"steps={steps}")
    got = decrypt_slots(bfv, keys, enc, bfv.rotate_columns(ct, keys))
    np.testing.assert_array_equal(got, np.concatenate([v[row:], v[:row]]))
