"""Serialization: key save/load (with and without secret key) and
ciphertext round-trips (ref SaveLoadKeys + Write/Read tests,
`BasicOperations.cs:291-330`)."""

import io
import os

import numpy as np
import pytest

from cryptonets_tpu.api import CrtBfvFactory
from cryptonets_tpu.api.serial import (
    load_factory,
    load_matrix,
    load_vector,
    save_keys,
    save_matrix,
    save_vector,
)
from cryptonets_tpu.crypto.primes import ntt_primes

N = 256
RNG = np.random.default_rng(77)


@pytest.fixture(scope="module")
def fac():
    return CrtBfvFactory(
        plain_primes=ntt_primes(N, 17, 2), n=N,
        coeff_modulus=ntt_primes(N, 30, 3), dbc=16, seed=21,
    )


def test_key_roundtrip_and_decrypt(fac, tmp_path):
    path = str(tmp_path / "keys.npz")
    save_keys(fac, path, include_secret=True)
    fac2 = load_factory(path)
    v = RNG.integers(-9, 9, 10).astype(float)
    # encrypt with the ORIGINAL factory, decrypt with the RELOADED keys
    enc = fac.get_encrypted_vector(v, "dense", 4.0)
    enc2 = type(enc)(
        fac2, data=enc.data, dim=enc.dim, scale=enc.scale, fmt=enc.fmt
    )
    np.testing.assert_allclose(enc2.decrypt()[:10], v)


def test_public_only_keys(fac, tmp_path):
    path = str(tmp_path / "pub.npz")
    save_keys(fac, path, include_secret=False)
    fac2 = load_factory(path)
    assert not fac2.has_secret_key
    # evaluation still works: encrypt + add on the public-only factory
    v = np.arange(4.0)
    e1 = fac2.get_encrypted_vector(v, "dense", 1.0)
    e2 = fac2.get_encrypted_vector(v, "dense", 1.0)
    s = e1.add(e2)
    # decrypting with the REAL factory gives the right answer
    real = type(s)(fac, data=s.data, dim=s.dim, scale=s.scale, fmt=s.fmt)
    np.testing.assert_allclose(real.decrypt()[:4], 2 * v)


def test_vector_matrix_roundtrip(fac):
    v = RNG.integers(-9, 9, 12).astype(float)
    enc = fac.get_encrypted_vector(v, "dense", 2.0)
    buf = io.BytesIO()
    save_vector(enc, buf)
    buf.seek(0)
    back = load_vector(fac, buf)
    np.testing.assert_allclose(back.decrypt()[:12], v)
    assert back.scale == 2.0 and back.fmt == "dense"

    M = RNG.integers(-5, 5, (6, 3)).astype(float)
    em = fac.get_encrypted_matrix(M, "col", 2.0)
    buf = io.BytesIO()
    save_matrix(em, buf)
    buf.seek(0)
    bm = load_matrix(fac, buf)
    np.testing.assert_allclose(bm.decrypt()[:6], M)
