"""Batched ct x ct elementwise multiply: the lax.map chunked path
(V > _MULT_CHUNK) must equal the per-vector path exactly.  The chunk
size is patched down so a tiny ring exercises padding + map."""

from __future__ import annotations

import numpy as np
import pytest

import cryptonets_tpu.api.matrix as matrix_mod
from cryptonets_tpu.api.factory import CrtBfvFactory
from cryptonets_tpu.crypto.primes import ntt_primes


@pytest.fixture(scope="module")
def fac():
    n = 256
    return CrtBfvFactory(
        plain_primes=ntt_primes(n, 17, 2),
        n=n,
        coeff_modulus=ntt_primes(n, 30, 4),
        dbc=16,
        seed=5,
    )


def _mat(fac, vals, scale=2.0):
    return fac.get_encrypted_matrix(np.asarray(vals, float), "col", scale)


def test_chunked_map_equals_unchunked(fac, monkeypatch):
    rng = np.random.default_rng(3)
    V, d = 5, 8
    a = rng.integers(-3, 4, (d, V)).astype(float)
    b = rng.integers(-3, 4, (d, V)).astype(float)
    expect = (a * b).T  # column i squared values

    m1 = _mat(fac, a).elementwise_multiply(_mat(fac, b))
    ref = [np.asarray(m1.get_column(i).decrypt(), float)[:d] for i in range(V)]
    np.testing.assert_allclose(np.stack(ref), expect, atol=1e-9)

    monkeypatch.setattr(matrix_mod, "_MULT_CHUNK", 2)  # 5 cols -> 3 chunks
    m2 = _mat(fac, a).elementwise_multiply(_mat(fac, b))
    got = [np.asarray(m2.get_column(i).decrypt(), float)[:d] for i in range(V)]
    np.testing.assert_allclose(np.stack(got), expect, atol=1e-9)
