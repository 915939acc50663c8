"""On-disk key cache (CRYPTONETS_KEY_CACHE): second factory of the same
geometry+seed loads bit-identical keys from disk; different seed or
geometry gets its own file."""

from __future__ import annotations

import os

import jax
import numpy as np

from cryptonets_tpu.api.factory import CrtBfvFactory
from cryptonets_tpu.crypto.primes import ntt_primes


def _tiny(seed, **kw):
    n = 256
    return CrtBfvFactory(
        plain_primes=ntt_primes(n, 17, 2), n=n,
        coeff_modulus=ntt_primes(n, 30, 4), dbc=16, seed=seed, **kw,
    )


def test_key_cache_roundtrip(tmp_path, monkeypatch):
    monkeypatch.setenv("CRYPTONETS_KEY_CACHE", str(tmp_path))
    f1 = _tiny(seed=7)
    files1 = set(os.listdir(tmp_path))
    assert len(files1) == 1 and not any(f.endswith(".tmp") for f in files1)

    f2 = _tiny(seed=7)
    assert set(os.listdir(tmp_path)) == files1  # hit, no new file
    for a, b in zip(jax.tree.leaves(f1.keys), jax.tree.leaves(f2.keys)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert set(f1.keys.galois) == set(f2.keys.galois)

    # cached keys are fully functional
    v = f2.get_encrypted_vector(np.arange(1.0, 7.0), "dense", 4.0)
    out = float(v.dot_product(v).decrypt()[0])
    assert abs(out - float((np.arange(1.0, 7.0) ** 2).sum())) < 1e-9

    # different seed -> different cache entry, different keys
    f3 = _tiny(seed=8)
    assert len(os.listdir(tmp_path)) == 2
    assert not np.array_equal(
        np.asarray(f1.keys.s_small), np.asarray(f3.keys.s_small)
    )


def test_key_cache_off_by_default(tmp_path, monkeypatch):
    monkeypatch.delenv("CRYPTONETS_KEY_CACHE", raising=False)
    _tiny(seed=9)
    assert os.listdir(tmp_path) == []
