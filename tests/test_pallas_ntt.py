"""Pallas fused NTT: bit-exactness vs the butterfly reference
implementation (same Longa-Naehrig factorization, so outputs must be
IDENTICAL, not merely equivalent), plus a factory-level encrypted smoke
test with ntt_impl='pallas'.  Runs in interpret mode on CPU; the real
TPU path is exercised by bench/scripts."""

import numpy as np
import pytest

from cryptonets_tpu.crypto.ntt import get_ntt_context
from cryptonets_tpu.crypto.primes import ntt_primes
from cryptonets_tpu.kernels.pallas_ntt import PallasNTTContext


@pytest.mark.parametrize("n,k", [(256, 3), (512, 5)])
def test_pallas_matches_butterfly_exactly(n, k):
    mods = tuple(ntt_primes(n, 30, k))
    ref = get_ntt_context(n, mods)
    pal = PallasNTTContext(n, mods)
    rng = np.random.default_rng(7)
    x = rng.integers(0, min(mods), size=(2, k, n)).astype(np.uint32)
    f_ref = np.asarray(ref.forward(x))
    f_pal = np.asarray(pal.forward(x))
    np.testing.assert_array_equal(f_ref, f_pal)
    np.testing.assert_array_equal(
        np.asarray(ref.inverse(f_ref)), np.asarray(pal.inverse(f_ref))
    )
    np.testing.assert_array_equal(np.asarray(pal.inverse(f_pal)), x)


def test_pallas_limb_padding():
    """Limb counts that don't divide the VMEM block are padded/stripped."""
    n = 256
    mods = tuple(ntt_primes(n, 30, 1))  # 1 limb vs block of 8
    ref = get_ntt_context(n, mods)
    pal = PallasNTTContext(n, mods)
    rng = np.random.default_rng(8)
    x = rng.integers(0, min(mods), size=(1, n)).astype(np.uint32)
    np.testing.assert_array_equal(
        np.asarray(ref.forward(x)), np.asarray(pal.forward(x))
    )


def test_factory_pallas_encrypted_ops():
    """End-to-end encrypted add/mult/rotate with ntt_impl='pallas'
    agrees with plaintext math (mirrors the 'matmul' selectable test)."""
    from cryptonets_tpu.api import CrtBfvFactory

    n = 256
    fac = CrtBfvFactory(
        plain_primes=ntt_primes(n, 17, 2), n=n,
        coeff_modulus=ntt_primes(n, 30, 5), dbc=16, seed=3,
        ntt_impl="pallas",
    )
    rng = np.random.default_rng(9)
    a = np.arange(n, dtype=float) % 11 - 5
    b = rng.integers(-5, 6, n).astype(float)
    va = fac.get_encrypted_vector(a, "dense", 1.0)
    vb = fac.get_encrypted_vector(b, "dense", 1.0)
    np.testing.assert_allclose(
        va.pointwise_multiply(vb).decrypt()[:n], a * b, rtol=1e-12
    )
    row = n // 2  # slot-row rotation semantics (ref RotateRows)
    want = np.concatenate([np.roll(a[:row], -3), np.roll(a[row:], -3)])
    np.testing.assert_allclose(va.rotate(3).decrypt(), want, rtol=1e-12)
