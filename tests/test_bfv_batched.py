"""Batched (leading-axis) BFV ops must match per-item unbatched results.
This is the TPU replacement for the reference's thread-pool fan-out
(`Utils.ParallelProcessInEnv`, SURVEY.md 2.5)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cryptonets_tpu.crypto.bfv import BFV, BFVParams, Ciphertext
from cryptonets_tpu.crypto.primes import ntt_primes

N = 256
T = ntt_primes(N, 16, 1)[0]
B = 3
RNG = np.random.default_rng(21)


@pytest.fixture(scope="module")
def ctx():
    params = BFVParams(N, T, coeff_modulus=ntt_primes(N, 30, 3), dbc=16)
    bfv = BFV(params)
    keys = bfv.keygen(seed=5)
    return bfv, keys


def test_batched_ops_match_unbatched(ctx):
    bfv, keys = ctx
    ms = [RNG.integers(0, T, N, dtype=np.int64) for _ in range(B)]
    res = jnp.asarray(np.stack([bfv.p.plain_to_residues(m) for m in ms]))
    cts = bfv.encrypt(keys, res, jax.random.key(0))  # [B, 2, k, N]
    assert cts.data.shape[0] == B and cts.size == 2

    # batched decrypt == per-item plaintexts
    dec = bfv.decrypt(keys, cts)
    for i, m in enumerate(ms):
        np.testing.assert_array_equal(dec[i].astype(np.int64), m)

    # batched square+relin
    sq = bfv.relinearize(bfv.square(cts), keys)
    dec_sq = bfv.decrypt(keys, sq)
    for i, m in enumerate(ms):
        single = Ciphertext(cts.data[i])
        want = bfv.decrypt(keys, bfv.relinearize(bfv.square(single), keys))
        np.testing.assert_array_equal(dec_sq[i], want)

    # batched rotation
    rot = bfv.rotate_rows(cts, 2, keys)
    dec_rot = bfv.decrypt(keys, rot)
    for i in range(B):
        single = Ciphertext(cts.data[i])
        want = bfv.decrypt(keys, bfv.rotate_rows(single, 2, keys))
        np.testing.assert_array_equal(dec_rot[i], want)
