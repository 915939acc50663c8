"""BFV scheme correctness: encrypt/decrypt and homomorphic ops vs exact
plaintext arithmetic in Z_t[x]/(x^n+1)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cryptonets_tpu.crypto.bfv import BFV, BFVParams
from cryptonets_tpu.crypto.noise import invariant_noise_budget
from cryptonets_tpu.crypto.primes import ntt_primes

N = 1024
T = ntt_primes(N, 20, 1)[0]  # plain modulus = 1 mod 2n (batching-ready)
RNG = np.random.default_rng(11)


@pytest.fixture(scope="module")
def ctx():
    params = BFVParams(N, T, coeff_modulus=ntt_primes(N, 30, 3), dbc=16)
    bfv = BFV(params)
    keys = bfv.keygen(seed=123, rot_steps=(3,))
    return bfv, keys


def rand_plain():
    return RNG.integers(0, T, size=N, dtype=np.int64)


def enc(bfv, keys, m, seed=0):
    res = jnp.asarray(bfv.p.plain_to_residues(m))
    return bfv.encrypt(keys, res, jax.random.key(seed))


def dec(bfv, keys, ct):
    return bfv.decrypt(keys, ct).astype(np.int64)


def test_encrypt_decrypt_roundtrip(ctx):
    bfv, keys = ctx
    m = rand_plain()
    ct = enc(bfv, keys, m, seed=1)
    np.testing.assert_array_equal(dec(bfv, keys, ct), m)
    assert invariant_noise_budget(bfv, keys, ct) > 20


def test_add_sub_neg(ctx):
    bfv, keys = ctx
    m1, m2 = rand_plain(), rand_plain()
    c1, c2 = enc(bfv, keys, m1, 2), enc(bfv, keys, m2, 3)
    np.testing.assert_array_equal(dec(bfv, keys, bfv.add(c1, c2)), (m1 + m2) % T)
    np.testing.assert_array_equal(dec(bfv, keys, bfv.sub(c1, c2)), (m1 - m2) % T)
    np.testing.assert_array_equal(dec(bfv, keys, bfv.neg(c1)), (-m1) % T)


def test_add_plain(ctx):
    bfv, keys = ctx
    m1, m2 = rand_plain(), rand_plain()
    c1 = enc(bfv, keys, m1, 4)
    res2 = jnp.asarray(bfv.p.plain_to_residues(m2))
    np.testing.assert_array_equal(
        dec(bfv, keys, bfv.add_plain(c1, res2)), (m1 + m2) % T
    )
    np.testing.assert_array_equal(
        dec(bfv, keys, bfv.sub_plain(c1, res2)), (m1 - m2) % T
    )


def negacyclic_mod_t(a, b):
    full = np.convolve(a.astype(object), b.astype(object))
    out = np.zeros(N, dtype=object)
    out[: len(full[:N])] = full[:N]
    out[: len(full) - N] -= full[N:]
    return (out % T).astype(np.int64)


def test_mul_plain(ctx):
    bfv, keys = ctx
    m = rand_plain()
    w = np.zeros(N, np.int64)
    w[0], w[1], w[5] = 3, 7, 2  # small plain poly
    c = enc(bfv, keys, m, 5)
    w_hat = bfv.prepare_plain_mult(jnp.asarray(bfv.p.plain_to_residues(w)))
    got = dec(bfv, keys, bfv.mul_plain(c, w_hat))
    np.testing.assert_array_equal(got, negacyclic_mod_t(m, w))


def test_ct_multiply_relinearize(ctx):
    bfv, keys = ctx
    m1, m2 = rand_plain(), rand_plain()
    c1, c2 = enc(bfv, keys, m1, 6), enc(bfv, keys, m2, 7)
    prod3 = bfv.multiply(c1, c2)
    assert prod3.size == 3
    want = negacyclic_mod_t(m1, m2)
    np.testing.assert_array_equal(dec(bfv, keys, prod3), want)
    prod2 = bfv.relinearize(prod3, keys)
    assert prod2.size == 2
    np.testing.assert_array_equal(dec(bfv, keys, prod2), want)
    b = invariant_noise_budget(bfv, keys, prod2)
    assert b > 5, f"budget exhausted after one multiply: {b}"


def test_square_chain(ctx):
    """Two squarings (the deepest chain CryptoNets needs) stay correct."""
    bfv, keys = ctx
    m = RNG.integers(0, 50, size=N, dtype=np.int64)
    c = enc(bfv, keys, m, 8)
    s1 = bfv.relinearize(bfv.square(c), keys)
    m1 = negacyclic_mod_t(m, m)
    np.testing.assert_array_equal(dec(bfv, keys, s1), m1)
    s2 = bfv.relinearize(bfv.square(s1), keys)
    np.testing.assert_array_equal(dec(bfv, keys, s2), negacyclic_mod_t(m1, m1))


def test_galois_automorphism(ctx):
    """dec(apply_galois(ct, g)) == m(x^g) in Z_t[x]/(x^n+1)."""
    bfv, keys = ctx
    m = rand_plain()
    c = enc(bfv, keys, m, 9)
    g = next(iter(keys.galois))
    got = dec(bfv, keys, bfv.apply_galois(c, g, keys))
    want = np.zeros(N, np.int64)
    for i in range(N):
        r = (i * g) % (2 * N)
        if r < N:
            want[r] = (want[r] + m[i]) % T
        else:
            want[r - N] = (want[r - N] - m[i]) % T
    np.testing.assert_array_equal(got, want % T)


def test_device_decrypt_matches_host(ctx):
    """BEHZ gamma-correction device decrypt == exact host decrypt."""
    bfv, keys = ctx
    m = rand_plain()
    ct = enc(bfv, keys, m, seed=31)
    host = dec(bfv, keys, ct)
    dev = np.asarray(bfv.decrypt_residues_mod_t(keys, ct)).astype(np.int64)
    np.testing.assert_array_equal(dev, host)
    # and after a multiply (noisier ciphertext)
    sq = bfv.relinearize(bfv.square(ct), keys)
    np.testing.assert_array_equal(
        np.asarray(bfv.decrypt_residues_mod_t(keys, sq)).astype(np.int64),
        dec(bfv, keys, sq),
    )


@pytest.mark.parametrize(
    "n_special,ks_alpha,n_limbs",
    [(1, 0, 3), (2, 0, 3), (0, 1, 3), (0, 2, 4)],
)
def test_hybrid_key_switch(n_special, ks_alpha, n_limbs):
    """Hybrid (special-prime) and P-less RNS-group key switching: relin +
    rotations exact (SEAL >= 3.4's construction; the reference's SEAL 3.2
    uses the digit mode also kept here).  Special-prime mode must cost at
    most a couple of budget bits; P-less mode costs ~31*alpha bits by
    design but must stay decryptable."""
    params = BFVParams(
        N, T, coeff_modulus=ntt_primes(N, 30, n_limbs), dbc=16,
        n_special=n_special, ks_alpha=ks_alpha,
    )
    bfv = BFV(params)
    keys = bfv.keygen(seed=7, rot_steps=(3,))
    m1 = rand_plain()
    m2 = rand_plain()
    c1 = enc(bfv, keys, m1, seed=2)
    c2 = enc(bfv, keys, m2, seed=3)
    prod = bfv.relinearize(bfv.multiply(c1, c2), keys)
    np.testing.assert_array_equal(
        dec(bfv, keys, prod), _negacyclic_mul(m1, m2)
    )
    # rotation: slot semantics need slot-ENCODED plaintexts (rotate_rows
    # rolls the two encoder rows, i.e. applies m(x) -> m(x^g) on coeffs)
    from cryptonets_tpu.crypto.encoder import BatchEncoder

    encd = BatchEncoder(N, T)
    slots = rand_plain()
    c3 = enc(bfv, keys, np.asarray(encd.encode(slots)), seed=4)
    rot = bfv.rotate_rows(c3, 3, keys)
    got = encd.decode(dec(bfv, keys, rot)).astype(np.int64)
    np.testing.assert_array_equal(
        got,
        np.concatenate(
            [np.roll(slots[: N // 2], -3), np.roll(slots[N // 2 :], -3)]
        ),
    )
    budget_rot = invariant_noise_budget(bfv, keys, rot)
    budget_fresh = invariant_noise_budget(bfv, keys, c3)
    assert budget_rot > 0, (budget_fresh, budget_rot)
    if n_special > 0:
        # special primes absorb the decomposition noise almost entirely
        assert budget_fresh - budget_rot <= 2, (budget_fresh, budget_rot)


def _negacyclic_mul(m1, m2):
    a = m1.astype(object)
    b = m2.astype(object)
    full = np.convolve(a, b)
    out = full[:N].copy()
    out[: len(full) - N] -= full[N:]
    return (out % T).astype(np.int64)
