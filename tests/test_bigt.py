"""Big plain modulus (t >= 2**31) crypto path — the stack behind the
CryptoNets / CIFAR / LoLaDense / LoLaLarge presets (round-1 VERDICT item 1):

  * host big-int / native-C++ slot encode (`crypto/encoder.py`,
    `runtime/hostcrypto.py`)
  * device two-plane scale-and-round decrypt (`crypto/bfv.py`
    decrypt_big_t_planes) and the exact int64 host join (join_big_t_planes)
  * the CrtBfvFactory _device_decode_big dispatch (`api/factory.py`)
    for vectors and batched matrix columns

All exercised at a small ring degree with ~39-bit plain primes (the same
width as the reference CryptoNets primes 549764251649/549764284417,
`CryptoNets/CryptoNets.cs:17`).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cryptonets_tpu.api import CrtBfvFactory
from cryptonets_tpu.crypto.bfv import BFV, BFVParams
from cryptonets_tpu.crypto.encoder import BatchEncoder, _intt_host, _ntt_host
from cryptonets_tpu.crypto.primes import ntt_primes

N = 512
BIG_TS = ntt_primes(N, 39, 2)  # two ~39-bit batching primes, like CryptoNets
COEFF = ntt_primes(N, 30, 5)
RNG = np.random.default_rng(77)


# --------------------------------------------------------------- encoder


def test_encoder_big_t_roundtrip():
    t = BIG_TS[0]
    assert t >= (1 << 31)
    enc = BatchEncoder(N, t)
    slots = np.array(
        [int(x) for x in RNG.integers(0, t, size=N, dtype=np.int64)],
        dtype=object,
    ) % t
    coeffs = enc.encode(slots)
    back = enc.decode(coeffs)
    np.testing.assert_array_equal(back, slots)


def test_encoder_big_t_native_matches_python():
    """The C++ 128-bit host NTT must agree with the exact object-int
    fallback on identical inputs."""
    t = BIG_TS[1]
    enc = BatchEncoder(N, t)
    from cryptonets_tpu.runtime import hostcrypto

    if hostcrypto.get_lib() is None:
        pytest.skip("native host runtime unavailable")
    coeffs = np.array(
        [int(x) for x in RNG.integers(0, t, size=N, dtype=np.int64)],
        dtype=object,
    )
    native = hostcrypto.ntt_forward(
        np.array([int(x) for x in coeffs], np.uint64), enc.pf64, t
    )
    pure = _ntt_host(coeffs.astype(object), enc.pf, t)
    np.testing.assert_array_equal(native.astype(object), pure)
    inative = hostcrypto.ntt_inverse(
        np.array([int(x) for x in coeffs], np.uint64), enc.pi64, enc.n_inv, t
    )
    ipure = _intt_host(coeffs.astype(object), enc.pi, enc.n_inv, t)
    np.testing.assert_array_equal(inative.astype(object), ipure)


def test_plain_to_residues_big_t():
    t = BIG_TS[0]
    params = BFVParams(N, t, coeff_modulus=COEFF, dbc=16)
    coeffs = np.array(
        [int(x) for x in RNG.integers(0, t, size=N, dtype=np.int64)],
        dtype=object,
    )
    res = params.plain_to_residues(coeffs)
    assert res.shape == (len(COEFF), N)
    for li, q in enumerate(COEFF):
        np.testing.assert_array_equal(
            res[li].astype(object), coeffs % q
        )


# ------------------------------------------------- bfv two-plane decrypt


@pytest.fixture(scope="module")
def big_ctx():
    params = BFVParams(N, BIG_TS[0], coeff_modulus=COEFF, dbc=16)
    bfv = BFV(params)
    keys = bfv.keygen(seed=42)
    return bfv, keys


def _enc(bfv, keys, coeffs, seed):
    res = jnp.asarray(bfv.p.plain_to_residues(coeffs))
    return bfv.encrypt(keys, res, jax.random.key(seed))


def _dec_planes(bfv, keys, ct):
    lo, m2 = bfv.decrypt_big_t_planes(keys, ct)
    return bfv.join_big_t_planes(np.asarray(lo), np.asarray(m2)).astype(
        object
    )


def test_big_t_plane_decrypt_matches_host(big_ctx):
    """decrypt_big_t_planes + join == exact host big-int decrypt, on a
    fresh ciphertext with full-range coefficients."""
    bfv, keys = big_ctx
    t = bfv.p.t
    m = np.array(
        [int(x) for x in RNG.integers(0, t, size=N, dtype=np.int64)],
        dtype=object,
    )
    ct = _enc(bfv, keys, m, seed=1)
    host = bfv.decrypt(keys, ct)
    np.testing.assert_array_equal(_dec_planes(bfv, keys, ct), host)
    np.testing.assert_array_equal(host, m)


def test_big_t_plane_decrypt_after_ops(big_ctx):
    """Two-plane decrypt stays exact on noisier ciphertexts: after a
    ct x ct square + relinearize and after a rotation."""
    bfv, keys = big_ctx
    t = bfv.p.t
    m = np.array(
        [int(x) for x in RNG.integers(0, 1 << 19, size=N, dtype=np.int64)],
        dtype=object,
    )
    ct = _enc(bfv, keys, m, seed=2)
    sq = bfv.relinearize(bfv.square(ct), keys)
    np.testing.assert_array_equal(
        _dec_planes(bfv, keys, sq), bfv.decrypt(keys, sq)
    )
    rot = bfv.rotate_rows(ct, 3, keys)
    np.testing.assert_array_equal(
        _dec_planes(bfv, keys, rot), bfv.decrypt(keys, rot)
    )


def test_big_t_plane_decrypt_batched(big_ctx):
    """Leading batch axes flow through the plane decrypt (the factory
    decrypts [P, C] blocks in one program)."""
    bfv, keys = big_ctx
    t = bfv.p.t
    m = np.array(
        [
            [int(x) for x in row]
            for row in RNG.integers(0, t, size=(3, N), dtype=np.int64)
        ],
        dtype=object,
    )
    ct = _enc(bfv, keys, m, seed=3)
    got = _dec_planes(bfv, keys, ct)
    assert got.shape == (3, N)
    np.testing.assert_array_equal(got, m)


# ------------------------------------------------------ factory-level CRT


@pytest.fixture(scope="module")
def big_fac():
    return CrtBfvFactory(
        plain_primes=BIG_TS, n=N, coeff_modulus=COEFF, dbc=16, seed=5
    )


def test_big_fac_uses_device_decode_big(big_fac):
    assert big_fac._device_decode_big
    assert not big_fac._device_decode
    assert not big_fac._device_encode


def test_big_fac_vector_roundtrip(big_fac):
    """Values up to the ~78-bit CRT product survive encrypt -> two-plane
    decrypt -> CRT join, signed."""
    M = big_fac.plain_crt.product
    vals = [0, 1, -1, 123456789, -(1 << 62), (M - 1) // 2, -((M - 1) // 2)]
    v = big_fac.get_encrypted_vector(np.zeros(len(vals)), "dense", 1.0)
    # bypass the float path for exact huge ints
    data = big_fac.encrypt_blocks(np.array(vals, dtype=object), len(vals))
    got = big_fac.decrypt_blocks(data, len(vals))
    np.testing.assert_array_equal(got, np.array(vals, dtype=object))
    del v


def test_big_fac_ops_match_plain(big_fac):
    a = RNG.integers(-(1 << 18), 1 << 18, size=12).astype(float)
    b = RNG.integers(-(1 << 18), 1 << 18, size=12).astype(float)
    va = big_fac.get_encrypted_vector(a, "dense", 1.0)
    vb = big_fac.get_encrypted_vector(b, "dense", 1.0)
    np.testing.assert_array_equal(
        va.add(vb).decrypt_full_precision()[:12].astype(np.int64),
        (a + b).astype(np.int64),
    )
    prod = va.pointwise_multiply(vb)
    np.testing.assert_array_equal(
        prod.decrypt_full_precision()[:12].astype(np.int64),
        (a.astype(np.int64) * b.astype(np.int64)),
    )
    dot = va.dot_product(vb)
    assert int(dot.decrypt_full_precision()[0]) == int(
        np.dot(a.astype(np.int64), b.astype(np.int64))
    )


def test_big_fac_matrix_decrypt_columns(big_fac):
    """decrypt_columns' _device_decode_big branch: batched two-plane
    decrypt of all matrix columns in one launch."""
    m = RNG.integers(-50, 50, size=(6, 3)).astype(float)
    enc = big_fac.get_encrypted_matrix(m, "col", scale=4.0)
    dec = enc.decrypt()
    np.testing.assert_allclose(dec, m, atol=1e-9)


def test_big_fac_mul_plain_scalar(big_fac):
    """The conv hot path (scalar-residue plain multiply) at big t."""
    a = RNG.integers(-100, 100, size=8).astype(float)
    w = [3.0, -7.0]
    va = big_fac.get_encrypted_vector(a, "dense", 2.0)
    m = big_fac.get_matrix([va, va], "col")
    sv = big_fac.get_plain_vector(w, "sparse", 8.0)
    out = m.mul(sv)
    want = a * 3.0 + a * (-7.0)
    np.testing.assert_allclose(out.decrypt(), want, atol=1e-9)


# ------------------------------------------- mini encrypted network @ big t


def test_big_t_mini_cryptonets_network():
    """A reduced CryptoNets-shaped network (conv -> square -> dense ->
    square -> dense) on the big-t encrypted stack matches the raw oracle
    exactly in fixed point — the same layer code path the full 8192-batch
    preset uses (`models/cryptonets_mnist.py`), at test scale."""
    from cryptonets_tpu.api import RawFactory
    from cryptonets_tpu.nn import (
        BatchReader,
        EncryptLayer,
        PoolLayer,
        SquareActivation,
    )

    rng = np.random.default_rng(123)
    batch, side = 3, 6
    recs = [
        (0, rng.integers(0, 4, side * side).astype(float))
        for _ in range(batch)
    ]
    conv_w = rng.integers(-2, 3, 2 * 3 * 3).astype(float)

    # two squares at 39-bit t consume ~130 bits of noise headroom
    # (t*n per multiply); the chain must satisfy log2(q) >~ t_bits + 130
    deep_chain = ntt_primes(N, 30, 7)

    def build(encrypt):
        fac = (
            CrtBfvFactory(
                plain_primes=BIG_TS, n=N, coeff_modulus=deep_chain,
                dbc=16, seed=7,
            )
            if encrypt
            else RawFactory(N)
        )
        reader = BatchReader(
            RawFactory(N), max_slots=batch, scale=2.0
        ).set_source_records([(l, f.copy()) for l, f in recs])
        enc = EncryptLayer(reader)
        enc.factory = fac
        conv = PoolLayer(
            enc,
            input_shape=[side, side],
            kernel_shape=[3, 3],
            stride=[2, 2],
            map_count=[2, 1],
            weights=conv_w,
            bias=np.array([1.0, -1.0]),
            weights_scale=4.0,
        )
        act = SquareActivation(conv)
        n_feat = 2 * len(conv.engine.corners)
        dense_rng = np.random.default_rng(321)
        dense = PoolLayer(
            act,
            input_shape=[n_feat],
            kernel_shape=[n_feat],
            stride=[n_feat + 1],
            map_count=[4],
            weights=dense_rng.integers(-3, 4, 4 * n_feat).astype(float),
            bias=dense_rng.integers(-5, 6, 4).astype(float),
            weights_scale=4.0,
        )
        head = SquareActivation(dense)
        head.prepare_network()
        return head

    raw_out = build(False).get_next().decrypt()
    enc_out = build(True).get_next().decrypt()
    np.testing.assert_allclose(enc_out, raw_out, rtol=1e-12)
