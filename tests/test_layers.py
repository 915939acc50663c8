"""L2 layer tests (port of `NeuralNetworksTest/LayersTest.cs` semantics):
reader equivalence, mean-pool values, LLPreConv structural checks, dense
layer identity, and raw-vs-encrypted network agreement."""

import numpy as np
import pytest

from cryptonets_tpu.api import CrtBfvFactory, RawFactory
from cryptonets_tpu.crypto.primes import ntt_primes
from cryptonets_tpu.nn import (
    BatchReader,
    EncryptLayer,
    LLConvReader,
    LLDenseLayer,
    LLDuplicateLayer,
    LLPoolLayer,
    LLPreConvLayer,
    LLSingleLineReader,
    LLVectorizeLayer,
    PoolLayer,
    SquareActivation,
)

N = 256
RNG = np.random.default_rng(33)
RAW = RawFactory(N)


@pytest.fixture(scope="module")
def fac():
    return CrtBfvFactory(
        plain_primes=ntt_primes(N, 17, 2), n=N,
        coeff_modulus=ntt_primes(N, 30, 5), dbc=16, seed=9,
    )


def records(num, dim, lo=-2, hi=3):
    return [
        (int(RNG.integers(0, 10)), RNG.integers(lo, hi, dim).astype(float))
        for _ in range(num)
    ]


def test_reader_equivalence():
    """BatchReader row i == LLSingleLineReader record i (ref :21-51)."""
    recs = records(4, 9)
    br = BatchReader(RAW, max_slots=4, scale=2.0).set_source_records(recs)
    sr = LLSingleLineReader(RAW, scale=2.0).set_source_records(recs)
    bm = br.get_next()
    for i, (label, feats) in enumerate(recs):
        sm = sr.get_next()
        np.testing.assert_allclose(sm.decrypt()[:, 0], feats)
        np.testing.assert_allclose(bm.decrypt()[i], feats)
        assert sr.labels == [label]
    assert br.labels == [l for l, _ in recs]


def test_mean_pool_raw():
    """Mean pool = windowed average via scale re-registration (ref :53-82)."""
    img = np.arange(16, dtype=float).reshape(1, 16)
    reader = BatchReader(RAW, max_slots=1, scale=1.0).set_source_records(
        [(0, img.ravel())]
    )
    pool = PoolLayer(
        reader, input_shape=[4, 4], kernel_shape=[2, 2], stride=[2, 2]
    )
    pool.prepare_network()
    out = pool.get_next()
    got = out.decrypt()[0]
    want = img.reshape(4, 4)
    want = np.array(
        [
            want[i : i + 2, j : j + 2].mean()
            for i in (0, 2)
            for j in (0, 2)
        ]
    )
    np.testing.assert_allclose(sorted(got), sorted(want))


def test_conv_pool_raw_matches_direct():
    """PoolLayer with weights == direct convolution on the raw backend."""
    batch, hw = 3, 6
    imgs = [RNG.integers(-2, 3, hw * hw).astype(float) for _ in range(batch)]
    w = RNG.integers(-2, 3, 9).astype(float)
    b = np.array([1.0])
    reader = BatchReader(RAW, max_slots=batch, scale=1.0).set_source_records(
        [(0, im) for im in imgs]
    )
    conv = PoolLayer(
        reader,
        input_shape=[hw, hw],
        kernel_shape=[3, 3],
        stride=[2, 2],
        weights=w,
        bias=b,
        map_count=[1],
    )
    conv.prepare_network()
    out = conv.get_next().decrypt()  # [batch, corners]
    kernel = w.reshape(3, 3)
    for bi, im in enumerate(imgs):
        im2 = im.reshape(hw, hw)
        want = [
            (im2[i : i + 3, j : j + 3] * kernel).sum() + 1.0
            for i in range(0, hw - 2, 2)
            for j in range(0, hw - 2, 2)
        ]
        np.testing.assert_allclose(out[bi], want)


def test_lldense_identity_stack():
    """Sparse input -> ColumnMajor identity weights reproduces input
    (ref :154-185)."""
    recs = records(1, 6)
    sr = LLSingleLineReader(RAW, scale=1.0).set_source_records(recs)
    dense = LLDenseLayer(
        sr,
        weights=np.eye(6).ravel(),
        bias=np.zeros(6),
        input_format="dense",
    )
    dense.prepare_network()
    out = dense.get_next()
    np.testing.assert_allclose(out.decrypt()[:, 0][:6], recs[0][1])


def test_llpreconv_structural():
    """LLPreConv output validated structurally on the raw backend:
    uniqueness, stride alignment, per-offset displacement (ref :84-152)."""
    hw, k, s = 8, 3, 2
    img = np.arange(hw * hw, dtype=float) + 1
    sr = LLSingleLineReader(RAW, scale=1.0).set_source_records([(0, img)])
    pre = LLPreConvLayer(
        sr, input_shape=[hw, hw], kernel_shape=[k, k], stride=[s, s]
    )
    pre.prepare_network()
    out = pre.get_next()
    mat = out.decrypt()  # [output_dim, n_offsets]
    e = pre.engine
    hot = pre.hot_indices.astype(bool)
    for oi, off in enumerate(e.offsets):
        col = mat[:, oi]
        vals = col[hot]
        # each hot slot must carry the image value at corner+offset
        for j, corner in enumerate(e.corners):
            l = e.location(corner, off, e.input_shape)
            want = img[l] if l >= 0 else 0.0
            got = col[pre.corners_map[j]]
            assert got == want, (oi, j, got, want)


def test_encrypted_small_network_matches_raw(fac):
    """conv -> square -> vectorize -> dense on both backends, exact match
    (the reference's multi-backend strategy, SURVEY.md section 4)."""
    hw = 4
    rec = [(7, RNG.integers(-2, 3, hw * hw).astype(float))]
    w_conv = RNG.integers(-2, 3, 4).astype(float)
    b_conv = np.array([1.0])
    w_fc = RNG.integers(-2, 3, (3, 4)).astype(float)
    b_fc = RNG.integers(-2, 3, 3).astype(float)

    outs = {}
    for name, factory in (("raw", RAW), ("enc", fac)):
        reader = LLConvReader(
            RAW,
            input_shape=[hw, hw],
            kernel_shape=[2, 2],
            stride=[2, 2],
            scale=1.0,
        ).set_source_records(list(rec))
        chain = reader
        if name == "enc":
            chain = EncryptLayer(chain)
            chain.factory = factory
        conv = LLPoolLayer(
            chain,
            input_shape=[hw, hw],
            kernel_shape=[2, 2],
            stride=[2, 2],
            map_count=[1],
            weights=w_conv,
            bias=b_conv,
        )
        sq = SquareActivation(conv)
        vec = LLVectorizeLayer(sq, output_dim=4)
        fc = LLDenseLayer(
            vec, weights=w_fc.ravel(), bias=b_fc, input_format="dense"
        )
        fc.prepare_network()
        out = fc.get_next()
        vecout = out.get_column(0) if hasattr(out, "get_column") else out
        outs[name] = vecout.decrypt()[:3]
    np.testing.assert_allclose(outs["enc"], outs["raw"])
    # independent oracle
    im = rec[0][1].reshape(hw, hw)
    kernel = w_conv.reshape(2, 2)
    conv_vals = np.array(
        [
            (im[i : i + 2, j : j + 2] * kernel).sum() + 1.0
            for i in (0, 2)
            for j in (0, 2)
        ]
    )
    want = w_fc @ (conv_vals**2) + b_fc
    np.testing.assert_allclose(outs["raw"], want)


def test_duplicate_layer(fac):
    rec = [(0, np.array([1.0, 2.0, 3.0]))]
    reader = LLSingleLineReader(RAW, scale=1.0).set_source_records(rec)
    enc = EncryptLayer(reader)
    enc.factory = fac
    dup = LLDuplicateLayer(enc, count=3)
    dup.prepare_network()
    out = dup.get_next()
    assert dup.output_dimension() == 4 * 3
    got = out.get_column(0).decrypt()
    for i in range(3):
        np.testing.assert_allclose(got[i * 4 : i * 4 + 3], [1, 2, 3])


def test_packed_dense_interleave_encrypted(fac):
    """LoLa packing pipeline (duplicate -> packed dense -> interleave ->
    interleaved dense) encrypted vs raw, with the batched rotation tree."""
    from cryptonets_tpu.nn import (
        LLInterleavedDenseLayer,
        LLInterleaveLayer,
        LLPackedDenseLayer,
    )

    d = 4
    count, shift = 4, 4  # shift must equal the duplicate stride
    rec = [(0, RNG.integers(-3, 4, d).astype(float))]
    w = RNG.integers(-2, 3, (8, d)).astype(float)  # 8 outputs
    b = RNG.integers(-2, 3, 8).astype(float)
    w2 = RNG.integers(-2, 3, (3, 8)).astype(float)
    b2 = RNG.integers(-2, 3, 3).astype(float)
    selected = [shift - 1 + i * shift for i in range(count)]

    outs = {}
    for name, factory in (("raw", RAW), ("enc", fac)):
        reader = LLSingleLineReader(RAW, scale=1.0).set_source_records(
            [(l, f.copy()) for l, f in rec]
        )
        chain = reader
        if name == "enc":
            chain = EncryptLayer(chain)
            chain.factory = factory
        dup = LLDuplicateLayer(chain, count=count)
        # pad weights to the duplicate stride (4 -> stride 4): rows of
        # length d placed at stride `shift`
        packed = LLPackedDenseLayer(
            dup,
            weights=np.pad(w, ((0, 0), (0, 0))).ravel(),
            bias=b,
            packing_count=count,
            packing_shift=shift,
        )
        inter = LLInterleaveLayer(
            packed, shift=-1, selected_indices=selected,
            input_gross_dimension=count * shift,
        )
        head = LLInterleavedDenseLayer(
            inter, weights=w2.ravel(), bias=b2, shift=-1,
            selected_indices=selected,
        )
        head.prepare_network()
        out = head.get_next()
        outs[name] = out.get_column(0).decrypt()[:3]
    np.testing.assert_allclose(outs["enc"], outs["raw"])
    # independent oracle
    x = rec[0][1]
    h = w @ x + b
    want = w2 @ h + b2
    np.testing.assert_allclose(outs["raw"], want)


def test_pool_layer_encrypted_conv_and_dense(fac):
    """Batched-encrypted PoolLayer (conv + dense-as-pool) vs raw backend."""
    batch, hw = 3, 6
    recs = [(0, RNG.integers(-2, 3, hw * hw).astype(float)) for _ in range(batch)]
    w = RNG.integers(-2, 3, 9).astype(float)
    b = np.array([1.0])
    wd = RNG.integers(-2, 3, 2 * 4).astype(float)  # dense: 4 conv outs -> 2
    bd = RNG.integers(-2, 3, 2).astype(float)

    outs = {}
    for name, factory in (("raw", RAW), ("enc", fac)):
        reader = BatchReader(RAW, max_slots=batch, scale=1.0).set_source_records(
            [(l, f.copy()) for l, f in recs]
        )
        chain = reader
        if name == "enc":
            chain = EncryptLayer(chain)
            chain.factory = factory
        conv = PoolLayer(
            chain,
            input_shape=[hw, hw],
            kernel_shape=[3, 3],
            stride=[2, 2],
            weights=w,
            bias=b,
            map_count=[1],
        )
        dense = PoolLayer(
            conv,
            input_shape=[4],
            kernel_shape=[4],
            stride=[100],
            map_count=[2],
            weights=wd,
            bias=bd,
        )
        dense.prepare_network()
        outs[name] = dense.get_next().decrypt()
    np.testing.assert_allclose(outs["enc"], outs["raw"])
    # oracle for record 0
    im = recs[0][1].reshape(hw, hw)
    kern = w.reshape(3, 3)
    conv_vals = np.array(
        [
            (im[i : i + 3, j : j + 3] * kern).sum() + 1.0
            for i in range(0, hw - 2, 2)
            for j in range(0, hw - 2, 2)
        ]
    )
    want = wd.reshape(2, 4) @ conv_vals + bd
    np.testing.assert_allclose(outs["raw"][0], want)


def test_fused_single_launch_pipeline(fac):
    """EncryptedForward(fuse_io=True) — encode+encrypt+network+decrypt+
    decode as ONE program — matches the 3-launch path exactly."""
    from cryptonets_tpu.nn.jit import EncryptedForward

    hw = 4
    rec = [(1, RNG.integers(-2, 3, hw * hw).astype(float)) for _ in range(2)]
    w_conv = RNG.integers(-2, 3, 4).astype(float)
    w_fc = RNG.integers(-2, 3, (3, 4)).astype(float)
    b_fc = RNG.integers(-2, 3, 3).astype(float)

    def build():
        reader = LLConvReader(
            RAW, input_shape=[hw, hw], kernel_shape=[2, 2],
            stride=[2, 2], scale=1.0,
        ).set_source_records([(l, f.copy()) for l, f in rec])
        chain = EncryptLayer(reader)
        chain.factory = fac
        conv = LLPoolLayer(
            chain, input_shape=[hw, hw], kernel_shape=[2, 2],
            stride=[2, 2], map_count=[1], weights=w_conv,
            bias=np.array([1.0]),
        )
        sq = SquareActivation(conv)
        vec = LLVectorizeLayer(sq, output_dim=4)
        fc = LLDenseLayer(
            vec, weights=w_fc.ravel(), bias=b_fc, input_format="dense"
        )
        fc.prepare_network()
        return fc

    fwd_plain = EncryptedForward(build(), jit=True, fuse_io=False)
    fwd_fused = EncryptedForward(build(), jit=True, fuse_io=True)
    assert fwd_fused.fuse_io, "fused path should activate for uint32 primes"
    for _ in range(2):
        a = fwd_plain().get_column(0).decrypt()[:3]
        b = fwd_fused().get_column(0).decrypt()[:3]
        np.testing.assert_allclose(a, b)
