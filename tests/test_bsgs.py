"""BSGS diagonal matvec (api/bsgs.py): exact agreement with the integer
matvec, single- and two-row spans, jit/hoist compatibility, and the
LLDenseLayer gating."""

import numpy as np
import pytest

from cryptonets_tpu.api.bsgs import BsgsDenseForm, bsgs_matvec
from cryptonets_tpu.api.factory import CrtBfvFactory
from cryptonets_tpu.api.vector import HEVector
from cryptonets_tpu.utils.hoist import hoist_jit

N = 4096
PRIMES = (40961, 65537)


@pytest.fixture(scope="module")
def fac():
    return CrtBfvFactory(plain_primes=PRIMES, n=N, seed=3)


def _run(fac, R, D, seed, jit=False):
    rng = np.random.default_rng(seed)
    W = rng.integers(-8, 9, size=(R, D)).astype(np.int64)
    v = rng.integers(-5, 6, size=D).astype(np.int64)
    form = BsgsDenseForm(fac, W, R, D)
    enc = fac.get_encrypted_vector(v.astype(float), "dense", scale=1.0)
    fn = (lambda d: bsgs_matvec(form, d))
    if jit:
        fn = hoist_jit(fn)
    out = HEVector(
        fac, data=fn(enc.data), dim=R, scale=1.0, fmt="dense"
    )
    got = np.array([int(x) for x in out.decrypt_full_precision()])
    np.testing.assert_array_equal(got, W @ v)
    return form


def test_bsgs_single_row_span(fac):
    # R, D both within one slot row -> F == 1, zero chunks skipped
    form = _run(fac, R=37, D=300, seed=0)
    assert form.F == 1
    assert len(form.active) < form.G


def test_bsgs_two_row_span(fac):
    # input spans both slot rows -> column-swap branch
    form = _run(fac, R=50, D=N // 2 + 700, seed=1)
    assert form.F == 2


def test_bsgs_output_spans_rows(fac):
    form = _run(fac, R=N // 2 + 100, D=512, seed=2)
    assert form.F == 2


def test_bsgs_under_hoist_jit(fac):
    _run(fac, R=64, D=200, seed=3, jit=True)


def test_bsgs_dense_support_scan_path(fac):
    # displacement support covers every giant chunk -> the lax.scan
    # Horner path (the CIFAR/LoLaLarge regime)
    form = _run(fac, R=600, D=1800, seed=4, jit=True)
    assert len(form.active) == form.G


def test_lldense_uses_bsgs(fac):
    from cryptonets_tpu.nn.lola import LLDenseLayer
    from cryptonets_tpu.nn.network import Layer

    rng = np.random.default_rng(7)
    R, D = 130, 400
    W = rng.integers(-4, 5, size=(R, D)).astype(float)
    b = rng.integers(-3, 4, size=R).astype(float)
    v = rng.integers(-5, 6, size=D).astype(float)

    class Feed(Layer):
        def __init__(self, factory, m):
            super().__init__(None)
            self.factory = factory
            self._m = m

        def apply(self, m):
            return m

        def get_next(self):
            return self._m

        def output_dimension(self):
            return D

        def get_output_scale(self):
            return 1.0

        def prepare(self):
            pass

    enc = fac.get_encrypted_vector(v, "dense", scale=1.0)
    feed = Feed(fac, fac.get_matrix([enc], "col"))
    layer = LLDenseLayer(
        feed, weights=W.ravel(), bias=b, weights_scale=1.0,
        input_format="dense", force_dense_format=True,
    )
    layer.prepare()
    assert layer.bsgs_form is not None, "BSGS gate should trigger"
    out = layer.apply(feed.get_next()).get_column(0)
    got = np.array([int(x) for x in out.decrypt_full_precision()[:R]])
    np.testing.assert_array_equal(got, (W @ v + b).astype(np.int64))


@pytest.fixture(scope="module")
def fac_hoist():
    # digit-mode factory with per-step Galois keys for hoisted babies
    return CrtBfvFactory(
        plain_primes=PRIMES, n=N, seed=4, rot_steps=tuple(range(1, 16))
    )


@pytest.fixture(scope="module")
def fac_hoist_alpha():
    # P-less RNS-group key switching (ks_alpha): the hybrid hoist flavor
    return CrtBfvFactory(
        plain_primes=PRIMES, n=N, seed=5, ks_alpha=1,
        rot_steps=tuple(range(1, 16)),
    )


def _run_g(fac, R, D, g, seed, expect_hoist):
    from cryptonets_tpu.api.bsgs import hoist_eligible

    assert hoist_eligible(fac, g) == expect_hoist
    rng = np.random.default_rng(seed)
    W = rng.integers(-8, 9, size=(R, D)).astype(np.int64)
    v = rng.integers(-5, 6, size=D).astype(np.int64)
    form = BsgsDenseForm(fac, W, R, D, g=g)
    assert form.g == g
    enc = fac.get_encrypted_vector(v.astype(float), "dense", scale=1.0)
    out = HEVector(
        fac, data=bsgs_matvec(form, enc.data), dim=R, scale=1.0,
        fmt="dense",
    )
    got = np.array([int(x) for x in out.decrypt_full_precision()])
    np.testing.assert_array_equal(got, W @ v)


def test_bsgs_hoisted_babies_digit(fac_hoist):
    """Hoisted baby steps (shared digit decomposition + NTT-domain
    permutation gathers) produce the exact matvec."""
    _run_g(fac_hoist, R=37, D=300, g=16, seed=7, expect_hoist=True)


def test_bsgs_hoisted_babies_pless(fac_hoist_alpha):
    """Hybrid (P-less RNS-group) hoisting: decomposition mod-up done
    once, babies as NTT-domain gathers + group-key inner products."""
    _run_g(fac_hoist_alpha, R=37, D=300, g=16, seed=8, expect_hoist=True)


def test_bsgs_hoisted_matches_chained(fac_hoist):
    """Same form applied with and without per-step keys decrypts to the
    same values (hoisted vs chained babies differ only in noise)."""
    rng = np.random.default_rng(9)
    R, D, g = 20, 120, 16
    W = rng.integers(-8, 9, size=(R, D)).astype(np.int64)
    v = rng.integers(-5, 6, size=D).astype(np.int64)
    enc = fac_hoist.get_encrypted_vector(v.astype(float), "dense", scale=1.0)
    form = BsgsDenseForm(fac_hoist, W, R, D, g=g)
    out_h = HEVector(
        fac_hoist, data=bsgs_matvec(form, enc.data), dim=R, scale=1.0,
        fmt="dense",
    )
    # strip the baby keys to force the chained path on the same factory
    import cryptonets_tpu.api.bsgs as bsgs_mod

    bfv0 = fac_hoist.bfv[0]
    keys = fac_hoist.keys
    pow2_only = {
        g_elt: sk
        for g_elt, sk in keys.galois.items()
        if g_elt in (
            {bfv0.galois_elt_rows(1 << j) for j in range(12)}
            | {bfv0.galois_elt_rows((N // 2) - (1 << j)) for j in range(12)}
            | {2 * N - 1, bfv0.galois_elt_rows(1)}
        )
    }
    keys_nohoist = keys._replace(galois=pow2_only)
    fac_hoist.keys = keys_nohoist
    try:
        out_c = HEVector(
            fac_hoist, data=bsgs_matvec(form, enc.data), dim=R, scale=1.0,
            fmt="dense",
        )
    finally:
        fac_hoist.keys = keys
    a = np.array([int(x) for x in out_h.decrypt_full_precision()])
    b = np.array([int(x) for x in out_c.decrypt_full_precision()])
    np.testing.assert_array_equal(a, b)
