"""Utility-surface tests: exact MXU modular matmul (kernels/modmatmul),
BudgetAnalysis harness, Show/Dump debug helpers, CRT string codec."""

import numpy as np
import pytest

from cryptonets_tpu.api import CrtBfvFactory
from cryptonets_tpu.crypto.primes import ntt_primes

N = 256


@pytest.fixture(scope="module")
def fac():
    return CrtBfvFactory(
        plain_primes=ntt_primes(N, 17, 2), n=N,
        coeff_modulus=ntt_primes(N, 30, 4), dbc=16, seed=6,
    )


def test_exact_mod_contract_random():
    """Digit-plane MXU contraction == exact object-int math, including
    negative and 31-bit-magnitude weights at the longest supported
    contraction lengths."""
    import jax.numpy as jnp

    from cryptonets_tpu.kernels.modmatmul import exact_mod_contract

    rng = np.random.default_rng(3)
    qs = ntt_primes(64, 30, 3)
    q_col = jnp.asarray(np.array(qs, np.uint32).reshape(-1, 1))
    M, O, n = 5, 97, 64
    W = rng.integers(-(1 << 40), 1 << 40, size=(M, O))
    x = rng.integers(0, 1 << 31, size=(2, O, 1, 2, len(qs), n)).astype(
        np.uint64
    )
    xr = np.stack(
        [(x[..., li, :] % q).astype(np.uint32) for li, q in enumerate(qs)],
        axis=-2,
    )
    got = np.asarray(exact_mod_contract(W, jnp.asarray(xr), qs, q_col))
    for li, q in enumerate(qs):
        want = (
            W.astype(object) @ xr[..., li, :].astype(object).reshape(
                2, O, -1
            )[0]
        ) % q
        # check P=0 plane
        np.testing.assert_array_equal(
            got[0, :, :, :, li, :].reshape(M, -1).astype(object), want
        )


def test_budget_harness(fac):
    from cryptonets_tpu.utils.budget import op_budgets

    b = op_budgets(fac, dim=16)
    assert set(b) == {
        "fresh", "enc_dot", "plain_dot", "sum_slots",
        "plain_mult", "enc_mult", "rotate",
    }
    assert b["fresh"] > b["enc_mult"] > 0
    assert b["fresh"] >= b["rotate"] > 0


def test_show_dump(fac, tmp_path, capsys):
    from cryptonets_tpu.utils.debug import dump, show

    m = np.array([[1.25, -2.5], [3.0, 4.0]])
    enc = fac.get_encrypted_matrix(m, "col", scale=8.0)
    show(enc)
    out = capsys.readouterr().out
    assert "1.2500" in out and "-2.5000" in out
    f = tmp_path / "dump.tsv"
    dump(str(f), enc)
    lines = f.read_text().strip().splitlines()
    assert len(lines) == 2 and "\t" in lines[0]


def test_crt_string_codec(fac):
    """value -> residue string -> value roundtrip (ref
    GetValueFromString/GetStringFromValue, `IFactory.cs:395-408`)."""
    M = fac.plain_crt.product
    for v in (0, 1, 12345, M - 1, M // 2):
        s = fac.get_string_from_value(v)
        assert fac.get_value_from_string(s) == v
