"""Caltech-101 end-to-end validation against the reference's independent
oracle (`NeuralNetworksTest/TestNetwork.cs` — a generated hardcoded
scorer for the first 10 classes, the only reference-shipped Caltech
model data; cal.model.ini itself is a missing large blob upstream).

Ports `CaltechTests.cs`:
  * IniReaderTest (:18-39): the INI round-trip — oracle weights emitted
    in the reference's `Class_<c>+f<i>` line format, re-parsed by our
    IniReader, checked feature-by-feature against the oracle scorer.
  * CalPrediction (:60-103): reader -> DebugLayer oracle tap ->
    EncryptLayer -> LLDenseLayer at the reference's exact scales
    (feature 1e10, weights 1e6) on the Raw factory (the reference test
    runs on `Defaults.RawFactory` too), predictions vs oracle to 1e-3.
  * plus what the reference never did: the same oracle model through the
    REAL encrypted pipeline (CRT factory), gated on exact raw agreement
    and on the oracle within the fixed-point quantization bound.
"""

from __future__ import annotations

import numpy as np
import pytest

from cryptonets_tpu.data import testnetwork
from cryptonets_tpu.data.preprocess import synthetic_feature_records
from cryptonets_tpu.models.caltech101 import IniReader, N_CLASSES, N_FEATURES
from cryptonets_tpu.nn import DebugLayer, EncryptLayer, LLDenseLayer, LLSingleLineReader
from cryptonets_tpu.api.factory import CrtBfvFactory, RawFactory


@pytest.fixture(scope="module")
def oracle():
    data = testnetwork.load()
    assert data is not None, "run python -m cryptonets_tpu.data.testnetwork"
    return data


@pytest.fixture(scope="module")
def ini(oracle, tmp_path_factory):
    W, bias = oracle
    path = tmp_path_factory.mktemp("cal") / "cal.model.ini"
    testnetwork.write_model_ini(str(path), W, bias)
    return IniReader(str(path), N_FEATURES, N_CLASSES)


def test_ini_reader_vs_oracle(oracle, ini):
    """Port of IniReaderTest: bias = Score(0); one-hot probes give
    bias + weight, feature by feature."""
    W, bias = oracle
    zero_scores = testnetwork.score(W, bias, np.zeros(N_FEATURES))
    np.testing.assert_allclose(ini.bias[:10], zero_scores, atol=1e-5)
    v = np.zeros(N_FEATURES)
    rng = np.random.default_rng(0)
    for f in rng.choice(N_FEATURES, 200, replace=False):
        v[f] = 1
        pred = testnetwork.score(W, bias, v)
        v[f] = 0
        for b in range(10):
            assert abs(
                pred[b] - (ini.bias[b] + ini.weights[b * N_FEATURES + f])
            ) < 1e-5
    # classes beyond the oracle's 10 stay zero (absent from the INI)
    assert not ini.weights[10 * N_FEATURES:].any()


def _build_network(factory, ini, records, scale, weightscale, tap):
    reader = LLSingleLineReader(
        RawFactory(N_FEATURES), normalization_factor=1.0, scale=scale
    )
    reader.set_source_records(records)
    debug = DebugLayer(reader, callback=tap)
    enc = EncryptLayer(debug)
    enc.factory = factory
    head = LLDenseLayer(
        enc, weights=ini.weights, bias=ini.bias,
        weights_scale=weightscale, input_format="dense",
    )
    head.prepare_network()
    return head


def test_cal_prediction_raw_oracle(oracle, ini):
    """Port of CalPrediction: the reference's exact scales on the Raw
    factory; predictions match the independent oracle to 1e-3."""
    W, bias = oracle
    records = synthetic_feature_records(1, N_FEATURES, seed=21)
    captured = {}

    def tap(m):
        captured["scores"] = testnetwork.score(
            W, bias, np.asarray(m.get_column(0).decrypt(), float)
        )

    head = _build_network(
        RawFactory(N_FEATURES), ini, records, 1e10, 1e6, tap
    )
    pred = np.asarray(head.get_next().get_column(0).decrypt(), float)
    assert len(pred) == N_CLASSES
    np.testing.assert_allclose(pred[:10], captured["scores"], atol=1e-3)


@pytest.mark.slow
def test_cal_prediction_encrypted(oracle, ini):
    """The oracle model through the REAL encrypted pipeline.  The
    caltech app preset (one 23-bit prime) cannot carry float-oracle
    precision, so this uses the default 5-prime CRT factory (~80-bit
    message capacity) at scale 2^22: encrypted output must equal the
    Raw backend EXACTLY, and match the float oracle within the
    fixed-point quantization bound (< 1e-3 for these weights)."""
    W, bias = oracle
    records = synthetic_feature_records(1, N_FEATURES, seed=22)
    feats = records[0][1]
    S = float(1 << 22)
    captured = {}

    def tap(m):
        captured["scores"] = testnetwork.score(
            W, bias, np.asarray(m.get_column(0).decrypt(), float)
        )

    raw_head = _build_network(
        RawFactory(N_FEATURES), ini,
        [(l, f.copy()) for l, f in records], S, S, tap,
    )
    raw_pred = np.asarray(raw_head.get_next().get_column(0).decrypt(), float)

    fac = CrtBfvFactory(n=N_FEATURES, seed=3)
    enc_head = _build_network(
        fac, ini, [(l, f.copy()) for l, f in records], S, S, lambda m: None
    )
    enc_pred = np.asarray(
        enc_head.get_next().get_column(0).decrypt(), float
    )
    # 1) the encrypted pipeline reproduces the Raw fixed-point EXACTLY
    np.testing.assert_allclose(enc_pred, raw_pred, rtol=1e-12)
    # 2) and the float oracle within the rounding bound:
    #    |err| <= sum|f|/(2S) + max_b sum|w_b|/(2S) + D/(4S^2)
    bound = (
        np.abs(feats).sum() / (2 * S)
        + np.abs(W).sum(axis=1).max() / (2 * S)
        + N_FEATURES / (4 * S * S)
    )
    assert bound < 1e-3, bound
    np.testing.assert_allclose(
        enc_pred[:10], captured["scores"], atol=bound
    )
