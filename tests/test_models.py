"""L3 model tests: raw-backend end-to-end flows for every model family
(fast), plus structural checks on geometry and presets.  Full encrypted
runs are exercised by bench.py / manual drives (minutes-scale)."""

import numpy as np
import pytest

from cryptonets_tpu.data.preprocess import (
    synthetic_cifar_records,
    synthetic_feature_records,
    synthetic_mnist_records,
)
from cryptonets_tpu.models import caltech101, cryptonets_mnist, lola_cifar
from cryptonets_tpu.models import lola_mnist
from cryptonets_tpu.models.presets import CONFIGS, coeff_count_for


def test_preset_coeff_mapping():
    # SMC=3 at 8192 -> 130 SEAL bits -> 5 x 31-bit limbs
    assert coeff_count_for(8192, 3) == 5
    assert coeff_count_for(16384, 7) == 11
    # full chains stay within the security budget
    for name, cfg in CONFIGS.items():
        assert cfg["n"] in (4096, 8192, 16384)


def _run_raw(builder, records, n_out=10):
    head, factory, reader = builder(False, records=records)
    head.prepare_network()
    m = head.get_next()
    col = m.get_column(0) if hasattr(m, "get_column") else m
    return col.decrypt()


def test_lola_raw_all_variants():
    """All four LoLa variants run end-to-end on the raw backend and the
    three MNIST variants agree with each other on the shared model."""
    recs = synthetic_mnist_records(1, seed=9)
    outs = {}
    for name in ("LoLa", "LoLaSmall", "LoLaDense"):
        r = [(l, f.copy()) for l, f in recs]
        outs[name] = np.asarray(
            _run_raw(lola_mnist.BUILDERS[name], r)[:10], dtype=float
        )
    # LoLa and LoLaDense share weights: predictions must match closely
    assert np.argmax(outs["LoLa"]) == np.argmax(outs["LoLaDense"])
    np.testing.assert_allclose(outs["LoLa"], outs["LoLaDense"], rtol=1e-6)


def test_lola_large_raw_structure():
    recs = synthetic_mnist_records(1, seed=10)
    out = _run_raw(lola_mnist.build_lola_large, recs)
    assert len(out) >= 10


def test_cryptonets_raw_batch():
    recs = synthetic_mnist_records(4, seed=12)
    head, factory, reader = cryptonets_mnist.build(
        False, batch_size=4, records=recs
    )
    head.prepare_network()
    m = head.get_next()
    dec = m.decrypt()
    assert dec.shape[0] == 4 and dec.shape[1] == 10
    # independent oracle on record 0 through the embedded reference model
    from cryptonets_tpu.data import weights_extract

    W = weights_extract.load("cryptonets")
    if W is None:
        pytest.skip("reference weights not extracted")
    from cryptonets_tpu.nn import ConvolutionEngine

    def q(v, s):  # fixed-point quantization: round(v*s)/s
        return np.round(np.asarray(v, float) * s) / s

    ws = 32
    x = q(recs[0][1] / 256.0, 16)
    eng = ConvolutionEngine(
        [28, 28], [5, 5], stride=[2, 2], upper_padding=[1, 1]
    )
    w0 = W["Weights_0"]
    ksz = 26  # bias embedded as the extra last element per map
    conv = np.zeros(5 * len(eng.corners))
    for mi in range(5):
        bq = q(w0[(mi + 1) * ksz - 1], 16 * ws)
        for ci, corner in enumerate(eng.corners):
            acc = bq
            for off in eng.offsets:
                l = eng.location(corner, off, [28, 28])
                kidx = eng.location(None, off, [5, 5])
                if l >= 0:
                    acc += x[l] * q(w0[kidx + mi * ksz], ws)
            conv[mi * len(eng.corners) + ci] = acc
    h1 = conv**2
    s1 = (16.0 * ws) ** 2  # scale entering dense layer 1
    w1 = q(W["Weights_1"].reshape(845, 100), ws * ws)
    h2 = (h1 @ w1 + q(W["Biases_2"], s1 * ws * ws)) ** 2
    s2 = (s1 * ws * ws) ** 2
    w3 = q(W["Weights_3"].reshape(10, 100), ws)
    logits = h2 @ w3.T + q(W["Biases_3"], s2 * ws)
    np.testing.assert_allclose(dec[0], logits, rtol=1e-9)


def test_cifar_raw():
    recs = synthetic_cifar_records(1, seed=13)
    out = _run_raw(lola_cifar.build, recs)
    assert len(out) >= 10


def test_caltech_raw_and_ini(tmp_path):
    # INI parser (ref IniReader.cs regex format)
    ini_file = tmp_path / "model.ini"
    lines = ["header"]
    lines.append("Class_0+(Bias)\t0.5")
    lines.append("Class_1+f3\t-2.25")
    lines.append("Class_0+f0\t1.5")
    ini_file.write_text("\n".join(lines))
    ini = caltech101.IniReader(str(ini_file), 4096, 102)
    assert ini.bias[0] == 0.5
    assert ini.weights[1 * 4096 + 3] == -2.25
    assert ini.weights[0] == 1.5
    recs = synthetic_feature_records(1, 4096, seed=14)
    out = _run_raw(caltech101.build, recs)
    assert len(out) == 102
