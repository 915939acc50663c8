"""Extract the Caltech-101 oracle model from the reference's generated
scorer.

`NeuralNetworksTest/TestNetwork.cs` is a ~915 KB GENERATED file holding
one hardcoded linear expression per class ("keeping only the first 10
scores otherwise visual studio has a problem with the size of the
file"): `score[b] = c0*f[0] + ... + c4095*f[4095] + bias;`.  The
reference uses it as the independent end-to-end oracle for the Caltech
linear model (`CaltechTests.cs:18-39,60-103`); the actual model blob
(cal.model.ini) is a missing large blob upstream.

This module parses those expressions into a [10, 4096] weight matrix +
[10] bias (the only reference-shipped Caltech model data that exists),
stores them as `data/weights/caltech_oracle.npz`, and can re-emit them
in the reference's INI format (`Class_<c>+f<i>\\t<w>` /
`Class_<c>+(Bias)\\t<w>`, `IniReader.cs:22`) so the real INI-parsing
path is exercised end to end (tests/test_caltech_oracle.py).

CLI: python -m cryptonets_tpu.data.testnetwork <TestNetwork.cs> [out.npz]
"""

from __future__ import annotations

import os
import re
import sys

import numpy as np

N_FEATURES = 4096
N_ORACLE_CLASSES = 10

_NPZ = os.path.join(os.path.dirname(__file__), "weights",
                    "caltech_oracle.npz")

_TERM = re.compile(
    r"(?P<coef>[-+]?[0-9]*\.?[0-9]+(?:[eE][-+]?[0-9]+)?)\s*\*\s*"
    r"f\[(?P<idx>[0-9]+)\]"
)
_LINE = re.compile(r"score\[(?P<cls>[0-9]+)\]\s*=\s*(?P<body>.*?);",
                   re.DOTALL)


def parse_testnetwork(path: str):
    """-> (W [10, 4096] float64, bias [10] float64)."""
    text = open(path).read()
    W = np.zeros((N_ORACLE_CLASSES, N_FEATURES))
    bias = np.zeros(N_ORACLE_CLASSES)
    n_lines = 0
    for m in _LINE.finditer(text):
        cls = int(m.group("cls"))
        body = m.group("body")
        n_lines += 1
        for t in _TERM.finditer(body):
            W[cls, int(t.group("idx"))] = float(t.group("coef"))
        # the trailing constant (no *f[..] factor) is the bias
        tail = body.rsplit("+", 1)[-1].strip()
        if "f[" not in tail:
            bias[cls] = float(tail)
    assert n_lines == N_ORACLE_CLASSES, n_lines
    return W, bias


def score(W: np.ndarray, bias: np.ndarray, f: np.ndarray) -> np.ndarray:
    """The oracle: mirrors TestNetwork.Score(Vector<double>)."""
    return W @ np.asarray(f, dtype=np.float64) + bias


def write_model_ini(path: str, W: np.ndarray, bias: np.ndarray) -> None:
    """Emit the reference's cal.model.ini line format (IniReader.cs:22).
    Zero coefficients are omitted (the INI is sparse; absent entries
    stay zero in the parser)."""
    with open(path, "w") as fh:
        fh.write("[Model]\n")
        for c in range(W.shape[0]):
            fh.write(f"Class_{c}+(Bias)\t{float(bias[c]):.17g}\n")
            nz = np.nonzero(W[c])[0]
            for i in nz:
                fh.write(f"Class_{c}+f{i}\t{float(W[c, i]):.17g}\n")


def load():
    """-> (W, bias) from the extracted npz, or None if absent."""
    if not os.path.exists(_NPZ):
        return None
    z = np.load(_NPZ)
    return z["W"], z["bias"]


def main():
    src = sys.argv[1]
    out = sys.argv[2] if len(sys.argv) > 2 else _NPZ
    W, bias = parse_testnetwork(src)
    os.makedirs(os.path.dirname(out), exist_ok=True)
    np.savez_compressed(out, W=W, bias=bias)
    nz = int((W != 0).sum())
    print(f"{out}: W{W.shape} ({nz} nonzero), bias {bias.shape}")


if __name__ == "__main__":
    main()
