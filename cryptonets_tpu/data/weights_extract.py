"""Extract the reference's embedded MNIST model parameters as npz DATA.

The reference ships its trained CryptoNets/LoLa MNIST models as C# double
literals (`CryptoNets/Weights.cs`, `LowLatencyCryptoNets/SmallModel.cs`,
MIT-licensed).  These are model parameters, not code: we parse the numeric
arrays once and cache them as .npz so the model builders reproduce the
reference's published accuracy.  Missing-blob models (MnistLargeWeight.csv,
CifarWeight.csv are absent upstream, `.MISSING_LARGE_BLOBS`) fall back to
seeded synthetic weights for structural validation.

Usage: python -m cryptonets_tpu.data.weights_extract [reference_root]
"""

from __future__ import annotations

import os
import re
import sys

import numpy as np

HERE = os.path.dirname(__file__)
WEIGHTS_DIR = os.path.join(HERE, "weights")

_ARRAYS = {
    "cryptonets": (
        "CryptoNets/Weights.cs",
        ["Weights_0", "Weights_1", "Weights_3", "Biases_2", "Biases_3"],
    ),
    "lola_small": (
        "LowLatencyCryptoNets/SmallModel.cs",
        ["Weights_0", "Weights_1", "Biases_1"],
    ),
}


def _parse_array(src: str, name: str) -> np.ndarray:
    m = re.search(
        rf"{name}\s*{{\s*get;\s*}}\s*=\s*new double\[\]\s*{{", src
    )
    if m is None:
        raise KeyError(name)
    i = m.end()
    depth = 1
    j = i
    while depth:
        if src[j] == "{":
            depth += 1
        elif src[j] == "}":
            depth -= 1
        j += 1
    body = src[i : j - 1]
    body = re.sub(r"//[^\n]*", "", body)  # strip line comments
    vals = [float(v) for v in re.split(r"[\s,]+", body) if v]
    return np.asarray(vals, dtype=np.float64)


def extract(reference_root: str, out_dir: str = WEIGHTS_DIR) -> dict:
    os.makedirs(out_dir, exist_ok=True)
    written = {}
    for model, (rel, names) in _ARRAYS.items():
        path = os.path.join(reference_root, rel)
        src = open(path, encoding="utf-8-sig").read()
        arrs = {n: _parse_array(src, n) for n in names}
        out = os.path.join(out_dir, f"{model}.npz")
        np.savez_compressed(out, **arrs)
        written[model] = {n: a.shape for n, a in arrs.items()}
    return written


def load(model: str) -> dict | None:
    """Load extracted weights for `model`; None if not extracted."""
    path = os.path.join(WEIGHTS_DIR, f"{model}.npz")
    if not os.path.exists(path):
        return None
    with np.load(path) as z:
        return {k: z[k] for k in z.files}


def synthetic_weights(shapes: dict, seed: int = 0) -> dict:
    """Seeded stand-in weights for models whose blobs are missing
    upstream; magnitudes mimic trained nets (~N(0, 0.05))."""
    rng = np.random.default_rng(seed)
    return {
        k: rng.normal(0, 0.05, size=v).astype(np.float64)
        for k, v in shapes.items()
    }


if __name__ == "__main__":
    root = sys.argv[1] if len(sys.argv) > 1 else "/root/reference"
    info = extract(root)
    for model, arrs in info.items():
        print(model, {k: s for k, s in arrs.items()})
