"""Caltech data-prep pipeline: AlexNet featurizer -> sparse TSV ->
reader (ref `GetCAL.cs:86-123`).  Uses seeded-random featurizer weights
(no egress for the pretrained blob — data/alexnet.py documents the
offline path); validates shapes, determinism, the reference TSV line
format, and the read-back through LLSingleLineReader."""

from __future__ import annotations

import numpy as np

from cryptonets_tpu.data.alexnet import (
    AlexNetFeaturizer,
    featurize_directory,
    write_sparse_tsv,
)
from cryptonets_tpu.nn import LLSingleLineReader
from cryptonets_tpu.api.factory import RawFactory


def test_featurizer_shape_and_determinism():
    rng = np.random.default_rng(0)
    imgs = rng.integers(0, 256, (2, 227, 227, 3)).astype(np.uint8)
    f1 = AlexNetFeaturizer(seed=3)(imgs)
    f2 = AlexNetFeaturizer(seed=3)(imgs)
    assert f1.shape == (2, 4096)
    np.testing.assert_array_equal(f1, f2)
    assert (f1 >= 0).all()  # fc7 is post-ReLU
    assert (f1 != 0).any()


def test_directory_to_tsv_roundtrip(tmp_path):
    from PIL import Image

    rng = np.random.default_rng(1)
    for cls in ("ant", "bee"):
        d = tmp_path / "cats" / cls
        d.mkdir(parents=True)
        arr = rng.integers(0, 256, (60, 80, 3)).astype(np.uint8)
        Image.fromarray(arr).save(d / "img_0001.jpg")
    out = tmp_path / "cal_deep_test.tsv"
    n = featurize_directory(str(tmp_path / "cats"), str(out), seed=4)
    assert n == 2
    lines = out.read_text().splitlines()
    assert len(lines) == 2
    # reference line format: label \t 4096 \t j:v ...
    first = lines[0].split("\t")
    assert first[0] == "0" and first[1] == "4096"
    assert all(":" in t for t in first[2:])

    # scale 1e6: decrypt descales round(v * scale), so fractional
    # features survive to ~1e-6 (the reference's Caltech reader uses
    # Scale=1e10 for the same reason, `CaltechTests.cs:47-52`)
    reader = LLSingleLineReader(
        RawFactory(4096), file_name=str(out),
        normalization_factor=1.0, scale=1e6,
    )
    m = reader.get_next()
    v = np.asarray(m.get_column(0).decrypt(), float)
    assert len(v) == 4096
    assert reader.labels[0] == 0
    j, val = first[2].split(":")
    np.testing.assert_allclose(v[int(j)], float(val), atol=2e-6)


def test_write_sparse_tsv_format(tmp_path):
    p = tmp_path / "t.tsv"
    feats = np.zeros(8)
    feats[3] = 1.5
    feats[7] = -2.0
    with open(p, "w") as fh:
        write_sparse_tsv(fh, 5, feats)
    assert p.read_text() == "5\t8\t3:1.5\t7:-2\n"
