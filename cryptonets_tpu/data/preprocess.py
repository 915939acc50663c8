"""Dataset preparation (ref `DataPreprocess/`): MNIST idx -> sparse TSV,
CIFAR-10 binary -> dense TSV, plus seeded synthetic generators for
data-free environments (this container has no network egress; the
reference's DataPreprocess.exe downloads from the internet).

CLI parity:  python -m cryptonets_tpu.data.preprocess MNIST|CIFAR [dir]
"""

from __future__ import annotations

import gzip
import os
import struct
import sys

import numpy as np


# ------------------------------------------------------------------ MNIST
def read_idx(path: str) -> np.ndarray:
    """Parse an (optionally gzipped) idx file (ref GetMNIST.cs:55-80)."""
    op = gzip.open if path.endswith(".gz") else open
    with op(path, "rb") as fh:
        magic = struct.unpack(">I", fh.read(4))[0]
        ndim = magic & 0xFF
        dims = [struct.unpack(">I", fh.read(4))[0] for _ in range(ndim)]
        data = np.frombuffer(fh.read(), dtype=np.uint8)
        return data.reshape(dims)


def mnist_to_sparse_tsv(images_path: str, labels_path: str, out_path: str):
    """MNIST -> `label dim idx:val ...` sparse TSV (reference format)."""
    images = read_idx(images_path)
    labels = read_idx(labels_path)
    n, h, w = images.shape
    dim = h * w
    with open(out_path, "w") as out:
        for i in range(n):
            flat = images[i].ravel()
            nz = np.nonzero(flat)[0]
            toks = [str(int(labels[i])), str(dim)]
            toks += [f"{j}:{int(flat[j])}" for j in nz]
            out.write("\t".join(toks) + "\n")


def load_mnist_records(images_path: str, labels_path: str, count=None):
    images = read_idx(images_path)
    labels = read_idx(labels_path)
    if count:
        images, labels = images[:count], labels[:count]
    return [
        (int(l), im.ravel().astype(np.float64)) for l, im in zip(labels, images)
    ]


# ------------------------------------------------------------------ CIFAR
def cifar_to_dense_tsv(batch_paths, out_path: str):
    """CIFAR-10 binary batches -> dense TSV in channel-x-y transposed
    order (ref GetCIFAR.cs:16-51)."""
    with open(out_path, "w") as out:
        for path in batch_paths:
            raw = np.fromfile(path, dtype=np.uint8).reshape(-1, 3073)
            labels = raw[:, 0]
            imgs = raw[:, 1:].reshape(-1, 3, 32, 32)
            # reference writes channel-major with x/y transposed
            imgs = imgs.transpose(0, 1, 3, 2).reshape(-1, 3072)
            for l, im in zip(labels, imgs):
                out.write(
                    "\t".join([str(int(l))] + [str(int(v)) for v in im]) + "\n"
                )


# -------------------------------------------------------------- synthetic
def synthetic_mnist_records(count: int, seed: int = 0):
    """Seeded MNIST-like records (28x28 uint8 with sparse blobs) so the
    full pipelines run without downloaded data."""
    rng = np.random.default_rng(seed)
    out = []
    for _ in range(count):
        img = np.zeros((28, 28))
        for _ in range(rng.integers(3, 8)):
            cx, cy = rng.integers(4, 24, 2)
            yy, xx = np.mgrid[0:28, 0:28]
            img += 255.0 * np.exp(
                -((xx - cx) ** 2 + (yy - cy) ** 2) / rng.uniform(4, 16)
            )
        img = np.clip(img, 0, 255).round()
        out.append((int(rng.integers(0, 10)), img.ravel()))
    return out


def synthetic_cifar_records(count: int, seed: int = 0):
    rng = np.random.default_rng(seed)
    return [
        (
            int(rng.integers(0, 10)),
            rng.integers(0, 256, 3 * 32 * 32).astype(np.float64),
        )
        for _ in range(count)
    ]


def synthetic_feature_records(count: int, dim: int, seed: int = 0):
    """AlexNet-featurizer stand-in for Caltech-101 (the reference uses
    ML.NET DnnFeaturizeImage, ref GetCAL.cs:86-123)."""
    rng = np.random.default_rng(seed)
    return [
        (int(rng.integers(0, 102)), np.abs(rng.normal(0, 1.0, dim)))
        for _ in range(count)
    ]


def main():
    kind = sys.argv[1] if len(sys.argv) > 1 else ""
    src = sys.argv[2] if len(sys.argv) > 2 else "."
    if kind.upper() == "MNIST":
        mnist_to_sparse_tsv(
            os.path.join(src, "t10k-images-idx3-ubyte.gz"),
            os.path.join(src, "t10k-labels-idx1-ubyte.gz"),
            "MNIST-28x28-test.txt",
        )
    elif kind.upper() == "CIFAR":
        cifar_to_dense_tsv(
            [os.path.join(src, "test_batch.bin")], "cifar-test.txt"
        )
    elif kind.upper() == "CAL":
        # <src> = the 101_ObjectCategories directory; optional argv[3] =
        # torchvision alexnet state_dict for real (pretrained) features
        # (ref GetCAL.cs:86-123; see data/alexnet.py for the offline
        # weights path)
        from .alexnet import featurize_directory

        weights = sys.argv[3] if len(sys.argv) > 3 else None
        n = featurize_directory(src, "cal_deep_test.tsv", weights)
        print(f"cal_deep_test.tsv: {n} records"
              + ("" if weights else " (seeded-random featurizer weights;"
                 " pass a torchvision alexnet .pth for real features)"))
    else:
        print(__doc__)


if __name__ == "__main__":
    main()
