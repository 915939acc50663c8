"""AlexNet featurizer for the Caltech-101 data preparation.

The reference's `DataPreprocess CAL` pipeline (ref `GetCAL.cs:86-123`)
loads each image, resizes to 227x227, extracts raw pixels, and runs
ML.NET's `DnnFeaturizeImage` AlexNet to a 4096-d feature vector written
as sparse TSV (`label\\t4096\\tj:v...`).  ML.NET ships that AlexNet as a
pretrained ONNX binary; this rig has no network egress and no
torchvision, so this module provides a first-party torch AlexNet with
the standard torchvision topology through fc7 (4096-d, post-ReLU) and a
documented OFFLINE weights path:

  * pass `weights_path=` a torchvision-format `alexnet` state_dict
    (e.g. downloaded elsewhere from
    https://download.pytorch.org/models/alexnet-owt-7be5be79.pth and
    copied onto the machine) for real features;
  * with no weights file, parameters are seeded-random — the pipeline,
    formats and shapes are identical, but features are a structural
    stand-in (accuracy is meaningless), matching how the other missing
    upstream blobs are handled (`.MISSING_LARGE_BLOBS`).

Preprocessing here feeds raw 0-255 RGB floats, mirroring ML.NET's
default `ExtractPixels` (no normalization); exact numeric parity with
the ML.NET ONNX graph is not verifiable offline and is documented as a
limitation in docs/PARITY.md.
"""

from __future__ import annotations

import numpy as np


def _build_model(seed: int = 0):
    import torch
    from torch import nn

    torch.manual_seed(seed)

    class AlexNetFc7(nn.Module):
        def __init__(self):
            super().__init__()
            self.features = nn.Sequential(
                nn.Conv2d(3, 64, kernel_size=11, stride=4, padding=2),
                nn.ReLU(inplace=True),
                nn.MaxPool2d(kernel_size=3, stride=2),
                nn.Conv2d(64, 192, kernel_size=5, padding=2),
                nn.ReLU(inplace=True),
                nn.MaxPool2d(kernel_size=3, stride=2),
                nn.Conv2d(192, 384, kernel_size=3, padding=1),
                nn.ReLU(inplace=True),
                nn.Conv2d(384, 256, kernel_size=3, padding=1),
                nn.ReLU(inplace=True),
                nn.Conv2d(256, 256, kernel_size=3, padding=1),
                nn.ReLU(inplace=True),
                nn.MaxPool2d(kernel_size=3, stride=2),
            )
            self.avgpool = nn.AdaptiveAvgPool2d((6, 6))
            # torchvision classifier indices 0-5 (through the fc7 ReLU)
            self.classifier = nn.Sequential(
                nn.Dropout(),
                nn.Linear(256 * 6 * 6, 4096),
                nn.ReLU(inplace=True),
                nn.Dropout(),
                nn.Linear(4096, 4096),
                nn.ReLU(inplace=True),
            )

        def forward(self, x):
            x = self.features(x)
            x = self.avgpool(x)
            x = x.flatten(1)
            return self.classifier(x)

    return AlexNetFc7()


class AlexNetFeaturizer:
    """227x227 RGB images -> 4096-d fc7 features (ref DnnFeaturizeImage)."""

    def __init__(self, weights_path: str | None = None, seed: int = 0):
        import torch

        self.model = _build_model(seed)
        self.pretrained = False
        if weights_path:
            state = torch.load(weights_path, map_location="cpu",
                               weights_only=True)
            # torchvision's alexnet state_dict has classifier.{1,4,6};
            # we keep only through classifier.4 (fc7) + its ReLU
            state = {k: v for k, v in state.items()
                     if not k.startswith("classifier.6")}
            self.model.load_state_dict(state, strict=False)
            self.pretrained = True
        self.model.eval()

    def __call__(self, images: np.ndarray) -> np.ndarray:
        """images: uint8/float [B, 227, 227, 3] (HWC RGB) -> [B, 4096]."""
        import torch

        x = np.asarray(images, dtype=np.float32)
        if x.ndim == 3:
            x = x[None]
        assert x.shape[1:] == (227, 227, 3), x.shape
        x = np.transpose(x, (0, 3, 1, 2))  # raw 0-255, NCHW
        with torch.no_grad():
            out = self.model(torch.from_numpy(x))
        return out.numpy()


def load_image(path: str) -> np.ndarray:
    """Load + resize to 227x227 RGB (ref ResizeImages 227x227)."""
    from PIL import Image

    with Image.open(path) as im:
        return np.asarray(im.convert("RGB").resize((227, 227)))


def write_sparse_tsv(fh, label: int, feats: np.ndarray) -> None:
    """One record in the reference's sparse line format
    (`GetCAL.cs:113-118`): label\\t4096\\tj:v for nonzero j."""
    parts = [str(int(label)), str(len(feats))]
    for j in np.nonzero(feats)[0]:
        parts.append(f"{j}:{feats[j]:g}")
    fh.write("\t".join(parts) + "\n")


def featurize_directory(
    src_dir: str, out_path: str, weights_path: str | None = None,
    limit_per_class: int | None = None, seed: int = 0,
) -> int:
    """Walk <src_dir>/<class>/*.jpg (the 101_ObjectCategories layout),
    featurize, and write the sparse TSV the readers consume.  Returns
    the number of records written."""
    import os

    feat = AlexNetFeaturizer(weights_path, seed=seed)
    classes = sorted(
        d for d in os.listdir(src_dir)
        if os.path.isdir(os.path.join(src_dir, d))
    )
    n = 0
    with open(out_path, "w") as fh:
        for label, cls in enumerate(classes):
            files = sorted(os.listdir(os.path.join(src_dir, cls)))
            if limit_per_class:
                files = files[:limit_per_class]
            for f in files:
                img = load_image(os.path.join(src_dir, cls, f))
                write_sparse_tsv(fh, label, feat(img)[0])
                n += 1
    return n
