"""Input layers / readers (ref BatchReader, LLSingleLineReader,
LLConvReader, WeightsReader in `NeuralNetworks/`).

Record format (TSV): sparse = "label dim idx:val idx:val ..."; dense =
one value per column with the label at `label_column`."""

from __future__ import annotations

import numpy as np

from ..api.raw import RawMatrix
from .convolution import ConvolutionEngine
from .network import InputLayer


def _parse_line(line: str, sparse: bool, label_column: int, norm: float):
    f = line.rstrip("\n").split("\t")
    if sparse:
        label = int(f[0])
        dim = int(f[1])
        features = np.zeros(dim)
        for tok in f[2:]:
            i, v = tok.split(":")
            features[int(i)] = float(v) * norm
        return label, features
    dim = len(f)
    if label_column >= dim:
        label = np.iinfo(np.int32).max
        vals = [float(x) for x in f]
    else:
        label = int(f[label_column])
        vals = [float(x) for i, x in enumerate(f) if i != label_column]
    return label, np.asarray(vals) * norm


class BatchReader(InputLayer):
    """Reads up to max_slots records; batch becomes the matrix ROWS (SIMD
    slots after encryption) with features as columns (ref BatchReader.cs)."""

    def __init__(
        self,
        factory,
        file_name: str | None = None,
        max_slots: int = 0,
        normalization_factor: float = 1.0,
        scale: float = 1.0,
        sparse_format: bool = True,
        label_column: int = 0,
    ):
        super().__init__(None, factory)
        self.max_slots = max_slots
        self.normalization_factor = normalization_factor
        self.scale = scale
        self.sparse_format = sparse_format
        self.label_column = label_column
        self.labels = []
        self._fh = open(file_name) if file_name else None

    def set_source_records(self, records):
        """Inject records directly (list of (label, features)) instead of
        reading a file — used when datasets are generated in-process."""
        self._records = list(records)
        self._fh = None
        return self

    def _read_lines(self):
        rows = []
        if self._fh is not None:
            while len(rows) < self.max_slots:
                line = self._fh.readline()
                if not line:
                    break
                rows.append(
                    _parse_line(
                        line, self.sparse_format, self.label_column,
                        self.normalization_factor,
                    )
                )
        else:
            take = self._records[: self.max_slots]
            self._records = self._records[self.max_slots :]
            rows = [(l, np.asarray(f) * self.normalization_factor) for l, f in take]
        return rows

    def get_next(self):
        rows = self._read_lines()
        if not rows:
            return None
        self.labels = [r[0] for r in rows]
        mat = np.stack([r[1] for r in rows])  # [batch, features]
        return RawMatrix(mat, self.scale, "col", 0)

    def output_dimension(self):
        return -1

    def get_output_scale(self):
        return self.scale


class LLSingleLineReader(InputLayer):
    """One record per get_next as a single-column matrix
    (ref LLSingleLineReader.cs)."""

    def __init__(
        self,
        factory,
        file_name: str | None = None,
        normalization_factor: float = 1.0,
        scale: float = 1.0,
        sparse_format: bool = True,
        label_column: int = 0,
    ):
        super().__init__(None, factory)
        self.normalization_factor = normalization_factor
        self.scale = scale
        self.sparse_format = sparse_format
        self.label_column = label_column
        self.labels = []
        self.dim = -1
        self._fh = open(file_name) if file_name else None
        self._records = None

    def set_source_records(self, records):
        self._records = list(records)
        self._fh = None
        return self

    def _next_record(self):
        if self._fh is not None:
            line = self._fh.readline()
            if not line:
                return None
            return _parse_line(
                line, self.sparse_format, self.label_column,
                self.normalization_factor,
            )
        if not self._records:
            return None
        l, f = self._records.pop(0)
        return l, np.asarray(f) * self.normalization_factor

    def get_next(self):
        rec = self._next_record()
        if rec is None:
            return None
        label, features = rec
        self.labels = [label]
        self.dim = len(features)
        return self.factory.get_plain_matrix(
            features.reshape(-1, 1), "col", self.scale
        )

    def output_dimension(self):
        return self.dim

    def get_output_scale(self):
        return self.scale


class LLConvReader(InputLayer):
    """One record per get_next, pre-arranged CLIENT-side into the
    Corners x Offsets patch matrix (ref LLConvReader.cs:144-155 — the
    deliberate LoLa design point of doing im2col before encryption)."""

    def __init__(
        self,
        factory,
        input_shape,
        kernel_shape,
        stride=None,
        padding=None,
        upper_padding=None,
        lower_padding=None,
        file_name: str | None = None,
        normalization_factor: float = 1.0,
        scale: float = 1.0,
        sparse_format: bool = True,
        label_column: int = 0,
    ):
        super().__init__(None, factory)
        self.engine = ConvolutionEngine(
            input_shape, kernel_shape, stride, padding,
            upper_padding, lower_padding,
        )
        self.normalization_factor = normalization_factor
        self.scale = scale
        self.sparse_format = sparse_format
        self.label_column = label_column
        self.labels = []
        self.features = None  # may be injected directly
        self._fh = open(file_name) if file_name else None
        self._records = None

    def set_source_records(self, records):
        self._records = list(records)
        self._fh = None
        return self

    def get_next(self):
        if self.features is None:
            if self._fh is not None:
                line = self._fh.readline()
                if not line:
                    return None
                label, feats = _parse_line(
                    line, self.sparse_format, self.label_column,
                    self.normalization_factor,
                )
            else:
                if not self._records:
                    return None
                label, feats = self._records.pop(0)
                feats = np.asarray(feats) * self.normalization_factor
            self.labels = [label]
            self.features = feats
        e = self.engine
        mat = np.zeros((len(e.corners), len(e.offsets)))
        for c, corner in enumerate(e.corners):
            for o, off in enumerate(e.offsets):
                l = e.location(corner, off, e.input_shape)
                if l >= 0:
                    mat[c, o] = self.features[l]
        self.features = None
        return RawMatrix(mat, self.scale, "col", 0)

    def output_dimension(self):
        return len(self.engine.corners) * len(self.engine.offsets)

    def get_output_scale(self):
        return self.scale


class WeightsReader:
    """CSV weights/biases -> lists of float rows (ref WeightsReader.cs)."""

    def __init__(self, weights_csv_path: str, biases_csv_path: str):
        self.weights = self._read(weights_csv_path)
        self.biases = self._read(biases_csv_path)

    @staticmethod
    def _read(path: str) -> list[np.ndarray]:
        out = []
        with open(path) as fh:
            for line in fh:
                line = line.strip()
                if line:
                    out.append(
                        np.array([float(x) for x in line.split(",")])
                    )
        return out
