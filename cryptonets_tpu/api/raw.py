"""Raw plaintext backend: the exact-semantics float64 oracle
(ref RawVector/RawMatrix, `HE Wrapper/RawVector.cs`, `RawMatrix.cs`).

Networks flip between this and the encrypted backend with one line (ref
`LoLaCryptonets.cs:208`); tests assert the two agree.  `RawVector.max_abs`
mirrors the reference's global `RawVector.Max` used to size the plaintext
message space (`LoLaCryptonets.cs:59-61`).
"""

from __future__ import annotations

import numpy as np

DENSE = "dense"
SPARSE = "sparse"


class _MaxTracker:
    value = 0.0

    @classmethod
    def update(cls, arr):
        if arr is not None and len(arr):
            cls.value = max(cls.value, float(np.max(np.abs(arr))))

    @classmethod
    def reset(cls):
        cls.value = 0.0


class RawVector:
    max_tracker = _MaxTracker

    def __init__(self, v, scale: float, block_size: int, *, _round=True):
        v = np.asarray(v, dtype=np.float64)
        if not np.all(np.isfinite(v)):
            raise ValueError("infinity")
        self.v = np.round(v * scale) if _round else v
        self.scale = float(scale)
        self.block_size = int(block_size)
        self.fmt = DENSE
        self.is_signed = True

    @classmethod
    def from_scaled(cls, scaled, scale, block_size):
        out = cls(scaled, 1.0, block_size, _round=False)
        out.scale = float(scale)
        return out

    # ---------------------------------------------------------- properties
    @property
    def dim(self) -> int:
        return len(self.v)

    @property
    def is_encrypted(self) -> bool:
        return False

    def register_scale(self, scale: float):
        self.scale = float(scale)
        return self

    # ---------------------------------------------------------------- ops
    def decrypt(self) -> np.ndarray:
        _MaxTracker.update(self.v)
        return self.v / self.scale

    def decrypt_full_precision(self) -> np.ndarray:
        _MaxTracker.update(self.v)
        vals = self.v if self.is_signed else np.abs(self.v)
        return np.array([int(round(x)) for x in vals], dtype=object)

    def add(self, other: "RawVector") -> "RawVector":
        if self.scale == 0:
            return other
        if other.scale == 0:
            return self
        if self.scale != other.scale:
            raise ValueError("Scales do not match.")
        return RawVector.from_scaled(self.v + other.v, self.scale, self.block_size)

    def subtract(self, other: "RawVector") -> "RawVector":
        if other.scale == 0:
            return self
        if self.scale != 0 and self.scale != other.scale:
            raise ValueError("Scales do not match.")
        return RawVector.from_scaled(self.v - other.v, self.scale, self.block_size)

    def multiply_scalar(self, x: float) -> "RawVector":
        return RawVector.from_scaled(self.v * x, self.scale, self.block_size)

    def pointwise_multiply(self, other: "RawVector") -> "RawVector":
        if self.dim == other.dim:
            mul = self.v * other.v
        elif self.dim == 1 and self.fmt == SPARSE:
            mul = other.v * self.v[0]
        elif other.dim == 1 and other.fmt == SPARSE:
            mul = self.v * other.v[0]
        else:
            raise ValueError("Vectors dimensions do not match")
        return RawVector.from_scaled(
            mul, self.scale * other.scale, self.block_size
        )

    def dot_product(self, other: "RawVector", length: int | None = None):
        if length is None:
            dot = float(self.v @ other.v)
            return RawVector.from_scaled(
                [dot], self.scale * other.scale, self.block_size
            )
        # bucketed: pointwise then cyclic right-rotate-accumulate within
        # Dim; sums land at bucket ENDS (ref RawVector.DotProduct(w,length))
        res = self.v * other.v
        skip = 1
        while skip < length:
            res = res + np.roll(res, skip)
            skip *= 2
        return RawVector.from_scaled(
            res, self.scale * other.scale, self.block_size
        )

    def sum_all_slots(self, length: int | None = None) -> "RawVector":
        s = float(np.sum(self.v))
        return RawVector.from_scaled([s], self.scale, self.block_size)

    def duplicate(self, count: int) -> "RawVector":
        stride = 1
        while stride < self.dim:
            stride *= 2
        w = np.zeros(stride * count)
        for i in range(count):
            w[i * stride : i * stride + self.dim] = self.v
        return RawVector.from_scaled(w, self.scale, self.block_size)

    def _rotate_arr(self, vec: np.ndarray, amount: int) -> np.ndarray:
        """w[i] = vec[(i+amount) mod block_size] if in range else 0
        (ref RawVector.Rotate, `RawVector.cs:228-239`)."""
        w = np.zeros(self.dim)
        for i in range(self.dim):
            k = (i + amount) % self.block_size
            if 0 <= k < len(vec):
                w[i] = vec[k]
        return w

    def rotate(self, amount: int) -> "RawVector":
        return RawVector.from_scaled(
            self._rotate_arr(self.v, amount), self.scale, self.block_size
        )

    def permute(self, selections, shifts, output_dim: int) -> "RawVector":
        if len(selections) != len(shifts):
            raise ValueError("selections/shifts length mismatch")
        res = np.zeros(self.dim)
        first = None
        for sel, sh in zip(selections, shifts):
            if sel is None:
                continue
            if first is None:
                first = sel
            if sel.dim != self.dim:
                raise ValueError("selection dimension mismatch")
            if sel.scale != first.scale:
                raise ValueError("selection scales must match")
            t = self.v * sel.v
            res = res + self._rotate_arr(t, sh)
        return RawVector.from_scaled(
            res[:output_dim], self.scale * first.scale, self.block_size
        )


class RawMatrix:
    """numpy [rows, cols] matrix of scaled values (ref RawMatrix.cs)."""

    def __init__(self, m, scale: float, fmt: str, block_size: int, *, _round=True):
        m = np.asarray(m, dtype=np.float64)
        self.m = np.round(m * scale) if _round else m
        self.scale = float(scale)
        self.fmt = fmt  # "col" | "row"
        self.block_size = int(block_size)
        _MaxTracker.update(self.m)

    @classmethod
    def from_scaled(cls, m, scale, fmt, block_size):
        out = cls(m, 1.0, fmt, block_size, _round=False)
        out.scale = float(scale)
        return out

    @property
    def row_count(self) -> int:
        return self.m.shape[0]

    @property
    def column_count(self) -> int:
        return self.m.shape[1]

    @property
    def is_encrypted(self) -> bool:
        return False

    def register_scale(self, scale: float):
        self.scale = float(scale)
        return self

    def decrypt(self) -> np.ndarray:
        _MaxTracker.update(self.m)
        return self.m / self.scale

    def mul(self, v: RawVector, force_dense: bool = False) -> RawVector:
        res = self.m @ v.v
        return RawVector.from_scaled(
            res, self.scale * v.scale, v.block_size
        )

    def elementwise_multiply(self, other: "RawMatrix") -> "RawMatrix":
        assert self.fmt == other.fmt and self.m.shape == other.m.shape
        return RawMatrix.from_scaled(
            self.m * other.m, self.scale * other.scale, self.fmt, self.block_size
        )

    def add(self, other: "RawMatrix") -> "RawMatrix":
        assert self.fmt == other.fmt and self.m.shape == other.m.shape
        if self.scale != other.scale:
            raise ValueError("Scale mismatch")
        return RawMatrix.from_scaled(
            self.m + other.m, self.scale, self.fmt, self.block_size
        )

    def get_column(self, i: int) -> RawVector:
        assert self.fmt == "col"
        return RawVector.from_scaled(self.m[:, i], self.scale, self.block_size)

    def get_row(self, i: int) -> RawVector:
        assert self.fmt == "row"
        return RawVector.from_scaled(self.m[i], self.scale, self.block_size)

    def set_column(self, i: int, v: RawVector):
        assert self.fmt == "col"
        self.m[:, i] = v.v
        _MaxTracker.update(self.m)

    def convert_to_column_vector(self) -> RawVector:
        if self.m.size > self.block_size:
            raise ValueError("block too long for interleaving")
        # column-major enumeration like MathNet's Enumerate()
        return RawVector.from_scaled(
            self.m.flatten(order="F"), self.scale, self.block_size
        )

    def interleave(self, shift: int) -> RawVector:
        """w = sum_i shift(col_i, shift*i): zero-fill shift toward higher
        indices for shift>0 (ref RawMatrix.Interleave/Shift)."""
        if shift == 0:
            raise ValueError("number of items cannot be zero")

        def sh(vec, s):
            w = np.zeros_like(vec)
            if s >= 0:
                if s < len(vec):
                    w[s:] = vec[: len(vec) - s]
            else:
                if -s < len(vec):
                    w[: len(vec) + s] = vec[-s:]
            return w

        w = self.m[:, 0].copy()
        for i in range(1, self.column_count):
            w = w + sh(self.m[:, i], shift * i)
        return RawVector.from_scaled(w, self.scale, self.block_size)
