"""HEMatrix: matrix of HE vectors with layout-dependent matvec algorithms
(ref IMatrix / EncryptedSealBfvMatrix, `EncryptedSealBfvMatrix.cs`).

A matrix is a list of uniform HEVectors — columns (ColumnMajor) or rows
(RowMajor).  The reference parallelizes per-column/row with thread tasks;
here the vector stack becomes one leading tensor axis and each algorithm
is a single batched traced program:

  * ColumnMajor x sparse vector  -> sum_j col_j * v_j  (dense output)
      (ref DenseMatrixBySparseVectorMultiply, used by conv windows)
  * RowMajor x dense vector      -> per-row DotProduct (sparse output)
  * RowMajor + force_dense       -> per-row dot forced into slot r, then
      tree-added into ONE dense vector (ref `EncryptedSealBfvMatrix.cs:
      90-120`)
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..crypto.bfv import Ciphertext, mod_sum
from ..crypto.modular import add_mod
from ..utils.opcount import OPS

# column-chunk size for the batched ct x ct multiply (tests patch it
# to exercise the lax.map path on tiny rings)
_MULT_CHUNK = 128
from .vector import DENSE, SPARSE, HEVector

COLUMN_MAJOR = "col"
ROW_MAJOR = "row"


def _scalar_residue_table(factory, values):
    """Integer scalars -> ([V, k, 1] residues, [V, k, 1] Shoup) uint32.

    An integer w acts identically on every plain prime's pipeline (the
    ciphertext ring is mod q; decrypt reduces mod t), so the table is
    shared across the P axis."""
    from ..crypto.modular import shoup_precompute_host

    qs = factory.coeff_modulus
    V = len(values)
    w = np.zeros((V, len(qs), 1), np.uint32)
    sh = np.zeros_like(w)
    for i, val in enumerate(values):
        iv = int(val)
        for li, q in enumerate(qs):
            r = iv % q
            w[i, li, 0] = r
            sh[i, li, 0] = shoup_precompute_host(r, q)
    return jnp.asarray(w), jnp.asarray(sh)


def _sum_slots_data(factory, d, length=None):
    """Batched SumAllSlots on raw data [..., C, 2|3, k, N] -> [..., 1, s, k, N].
    Same rotation structure as HEVector.sum_all_slots."""
    q = factory.bfv[0].p.chain_q.q
    n = factory.n
    row = n // 2
    if d.shape[-4] > 1:
        OPS.count("add_many", 1)
        d = mod_sum(d, q, axis=-4)[..., None, :, :, :]
    full = length is None or length >= row
    if full:
        sw = factory.bfv[0].rotate_columns(Ciphertext(d), factory.keys).data
        OPS.count("rotation", 1)
        d = add_mod(d, sw, q)
        length = row
    acc = d
    row_g = factory.bfv[0].galois_elt_rows
    g_list, steps = [], 1
    while steps < length:
        g_list.append(row_g(-steps % row))
        steps *= 2
    if (
        g_list
        and d.shape[-3] == 2
        and all(g in factory.keys.galois for g in g_list)
    ):
        # the whole log2 tree as ONE scanned program (single traced
        # level body; see BFV.rotate_accumulate_scan)
        OPS.count("rotation", len(g_list))
        return factory.bfv[0].rotate_accumulate_scan(
            acc, factory.stacked_galois(tuple(g_list))
        )
    steps = 1
    while steps < length:
        rot = factory.bfv[0].rotate_rows(Ciphertext(acc), -steps, factory.keys).data
        OPS.count("rotation", 1)
        acc = add_mod(acc, rot, q)
        steps *= 2
    return acc


class HEMatrix:
    def __init__(self, factory, vectors: list, fmt: str):
        assert fmt in (COLUMN_MAJOR, ROW_MAJOR)
        self.factory = factory
        self.vectors = list(vectors)
        self.fmt = fmt

    # ------------------------------------------------------------ properties
    @property
    def column_count(self) -> int:
        if self.fmt == COLUMN_MAJOR:
            return len(self.vectors)
        return self.vectors[0].dim

    @property
    def row_count(self) -> int:
        if self.fmt == ROW_MAJOR:
            return len(self.vectors)
        return self.vectors[0].dim

    @property
    def scale(self) -> float:
        return self.vectors[0].scale

    @property
    def is_encrypted(self) -> bool:
        return self.vectors[0].is_encrypted

    def register_scale(self, scale: float):
        for v in self.vectors:
            v.register_scale(scale)
        return self

    def get_column(self, i: int) -> HEVector:
        assert self.fmt == COLUMN_MAJOR
        return self.vectors[i]

    def get_row(self, i: int) -> HEVector:
        assert self.fmt == ROW_MAJOR
        return self.vectors[i]

    def set_column(self, i: int, v: HEVector):
        assert self.fmt == COLUMN_MAJOR
        self.vectors[i] = v

    # ------------------------------------------------------- stacked tensors
    def _stacked_data(self) -> jnp.ndarray:
        """[P, V, C, s, k, N] — vector index as its own axis."""
        return jnp.stack([v.data for v in self.vectors], axis=1)

    def _stacked_mult_forms(self) -> jnp.ndarray:
        """[P, V, C, k, N] for plain matrices."""
        return jnp.stack([v.mult_form() for v in self.vectors], axis=1)

    # ------------------------------------------------------------------ mul
    def mul(self, v: HEVector, force_dense: bool = False) -> HEVector:
        if self.fmt == COLUMN_MAJOR:
            return self._mul_column_major(v)
        return self._mul_row_major(v, force_dense)

    def _mul_column_major(self, v: HEVector) -> HEVector:
        """sum_j col_j * v_j with v sparse of dim == column_count."""
        ncols = len(self.vectors)
        assert v.fmt == SPARSE and v.dim == ncols, (v.fmt, v.dim, ncols)
        f = self.factory
        q = f.bfv[0].p.chain_q.q
        col0 = self.vectors[0]
        out_scale = col0.scale * v.scale
        if self.is_encrypted and v.is_encrypted:
            A = self._stacked_data()            # [P, V, C, 2, k, N]
            B = v.data[:, :, None]              # [P, V, 1, 2, k, N]
            OPS.count("multiplication", ncols)
            per = []
            for pi, bfv in enumerate(f.bfv):
                prod = bfv.multiply(Ciphertext(A[pi]), Ciphertext(B[pi]))
                per.append(prod.data)
            s3 = mod_sum(jnp.stack(per), q, axis=1)  # [P, C, 3, k, N]
            OPS.count("relinearization", 1)
            out = f.bfv[0].relinearize(Ciphertext(s3), f.keys).data
        elif self.is_encrypted:  # plain sparse weights (the conv hot path)
            # a sparse plain vector is per-element CONSTANT slots: its NTT
            # form is the scalar itself, so multiply with Shoup constants
            # instead of materialized plaintext polys (no encode, no
            # [V, k, N] weight tensors)
            from ..crypto.modular import mul_const_mod
            from ..crypto.bfv import mod_sum as _msum

            A = self._stacked_data()            # [P, V, C, 2, k, N]
            w_col, w_sh = _scalar_residue_table(f, v.values)  # [V,k,1] x2
            OPS.count("plain_multiplication", ncols)
            prod = mul_const_mod(
                A,
                w_col[None, :, None, None],  # -> [1, V, 1, 1, k, 1]
                w_sh[None, :, None, None],
                f.bfv[0].p.chain_q.q,
            )
            out = mod_sum(prod, q, axis=1)
        elif v.is_encrypted:  # plain matrix, encrypted sparse vector
            W = self._stacked_mult_forms()[:, :, :, None]  # [P, V, C, 1, k, N]
            B = v.data[:, :, None]                          # [P, V, 1, 2, k, N]
            OPS.count("plain_multiplication", ncols)
            prod = f.bfv[0].mul_plain(Ciphertext(B), W).data
            out = mod_sum(prod, q, axis=1)
        else:
            raise ValueError("plain x plain matvec belongs to the Raw backend")
        return HEVector(
            f, data=out, dim=col0.dim, scale=out_scale, fmt=DENSE,
            is_signed=col0.is_signed,
        )

    def _mul_row_major(self, v: HEVector, force_dense: bool) -> HEVector:
        """Per-row dot products, batched over the row axis."""
        nrows = len(self.vectors)
        row0 = self.vectors[0]
        assert v.fmt == DENSE and v.dim == row0.dim, (v.dim, row0.dim)
        f = self.factory
        q = f.bfv[0].p.chain_q.q
        out_scale = row0.scale * v.scale
        if self.is_encrypted and v.is_encrypted:
            A = self._stacked_data()           # [P, R, C, 2, k, N]
            B = v.data[:, None]                # [P, 1, C, 2, k, N]
            OPS.count("multiplication", nrows)
            OPS.count("relinearization", nrows)
            per = []
            for pi, bfv in enumerate(f.bfv):
                prod = bfv.multiply(Ciphertext(A[pi]), Ciphertext(B[pi]))
                per.append(bfv.relinearize(prod, f.keys).data)
            prod = jnp.stack(per)
        elif self.is_encrypted:
            A = self._stacked_data()
            W = v.mult_form()[:, None, :, None]  # [P, 1, C, 1, k, N]
            OPS.count("plain_multiplication", nrows)
            prod = f.bfv[0].mul_plain(Ciphertext(A), W).data
        elif v.is_encrypted:
            W = self._stacked_mult_forms()[:, :, :, None]  # [P, R, C, 1, k, N]
            B = v.data[:, None]
            OPS.count("plain_multiplication", nrows)
            prod = f.bfv[0].mul_plain(Ciphertext(B), W).data
        else:
            raise ValueError("plain x plain matvec belongs to the Raw backend")
        sums = _sum_slots_data(f, prod)          # [P, R, 1, s, k, N]
        if not force_dense:
            out = sums[:, :, 0]                  # [P, R, s, k, N] sparse
            return HEVector(
                f, data=out, dim=nrows, scale=out_scale, fmt=SPARSE,
                is_signed=row0.is_signed,
            )
        # force each row's sum into flat slot r, then add rows into one ct
        masks = jnp.stack(
            [f.unit_mask_form(r) for r in range(nrows)], axis=1
        )  # [P, R, 1, k, N]
        OPS.count("plain_multiplication", nrows)
        masked = f.bfv[0].mul_plain(
            Ciphertext(sums), masks[:, :, :, None]
        ).data
        out = mod_sum(masked, q, axis=1)         # [P, 1, s, k, N]
        return HEVector(
            f, data=out, dim=nrows, scale=out_scale, fmt=DENSE,
            is_signed=row0.is_signed,
        )

    # ------------------------------------------------------- elementwise ops
    def add(self, other: "HEMatrix") -> "HEMatrix":
        assert self.fmt == other.fmt and len(self.vectors) == len(other.vectors)
        return HEMatrix(
            self.factory,
            [a.add(b) for a, b in zip(self.vectors, other.vectors)],
            self.fmt,
        )

    def elementwise_multiply(self, other: "HEMatrix") -> "HEMatrix":
        assert self.fmt == other.fmt and len(self.vectors) == len(other.vectors)
        V = len(self.vectors)
        if (
            V > 1
            and self.is_encrypted
            and other.is_encrypted
            and all(v.data.shape == self.vectors[0].data.shape for v in self.vectors)
            and all(v.data.shape == other.vectors[0].data.shape for v in other.vectors)
        ):
            # batched ct x ct multiply: stack the vector axis and run the
            # BEHZ multiply + relin over column CHUNKS (bounding the live
            # Bsk-extended temporaries) instead of V separate single-column
            # programs (the reference runs V thread tasks,
            # `EncryptedSealBfvMatrix.cs:140-154`)
            f = self.factory
            A = self._stacked_data()  # [P, V, C, 2, k, N]
            B = other._stacked_data()
            OPS.count("multiplication", V)
            OPS.count("relinearization", V)
            # chunk bounds the live BEHZ temporaries: one chunk's multiply
            # holds ~6 copies of [chunk, C, 3, k+a, N] uint32 tensors
            # (lifted inputs, two NTT-domain tensors, the product, the
            # floor); at the CryptoNets preset (C=1, k=7, a=10, N=8192)
            # chunk=128 keeps that under ~2.5 GB of HBM.  The chunks run
            # under lax.map, NOT an unrolled Python loop: unrolled, XLA
            # is free to interleave chunk schedules and the overlapping
            # liveness blew the 845-column CryptoNets square past HBM
            # (21.4 GB estimated); lax.map guarantees one chunk of
            # temporaries lives at a time (and compiles the body once).
            chunk = _MULT_CHUNK
            import jax as _jax

            per = []
            for pi, bfv in enumerate(f.bfv):
                if V <= chunk:
                    prod = bfv.multiply(
                        Ciphertext(A[pi]), Ciphertext(B[pi])
                    )
                    per.append(bfv.relinearize(prod, f.keys).data)
                    continue
                G_ = -(-V // chunk)
                Vp = G_ * chunk
                pads = [(0, Vp - V)] + [(0, 0)] * (A.ndim - 2)
                Ag = jnp.pad(A[pi], pads).reshape(
                    G_, chunk, *A.shape[2:]
                )
                Bg = jnp.pad(B[pi], pads).reshape(
                    G_, chunk, *B.shape[2:]
                )

                def _body(ab, _bfv=bfv):
                    a, b = ab
                    prod = _bfv.multiply(Ciphertext(a), Ciphertext(b))
                    return _bfv.relinearize(prod, f.keys).data

                outs = _jax.lax.map(_body, (Ag, Bg))
                per.append(
                    outs.reshape(Vp, *outs.shape[2:])[:V]
                )
            out = jnp.stack(per)  # [P, V, C, 2, k, N]
            vecs = [
                HEVector(
                    f,
                    data=out[:, i],
                    dim=a.dim,
                    scale=a.scale * b.scale,
                    fmt=a.fmt,
                    is_signed=a.is_signed,
                )
                for i, (a, b) in enumerate(zip(self.vectors, other.vectors))
            ]
            return HEMatrix(f, vecs, self.fmt)
        return HEMatrix(
            self.factory,
            [
                a.pointwise_multiply(b)
                for a, b in zip(self.vectors, other.vectors)
            ],
            self.fmt,
        )

    # ----------------------------------------------------------- conversions
    def convert_to_column_vector(self) -> HEVector:
        """Stack all vectors into one long dense vector (ref
        `EncryptedSealBfvMatrix.cs:215-219`)."""
        return HEVector.stack(self.vectors)

    def interleave(self, shift: int) -> HEVector:
        return HEVector.interleave(self.vectors, shift)

    # --------------------------------------------------------------- decrypt
    def decrypt(self) -> np.ndarray:
        """[dim, nvec] array of floats (column-major orientation)."""
        vs = self.vectors
        if (
            self.is_encrypted
            and len(vs) > 1
            and all(v._dec_slots is None for v in vs)
            and all(v.fmt == DENSE for v in vs)
            and all(v.data.shape == vs[0].data.shape for v in vs)
            and all(v.dim == vs[0].dim for v in vs)
        ):
            # one launch + one vectorized CRT join for ALL columns
            vals = self.factory.decrypt_columns(
                self._stacked_data(), vs[0].dim
            )  # [V, dim] object
            cols = [
                np.array([float(x) for x in vals[i]]) / vs[i].scale
                for i in range(len(vs))
            ]
            return np.stack(cols, axis=1)
        cols = [v.decrypt() for v in vs]
        return np.stack(cols, axis=1)

    def __repr__(self):
        return (
            f"HEMatrix({self.fmt}, vecs={len(self.vectors)}, "
            f"dim={self.vectors[0].dim}, scale={self.scale})"
        )
