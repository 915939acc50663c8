"""HEVector: the scale-tracked ciphertext vector (ref IVector/
EncryptedSealBfvVector/AtomicSealBfvEncryptedVector, SURVEY.md 2.2).

Layout: `data` is uint32 [P, C, size, k, N] — P plain-CRT primes, C blocks.
  * dense  (EVectorFormat.dense):  C = ceil(dim/n) blocks; flat slot order
    (slots [0, n/2) = SIMD row 0, [n/2, n) = row 1, SEAL layout).
  * sparse (EVectorFormat.sparse): C = dim ciphertexts, each holding one
    value replicated in every slot.

Every structural op (rotate/duplicate/interleave/sum) is built from the
same primitive set as the reference — row rotations, column swaps, and
0/1-mask plaintext multiplies — so op counts and noise growth match the
SEAL cost model; but they run batched over [P, C] as one traced program
instead of per-prime/per-block thread tasks.

Plain (unencrypted) vectors share this class with is_encrypted=False and
slot values held host-side; mixed plain/encrypted ops dispatch like the
reference's plainData/encData dual storage (`AtomicSealBfvVector.cs:305`).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..crypto.bfv import Ciphertext
from ..crypto.modular import add_mod, sub_mod
from ..crypto.bfv import mod_sum
from ..utils.opcount import OPS

DENSE = "dense"
SPARSE = "sparse"


class HEVector:
    def __init__(
        self,
        factory,
        *,
        data=None,
        values=None,
        dim: int,
        scale: float,
        fmt: str = DENSE,
        is_signed: bool = True,
    ):
        self.factory = factory
        self.data = data            # [P, C, size, k, N] when encrypted
        self.values = values        # numpy object ints (scaled) when plain
        self.dim = int(dim)
        self.scale = float(scale)
        self.fmt = fmt
        self.is_signed = is_signed
        self._mult_form = None
        self._add_form = None
        # decoded slot residues [P, C, N] computed on-device inside a fused
        # forward+decrypt program (nn/jit.py); decrypt() then skips its own
        # device launch and only does the host CRT join
        self._dec_slots = None

    # ------------------------------------------------------------ properties
    @property
    def is_encrypted(self) -> bool:
        return self.data is not None

    @property
    def block_size(self) -> int:
        return self.factory.block_size

    @property
    def num_blocks(self) -> int:
        if self.is_encrypted:
            return self.data.shape[1]
        return max(1, -(-self.dim // self.factory.n))

    def _clone_meta(self, data=None, values=None, dim=None, scale=None, fmt=None):
        return HEVector(
            self.factory,
            data=data,
            values=values,
            dim=self.dim if dim is None else dim,
            scale=self.scale if scale is None else scale,
            fmt=self.fmt if fmt is None else fmt,
            is_signed=self.is_signed,
        )

    def register_scale(self, scale: float):
        self.scale = float(scale)
        return self

    # ------------------------------------------------------- plain lazy forms
    def _slot_values(self) -> np.ndarray:
        """Plain vector -> full slot array (dense: flat; sparse: replicated)."""
        assert not self.is_encrypted
        n = self.factory.n
        if self.fmt == SPARSE:
            # each element fills all slots of its own block
            return np.stack(
                [np.full(n, v, dtype=object) for v in self.values]
            )
        C = self.num_blocks
        buf = np.zeros(C * n, dtype=object)
        buf[: self.dim] = self.values[: self.dim]
        return buf.reshape(C, n)

    def mult_form(self):
        if self._mult_form is None:
            sv = self._slot_values()
            forms = [
                self.factory.plain_mult_form(sv[b], self.factory.n)
                for b in range(sv.shape[0])
            ]
            # [P, C, k, N] (plain_mult_form returns [P, 1, k, N] per block)
            out = jnp.concatenate(forms, axis=1)
            if isinstance(out, jax.core.Tracer):
                return out  # computed inside a trace: do not cache
            self._mult_form = out
        return self._mult_form

    def add_form(self):
        if self._add_form is None:
            sv = self._slot_values()
            forms = [
                self.factory.plain_add_form(sv[b], self.factory.n)
                for b in range(sv.shape[0])
            ]
            out = jnp.concatenate(forms, axis=1)
            if isinstance(out, jax.core.Tracer):
                return out  # computed inside a trace: do not cache
            self._add_form = out
        return self._add_form

    # ------------------------------------------------------------ add / sub
    def _binary_scale_check(self, other):
        if self.scale != 0 and other.scale != 0 and self.scale != other.scale:
            raise ValueError(
                f"Scales do not match: {self.scale} vs {other.scale}"
            )

    def add(self, other: "HEVector") -> "HEVector":
        if self.scale == 0:
            return other
        if other.scale == 0:
            return self
        self._binary_scale_check(other)
        bfv = self.factory.bfv[0]
        if self.is_encrypted and other.is_encrypted:
            OPS.count("addition", self.data.shape[1])
            out = bfv.add(Ciphertext(self.data), Ciphertext(other.data)).data
            return self._clone_meta(data=out)
        if self.is_encrypted and not other.is_encrypted:
            OPS.count("plain_addition", self.data.shape[1])
            out = self.factory.add_plain_data(self.data, other.add_form())
            return self._clone_meta(data=out)
        if not self.is_encrypted and other.is_encrypted:
            return other.add(self)
        vals = self.values + other.values
        return self._clone_meta(values=vals)

    def subtract(self, other: "HEVector") -> "HEVector":
        if other.scale == 0:
            return self
        bfv = self.factory.bfv[0]
        if self.is_encrypted and other.is_encrypted:
            self._binary_scale_check(other)
            OPS.count("subtraction", self.data.shape[1])
            out = bfv.sub(Ciphertext(self.data), Ciphertext(other.data)).data
            return self._clone_meta(data=out)
        if self.is_encrypted:
            self._binary_scale_check(other)
            OPS.count("plain_subtraction", self.data.shape[1])
            out = self.factory.add_plain_data(
                self.data, other.add_form(), sub=True
            )
            return self._clone_meta(data=out)
        if other.is_encrypted:
            neg = other.factory.bfv[0].neg(Ciphertext(other.data)).data
            tmp = other._clone_meta(data=neg)
            return tmp.add(self)
        return self._clone_meta(values=self.values - other.values)

    # --------------------------------------------------- pointwise multiply
    def pointwise_multiply(self, other: "HEVector") -> "HEVector":
        """Elementwise product; sparse-dim-1 operands broadcast as scalars
        (ref `AtomicSealBfvVector.cs:763-860`)."""
        a, b = self, other
        out_scale = a.scale * b.scale
        out_dim = max(a.dim, b.dim) if (a.dim == 1 or b.dim == 1) else a.dim
        if a.dim != b.dim and a.dim != 1 and b.dim != 1:
            raise ValueError("Vector dimensions do not match")
        out_fmt = a.fmt if a.dim >= b.dim else b.fmt
        if a.dim == 1 and b.dim > 1:
            a, b = b, a  # larger first; b is the scalar
        bfv0 = self.factory.bfv[0]
        if a.is_encrypted and b.is_encrypted:
            OPS.count("multiplication", a.data.shape[1])
            OPS.count("relinearization", a.data.shape[1])
            per = []
            bd = b.data
            for pi, bfv in enumerate(self.factory.bfv):
                prod = bfv.multiply(
                    Ciphertext(a.data[pi]), Ciphertext(bd[pi])
                )
                per.append(bfv.relinearize(prod, self.factory.keys).data)
            out = jnp.stack(per)
        elif a.is_encrypted:
            OPS.count("plain_multiplication", a.data.shape[1])
            # insert the poly axis so [P,C,k,N] broadcasts against
            # [P,C,size,k,N]
            out = bfv0.mul_plain(
                Ciphertext(a.data), b.mult_form()[:, :, None]
            ).data
        elif b.is_encrypted:
            return b.pointwise_multiply(a)
        else:
            bv = b.values if b.dim > 1 else b.values[0]
            r = self._clone_meta(values=a.values * bv, dim=out_dim, fmt=out_fmt)
            r.scale = out_scale
            return r
        r = self._clone_meta(data=out, dim=out_dim, fmt=out_fmt)
        r.scale = out_scale
        return r

    # ------------------------------------------------------------- rotations
    def _rot_rows(self, steps: int) -> jnp.ndarray:
        """Row-rotate LEFT by steps (SEAL RotateRows sign convention)."""
        OPS.count("rotation", self.data.shape[1])
        return self.factory.bfv[0].rotate_rows(
            Ciphertext(self.data), steps, self.factory.keys
        ).data

    def _col_swap_data(self, data) -> jnp.ndarray:
        OPS.count("rotation", data.shape[1])
        return self.factory.bfv[0].rotate_columns(
            Ciphertext(data), self.factory.keys
        ).data

    def rotate(self, amount: int) -> "HEVector":
        """SEAL RotateRows(amount): each (n/2)-row rotates left by amount.

        Multi-block vectors rotate EVERY block independently (each
        ciphertext's two rows rotate within themselves) — `_rot_rows`
        batches over [P, C] in one program.  NOTE: the reference rotates
        only encData[0] and silently drops the remaining blocks
        (`AtomicSealBfvVector.cs:1414-1430`); per-block rotation is the
        consistent generalization and matches the single-block case
        exactly."""
        if not self.is_encrypted:
            # plain HEVectors emulate the encrypted semantics per block
            row = self.factory.n // 2
            sv = self._slot_values()
            out = np.stack(
                [
                    np.concatenate(
                        [np.roll(b[:row], -amount), np.roll(b[row:], -amount)]
                    )
                    for b in sv
                ]
            )
            return self._clone_meta(values=out.reshape(-1)[: self.dim])
        return self._clone_meta(data=self._rot_rows(amount))

    # ----------------------------------------------------------- slot sums
    def sum_all_slots(
        self, length: int | None = None, force_output_in_column: int | None = None
    ) -> "HEVector":
        """Right-rotate-accumulate tree (ref `AtomicSealBfvVector.cs:
        871-955`): out[i] = sum_{d<length} in[i-d]; full sum uses a column
        rotation first and leaves the total in every slot."""
        assert self.fmt == DENSE, "expecting dense vector"
        p = self.factory
        n = p.n
        row = n // 2
        full = length is None or length >= row
        d = self.data
        if d.shape[1] > 1:  # AddMany over blocks
            OPS.count("add_many", 1)
            d = mod_sum(d, p.bfv[0].p.chain_q.q, axis=1)[:, None]
        if full:
            d = add_mod(d, self._col_swap_data(d), p.bfv[0].p.chain_q.q)
            length = row
        acc = d
        row_g = p.bfv[0].galois_elt_rows
        g_list, steps = [], 1
        while steps < length:
            g_list.append(row_g(-steps % row))
            steps *= 2
        if (
            g_list
            and d.shape[-3] == 2
            and all(g in p.keys.galois for g in g_list)
        ):
            OPS.count("rotation", len(g_list) * d.shape[1])
            acc = p.bfv[0].rotate_accumulate_scan(
                acc, p.stacked_galois(tuple(g_list))
            )
        else:
            steps = 1
            while steps < length:
                rot = p.bfv[0].rotate_rows(
                    Ciphertext(acc), -steps, p.keys
                ).data
                OPS.count("rotation", acc.shape[1])
                acc = add_mod(acc, rot, p.bfv[0].p.chain_q.q)
                steps *= 2
        out_dim = 1 if full else self.dim
        out_fmt = SPARSE if (length is not None and length >= row) else DENSE
        if force_output_in_column is not None:
            assert full, "forcing output column requires a complete sum"
            mask = p.unit_mask_form(force_output_in_column)
            OPS.count("plain_multiplication", acc.shape[1])
            acc = p.bfv[0].mul_plain(Ciphertext(acc), mask[:, :, None]).data
            out_fmt = DENSE
            out_dim = self.dim
        return self._clone_meta(data=acc, dim=out_dim, fmt=out_fmt)

    # ---------------------------------------------------------- dot product
    def dot_product(
        self, other: "HEVector", length: int | None = None,
        force_output_in_column: int | None = None,
    ) -> "HEVector":
        prod = self.pointwise_multiply(other)
        return prod.sum_all_slots(length, force_output_in_column)

    # ------------------------------------------------------------ duplicate
    def duplicate(self, count: int) -> "HEVector":
        """Replicate at next-pow2 stride within one ciphertext
        (ref `AtomicSealBfvVector.cs:1366-1408`)."""
        assert self.is_encrypted and self.fmt == DENSE
        p = self.factory
        n = p.n
        stride = 1
        while stride < self.dim:
            stride *= 2
        assert stride * count <= n, "packed vector must fit in one ciphertext"
        base = self.data
        res = base
        rotator = None
        q = p.bfv[0].p.chain_q.q
        for i in range(1, count):
            amt = i * stride
            src = base
            if 2 * amt >= n:
                if rotator is None:
                    rotator = self._col_swap_data(base)
                src = rotator
                amt -= n // 2
            rot = p.bfv[0].rotate_rows(Ciphertext(src), -amt, p.keys).data
            OPS.count("rotation", 1)
            res = add_mod(res, rot, q)
        return self._clone_meta(data=res, dim=stride * count)

    # -------------------------------------------------------------- permute
    def permute(self, selections, shifts, output_dim: int) -> "HEVector":
        """sum_i RotateRows(self * sel_i, shifts[i]) (ref
        `AtomicSealBfvVector.cs:1436-1475`)."""
        if self.fmt != DENSE:
            raise ValueError("Permute works only on dense vectors")
        if self.num_blocks != 1:
            # the reference throws identically ("can permute only a
            # single block", `AtomicSealBfvVector.cs:1443`)
            raise ValueError(
                f"can permute only a single block (got {self.num_blocks})"
            )
        p = self.factory
        q = p.bfv[0].p.chain_q.q
        res = None
        first_sel = None
        for sel, sh in zip(selections, shifts):
            if sel is None:
                continue
            if first_sel is None:
                first_sel = sel
            if sel.dim != self.dim:
                raise ValueError("selection dimension mismatch")
            if sel.scale != first_sel.scale:
                raise ValueError("selection scales must match")
            t = self.pointwise_multiply(sel)
            t = t._rot_rows(sh)
            res = t if res is None else add_mod(res, t, q)
        if first_sel is None:
            raise ValueError("permuting with no selections")
        out = self._clone_meta(data=res, dim=output_dim)
        out.scale = self.scale * first_sel.scale
        return out

    # ----------------------------------------------------------- interleave
    @staticmethod
    def interleave(vecs, shift: int) -> "HEVector":
        """Merge vectors: vec k lands at flat offset shift*k (negative
        shift: row + shift*k).  Faithful port of the reference case
        analysis (`AtomicSealBfvVector.cs:600-750`): the placement extent
        is |shift|; pieces are row-rotations, split by prefix masks only
        when the extent crosses a row/block boundary, with upper halves
        merged via one column rotation per output block."""
        v0 = vecs[0]
        p = v0.factory
        n = p.n
        row = n // 2
        q = p.bfv[0].p.chain_q.q
        d = v0.dim
        absh = abs(shift)
        if shift > 0:
            out_blocks = -(-int(d * len(vecs)) // n)
        else:
            out_blocks = 1
        assert absh * len(vecs) <= n * out_blocks, "not enough room"
        lower = [None] * out_blocks
        upper = [None] * out_blocks

        def acc(store, b, piece):
            store[b] = piece if store[b] is None else add_mod(store[b], piece, q)

        def rot_right(data, amt):
            if amt % row == 0:
                return data
            OPS.count("rotation", 1)
            return p.bfv[0].rotate_rows(Ciphertext(data), -amt, p.keys).data

        def prefix_masked(data, ups):
            """data * mask(flat slots [0, ups)) — the wrapped-around part."""
            mask = p.flat_mask_form(0, ups)
            OPS.count("plain_multiplication", 1)
            return p.bfv[0].mul_plain(Ciphertext(data), mask[:, :, None]).data

        for v in vecs:
            if v.num_blocks != 1 or v.fmt != DENSE:
                # the reference's Interleave also assumes single-block
                # dense inputs (`AtomicSealBfvVector.cs:600-617` indexes
                # encData[0] only); multi-block inputs must be split by
                # the caller (LoLa packing never produces them)
                raise ValueError(
                    "interleave inputs must be single-block dense "
                    f"vectors (got blocks={v.num_blocks}, fmt={v.fmt})"
                )

        # ---- uniform-run fast path: consecutive pieces whose placement
        # is a pure rotation into the same (block, row-half) differ by a
        # constant rotation stride, so a maximal run folds into ONE
        # lax.scan (Horner: z <- rot_right(z, shift) + piece, last piece
        # first) — one compiled rotation body instead of one unrolled
        # key-switch graph per piece.  Engaged only when the stride has a
        # single-hop Galois key (models pass rot_steps=(-stride,) to the
        # factory) and the run is long enough to matter; placement is
        # IDENTICAL to the per-piece branches below, which keep handling
        # boundary-crossing pieces and short runs.
        scanned: dict = {}
        if (
            shift > 0
            and len(vecs) >= 24
            and v0.is_encrypted
            and p.bfv[0].galois_elt_rows((-shift) % row)
            in p.keys.galois
        ):
            classes = []
            for kidx in range(len(vecs)):
                ts = shift * kidx
                in_block = ts % n
                start_b, end_b = ts // n, (ts + absh) // n
                if in_block == 0 or in_block + absh < row:
                    classes.append(("lower", start_b, ts % row))
                elif in_block >= row and start_b == end_b:
                    classes.append(("upper", start_b, in_block - row))
                else:
                    classes.append(None)
            runs = []
            k = 0
            while k < len(vecs):
                if classes[k] is None:
                    k += 1
                    continue
                j = k
                while (
                    j + 1 < len(vecs)
                    and classes[j + 1] is not None
                    and classes[j + 1][:2] == classes[k][:2]
                ):
                    j += 1
                if j - k + 1 >= 8:
                    runs.append((k, j))
                k = j + 1
            import jax as _jax

            for k0, k1 in runs:
                half, b, base_amt = classes[k0]
                stacked = jnp.stack(
                    [vecs[i].data for i in range(k1, k0 - 1, -1)], axis=0
                )
                # executed key switches: the Horner scan rotates every
                # carry by `shift` regardless of placement, so this is
                # the EXECUTED count, which can exceed the unrolled-
                # equivalent count (rot_right skips amounts that are
                # 0 mod row).  Seeding the carry with the last piece
                # (instead of zeros) drops the wasted switch-of-zero.
                OPS.count("rotation", k1 - k0)

                def _body(carry, piece):
                    rot = p.bfv[0].rotate_rows(
                        Ciphertext(carry), -shift, p.keys
                    ).data
                    return add_mod(rot, piece, q), None

                z, _ = _jax.lax.scan(_body, stacked[0], stacked[1:])
                if base_amt % row:
                    OPS.count("rotation", 1)
                    z = p.bfv[0].rotate_rows(
                        Ciphertext(z), -base_amt, p.keys
                    ).data
                acc(lower if half == "lower" else upper, b, z)
                for i in range(k0, k1 + 1):
                    scanned[i] = True

        for kidx, v in enumerate(vecs):
            if kidx in scanned:
                continue
            this_shift = shift * kidx
            if this_shift < 0:
                this_shift = row + this_shift
            in_block = this_shift % n
            start_b = this_shift // n
            end_b = (this_shift + absh) // n
            z = v.data
            if in_block == 0:
                acc(lower, start_b, z)
            elif in_block + absh < row:
                acc(lower, start_b, rot_right(z, this_shift))
            elif in_block >= row:
                z = rot_right(z, in_block - row)
                if start_b == end_b:
                    acc(upper, start_b, z)
                else:
                    ups = in_block + absh - n
                    zm = prefix_masked(z, ups)
                    OPS.count("subtraction", 1)
                    acc(upper, start_b, sub_mod(z, zm, q))
                    acc(lower, end_b, zm)
            else:
                z = rot_right(z, in_block)
                ups = in_block + absh - row
                if ups > 0:
                    zm = prefix_masked(z, ups)
                    OPS.count("subtraction", 1)
                    acc(upper, start_b, zm)
                    acc(lower, start_b, sub_mod(z, zm, q))
                else:
                    acc(lower, start_b, z)
        outs = []
        for b in range(out_blocks):
            blk = lower[b]
            if upper[b] is not None:
                up = v0._col_swap_data(upper[b])
                blk = up if blk is None else add_mod(blk, up, q)
            if blk is None:
                blk = jnp.zeros_like(v0.data)
            outs.append(blk)
        out = jnp.concatenate(outs, axis=1)
        return v0._clone_meta(data=out, dim=d)

    @staticmethod
    def stack(vecs) -> "HEVector":
        """Concatenate vectors end-to-end (ref Stack,
        `AtomicSealBfvVector.cs:752-761`)."""
        res = HEVector.interleave(vecs, int(vecs[0].dim))
        res.dim = int(vecs[0].dim) * len(vecs)
        return res

    # -------------------------------------------------------------- decrypt
    def decrypt_full_precision(self) -> np.ndarray:
        """Centered big-int values (ref DecryptFullPrecision)."""
        if not self.is_encrypted:
            if self.fmt == SPARSE:
                return np.asarray(self.values, dtype=object)
            return np.asarray(self.values[: self.dim], dtype=object)
        p = self.factory
        if not getattr(p, "has_secret_key", True):
            raise RuntimeError(
                "this factory was loaded without a secret key; "
                "decryption is disabled (ref AtomicSealBfvVector.cs:121-128)"
            )
        if self._dec_slots is not None:
            slots_all = np.asarray(self._dec_slots)  # [P, C, N]
            if self.fmt == SPARSE:
                per = [
                    slots_all[pi, :, 0].astype(np.int64)[: self.dim]
                    for pi in range(p.P)
                ]
                return p.join_split_numbers(per)
            return p.join_decoded_blocks(slots_all, self.dim)
        if self.fmt == SPARSE:
            # value of block c replicated in slots: read flat slot 0
            vals = p.decrypt_blocks(self.data, p.n * self.num_blocks)
            vals = vals.reshape(self.num_blocks, p.n)[:, 0]
            return vals[: self.dim]
        return p.decrypt_blocks(self.data, self.dim)

    def decrypt(self) -> np.ndarray:
        """Float values (big ints / scale).

        Precision bound: float64 carries 53 mantissa bits, so values
        wider than 2**53 (CIFAR logits reach ~79 bits,
        `LolaCifarCryptoNet.cs:28-30`) lose low-order bits here — the
        same loss the reference incurs converting BigInteger to double
        (`RawMatrix`/argmax paths).  Relative error stays 2**-53, so
        argmax/accuracy are unaffected; use decrypt_full_precision()
        when exact integers matter."""
        vals = self.decrypt_full_precision()
        return np.array([float(v) for v in vals]) / self.scale

    # ---------------------------------------------------------------- debug
    def __repr__(self):
        kind = "enc" if self.is_encrypted else "plain"
        return (
            f"HEVector({kind}, dim={self.dim}, scale={self.scale}, "
            f"fmt={self.fmt}, blocks={self.num_blocks})"
        )
