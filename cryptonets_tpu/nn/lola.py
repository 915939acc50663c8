"""LoLa low-latency packing layers (ref `NeuralNetworks/LL*.cs`):
single-image networks that trade SIMD batch throughput for latency by
packing one image's activations across slots."""

from __future__ import annotations

import numpy as np

from .convolution import ConvolutionEngine
from .network import Layer


class LLPoolLayer(Layer):
    """LoLa conv over a single-image row-major "patch matrix" (column i =
    i-th kernel-offset vector across windows): per map, one matrix x
    sparse-weight-window multiply + dense bias (ref `LLPoolLayer.cs`).
    `hot_indices` masks the bias to valid slots when input came from
    LLPreConvLayer."""

    def __init__(
        self,
        source,
        input_shape,
        kernel_shape,
        stride=None,
        padding=None,
        upper_padding=None,
        lower_padding=None,
        map_count=None,
        weights=None,
        bias=None,
        weights_scale: float = 1.0,
        hot_indices=None,
    ):
        super().__init__(source)
        self.engine = ConvolutionEngine(
            input_shape, kernel_shape, stride, padding,
            upper_padding, lower_padding, map_count,
        )
        self.weights = None if weights is None else np.asarray(weights, float)
        self.bias = None if bias is None else np.asarray(bias, float)
        self.weights_scale = float(weights_scale)
        self.hot_indices = hot_indices
        self.weight_windows = None
        self.bias_vectors = None
        self.kernel_size = -1

    def get_output_scale(self):
        if self.weights is None:
            return len(self.engine.offsets) * self.source.get_output_scale()
        return self.weights_scale * self.source.get_output_scale()

    def output_dimension(self):
        count = len(self.engine.corners)
        if self.weights is None:
            return count
        return count * self.engine.maps

    def prepare(self):
        if self.layer_prepared:
            return
        e = self.engine
        self.kernel_size = int(np.prod(e.kernel_shape))
        if self.bias is None:
            self.kernel_size += 1
        if self.weights is None:
            return
        self.weight_windows = []
        for m in range(e.maps):
            w = [
                0.0
                if e.location(None, off, e.kernel_shape, m * self.kernel_size) < 0
                else self.weights[
                    e.location(None, off, e.kernel_shape, m * self.kernel_size)
                ]
                for off in e.offsets
            ]
            self.weight_windows.append(
                self.factory.get_plain_vector(w, "sparse", self.weights_scale)
            )
        hot = (
            np.ones(len(e.corners))
            if self.hot_indices is None
            else np.asarray(self.hot_indices, float)
        )
        self.hot_indices = hot
        src_scale = self.source.get_output_scale()
        if self.bias is not None:
            bvals = [self.bias[m] for m in range(e.maps)]
        else:
            bvals = [
                self.weights[(m + 1) * self.kernel_size - 1]
                for m in range(e.maps)
            ]
        self.bias_vectors = [
            self.factory.get_plain_vector(
                hot * b, "dense", src_scale * self.weights_scale
            )
            for b in bvals
        ]

    def apply(self, m):
        if self.weights is None:  # mean pool: sum the offset columns
            agg = None
            for i in range(m.column_count):
                col = m.get_column(i)
                agg = col if agg is None else agg.add(col)
            agg.register_scale(agg.scale * m.column_count)
            return self.factory.get_matrix([agg], "col")
        if m.is_encrypted and len(self.bias_vectors) > 1:
            # all maps in ONE digit-plane MXU contraction: out[map] =
            # sum_o W[map, o] * col_o.  The per-map m.mul path stacks the
            # full patch tensor and materializes a per-map product each
            # time — at CIFAR scale (83 maps x 192 offset columns x
            # n=16384) that alone exceeds HBM; the contraction never
            # materializes a (map, offset) intermediate.
            from ..api.vector import HEVector
            from ..kernels.modmatmul import exact_mod_contract
            from ..utils.opcount import OPS

            f = self.factory
            wint = np.stack(
                [
                    np.asarray(
                        [int(x) for x in wv.values], dtype=np.int64
                    )
                    for wv in self.weight_windows
                ]
            )
            X = m._stacked_data()               # [P, V, C, s, k, N]
            OPS.count("plain_multiplication", int(wint.size))
            out = exact_mod_contract(
                wint, X, f.coeff_modulus, f.bfv[0].p.chain_q.q
            )                                    # [P, maps, C, s, k, N]
            col0 = m.get_column(0)
            out_scale = col0.scale * self.weights_scale
            cols = [
                HEVector(
                    f, data=out[:, k], dim=col0.dim, scale=out_scale,
                    fmt="dense", is_signed=col0.is_signed,
                ).add(self.bias_vectors[k])
                for k in range(self.engine.maps)
            ]
            return self.factory.get_matrix(cols, "col")
        cols = [
            m.mul(self.weight_windows[k]).add(self.bias_vectors[k])
            for k in range(len(self.bias_vectors))
        ]
        return self.factory.get_matrix(cols, "col")


class LLVectorizeLayer(Layer):
    """Matrix of map-columns -> one long dense vector via Stack
    (ref `LLVectorizeLayer.cs`)."""

    def __init__(self, source=None, output_dim: int = -1):
        super().__init__(source)
        self.output_dim = output_dim

    def apply(self, m):
        vec = m.convert_to_column_vector()
        return self.factory.get_matrix([vec], "col")

    def output_dimension(self):
        if self.output_dim > 0:
            return self.output_dim
        return self.source.output_dimension()


class LLDuplicateLayer(Layer):
    """Replicate each column `count` times at next-pow2 stride within one
    ciphertext (ref `LLDuplicateLayer.cs`)."""

    def __init__(self, source=None, count: int = 1):
        super().__init__(source)
        self.count = count

    def apply(self, m):
        cols = [
            m.get_column(i).duplicate(self.count)
            for i in range(m.column_count)
        ]
        return self.factory.get_matrix(cols, m.fmt)

    def output_dimension(self):
        shift = 1
        d = self.source.output_dimension()
        while shift < d:
            shift *= 2
        return shift * self.count


class LLPackedDenseLayer(Layer):
    """FC over a duplicated vector: weight rows packed `packing_count` per
    stacked row at `packing_shift` stride; bucketed DotProduct leaves each
    output at slot (col+1)*shift - 1, where the bias is added
    (ref `LLPackedDenseLayer.cs`)."""

    def __init__(
        self,
        source,
        weights,
        bias,
        packing_count: int,
        packing_shift: int,
        weights_scale: float = 1.0,
    ):
        super().__init__(source)
        self.weights = np.asarray(weights, float)
        self.bias = np.asarray(bias, float)
        self.packing_count = packing_count
        self.packing_shift = packing_shift
        self.weights_scale = float(weights_scale)
        self.weights_matrix = None
        self.bias_matrix = None

    def get_output_scale(self):
        return self.weights_scale * self.source.get_output_scale()

    def output_dimension(self):
        return len(self.bias)

    def prepare(self):
        if self.layer_prepared:
            return
        maps = len(self.bias)
        map_len = len(self.weights) // maps
        pc, shift = self.packing_count, self.packing_shift
        new_rows = (maps + pc - 1) // pc
        stacked = np.zeros((new_rows, pc * shift))
        padded_bias = np.zeros((new_rows, pc * shift))
        w = self.weights.reshape(maps, map_len)
        for i in range(maps):
            col, row = i % pc, i // pc
            stacked[row, col * shift : col * shift + map_len] = w[i]
            padded_bias[row, (col + 1) * shift - 1] = self.bias[i]
        self.weights_matrix = self.factory.get_plain_matrix(
            stacked, "row", self.weights_scale
        )
        self.bias_matrix = self.factory.get_plain_matrix(
            padded_bias, "row",
            self.source.get_output_scale() * self.weights_scale,
        )

    def apply(self, m):
        assert m.column_count == 1, "expecting only one column"
        vector = m.get_column(0)
        if not vector.is_encrypted:
            cols = []
            for k in range(self.weights_matrix.row_count):
                mul = self.weights_matrix.get_row(k).dot_product(
                    vector, length=self.packing_shift
                )
                cols.append(mul.add(self.bias_matrix.get_row(k)))
            return self.factory.get_matrix(cols, "col")
        # batched encrypted path: ONE rotation tree over all stacked rows
        # (the per-row loop costs rows x log2(shift) key-switches; batching
        # makes it log2(shift) total)
        import jax.numpy as jnp

        from ..api.matrix import _sum_slots_data
        from ..api.vector import HEVector
        from ..crypto.bfv import Ciphertext
        from ..utils.opcount import OPS

        f = self.factory
        R = self.weights_matrix.row_count
        Wf = jnp.stack(
            [
                self.weights_matrix.get_row(r).mult_form()
                for r in range(R)
            ],
            axis=1,
        )  # [P, R, C, k, N]
        OPS.count("plain_multiplication", R)
        prod = f.bfv[0].mul_plain(
            Ciphertext(vector.data[:, None]), Wf[:, :, :, None]
        ).data  # [P, R, C, 2, k, N]
        sums = _sum_slots_data(f, prod, length=self.packing_shift)
        bias_forms = jnp.stack(
            [self.bias_matrix.get_row(r).add_form() for r in range(R)],
            axis=1,
        )
        OPS.count("plain_addition", R)
        out = f.add_plain_data(sums, bias_forms)  # [P, R, 1, 2, k, N]
        out_scale = vector.scale * self.weights_matrix.scale
        dim = self.packing_count * self.packing_shift
        cols = [
            HEVector(
                f, data=out[:, r], dim=dim, scale=out_scale, fmt="dense",
                is_signed=vector.is_signed,
            )
            for r in range(R)
        ]
        return f.get_matrix(cols, "col")


class LLInterleaveLayer(Layer):
    """Gather the meaningful slots (selected_indices mask) of several
    columns into one vector via mask-mult + Interleave(shift)
    (ref `LLInterleaveLayer.cs`)."""

    def __init__(
        self, source, shift: int, selected_indices, input_gross_dimension=-1
    ):
        super().__init__(source)
        self.shift = shift
        self.selected_indices = list(selected_indices)
        self.input_gross_dimension = input_gross_dimension
        self.mask = None

    def prepare(self):
        if self.input_gross_dimension < 0:
            self.input_gross_dimension = max(self.selected_indices) + 1
        mv = np.zeros(self.input_gross_dimension)
        mv[self.selected_indices] = 1.0
        self.mask = self.factory.get_plain_vector(mv, "dense", 1.0)

    def apply(self, m):
        col0 = m.get_column(0)
        if col0.is_encrypted:
            # one batched mask multiply over all columns
            import jax.numpy as jnp

            from ..api.vector import HEVector
            from ..crypto.bfv import Ciphertext
            from ..utils.opcount import OPS

            f = self.factory
            stacked = jnp.stack(
                [m.get_column(i).data for i in range(m.column_count)],
                axis=1,
            )  # [P, V, C, 2, k, N]
            mf = self.mask.mult_form()  # [P, C, k, N]
            OPS.count("plain_multiplication", m.column_count)
            cleaned = f.bfv[0].mul_plain(
                Ciphertext(stacked), mf[:, None, :, None]
            ).data
            clean = [
                HEVector(
                    f, data=cleaned[:, i], dim=col0.dim,
                    scale=col0.scale * self.mask.scale, fmt="dense",
                    is_signed=col0.is_signed,
                )
                for i in range(m.column_count)
            ]
        else:
            clean = [
                m.get_column(i).pointwise_multiply(self.mask)
                for i in range(m.column_count)
            ]
        clean_mat = self.factory.get_matrix(clean, "col")
        interleaved = clean_mat.interleave(self.shift)
        return self.factory.get_matrix([interleaved], "col")

    def output_dimension(self):
        return self.input_gross_dimension


class LLInterleavedDenseLayer(Layer):
    """FC whose weight columns are scattered to the interleaved slot
    positions (ref `LLInterleavedDenseLayer.cs`): the final 10-class head
    of LoLa."""

    def __init__(
        self, source, weights, bias, shift: int, selected_indices,
        weights_scale: float = 1.0,
    ):
        super().__init__(source)
        self.weights = np.asarray(weights, float)
        self.bias = np.asarray(bias, float)
        self.shift = shift
        self.selected_indices = list(selected_indices)
        self.weights_scale = float(weights_scale)
        self.weights_matrix = None
        self.bias_vector = None

    def get_output_scale(self):
        return self.source.get_output_scale() * self.weights_scale

    def output_dimension(self):
        return len(self.bias)

    def _target_indices(self, count):
        out = []
        offset = 0
        while count > 0:
            for i in self.selected_indices:
                if count <= 0:
                    break
                out.append(i + offset)
                count -= 1
            offset += self.shift
        return out

    def prepare(self):
        rows = len(self.bias)
        columns = len(self.weights) // rows
        small = self.weights.reshape(rows, columns)
        big = np.zeros((rows, self.source.output_dimension()))
        ti = self._target_indices(columns)
        for i in range(columns):
            big[:, ti[i]] = small[:, i]
        self.bias_vector = self.factory.get_plain_vector(
            self.bias, "sparse", self.get_output_scale()
        )
        self.weights_matrix = self.factory.get_plain_matrix(
            big, "row", self.weights_scale
        )

    def apply(self, m):
        mul = self.weights_matrix.mul(m.get_column(0))
        v = mul.add(self.bias_vector)
        return self.factory.get_matrix([v], "col")


class LLDenseLayer(Layer):
    """General FC (ref `LLDenseLayer.cs`): dense input -> RowMajor weights
    (per-row dots; force_dense_format packs outputs into one dense
    vector); sparse input -> ColumnMajor weights."""

    def __init__(
        self,
        source,
        weights,
        bias,
        weights_scale: float = 1.0,
        input_format: str = "dense",
        force_dense_format: bool = False,
        use_bsgs: bool | None = None,
        bsgs_g: int | None = None,
    ):
        super().__init__(source)
        self.weights = np.asarray(weights, float)
        self.bias = np.asarray(bias, float)
        self.weights_scale = float(weights_scale)
        self.input_format = input_format
        self.force_dense_format = force_dense_format
        # use_bsgs: None = size heuristic (maps >= 128); True forces the
        # BSGS diagonal matvec (e.g. with hoisted babies via a factory
        # that has per-step Galois keys); False forces per-row dots.
        # bsgs_g overrides the baby count (api/bsgs.py BsgsDenseForm).
        self.use_bsgs = use_bsgs
        self.bsgs_g = bsgs_g
        self.weights_matrix = None
        self.bias_vector = None
        self.bsgs_form = None

    def get_output_scale(self):
        return self.weights_scale * self.source.get_output_scale()

    def output_dimension(self):
        return len(self.bias)

    def prepare(self):
        if self.layer_prepared:
            return
        if self.force_dense_format and self.input_format == "sparse":
            raise ValueError("force-dense requires dense input")
        maps = len(self.bias)
        wmat = self.weights.reshape(maps, len(self.weights) // maps)
        bias_scale = self.source.get_output_scale() * self.weights_scale
        if self.input_format == "dense":
            self.bias_vector = self.factory.get_plain_vector(
                self.bias,
                "dense" if self.force_dense_format else "sparse",
                bias_scale,
            )
            # Large force-dense layers (LoLa-CIFAR / LoLaLarge conv-as-
            # dense) run as a BSGS diagonal matvec: ~2*sqrt(n/2) key
            # switches total instead of maps*log2(n/2) (api/bsgs.py).
            # Per-row dots stay for small heads and factories without
            # device-side encoding (big plain moduli).
            want_bsgs = (
                self.use_bsgs
                if self.use_bsgs is not None
                else maps >= 128
            )
            if (
                self.force_dense_format
                and want_bsgs
                and maps <= self.factory.n
                and wmat.shape[1] <= self.factory.n
                and getattr(self.factory, "_device_encode", False)
            ):
                from ..api.bsgs import BsgsDenseForm

                # same integers as _scaled_ints (round-half-even) but
                # vectorized: the per-element int() path costs minutes
                # at CIFAR scale (5488 x 16268 weights)
                w_int = np.round(
                    wmat * self.weights_scale
                ).astype(np.int64)
                self.bsgs_form = BsgsDenseForm(
                    self.factory, w_int, maps, wmat.shape[1],
                    g=self.bsgs_g,
                )
                return
            self.weights_matrix = self.factory.get_plain_matrix(
                wmat, "row", self.weights_scale
            )
        else:
            self.bias_vector = self.factory.get_plain_vector(
                self.bias, "dense", bias_scale
            )
            self.weights_matrix = self.factory.get_plain_matrix(
                wmat, "col", self.weights_scale
            )

    def apply(self, m):
        assert m.column_count == 1, "expecting only one column"
        v = m.get_column(0)
        if self.bsgs_form is not None:
            from ..api.bsgs import bsgs_matvec
            from ..api.vector import HEVector

            if v.num_blocks != 1:
                raise ValueError("BSGS dense needs a single-block input")
            out = bsgs_matvec(self.bsgs_form, v.data)
            mul = HEVector(
                self.factory,
                data=out,
                dim=self.bsgs_form.out_dim,
                scale=v.scale * self.weights_scale,
                fmt="dense",
                is_signed=v.is_signed,
            )
        else:
            mul = self.weights_matrix.mul(v, self.force_dense_format)
        res = mul.add(self.bias_vector)
        return self.factory.get_matrix([res], "col")


class LLPreConvLayer(Layer):
    """Re-pack a single dense image vector into the patch-matrix layout
    HOMOMORPHICALLY with masked rotations (ref `LLPreConvLayer.cs` — the
    most intricate index logic in the reference; ported 1:1 at the index-
    algebra level, executed with our Permute)."""

    def __init__(
        self,
        source,
        input_shape,
        kernel_shape,
        stride=None,
        padding=None,
        upper_padding=None,
        lower_padding=None,
        use_axis_for_blocks=None,
    ):
        super().__init__(source)
        self.engine = ConvolutionEngine(
            input_shape, kernel_shape, stride, padding,
            upper_padding, lower_padding,
        )
        self.use_axis_for_blocks = use_axis_for_blocks
        self.output_dim = -1
        self.shifts = None
        self.masks = None
        self.hot_indices = None
        self.corners_map = None

    def _block_offsets(self):
        e = self.engine
        stride = e.stride
        shifts = [1] * len(stride)
        for i in range(1, len(shifts)):
            shifts[i] = shifts[i - 1] * e.input_shape[i - 1]
        block = [0] * len(stride)
        offset = 0
        out = []
        while True:
            out.append(offset)
            for i in range(len(block)):
                if not self.use_axis_for_blocks[i]:
                    continue
                block[i] += 1
                offset += shifts[i]
                if block[i] < stride[i]:
                    break
                offset -= block[i] * shifts[i]
                block[i] = 0
            else:
                return out

    def prepare(self):
        if self.layer_prepared:
            return
        e = self.engine
        if self.use_axis_for_blocks is None:
            self.use_axis_for_blocks = [True] * len(e.input_shape)
        n_off = len(e.offsets)
        dim = int(np.prod(e.input_shape))
        block_offsets = self._block_offsets()
        corners_proj = sorted({c[0] for c in e.corners})
        expected = len(corners_proj) / len(block_offsets)
        small_bs = int(np.floor(expected))
        large_bs = int(np.ceil(expected))
        n_large = len(corners_proj) - len(block_offsets) * small_bs
        self.corners_map = [-1] * len(e.corners)
        self.masks = []
        self.shifts = []
        for i in range(n_off):
            selections = [[] for _ in block_offsets]
            sh = [0] * len(block_offsets)
            for j in range(len(sh)):
                this_bs = small_bs if j > n_large else large_bs
                if j == 0:
                    sh[j] = e.location(None, e.offsets[i], e.input_shape)
                else:
                    sh[j] = (
                        sh[j - 1]
                        + block_offsets[j - 1]
                        - block_offsets[j]
                        + this_bs * e.stride[0] * dim // e.input_shape[0]
                    )
            for j, corner in enumerate(e.corners):
                location = e.location(corner, e.offsets[i], e.input_shape)
                corner_id = (corner[0] - e.corners[0][0]) // e.stride[0]
                if corner_id < large_bs * n_large:
                    block = corner_id // large_bs
                else:
                    block = n_large + (corner_id - large_bs * n_large) // small_bs
                if location >= 0:
                    selections[block].append(location)
                    mp = location - sh[block]
                    if self.corners_map[j] >= 0 and self.corners_map[j] != mp:
                        raise RuntimeError("Internal Error")
                    self.corners_map[j] = mp
            row_masks = []
            for sel in selections:
                if sel:
                    mv = np.zeros(dim)
                    mv[sel] = 1.0
                    row_masks.append(
                        self.factory.get_plain_vector(mv, "dense", 1.0)
                    )
                else:
                    row_masks.append(None)
            self.masks.append(row_masks)
            self.shifts.append(sh)
        if n_large == 0:
            large_max = 0
        else:
            large_max = (dim // e.input_shape[0]) * (
                1 + e.stride[0] * (large_bs - 1)
            ) + block_offsets[n_large - 1]
        small_max = (dim // e.input_shape[0]) * (
            1 + e.stride[0] * (small_bs - 1)
        ) + block_offsets[-1]
        self.output_dim = max(large_max, small_max)
        hot = np.zeros(self.output_dim)
        for mp in self.corners_map:
            hot[mp] = 1.0
        self.hot_indices = hot

    def apply(self, m):
        assert m.column_count == 1, "expecting a single column"
        if not self.layer_prepared:
            self.prepare()
            self.layer_prepared = True
        v = m.get_column(0)
        cols = [
            v.permute(self.masks[k], self.shifts[k], self.output_dim)
            for k in range(len(self.masks))
        ]
        return self.factory.get_matrix(cols, "col")

    def output_dimension(self):
        return self.output_dim

    def rearrange_weights(self, weights) -> np.ndarray:
        """Permute downstream FC weights into the blocked order
        (ref RearrangeWeights)."""
        if not self.layer_prepared:
            self.prepare()
            self.layer_prepared = True
        weights = np.asarray(weights, float)
        e = self.engine
        maps = len(weights) // len(e.corners)
        out = np.zeros(maps * self.output_dim)
        for i in range(maps):
            for j in range(len(e.corners)):
                out[i * self.output_dim + self.corners_map[j]] = weights[
                    j + i * len(e.corners)
                ]
        return out
