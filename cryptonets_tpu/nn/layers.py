"""Core layers (ref `NeuralNetworks/`): EncryptLayer, SquareActivation,
PoolLayer (CryptoNets conv/dense/mean-pool over SIMD-batched columns),
TimingLayer, DebugLayer."""

from __future__ import annotations

import time

import numpy as np

from .convolution import ConvolutionEngine
from .network import Layer


class EncryptLayer(Layer):
    """The trust boundary: plaintext Raw matrix -> encrypted matrix,
    preserving scale (ref `EncryptLayer.cs:12-19`).  Everything upstream is
    client-side; everything downstream operates on ciphertexts."""

    def apply(self, m):
        res = self.factory.get_encrypted_matrix(m.m, "col", scale=1.0)
        # values in m.m are already scaled ints; carry the scale over
        res.register_scale(m.scale)
        return res


class SquareActivation(Layer):
    """x -> x^2 via elementwise ct multiply; the only nonlinearity
    (ref `SquareActivation.cs:10-19`)."""

    def apply(self, m):
        return m.elementwise_multiply(m)

    def get_output_scale(self):
        s = self.source.get_output_scale()
        return s * s


class PoolLayer(Layer):
    """CryptoNets-style conv / dense / mean-pool over column-major,
    SIMD-batched data: column j holds feature j across the batch
    (ref `PoolLayer.cs`).  weights None -> window-sum with scale-divide
    (average); else per (map, corner): gather patch columns, multiply by
    the sparse weight window, add the per-map dense bias row.

    Doubles as a dense layer via kernel=input shape + huge stride
    (ref `CryptoNets.cs:47-57`)."""

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
    ):
        super().__init__(source)
        self.engine = ConvolutionEngine(
            input_shape, kernel_shape, stride, padding,
            upper_padding, lower_padding, map_count,
        )
        self.weights = None if weights is None else np.asarray(weights, float)
        self.bias = None if bias is None else np.asarray(bias, float)
        self.weights_scale = float(weights_scale)
        self.weight_windows = None
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
            self.kernel_size += 1  # embedded-bias weight layout
        if self.weights is None:
            return
        self.weight_windows = []
        for m in range(e.maps):
            w = []
            for off in e.offsets:
                l = e.location(None, off, e.kernel_shape, m * self.kernel_size)
                w.append(0.0 if l < 0 else self.weights[l])
            self.weight_windows.append(
                self.factory.get_plain_vector(w, "sparse", self.weights_scale)
            )

    def _element_at(self, m, corner, offset):
        l = self.engine.location(corner, offset, self.engine.input_shape)
        if l < 0:  # padding: a free zero vector at the input's scale
            return self.factory.get_zero_vector(m.row_count, m.scale)
        return m.get_column(l)

    def _apply_encrypted(self, m):
        """Batched encrypted conv/dense: forward-NTT the input columns
        ONCE, gather patch columns per offset in the NTT domain, multiply
        by per-(map, offset) scalar constants, and inverse-NTT per map —
        the reference instead runs maps x corners thread tasks each
        re-touching the inputs (`PoolLayer.cs:149-229`)."""
        import jax.numpy as jnp

        from ..api.vector import HEVector
        from ..crypto.modular import (
            add_mod,
            mul_const_mod,
            shoup_precompute_host,
        )
        from ..utils.opcount import OPS

        e = self.engine
        f = self.factory
        bfv0 = f.bfv[0]
        ntt = bfv0.p.ntt_q
        q = bfv0.p.chain_q.q
        maps = e.maps
        qs = f.coeff_modulus
        src_scale = self.source.get_output_scale()

        X = jnp.stack([v.data for v in m.vectors], axis=1)
        Xh = ntt.forward(X)  # [P, Vin, C, 2, k, N]
        Xh_ext = jnp.concatenate(
            [Xh, jnp.zeros_like(Xh[:, :1])], axis=1
        )
        Vin = len(m.vectors)

        def w_table(mi):
            """[O, k, 1] residues+shoup of this map's scaled weights."""
            O = len(e.offsets)
            w = np.zeros((O, len(qs), 1), np.uint32)
            sh = np.zeros_like(w)
            for oi, off in enumerate(e.offsets):
                l = e.location(
                    None, off, e.kernel_shape, mi * self.kernel_size
                )
                wi = 0 if l < 0 else int(round(self.weights[l] * self.weights_scale))
                for li, qq in enumerate(qs):
                    r = wi % qq
                    w[oi, li, 0] = r
                    sh[oi, li, 0] = shoup_precompute_host(r, qq)
            return jnp.asarray(w), jnp.asarray(sh)

        if self.bias is not None:
            bias_vals = list(self.bias[:maps])
        else:
            bias_vals = [
                self.weights[(mi + 1) * self.kernel_size - 1]
                for mi in range(maps)
            ]
        bias_scale = src_scale * self.weights_scale
        rowcount = m.vectors[0].dim

        dense = len(e.corners) == 1
        if dense:
            # dense layer (kernel == input): ONE gather of the offset
            # columns + ONE exact digit-plane MXU contraction over all
            # maps (kernels/modmatmul.py) — the reference loops
            # maps x columns thread tasks; a per-map const-mul loop also
            # makes XLA materialize a gathered input copy per map.
            from ..kernels.modmatmul import exact_mod_contract

            idx = [
                e.location(e.corners[0], off, e.input_shape)
                for off in e.offsets
            ]
            idx = jnp.asarray([Vin if l < 0 else l for l in idx])
            Xg = jnp.take(Xh_ext, idx, axis=1)  # [P, O, C, 2, k, N]
            W = np.zeros((maps, len(e.offsets)), np.int64)
            for mi in range(maps):
                for oi, off in enumerate(e.offsets):
                    l = e.location(
                        None, off, e.kernel_shape, mi * self.kernel_size
                    )
                    W[mi, oi] = (
                        0
                        if l < 0
                        else int(round(self.weights[l] * self.weights_scale))
                    )
            OPS.count("plain_multiplication", maps * len(e.offsets))
            stacked = exact_mod_contract(W, Xg, qs, q)  # [P, maps, C, 2, k, N]
        else:
            map_outs = []
            for mi in range(maps):
                wt, wt_sh = w_table(mi)
                acc = None
                for oi, off in enumerate(e.offsets):
                    idx = [
                        e.location(c, off, e.input_shape) for c in e.corners
                    ]
                    idx = jnp.asarray([Vin if l < 0 else l for l in idx])
                    Xo = jnp.take(Xh_ext, idx, axis=1)  # [P, Co, C, 2, k, N]
                    OPS.count("plain_multiplication", 1)
                    term = mul_const_mod(
                        Xo,
                        wt[oi][None, None, None],
                        wt_sh[oi][None, None, None],
                        q,
                    )
                    acc = term if acc is None else add_mod(acc, term, q)
                map_outs.append(acc)
            stacked = jnp.concatenate(map_outs, axis=1)
        out = ntt.inverse(stacked)  # coeff domain
        # bias: per map, replicated over the batch rows (dense slots)
        bias_forms = jnp.stack(
            [
                f.plain_add_form(
                    np.full(rowcount, round(b * bias_scale), dtype=object),
                    rowcount,
                )
                for b in bias_vals
            ],
            axis=1,
        )  # [P, maps, C, k, N]
        corners = len(e.corners)
        out = out.reshape(
            out.shape[0], maps, corners, *out.shape[2:]
        )
        OPS.count("plain_addition", maps)
        out = f.add_plain_data(
            out, bias_forms[:, :, None]
        )  # [P, maps, 1, C, k, N] broadcasts over corners
        cols = []
        for mi in range(maps):
            for ci in range(corners):
                cols.append(
                    HEVector(
                        f,
                        data=out[:, mi, ci],
                        dim=rowcount,
                        scale=bias_scale,
                        fmt="dense",
                        is_signed=m.vectors[0].is_signed,
                    )
                )
        return f.get_matrix(cols, "col")

    def apply(self, m):
        e = self.engine
        if self.weights is None:  # mean pool
            cols = []
            for corner in e.corners:
                agg = None
                for off in e.offsets:
                    el = self._element_at(m, corner, off)
                    agg = el if agg is None else agg.add(el)
                agg.register_scale(agg.scale * len(e.offsets))
                cols.append(agg)
            return self.factory.get_matrix(cols, "col")

        if getattr(m, "vectors", None) is not None and m.vectors[0].is_encrypted:
            return self._apply_encrypted(m)

        maps = e.maps
        src_scale = self.source.get_output_scale()
        if self.bias is not None:
            bias_vals = [self.bias[mi] for mi in range(maps)]
        else:  # bias embedded as last weight of each window
            bias_vals = [
                self.weights[(mi + 1) * self.kernel_size - 1]
                for mi in range(maps)
            ]
        bias_vecs = [
            self.factory.get_plain_vector(
                np.full(m.row_count, b), "dense",
                src_scale * self.weights_scale,
            )
            for b in bias_vals
        ]
        cols = []
        for mi in range(maps):
            for corner in e.corners:
                patch = self.factory.get_matrix(
                    [self._element_at(m, corner, off) for off in e.offsets],
                    "col",
                )
                conv = patch.mul(self.weight_windows[mi])
                cols.append(conv.add(bias_vecs[mi]))
        return self.factory.get_matrix(cols, "col")


class TimingLayer(Layer):
    """Pass-through with named start/stop counters (ref TimingLayer.cs)."""

    total_time_ms: dict = {}
    n: dict = {}
    start_time: dict = {}

    def __init__(self, source=None, start_counters=(), stop_counters=()):
        super().__init__(source)
        self.start_counters = list(start_counters)
        self.stop_counters = list(stop_counters)

    @classmethod
    def reset(cls):
        cls.total_time_ms.clear()
        cls.n.clear()
        cls.start_time.clear()

    @classmethod
    def get_stats(cls, multi_lines: bool = False) -> str:
        sep = "\n" if multi_lines else "\t"
        return sep.join(
            f"{k} {cls.total_time_ms[k] / cls.n[k]:0.2f}"
            for k in cls.total_time_ms
        )

    def apply(self, m):
        now = time.time()
        for c in self.start_counters:
            TimingLayer.start_time[c] = now
        for c in self.stop_counters:
            if c in TimingLayer.start_time:
                ms = (now - TimingLayer.start_time[c]) * 1000.0
                TimingLayer.total_time_ms[c] = (
                    TimingLayer.total_time_ms.get(c, 0.0) + ms
                )
                TimingLayer.n[c] = TimingLayer.n.get(c, 0) + 1
        return m


class DebugLayer(Layer):
    """Pass-through tap invoking a callback on the flowing matrix (used by
    end-to-end oracle tests, ref `CaltechTests.cs` DebugLayer)."""

    def __init__(self, source=None, callback=None):
        super().__init__(source)
        self.callback = callback

    def apply(self, m):
        if self.callback is not None:
            self.callback(m)
        return m
