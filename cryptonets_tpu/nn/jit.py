"""Whole-network jit: compile the encrypted portion of a layer chain into
ONE XLA program.

The reference dispatches thousands of individual SEAL calls through thread
pools per inference; here the entire encrypted forward pass traces into a
single jitted function (layer Python runs at trace time only), so steady-
state latency is one device program launch.  This is THE structural
performance advantage of the TPU design (SURVEY.md section 7, stage 4).
"""

from __future__ import annotations

from ..api.matrix import HEMatrix
from ..api.vector import HEVector
from ..utils.hoist import hoist_jit
from .layers import EncryptLayer
from .network import Layer


def split_at_encrypt(head: Layer):
    """Walk source links from `head` down to the EncryptLayer; returns
    (encrypt_layer, [layers above it, in application order])."""
    chain = []
    p = head
    while p is not None and not isinstance(p, EncryptLayer):
        chain.append(p)
        p = p.source
    if p is None:
        raise ValueError("no EncryptLayer in network")
    return p, list(reversed(chain))


class EncryptedForward:
    """Runs reader+encrypt host-side, the rest as one jitted program.

    Usage:
        fwd = EncryptedForward(head)   # after head.prepare_network()
        out_matrix = fwd()             # pulls one record end to end

    With fuse_io=True (and a factory whose plain primes all fit uint32)
    the ENTIRE record pipeline — slot encode, RLWE encrypt, the network,
    gamma decrypt and slot decode — compiles into ONE device program, so a
    record costs a single launch; the host only index-maps input slots and
    CRT-joins the decoded outputs.  The computation is identical to the
    3-launch path (same kernels, same ciphertexts); only launch/transfer
    overhead is removed.
    """

    def __init__(self, head: Layer, jit: bool = True, fuse_io: bool = False):
        self.encrypt_layer, self.layers = split_at_encrypt(head)
        self.use_jit = jit
        fac = self.encrypt_layer.factory
        self.fuse_io = bool(
            fuse_io
            and jit
            and getattr(fac, "_device_encode", False)
            and getattr(fac, "_device_decode", False)
        )
        self._jitted = None
        self._out_meta = None
        self._in_meta = None

    @property
    def reader(self):
        p = self.encrypt_layer
        while p.source is not None:
            p = p.source
        return p

    def _build(self, template: HEMatrix):
        fac = self.encrypt_layer.factory
        in_meta = [(v.dim, v.scale, v.fmt, v.is_signed) for v in template.vectors]
        fmt = template.fmt
        capture = {}

        def forward(datas):
            vecs = [
                HEVector(
                    fac, data=d, dim=dim, scale=sc, fmt=f, is_signed=sg
                )
                for d, (dim, sc, f, sg) in zip(datas, in_meta)
            ]
            m = HEMatrix(fac, vecs, fmt)
            for layer in self.layers:
                m = layer.apply(m)
            capture["meta"] = [
                (v.dim, v.scale, v.fmt, v.is_signed) for v in m.vectors
            ]
            capture["fmt"] = m.fmt
            return [v.data for v in m.vectors]

        self._in_meta = in_meta
        self._capture = capture
        # hoist_jit (not jax.jit): keys/masks/weight forms become program
        # ARGUMENTS, not HLO constants — the compiled program is small and
        # key-independent (round-2 VERDICT item 1: the HTTP 413 regression
        # was ~240 MB of switch keys baked into the relay-shipped HLO).
        self._jitted = hoist_jit(forward) if self.use_jit else forward

    def run_encrypted(self, enc_matrix: HEMatrix) -> HEMatrix:
        if self._jitted is None or [
            (v.dim, v.scale, v.fmt, v.is_signed) for v in enc_matrix.vectors
        ] != self._in_meta:
            self._build(enc_matrix)
        datas = [v.data for v in enc_matrix.vectors]
        out_datas = self._jitted(datas)
        fac = self.encrypt_layer.factory
        vecs = [
            HEVector(fac, data=d, dim=dim, scale=sc, fmt=f, is_signed=sg)
            for d, (dim, sc, f, sg) in zip(out_datas, self._capture["meta"])
        ]
        return HEMatrix(fac, vecs, self._capture["fmt"])

    # ------------------------------------------------- fused one-launch path
    def slot_bufs(self, raw):
        """Host side of the fused pipeline: RawMatrix -> (index-mapped
        slot buffers [P, V*C, n], (V, C, dim, scale)).  Shared by the
        single-record path and bench.py's BENCH_VMAP record batching."""
        import numpy as np

        fac = self.encrypt_layer.factory
        vecs = np.asarray(raw.m, dtype=np.float64).T  # [V, dim] scaled ints
        V, dim = vecs.shape
        C = max(1, -(-dim // fac.n))
        padded = np.zeros((V, C * fac.n), np.int64)
        padded[:, :dim] = np.round(vecs).astype(np.int64)
        bufs = fac.encode_bufs(padded.reshape(V * C, fac.n))
        return bufs, (V, C, dim, float(raw.scale))

    def fused_record_fn(self, V: int, C: int, dim: int, scale: float,
                        capture: dict | None = None):
        """Traceable single-record fused forward: fn(bufs, rng) ->
        (output ct datas, decoded slot tensors).  Device slot encode +
        RLWE encrypt + network + gamma decrypt + slot decode in one
        traced body; vmap it for record batching."""
        fac = self.encrypt_layer.factory
        if capture is None:
            capture = {}

        def forward(bufs, rng):
            # bufs: [P, V*C, n] index-mapped slot residues
            data = fac._encrypt_all_dev(bufs, rng)  # [P, V*C, 2, k, N]
            data = data.reshape(fac.P, V, C, *data.shape[2:])
            vecs = [
                HEVector(
                    fac, data=data[:, i], dim=dim, scale=scale, fmt="dense"
                )
                for i in range(V)
            ]
            m = HEMatrix(fac, vecs, "col")
            for layer in self.layers:
                m = layer.apply(m)
            capture["meta"] = [
                (v.dim, v.scale, v.fmt, v.is_signed) for v in m.vectors
            ]
            capture["fmt"] = m.fmt
            return (
                [v.data for v in m.vectors],
                [fac._decrypt_decode_all(v.data) for v in m.vectors],
            )

        return forward, capture

    def _build_fused(self, V: int, C: int, dim: int, scale: float):
        forward, capture = self.fused_record_fn(V, C, dim, scale)
        self._in_meta = ("fused", V, C, dim, scale)
        self._capture = capture
        self._jitted = hoist_jit(forward)

    def _run_fused(self, raw) -> HEMatrix:
        fac = self.encrypt_layer.factory

        bufs, (V, C, dim, scale) = self.slot_bufs(raw)
        key = ("fused", V, C, dim, scale)
        if self._jitted is None or self._in_meta != key:
            self._build_fused(V, C, dim, scale)
        out_datas, out_slots = self._jitted(bufs, fac.fresh_key())
        out_vecs = []
        for d, s, (vdim, vsc, vf, vsg) in zip(
            out_datas, out_slots, self._capture["meta"]
        ):
            hv = HEVector(
                fac, data=d, dim=vdim, scale=vsc, fmt=vf, is_signed=vsg
            )
            hv._dec_slots = s
            out_vecs.append(hv)
        return HEMatrix(fac, out_vecs, self._capture["fmt"])

    def __call__(self):
        """Pull one record through reader -> encrypt -> jitted network."""
        raw = self.reader.get_next()
        if raw is None:
            return None
        if self.fuse_io:
            return self._run_fused(raw)
        enc = self.encrypt_layer.apply(raw)
        return self.run_encrypted(enc)

    def block_until_ready(self, out: HEMatrix):
        out.vectors[0].data.block_until_ready()
        return out


class StagedForward:
    """Per-layer jitted execution for stage-timing breakdowns.

    Mirrors the reference's per-layer run log (`README.md:84-94`: Encrypt/
    Conv/Square/Dense wall times): each layer compiles into its OWN
    program and is synchronized (`block_until_ready`) before the next, so
    per-stage wall times are honest.  Slower than `EncryptedForward` (one
    launch + sync per layer instead of one per record) — use for
    measurement, not production.
    """

    def __init__(self, head: Layer):
        self.encrypt_layer, self.layers = split_at_encrypt(head)
        self._progs = None
        self._built_meta = None

    def _build(self, template: HEMatrix):
        fac = self.encrypt_layer.factory
        self._progs = []
        in_meta = [(v.dim, v.scale, v.fmt, v.is_signed) for v in template.vectors]
        fmt = template.fmt
        # remember the template meta so later records that differ in
        # (dim, scale, fmt) trigger a rebuild instead of silently reusing
        # stale captured metadata (EncryptedForward.run_encrypted does
        # the same check)
        self._built_meta = (list(in_meta), fmt)
        for layer in self.layers:
            capture = {}

            def forward(datas, _layer=layer, _in=tuple(in_meta), _fmt=fmt,
                        _cap=capture):
                vecs = [
                    HEVector(fac, data=d, dim=dim, scale=sc, fmt=f, is_signed=sg)
                    for d, (dim, sc, f, sg) in zip(datas, _in)
                ]
                m = _layer.apply(HEMatrix(fac, vecs, _fmt))
                _cap["meta"] = [
                    (v.dim, v.scale, v.fmt, v.is_signed) for v in m.vectors
                ]
                _cap["fmt"] = m.fmt
                return [v.data for v in m.vectors]

            jitted = hoist_jit(forward)
            self._progs.append((layer, jitted, capture))
            # run one real call to populate capture (compile happens here)
            out = jitted([v.data for v in template.vectors])
            vecs = [
                HEVector(fac, data=d, dim=dim, scale=sc, fmt=f, is_signed=sg)
                for d, (dim, sc, f, sg) in zip(out, capture["meta"])
            ]
            template = HEMatrix(fac, vecs, capture["fmt"])
            in_meta = capture["meta"]
            fmt = capture["fmt"]
        return template

    def __call__(self, timings: dict | None = None):
        """Pull one record; if `timings` is given, record per-stage wall
        seconds into it under layer class names (Encrypt/Decrypt included)."""
        import time as _time

        import jax

        raw = self.reader.get_next()
        if raw is None:
            return None
        t0 = _time.time()
        enc = self.encrypt_layer.apply(raw)
        jax.block_until_ready([v.data for v in enc.vectors])
        if timings is not None:
            timings["Encrypt"] = timings.get("Encrypt", 0.0) + _time.time() - t0
        enc_meta = (
            [(v.dim, v.scale, v.fmt, v.is_signed) for v in enc.vectors],
            enc.fmt,
        )
        if self._progs is None or self._built_meta != enc_meta:
            self._build(enc)
        fac = self.encrypt_layer.factory
        m = enc
        for i, (layer, jitted, capture) in enumerate(self._progs):
            t0 = _time.time()
            out = jitted([v.data for v in m.vectors])
            jax.block_until_ready(out)
            name = f"{i}:{type(layer).__name__}"
            if timings is not None:
                timings[name] = timings.get(name, 0.0) + _time.time() - t0
            vecs = [
                HEVector(fac, data=d, dim=dim, scale=sc, fmt=f, is_signed=sg)
                for d, (dim, sc, f, sg) in zip(out, capture["meta"])
            ]
            m = HEMatrix(fac, vecs, capture["fmt"])
        return m

    @property
    def reader(self):
        p = self.encrypt_layer
        while p.source is not None:
            p = p.source
        return p
