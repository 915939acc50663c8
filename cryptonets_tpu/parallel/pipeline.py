"""Layer-pipeline parallelism: stage the encrypted layer chain across
devices.

The reference has NO pipeline axis (layers run strictly sequentially
through `GetNext`, SURVEY.md section 2.5); this is the TPU-pod analog:
the encrypted portion of a network is split into S contiguous segments,
each compiled into its own program PINNED to one device (its weights,
masks and switch keys live there permanently — `hoist_jit(device=...)`),
and records stream through the chain.  JAX dispatch is asynchronous, so
once record b's segment-s output is submitted, the host immediately
submits record b+1 to segment s-1: device s computes while device s-1
computes the next record — classic GPipe-style streaming without
microbatch bubbles beyond fill/drain.

Keys are the dominant per-stage state (~hundreds of MB for the big
presets).  A pipeline stage only holds the key material its own
segment's programs reference, so pipelining also SHARDS the key set
across device memories — the reason the reference-scale networks with
per-layer Galois-key working sets can outgrow a single chip's HBM.

Use `PipelineForward(head, n_stages=...)` like `EncryptedForward`; use
`run_stream(n)` to pull n records with cross-record overlap.
"""

from __future__ import annotations

import jax

from ..api.matrix import HEMatrix
from ..api.vector import HEVector
from ..utils.hoist import hoist_jit
from ..nn.jit import split_at_encrypt


class PipelineForward:
    """Per-segment jitted execution, one device per segment."""

    def __init__(self, head, n_stages: int | None = None, devices=None):
        self.encrypt_layer, self.layers = split_at_encrypt(head)
        if devices is None:
            devices = jax.devices()
        S = n_stages or min(len(devices), len(self.layers))
        assert 1 <= S <= len(self.layers), (S, len(self.layers))
        assert S <= len(devices), f"{S} stages > {len(devices)} devices"
        # contiguous split, near-equal layer counts
        base, extra = divmod(len(self.layers), S)
        groups = []
        i = 0
        for s in range(S):
            take = base + (1 if s < extra else 0)
            groups.append(self.layers[i: i + take])
            i += take
        self.groups = groups
        self.devices = list(devices[:S])
        self._progs = None
        self._built_meta = None

    @property
    def reader(self):
        p = self.encrypt_layer
        while p.source is not None:
            p = p.source
        return p

    def _build(self, template: HEMatrix):
        fac = self.encrypt_layer.factory
        self._progs = []
        in_meta = [
            (v.dim, v.scale, v.fmt, v.is_signed) for v in template.vectors
        ]
        fmt = template.fmt
        self._built_meta = (list(in_meta), fmt)
        for group, dev in zip(self.groups, self.devices):
            capture: dict = {}

            def forward(datas, _group=group, _in=tuple(in_meta),
                        _fmt=fmt, _cap=capture):
                vecs = [
                    HEVector(fac, data=d, dim=dim, scale=sc, fmt=f,
                             is_signed=sg)
                    for d, (dim, sc, f, sg) in zip(datas, _in)
                ]
                m = HEMatrix(fac, vecs, _fmt)
                for layer in _group:
                    m = layer.apply(m)
                _cap["meta"] = [
                    (v.dim, v.scale, v.fmt, v.is_signed) for v in m.vectors
                ]
                _cap["fmt"] = m.fmt
                return [v.data for v in m.vectors]

            jitted = hoist_jit(forward, device=dev)
            # one real call to populate capture (compiles here)
            out = jitted([v.data for v in template.vectors])
            self._progs.append((jitted, capture, dev))
            vecs = [
                HEVector(fac, data=d, dim=dim, scale=sc, fmt=f, is_signed=sg)
                for d, (dim, sc, f, sg) in zip(out, capture["meta"])
            ]
            template = HEMatrix(fac, vecs, capture["fmt"])
            in_meta = capture["meta"]
            fmt = capture["fmt"]
        return template

    def _submit(self, enc: HEMatrix):
        """Push one encrypted record through all segments WITHOUT
        blocking; returns the output HEMatrix (async device values)."""
        fac = self.encrypt_layer.factory
        datas = [v.data for v in enc.vectors]
        for jitted, capture, _dev in self._progs:
            datas = jitted(datas)
        vecs = [
            HEVector(fac, data=d, dim=dim, scale=sc, fmt=f, is_signed=sg)
            for d, (dim, sc, f, sg) in zip(datas, capture["meta"])
        ]
        return HEMatrix(fac, vecs, capture["fmt"])

    def _next_encrypted(self):
        raw = self.reader.get_next()
        if raw is None:
            return None
        enc = self.encrypt_layer.apply(raw)
        meta = (
            [(v.dim, v.scale, v.fmt, v.is_signed) for v in enc.vectors],
            enc.fmt,
        )
        if self._progs is None or self._built_meta != meta:
            self._build(enc)
        return enc

    def __call__(self):
        enc = self._next_encrypted()
        return None if enc is None else self._submit(enc)

    def run_stream(self, n_records: int) -> list:
        """Submit up to n records back-to-back (fill the pipeline), then
        block.  Cross-record overlap comes from JAX's async dispatch:
        each device works on its queued segment while the host submits
        the next record to the earlier stages."""
        outs = []
        for _ in range(n_records):
            out = self()
            if out is None:
                break
            outs.append(out)
        for o in outs:
            jax.block_until_ready([v.data for v in o.vectors])
        return outs
