"""Whole-network jit: compile the encrypted portion of a layer chain into
ONE XLA program.

The reference dispatches thousands of individual SEAL calls through thread
pools per inference; here the entire encrypted forward pass traces into a
single jitted function (layer Python runs at trace time only), so steady-
state latency is one device program launch.  This is THE structural
performance advantage of the TPU design (SURVEY.md section 7, stage 4).
"""

from __future__ import annotations

import jax

from ..api.matrix import HEMatrix
from ..api.vector import HEVector
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
    """

    def __init__(self, head: Layer, jit: bool = True):
        self.encrypt_layer, self.layers = split_at_encrypt(head)
        self.use_jit = jit
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
        self._jitted = jax.jit(forward) if self.use_jit else forward

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

    def __call__(self):
        """Pull one record through reader -> encrypt -> jitted network."""
        raw = self.reader.get_next()
        if raw is None:
            return None
        enc = self.encrypt_layer.apply(raw)
        return self.run_encrypted(enc)

    def block_until_ready(self, out: HEMatrix):
        out.vectors[0].data.block_until_ready()
        return out
