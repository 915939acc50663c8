"""Multi-chip validation harness: a REAL LoLa-shaped encrypted network
(LLConvReader -> Encrypt -> LLPoolLayer -> Vectorize -> Square ->
LLDenseLayer, the LoLaSmall topology of `models/lola_mnist.py:119-154`)
at reduced ring degree, vmapped over a ciphertext-record batch and jitted
over a (batch, limb) jax.sharding.Mesh.

The record axis shards over `batch` (data parallel — the weak-scaling
axis), the RNS limb axis over `limb` (tensor parallel: NTT stages and
key-switch inner products become XLA collectives over ICI; the hybrid
key switch's Q -> Q*P base extension forces a reshard, which GSPMD
inserts automatically).

Used by __graft_entry__.dryrun_multichip (driver validation) and
scripts/weak_scaling.py (throughput-efficiency measurement).
"""

from __future__ import annotations

import numpy as np


def build_tiny_lola(encrypt: bool = True, n: int = 256, seed: int = 3):
    """LoLaSmall-topology network at ring degree n with hybrid key
    switching (n_special=2, like the lola_small preset)."""
    from ..api import CrtBfvFactory, RawFactory
    from ..crypto.primes import ntt_primes
    from ..nn import (
        EncryptLayer,
        LLConvReader,
        LLDenseLayer,
        LLPoolLayer,
        LLVectorizeLayer,
        SquareActivation,
    )

    rng = np.random.default_rng(seed)
    side = 8
    geo = dict(
        input_shape=[side, side],
        kernel_shape=[3, 3],
        upper_padding=[1, 1],
        stride=[2, 2],
    )
    fac = (
        CrtBfvFactory(
            plain_primes=ntt_primes(n, 17, 2),
            n=n,
            coeff_modulus=ntt_primes(n, 30, 4),
            dbc=16,
            seed=seed,
            n_special=2,
        )
        if encrypt
        else RawFactory(n)
    )
    reader = LLConvReader(
        RawFactory(n), normalization_factor=1.0, scale=2.0, **geo
    )
    enc = EncryptLayer(reader)
    enc.factory = fac
    maps = 2
    conv = LLPoolLayer(
        enc,
        map_count=[maps, 1],
        weights=rng.integers(-2, 3, maps * 9).astype(float),
        bias=rng.integers(-2, 3, maps).astype(float),
        weights_scale=2.0,
        **geo,
    )
    vec = LLVectorizeLayer(conv)
    act = SquareActivation(vec)
    feat = maps * len(conv.engine.corners)
    head = LLDenseLayer(
        act,
        weights=rng.integers(-2, 3, 4 * feat).astype(float),
        bias=rng.integers(-2, 3, 4).astype(float),
        weights_scale=2.0,
        input_format="dense",
    )
    head.prepare_network()
    return head, fac, reader


def records_for(n_records: int, side: int = 8, seed: int = 11):
    rng = np.random.default_rng(seed)
    return [
        (0, rng.integers(0, 4, side * side).astype(float))
        for _ in range(n_records)
    ]


def batched_encrypted_forward(head, recs):
    """Encrypt `recs` and return (forward_fn, batched_datas, out_meta_fn):
    forward_fn maps a list of [B, P, C, s, k, N] arrays (one per input
    column) to the output column datas, vmapped over the record axis."""
    import jax
    import jax.numpy as jnp

    from ..nn.jit import EncryptedForward

    fwd = EncryptedForward(head, jit=False)
    fwd.reader.set_source_records([(l, f.copy()) for l, f in recs])
    encs = []
    while True:
        raw = fwd.reader.get_next()
        if raw is None:
            break
        encs.append(fwd.encrypt_layer.apply(raw))
    fwd._build(encs[0])
    batched = [
        jnp.stack([e.vectors[i].data for e in encs])
        for i in range(len(encs[0].vectors))
    ]
    vforward = jax.vmap(fwd._jitted)
    return vforward, batched, fwd


def mesh_shardings(mesh, ndim: int = 6, batch_axis: int = 0, limb_axis: int = 4):
    """NamedSharding for [B, P, C, size, k, N] batched ciphertext data."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    spec = [None] * ndim
    spec[batch_axis] = "batch"
    spec[limb_axis] = "limb"
    return NamedSharding(mesh, P(*spec))
