"""Mesh construction and sharding specs for ciphertext tensors.

Ciphertext data layout is [P, C, size, k, N] (plain primes, blocks/batch,
polys, RNS limbs, coefficients):
  * `batch` mesh axis shards C — independent ciphertexts, embarrassingly
    parallel (the weak-scaling axis of BASELINE).
  * `limb` mesh axis shards k — per-limb field ops are local; FastBConv
    and key-switch accumulations become XLA collectives over ICI.

Everything goes through jit + NamedSharding (GSPMD inserts the
collectives), per the standard scaling-book recipe; no hand-written
communication.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, batch: int | None = None):
    """A (batch, limb) mesh over the first n_devices devices."""
    devs = jax.devices()
    n = n_devices or len(devs)
    devs = np.asarray(devs[:n])
    if batch is None:
        batch = max(1, n // 2) if n > 1 else 1
    limb = n // batch
    return Mesh(devs.reshape(batch, limb), ("batch", "limb"))


def ciphertext_spec(batch_axis: int = 1, limb_axis: int = 3) -> P:
    """PartitionSpec for [P, C, size, k, N] ciphertext data."""
    spec = [None] * 5
    spec[batch_axis] = "batch"
    spec[limb_axis] = "limb"
    return P(*spec)


def shard_ciphertext_data(data, mesh: Mesh):
    """Place [P, C, size, k, N] data on the mesh (C over batch, k over
    limb)."""
    return jax.device_put(
        data, NamedSharding(mesh, ciphertext_spec())
    )


def batch_sharding(mesh: Mesh, ndim: int, batch_axis: int = 1):
    spec = [None] * ndim
    spec[batch_axis] = "batch"
    return NamedSharding(mesh, P(*spec))
