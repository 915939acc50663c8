"""Multi-host (multi-process) scaling: `jax.distributed` initialization
and host-local data feeding for ciphertext batches.

The reference is a single-process C# program whose only scale-out axis is
a thread pool (SURVEY.md section 2.5); this module is the TPU-pod analog.
Design (scaling-book recipe):

  * One JAX process per host, `jax.distributed.initialize` against a
    coordinator; all hosts then see the GLOBAL device list and build the
    same (batch, limb) mesh (`mesh.make_mesh`) over it.
  * The ciphertext-record batch axis shards over `batch` spanning hosts:
    records are embarrassingly parallel, so cross-host traffic rides DCN
    only at decrypt/gather time.  Each host encodes + encrypts only its
    own records and contributes them via
    `jax.make_array_from_process_local_data` — no host ever materializes
    the global batch.
  * The RNS `limb` axis should stay WITHIN a host's ICI domain (keep
    `limb` as the minor mesh axis over the host's local chips): key
    switching and FastBConv reduce over limbs every op, and those
    collectives must ride ICI, not DCN.  `make_mesh`'s device order
    (jax.devices() is process-major) gives exactly this layout when
    `batch >= n_hosts`.

Single-host rigs (this one) exercise the identical code path with
`n_processes=1`; the tests pin it and `scripts/weak_scaling.py` measures
the batch-axis efficiency the BASELINE targets (>= 80% at 2 hosts).
"""

from __future__ import annotations

import jax
import numpy as np

from .mesh import batch_sharding, make_mesh


def init_multihost(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
):
    """Initialize the multi-process runtime (idempotent).

    On a pod slice all three arguments are auto-detected from the TPU
    metadata and may be None; on CPU/GPU clusters pass them explicitly
    (ref behavior being replaced: none — the reference cannot span
    hosts at all).
    """
    if jax.process_count() > 1:
        return  # already initialized
    if coordinator_address is None and num_processes in (None, 1):
        return  # single-process rig: nothing to do, same code path
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def local_record_slice(n_records: int) -> slice:
    """This host's contiguous slice of a global record batch.

    Records are dealt round-robin-contiguously: host i gets records
    [i*ceil(R/H), ...), the standard data-parallel split.
    """
    h, i = jax.process_count(), jax.process_index()
    per = -(-n_records // h)
    return slice(i * per, min(n_records, (i + 1) * per))


def global_ciphertext_batch(local_data, mesh=None, batch_axis: int = 1):
    """Assemble a GLOBAL jax.Array for ciphertext data [P, C, size, k, N]
    from each host's process-local records (C = this host's records).

    Every host passes only its own slice; the result behaves as the full
    array under jit with the mesh's `batch` sharding, and XLA keeps each
    host's records on its own chips.
    """
    mesh = mesh or make_mesh()
    local = np.asarray(local_data)
    sharding = batch_sharding(mesh, local.ndim, batch_axis)
    if jax.process_count() == 1:
        return jax.device_put(local, sharding)
    return jax.make_array_from_process_local_data(sharding, local)
