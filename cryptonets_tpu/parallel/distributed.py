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
    *,
    single_process: bool = False,
):
    """Initialize the multi-process runtime (idempotent).

    On a pod slice all three arguments are auto-detected from the TPU
    metadata and may be None (`jax.distributed.initialize()` with no
    args); on CPU/GPU clusters pass them explicitly.  Single-process
    rigs must OPT IN with `single_process=True` — it is never inferred
    from absent args, so a pod host that forgets its coordinator fails
    loudly instead of silently duplicating the whole batch.

    Idempotency is checked via `jax.distributed.is_initialized()`, which
    does NOT touch the XLA backend (calling `jax.process_count()` here
    would instantiate the backend and make a later `initialize()` raise).
    """
    if jax.distributed.is_initialized():
        return
    if single_process:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def local_record_slice(n_records: int) -> slice:
    """This host's contiguous slice of a global record batch.

    Host i gets records [i*R/H, (i+1)*R/H) — the standard data-parallel
    split.  R must divide evenly: `make_array_from_process_local_data`
    requires every host's shard consistent with the global batch
    sharding, so ragged splits would fail at assembly time with an
    opaque error.  Pad the batch (e.g. repeat the last record) to a
    multiple of `jax.process_count()` before slicing.
    """
    h, i = jax.process_count(), jax.process_index()
    if n_records % h:
        raise ValueError(
            f"record count {n_records} must be a multiple of the host "
            f"count {h} (pad the batch before slicing; uneven local "
            "shards cannot be assembled into one global batch array)"
        )
    per = n_records // h
    return slice(i * per, (i + 1) * per)


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
