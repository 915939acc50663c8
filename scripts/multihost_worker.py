"""Worker process for the REAL multi-host (2-process) distributed test.

Each invocation is one "host": it initializes `jax.distributed` against
a localhost coordinator, sees the GLOBAL 8-device CPU mesh (4 local + 4
remote virtual devices), encrypts ONLY its own slice of the record
batch, contributes it via `jax.make_array_from_process_local_data`
(through `parallel.distributed.global mesh` helpers), runs the tiny-LoLa
encrypted forward jitted over the (batch, limb) mesh, and checks ITS
records' decrypted outputs exactly against the Raw oracle.

Run by tests/test_multihost.py as:
    python scripts/multihost_worker.py <process_id> <num_processes> <port>

Round-3 VERDICT item 4: `parallel/distributed.py` had never executed
with >1 process (the old test mocked `jax.process_count`); this is the
real `jax.distributed.initialize` + cross-process assembly path.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(process_id: int, num_processes: int, port: int) -> None:
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    import jax

    jax.config.update("jax_platforms", "cpu")

    from cryptonets_tpu.parallel import init_multihost, make_mesh
    from cryptonets_tpu.parallel.distributed import local_record_slice

    init_multihost(
        coordinator_address=f"127.0.0.1:{port}",
        num_processes=num_processes,
        process_id=process_id,
    )
    assert jax.process_count() == num_processes, jax.process_count()
    n_global = len(jax.devices())
    assert n_global == 4 * num_processes, n_global

    import numpy as np
    import jax.numpy as jnp

    from cryptonets_tpu.parallel.dryrun import (
        build_tiny_lola,
        mesh_shardings,
        records_for,
    )
    from cryptonets_tpu.parallel.mesh import batch_sharding
    from cryptonets_tpu.api.vector import HEVector
    from cryptonets_tpu.nn.jit import EncryptedForward

    # batch axis spans hosts (process-major device order), limb stays on
    # each host's local devices — collectives over limbs never cross the
    # host boundary (the ICI-vs-DCN rule of parallel/distributed.py)
    mesh = make_mesh(n_global, batch=num_processes)

    B = 2 * num_processes
    recs = records_for(B)
    sl = local_record_slice(B)
    local_recs = recs[sl]

    # identical deterministic keygen on every host (same seed)
    head, fac, reader = build_tiny_lola(encrypt=True)
    fwd = EncryptedForward(head, jit=False)

    # encrypt ONLY this host's records
    fwd.reader.set_source_records([(l, f.copy()) for l, f in local_recs])
    encs = []
    while True:
        raw = fwd.reader.get_next()
        if raw is None:
            break
        encs.append(fwd.encrypt_layer.apply(raw))
    fwd._build(encs[0])

    sh_in = mesh_shardings(mesh)
    # one GLOBAL array per input column from process-local shards
    batched = [
        jax.make_array_from_process_local_data(
            sh_in,
            np.stack(
                [np.asarray(e.vectors[i].data) for e in encs]
            ),
        )
        for i in range(len(encs[0].vectors))
    ]

    sh_out = batch_sharding(mesh, ndim=6, batch_axis=0)
    jitted = jax.jit(
        jax.vmap(fwd._jitted),
        in_shardings=([sh_in] * len(batched),),
        out_shardings=sh_out,
    )
    outs = jitted(batched)
    jax.block_until_ready(outs)

    # pull THIS host's rows from the addressable shards (the output is
    # batch-sharded, limb-replicated, so local shards hold full rows)
    rows: dict[int, np.ndarray] = {}
    for shard in outs[0].addressable_shards:
        start = shard.index[0].start or 0
        rows[start] = np.asarray(shard.data)

    raw_head, _, raw_reader = build_tiny_lola(encrypt=False)
    raw_reader.set_source_records([(l, f.copy()) for l, f in recs])
    meta = fwd._capture["meta"]
    dim, sc, f, sg = meta[0]
    checked = 0
    for b in range(B):
        raw_out = raw_head.get_next().get_column(0).decrypt()
        if not (sl.start <= b < sl.stop):
            continue
        chunk_start = max(k for k in rows if k <= b)
        d = rows[chunk_start][b - chunk_start]
        hv = HEVector(fac, data=jnp.asarray(d), dim=dim, scale=sc, fmt=f,
                      is_signed=sg)
        enc_out = hv.decrypt()
        np.testing.assert_allclose(
            np.asarray(enc_out[: len(raw_out)], float),
            np.asarray(raw_out, float),
            atol=1e-9,
        )
        checked += 1
    assert checked == len(local_recs), (checked, len(local_recs))
    print(
        f"MULTIHOST-OK p{process_id}/{num_processes}: mesh="
        f"{dict(mesh.shape)}, {checked} local records exact vs raw",
        flush=True,
    )


if __name__ == "__main__":
    main(int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3]))
