"""Weak-scaling measurement over the (batch, limb) mesh (BASELINE target:
>= 80% efficiency on ciphertext-batched throughput at 2 hosts; this rig
has one TPU chip, so the mesh scaling curve runs on the virtual CPU mesh
and the single-chip batch-scaling curve runs on the real TPU).

Modes:
  --mesh   : records/s of the tiny-LoLa network at mesh batch sizes
             1/2/4/8 on the virtual CPU mesh; efficiency(B) =
             throughput(B) / (B * throughput(1)).
  --batch  : single-device record-batch scaling (vmap, no mesh): the
             amortization curve that multi-chip DP inherits.

Usage: python scripts/weak_scaling.py [--mesh] [--batch] [--cpu]
       [--repeat 5]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _throughput(jitted, placed, repeat: int, B: int) -> float:
    import jax

    jax.block_until_ready(jitted(placed))  # compile
    t0 = time.time()
    for _ in range(repeat):
        out = jitted(placed)
    jax.block_until_ready(out)
    return repeat * B / (time.time() - t0)


def run_mesh_curve(repeat: int):
    import jax

    from cryptonets_tpu.parallel import make_mesh
    from cryptonets_tpu.parallel.dryrun import (
        batched_encrypted_forward,
        build_tiny_lola,
        mesh_shardings,
        records_for,
    )

    n_dev = len(jax.devices())
    head, fac, reader = build_tiny_lola(encrypt=True)
    results = {}
    B = 1
    while B <= n_dev:
        recs = records_for(B)
        vfwd, batched, fwd = batched_encrypted_forward(head, recs)
        mesh = make_mesh(B, batch=B)  # all B devices on the batch axis
        sh = mesh_shardings(mesh)
        jitted = jax.jit(
            vfwd, in_shardings=([sh] * len(batched),), out_shardings=sh
        )
        placed = [jax.device_put(d, sh) for d in batched]
        results[B] = _throughput(jitted, placed, repeat, B)
        eff = results[B] / (B * results[1])
        print(
            f"# mesh batch={B}: {results[B]:.2f} rec/s "
            f"efficiency={eff:.3f}",
            file=sys.stderr,
        )
        B *= 2
    top = max(results)
    return {
        "metric": f"weak-scaling efficiency @ {top} devices (DP batch)",
        "value": round(results[top] / (top * results[1]), 4),
        "unit": "fraction",
        "vs_baseline": round(
            results[top] / (top * results[1]) / 0.80, 3
        ),
        "throughput_rec_s": {str(k): round(v, 2) for k, v in results.items()},
    }


def run_batch_curve(repeat: int):
    import jax

    from cryptonets_tpu.parallel.dryrun import (
        batched_encrypted_forward,
        build_tiny_lola,
        records_for,
    )

    head, fac, reader = build_tiny_lola(encrypt=True)
    results = {}
    for B in (1, 2, 4, 8):
        recs = records_for(B)
        vfwd, batched, fwd = batched_encrypted_forward(head, recs)
        jitted = jax.jit(vfwd)
        results[B] = _throughput(jitted, batched, repeat, B)
        print(
            f"# single-device batch={B}: {results[B]:.2f} rec/s "
            f"({1000.0 * B / results[B] / B:.1f} ms/rec)",
            file=sys.stderr,
        )
    return {
        "metric": "single-device record-batch scaling (8 vs 1)",
        "value": round(results[8] / results[1], 3),
        "unit": "x",
        "throughput_rec_s": {str(k): round(v, 2) for k, v in results.items()},
    }


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--mesh", action="store_true")
    ap.add_argument("--batch", action="store_true")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--repeat", type=int, default=5)
    args = ap.parse_args()
    if args.cpu:
        os.environ.setdefault(
            "XLA_FLAGS", "--xla_force_host_platform_device_count=8"
        )
        import jax

        jax.config.update("jax_platforms", "cpu")
    if args.mesh:
        print(json.dumps(run_mesh_curve(args.repeat)))
    if args.batch:
        print(json.dumps(run_batch_curve(args.repeat)))


if __name__ == "__main__":
    main()
