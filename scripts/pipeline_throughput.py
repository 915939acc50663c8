"""Measure layer-pipeline streaming throughput (parallel/pipeline.py).

Runs the tiny-LoLa chain as 1 stage vs S stages on the virtual CPU mesh
and reports records/sec.  On this rig all virtual devices share 2
physical cores, so the overlap ceiling is the core count, not the stage
count — the numbers demonstrate the mechanism (async cross-record
overlap), while the capability's real target is multi-chip TPU where
each stage owns its own HBM (keys sharded across stages) and compute.

Usage: python scripts/pipeline_throughput.py [--records 16] [--stages 4]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--records", type=int, default=16)
    ap.add_argument("--stages", type=int, default=4)
    ap.add_argument("--devices", type=int, default=8)
    args = ap.parse_args()

    os.environ.setdefault(
        "XLA_FLAGS",
        f"--xla_force_host_platform_device_count={args.devices}",
    )
    import jax

    jax.config.update("jax_platforms", "cpu")

    from cryptonets_tpu.parallel.dryrun import build_tiny_lola, records_for
    from cryptonets_tpu.parallel.pipeline import PipelineForward

    import json

    out = {}
    for s in (1, args.stages):
        recs = records_for(args.records + 1, seed=29)
        head, fac, reader = build_tiny_lola(encrypt=True)
        reader.set_source_records(recs)
        pipe = PipelineForward(head, n_stages=s)
        pipe.run_stream(1)  # compile + fill
        t0 = time.time()
        outs = pipe.run_stream(args.records)
        dt = time.time() - t0
        out[f"stages_{s}"] = {
            "records": len(outs),
            "records_per_sec": round(len(outs) / dt, 2),
        }
        print(f"# {s} stage(s): {len(outs)} records in {dt:.2f}s "
              f"({len(outs)/dt:.2f} rec/s)", file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
