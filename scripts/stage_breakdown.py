"""Per-layer wall-time breakdown for any LoLa-family network (mirrors
the reference's per-layer run log).  Each layer compiles into its own
program (nn/jit.py StagedForward), so totals run slower than the fused
single-launch bench — use this to see WHERE the fused latency goes, not
to measure it.

Usage: python scripts/stage_breakdown.py [--network LoLa] [--records 2]
       [--cpu]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--network", default="LoLa")
    ap.add_argument("--records", type=int, default=2)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    import numpy as np

    from cryptonets_tpu.data.preprocess import synthetic_mnist_records
    from cryptonets_tpu.models import lola_mnist
    from cryptonets_tpu.nn.jit import StagedForward

    t0 = time.time()
    if args.network == "CryptoNets":
        from cryptonets_tpu.models import cryptonets_mnist

        batch = int(os.environ.get("BENCH_BATCH", "8192"))
        records = synthetic_mnist_records(
            batch * args.records, seed=11
        )
        head, fac, reader = cryptonets_mnist.build(
            True, batch, records=records
        )
    else:
        records = synthetic_mnist_records(args.records, seed=11)
        head, fac, reader = lola_mnist.BUILDERS[args.network](
            True, records=records
        )
    head.prepare_network()
    print(f"# keygen+prepare: {time.time()-t0:.1f}s", file=sys.stderr)

    sfwd = StagedForward(head)
    for ri in range(args.records):
        timings: dict = {}
        t0 = time.time()
        m = sfwd(timings)
        dec = np.asarray(m.get_column(0).decrypt())
        timings["Decrypt"] = time.time() - t0 - sum(timings.values())
        tag = "warmup(compile)" if ri == 0 else "steady"
        print(f"# --- record {ri+1} ({tag}): {sum(timings.values()):.3f}s",
              file=sys.stderr)
        for k, v in timings.items():
            print(f"#   {k:<28s} {v*1000:9.1f} ms", file=sys.stderr)
    print(json.dumps({
        "network": args.network,
        "stages_ms": {k: round(v * 1000, 1) for k, v in timings.items()},
        "total_s": round(sum(timings.values()), 3),
    }))


if __name__ == "__main__":
    main()
