"""Headline benchmark: LoLa-MNIST encrypted single-image latency.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline: 2.2 s published single-image latency (BASELINE.md north star);
vs_baseline > 1 means faster than the reference.

Env knobs:
  BENCH_NETWORK = LoLa | LoLaSmall | LoLaDense | LoLaLarge | Cifar |
                   Caltech  (default LoLa: the published 2.2 s pipeline;
                   Cifar benches vs its published 740 s; Caltech vs the
                   156-234 ms README run log; LoLaSmall vs the LoLa
                   paper's 0.29 s small-network figure; LoLaDense /
                   LoLaLarge have NO published latency — vs_baseline is
                   null and the numbers are recorded for PARITY.md)
  BENCH_RECORDS = number of timed records (default 3)
  BENCH_PLATFORM = cpu to force CPU
  BENCH_FUSE = 0 to disable the fused single-launch pipeline
  BENCH_BUDGET = 1 to also report the end-of-network noise budget
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BASELINE_S = 2.2


def main():
    if os.environ.get("BENCH_PLATFORM") == "cpu":
        os.environ.setdefault(
            "XLA_FLAGS", "--xla_force_host_platform_device_count=1"
        )
        import jax

        jax.config.update("jax_platforms", "cpu")
    import numpy as np

    from cryptonets_tpu.data.preprocess import synthetic_mnist_records
    from cryptonets_tpu.models import lola_mnist
    from cryptonets_tpu.nn.jit import EncryptedForward

    network = os.environ.get("BENCH_NETWORK", "LoLa")
    n_records = int(os.environ.get("BENCH_RECORDS", "3"))
    fuse = os.environ.get("BENCH_FUSE", "1") != "0"
    if network == "Cifar":
        from cryptonets_tpu.data.preprocess import synthetic_cifar_records
        from cryptonets_tpu.models import lola_cifar

        builder = lola_cifar.build
        records = synthetic_cifar_records(n_records + 1, seed=11)
        baseline_s = 740.0  # `LolaCifarCryptoNet.cs:28-31` published
        metric = "LoLa-CIFAR encrypted single-image latency"
    elif network == "Caltech":
        from cryptonets_tpu.data.preprocess import synthetic_feature_records
        from cryptonets_tpu.models import caltech101

        def builder(encrypt, records=None):
            return caltech101.build(encrypt, records=records)

        records = synthetic_feature_records(
            n_records + 1, caltech101.N_FEATURES, seed=11
        )
        baseline_s = 0.195  # README.md:178-197 run log (156-234 ms)
        metric = "Caltech-101 encrypted single-record latency"
    else:
        builder = lola_mnist.BUILDERS[network]
        records = synthetic_mnist_records(n_records + 1, seed=11)
        # LoLa: published 2.2 s; LoLaSmall: LoLa paper's 0.29 s small
        # network; LoLaDense/LoLaLarge: no published latency exists
        baseline_s = {
            "LoLa": BASELINE_S, "LoLaSmall": 0.29,
        }.get(network)
        metric = f"{network}-MNIST encrypted single-image latency"

    # raw oracle on record 0: the timed encrypted pipeline must reproduce
    # these logits exactly (fixed-point arithmetic is deterministic) —
    # a latency number over a noise-corrupted output is worthless.
    head_r, _, _ = builder(False, records=[(l, f.copy()) for l, f in records])
    head_r.prepare_network()
    mr = head_r.get_next()
    raw0 = np.asarray(
        (mr.get_column(0) if hasattr(mr, "get_column") else mr).decrypt(),
        dtype=float,
    )

    t0 = time.time()
    head, factory, reader = builder(True, records=records)
    head.prepare_network()
    keygen_s = time.time() - t0
    print(f"# factory+keygen+prepare: {keygen_s:.1f}s", file=sys.stderr)

    fwd = EncryptedForward(head, jit=True, fuse_io=fuse)
    print(f"# fused single-launch pipeline: {fwd.fuse_io}", file=sys.stderr)
    # warm-up record: trace + compile; also the correctness gate
    t0 = time.time()
    m = fwd()
    dec0 = np.asarray(m.get_column(0).decrypt(), dtype=float)
    print(f"# warmup (compile) record: {time.time()-t0:.1f}s", file=sys.stderr)
    nshared = min(len(dec0), len(raw0))
    if not np.allclose(dec0[:nshared], raw0[:nshared], rtol=1e-9):
        print(f"# MISMATCH enc={dec0[:10]} raw={raw0[:10]}", file=sys.stderr)
        raise SystemExit("encrypted output disagrees with raw oracle")
    print("# encrypted output matches raw oracle exactly", file=sys.stderr)

    budget = None
    if os.environ.get("BENCH_BUDGET") == "1":
        from cryptonets_tpu.api.tracker import CryptoTracker

        budget = CryptoTracker.test_vector_budget(m.get_column(0), warn=False)
        print(f"# end-of-network noise budget: {budget} bits", file=sys.stderr)

    lats = []
    for _ in range(n_records):
        t0 = time.time()
        m = fwd()
        dec = m.get_column(0).decrypt()
        lats.append(time.time() - t0)
        print(f"# record latency {lats[-1]:.3f}s", file=sys.stderr)
    lat = float(np.median(lats))
    out = {
        "metric": metric,
        "value": round(lat, 4),
        "unit": "s",
        "vs_baseline": round(baseline_s / lat, 3) if baseline_s else None,
        "keygen_s": round(keygen_s, 1),
    }
    if budget is not None:
        out["final_budget_bits"] = budget
    print(json.dumps(out))


if __name__ == "__main__":
    main()
