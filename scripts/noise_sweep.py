"""Seed-sweep characterization of the end-of-network noise budget.

Round-3 VERDICT item 6: the `lola` preset's final budget was known only
at a handful of seeds (dbc=16: 0-5 bits with one observed exhaustion;
dbc=12: 8 bits at the same failing seed).  The driver bench gates on
exact raw agreement, so ONE unlucky record seed makes it fail outright.
This sweep runs many records (fresh data + fresh encryption randomness
each) through the encrypted network on CPU, records the final invariant
noise budget per record, and prints a histogram + worst case, so the
preset's parameters can be chosen with a measured worst-case margin.

Usage: python scripts/noise_sweep.py [--network LoLa] [--records 100]
       [--dbc 12] [--out bench_data/noise_sweep_lola.json]
"""

from __future__ import annotations

import argparse
import collections
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--network", default="LoLa")
    ap.add_argument("--records", type=int, default=100)
    ap.add_argument("--dbc", type=int, default=None,
                    help="override the preset's key-switch digit width")
    ap.add_argument("--seed", type=int, default=101)
    ap.add_argument("--out", default=None)
    ap.add_argument("--tpu", action="store_true",
                    help="run on the default (TPU) platform instead of CPU")
    args = ap.parse_args()

    if not args.tpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    import numpy as np

    from cryptonets_tpu.api.tracker import CryptoTracker
    from cryptonets_tpu.data.preprocess import synthetic_mnist_records
    from cryptonets_tpu.models import lola_mnist
    from cryptonets_tpu.nn.jit import EncryptedForward

    records = synthetic_mnist_records(args.records, seed=args.seed)
    overrides = {}
    if args.dbc is not None:
        overrides["dbc"] = args.dbc

    head_r, _, _ = lola_mnist.BUILDERS[args.network](
        False, records=[(l, f.copy()) for l, f in records]
    )
    head_r.prepare_network()

    if overrides:
        import cryptonets_tpu.models.presets as presets

        if args.network in ("LoLa", "LoLaBsgs"):
            # BUILDERS['LoLa'] is now the BSGS pipeline, which passes
            # ks_alpha=1 explicitly to make_factory — builder kwargs
            # beat CONFIGS edits, so a --dbc override would be INERT
            # (hybrid KS ignores dbc) and the sweep would silently
            # measure nothing.  Digit-width sweeps belong to the
            # reference packing.
            sys.exit(
                "--dbc is inert for the BSGS 'LoLa' pipeline "
                "(P-less RNS key switching); sweep --network "
                "LoLaPacked for digit-width characterization"
            )
        name = {"LoLaPacked": "lola",
                "LoLaSmall": "lola_small",
                "LoLaDense": "lola_dense", "LoLaLarge": "lola_large"}[
            args.network]
        base = dict(presets.CONFIGS[name])
        base.update(overrides)
        presets.CONFIGS[name] = base
    head, fac, reader = lola_mnist.BUILDERS[args.network](
        True, records=records
    )
    head.prepare_network()
    dbc_used = fac.params[0].dbc
    print(f"# dbc={dbc_used}, primes={fac.plain_primes}, "
          f"k={len(fac.coeff_modulus)}", file=sys.stderr)

    fwd = EncryptedForward(head, jit=True, fuse_io=True)
    budgets = []
    mismatches = 0
    t_start = time.time()
    for i in range(args.records):
        m = fwd()
        if m is None:
            break
        col = m.get_column(0)
        raw = np.asarray(head_r.get_next().get_column(0).decrypt(), float)
        dec = np.asarray(col.decrypt(), float)
        ok = np.allclose(dec[: len(raw)], raw, rtol=1e-9)
        mismatches += 0 if ok else 1
        b = CryptoTracker.test_vector_budget(col, warn=False)
        budgets.append(int(b))
        if i % 10 == 0 or not ok:
            print(f"# [{time.time()-t_start:7.1f}s] record {i}: "
                  f"budget {b} bits, exact={ok}", file=sys.stderr)
    hist = collections.Counter(budgets)
    out = {
        "network": args.network,
        "dbc": dbc_used,
        "records": len(budgets),
        "min_budget_bits": min(budgets),
        "median_budget_bits": float(np.median(budgets)),
        "max_budget_bits": max(budgets),
        "mismatches": mismatches,
        "histogram": {str(k): v for k, v in sorted(hist.items())},
    }
    print(json.dumps(out))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
