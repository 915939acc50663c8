"""SEAL-parity evidence for the 31-bit-limb re-parameterization
(round-1 VERDICT item 5): for every model,

1. run the Raw oracle with the global max-magnitude tracker and report
   the peak scaled message magnitude in bits — checkable against the
   reference's published numbers (39 bits for LoLaSmall,
   `LoLaCryptonets.cs:290`; 78.55+1 bits for CIFAR,
   `LolaCifarCryptoNet.cs:28-30`) and against the preset's plain-modulus
   capacity (sum of plain-prime widths);
2. optionally (--encrypted) run one encrypted record and report the
   end-of-network invariant noise budget (headroom > 0 == the chain is
   adequate, the parity criterion SEAL itself uses).

Usage: python scripts/parity_evidence.py [model ...] [--encrypted]
       [--tpu]   (default backend: CPU)
Models: basic lola lola_small lola_dense lola_large cryptonets cifar
        caltech
"""

from __future__ import annotations

import argparse
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ALL = [
    "basic", "lola", "lola_small", "lola_dense", "lola_large",
    "cryptonets", "cifar", "caltech",
]

# reference-published peak message magnitudes (bits), where stated
REF_BITS = {"lola_small": 39.0, "cifar": 78.55 + 1}


def build(model, encrypt):
    from cryptonets_tpu.data.preprocess import (
        synthetic_cifar_records,
        synthetic_feature_records,
        synthetic_mnist_records,
    )
    from cryptonets_tpu.models import (
        caltech101,
        cryptonets_mnist,
        lola_cifar,
        lola_mnist,
    )

    if model in ("lola", "lola_small", "lola_dense", "lola_large"):
        name = {
            "lola": "LoLa", "lola_small": "LoLaSmall",
            "lola_dense": "LoLaDense", "lola_large": "LoLaLarge",
        }[model]
        recs = synthetic_mnist_records(1, seed=31)
        return lola_mnist.BUILDERS[name](encrypt, records=recs)
    if model == "cryptonets":
        recs = synthetic_mnist_records(4, seed=31)
        return cryptonets_mnist.build(encrypt, batch_size=4, records=recs)
    if model == "cifar":
        recs = synthetic_cifar_records(1, seed=31)
        return lola_cifar.build(encrypt, records=recs)
    if model == "caltech":
        recs = synthetic_feature_records(1, caltech101.N_FEATURES, seed=31)
        return caltech101.build(encrypt, records=recs)
    raise SystemExit(f"unknown model {model}")


def preset_of(model):
    return {
        "basic": "default", "lola": "lola", "lola_small": "lola_small",
        "lola_dense": "lola_dense", "lola_large": "lola_large",
        "cryptonets": "cryptonets", "cifar": "cifar", "caltech": "caltech",
    }[model]


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("models", nargs="*", default=None)
    ap.add_argument("--encrypted", action="store_true",
                    help="also run encrypted + report final noise budget")
    ap.add_argument("--tpu", action="store_true")
    args = ap.parse_args()
    if not args.tpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    import numpy as np  # noqa: F401

    from cryptonets_tpu.api.raw import RawVector
    from cryptonets_tpu.api.tracker import CryptoTracker
    from cryptonets_tpu.models.presets import CONFIGS

    models = args.models or ALL
    print(f"{'model':12s} {'t bits':>7s} {'msg bits':>9s} {'ref':>6s} "
          f"{'headroom':>9s}  end budget")
    for model in models:
        if model == "basic":
            # basic example: interactive op demo, no network; skip the
            # magnitude row (its ops are covered by utils/budget.py)
            continue
        cfg = CONFIGS[preset_of(model)]
        t_bits = sum(p.bit_length() for p in cfg["plain_primes"])
        RawVector.max_tracker.reset()
        head, fac, reader = build(model, False)
        head.prepare_network()
        m = head.get_next()
        col = m.get_column(0) if hasattr(m, "get_column") else m
        col.decrypt()
        msg_bits = math.log2(max(RawVector.max_tracker.value, 1.0))
        ref = REF_BITS.get(model)
        budget = ""
        if args.encrypted:
            t0 = time.time()
            CryptoTracker.reset()
            head, fac, reader = build(model, True)
            head.prepare_network()
            m = head.get_next()
            col = m.get_column(0) if hasattr(m, "get_column") else m
            b = CryptoTracker.test_vector_budget(col, warn=False)
            col.decrypt()
            budget = f"{b} bits ({time.time()-t0:.0f}s)"
        print(
            f"{model:12s} {t_bits:7d} {msg_bits:9.2f} "
            f"{('%.1f' % ref) if ref else '-':>6s} "
            f"{t_bits - 1 - msg_bits:9.2f}  {budget}",
            flush=True,
        )


if __name__ == "__main__":
    main()
