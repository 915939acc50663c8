"""Profile the factory+keygen+prepare split on the current backend.

Round-2 VERDICT item 6: bench stderr showed 109 s warm factory+keygen+
prepare on TPU vs the reference's 1.84 s LoLa keygen (`README.md:120`).
This script times each phase so the dominant cost is measurable, not
guessed: parameter precompute (host + constant uploads), keygen (first =
compile + run, second = warm run), and network prepare.

Usage: python scripts/keygen_profile.py [--preset lola] [--cpu]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--preset", default="lola")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax

    t0 = time.time()
    jax.devices()
    print(f"backend init: {time.time()-t0:.1f}s ({jax.default_backend()})")

    from cryptonets_tpu.api.factory import CrtBfvFactory
    from cryptonets_tpu.models.presets import CONFIGS

    cfg = dict(CONFIGS[args.preset])

    t0 = time.time()
    fac = CrtBfvFactory(seed=0, _skip_keygen=True, **cfg)
    t_params = time.time() - t0
    print(f"factory init without keygen (params/constants): {t_params:.1f}s")

    t0 = time.time()
    fac.keys = fac.bfv[0].keygen(seed=0)
    jax.block_until_ready(fac.keys.relin.k0)
    t_kg1 = time.time() - t0
    print(f"keygen #1 (compile + run): {t_kg1:.1f}s")

    t0 = time.time()
    keys2 = fac.bfv[0].keygen(seed=1)
    jax.block_until_ready(keys2.relin.k0)
    t_kg2 = time.time() - t0
    print(f"keygen #2 (warm): {t_kg2:.1f}s")

    if args.preset == "lola":
        from cryptonets_tpu.data.preprocess import synthetic_mnist_records
        from cryptonets_tpu.models import lola_mnist

        t0 = time.time()
        head, fac2, reader = lola_mnist.build_lola(
            True, records=synthetic_mnist_records(1, seed=1)
        )
        t_build = time.time() - t0
        print(f"full build_lola (2nd factory + keygen): {t_build:.1f}s")
        t0 = time.time()
        head.prepare_network()
        print(f"prepare_network: {time.time()-t0:.1f}s")


if __name__ == "__main__":
    main()
