"""Noise-budget characterization per op class — port of the reference's
`HE Wrapper Tests/BudgetAnalysis.cs:37-63` measurement harness: prints the
invariant noise budget after each operation class (fresh encryption,
enc x enc dot, plain dot, slot sum, plain multiply, enc multiply,
rotation) for a named preset.

This is the SEAL-parity evidence for the 31-bit-limb re-parameterization
(presets.py): the chains match the truncated SEAL chain's TOTAL modulus
width, so budgets land within a few bits of what SEAL 3.2 would report
for the same op on the same preset.

CLI: python -m cryptonets_tpu.utils.budget [preset ...] [--cpu]
"""

from __future__ import annotations

import sys

import numpy as np


def op_budgets(factory, dim: int = 64) -> dict[str, int]:
    """Budget after each op class on `factory` (ref BudgetAnalysis.cs)."""
    from ..api.tracker import CryptoTracker

    rng = np.random.default_rng(1)
    a = rng.integers(-8, 9, dim).astype(float)
    b = rng.integers(-8, 9, dim).astype(float)
    CryptoTracker.enabled = True
    va = factory.get_encrypted_vector(a, "dense", 1.0)
    vb = factory.get_encrypted_vector(b, "dense", 1.0)
    pb = factory.get_plain_vector(b, "dense", 1.0)
    out = {}

    def probe(name, vec):
        prev = CryptoTracker.min_budget_so_far
        CryptoTracker.min_budget_so_far = None
        out[name] = CryptoTracker.test_vector_budget(vec, warn=False)
        CryptoTracker.min_budget_so_far = prev

    probe("fresh", va)
    probe("enc_dot", va.dot_product(vb))
    probe("plain_dot", va.dot_product(pb))
    probe("sum_slots", va.sum_all_slots())
    probe("plain_mult", va.pointwise_multiply(pb))
    probe("enc_mult", va.pointwise_multiply(vb))
    probe("rotate", va.rotate(3))
    return out


def main(argv=None):
    import argparse

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("presets", nargs="*", default=None)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args(argv)
    if args.cpu:
        # must run before any jax backend is touched (the container
        # pre-selects the axon TPU platform; see tests/conftest.py)
        import jax

        jax.config.update("jax_platforms", "cpu")
    from ..models.presets import CONFIGS, make_factory

    if not args.presets:
        args.presets = list(CONFIGS)
    for name in args.presets:
        fac = make_factory(name, True, seed=0)
        cfg = CONFIGS[name]
        k = len(fac.coeff_modulus)
        print(
            f"{name}: n={fac.n} k={k} plain_primes={fac.plain_primes}",
            flush=True,
        )
        for op, bits in op_budgets(fac).items():
            print(f"  {op:12s} {bits} bits", flush=True)


if __name__ == "__main__":
    sys.exit(main())
