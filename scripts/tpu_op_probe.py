"""Microbenchmark the primitive HE ops on the real TPU at LoLa shapes:
per-op cost of butterfly NTT vs MXU matmul NTT, Galois rotation (gather +
hybrid key switch), BEHZ ct x ct multiply, and gamma decrypt.  Chains R
sequential dependent applications inside one jit so per-launch overhead
(~40 ms on this relay) amortizes away.

Usage: python scripts/tpu_op_probe.py [--n 8192] [--reps 20] [--cpu]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def chain_time(jitted, x, reps_outer: int = 3):
    out = jitted(x)
    jax_block(out)
    best = 1e9
    for _ in range(reps_outer):
        t0 = time.time()
        out = jitted(x)
        jax_block(out)
        best = min(best, time.time() - t0)
    return best


def jax_block(x):
    import jax

    jax.block_until_ready(x)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=8192)
    ap.add_argument("--reps", type=int, default=20)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp
    import numpy as np

    from cryptonets_tpu.crypto.bfv import BFV, BFVParams, Ciphertext
    from cryptonets_tpu.crypto.ntt import get_ntt_context
    from cryptonets_tpu.kernels.matmul_ntt import MatmulNTTContext
    from cryptonets_tpu.crypto.primes import ntt_primes

    n = args.n
    R = args.reps
    qs = ntt_primes(n, 31, 7)  # LoLa-like chain
    params = BFVParams(n, ntt_primes(n, 20, 1)[0], coeff_modulus=qs,
                       dbc=16, ks_alpha=1)
    bfv = BFV(params)
    keys = bfv.keygen(seed=1)
    rng = np.random.default_rng(0)
    x = jnp.asarray(
        rng.integers(0, min(qs), size=(len(qs), n)).astype(np.uint32)
    )
    ct = bfv.encrypt(
        keys,
        jnp.asarray(params.plain_to_residues(rng.integers(0, 100, n))),
        jax.random.key(1),
    )

    ntt_b = get_ntt_context(n, qs)
    ntt_m = MatmulNTTContext(n, qs)
    from cryptonets_tpu.kernels.pallas_ntt import PallasNTTContext

    ntt_p = PallasNTTContext(n, qs)

    def rep_ntt(ntt):
        def f(v):
            for _ in range(R):
                v = ntt.forward(ntt.inverse(v))
            return v
        return jax.jit(f)

    tb = chain_time(rep_ntt(ntt_b), x)
    tm = chain_time(rep_ntt(ntt_m), x)
    tp = chain_time(rep_ntt(ntt_p), x)
    print(f"butterfly fwd+inv NTT pair ({len(qs)} limbs): "
          f"{1000*tb/R:.3f} ms")
    print(f"matmul    fwd+inv NTT pair ({len(qs)} limbs): "
          f"{1000*tm/R:.3f} ms")
    print(f"pallas    fwd+inv NTT pair ({len(qs)} limbs): "
          f"{1000*tp/R:.3f} ms")

    g = bfv.galois_elt_rows(1)

    def rot(c):
        for _ in range(R):
            c = bfv.apply_galois(c, g, keys)
        return c

    tr = chain_time(jax.jit(lambda c: rot(c)), ct)
    print(f"rotation (gather + hybrid key switch): {1000*tr/R:.3f} ms")

    def mul(c):
        for _ in range(R):
            c = bfv.relinearize(bfv.multiply(c, ct), keys)
        return c

    tmu = chain_time(jax.jit(lambda c: mul(c)), ct)
    print(f"ct x ct multiply + relin: {1000*tmu/R:.3f} ms")

    def dec(c):
        outs = []
        for _ in range(R):
            outs.append(bfv.decrypt_residues_mod_t(keys, c))
        return jnp.stack(outs)

    td = chain_time(jax.jit(dec), ct)
    print(f"gamma decrypt: {1000*td/R:.3f} ms")

    # pure gather cost (the automorphism permutation alone)
    from cryptonets_tpu.crypto.bfv import _automorphism_tables

    src, neg = _automorphism_tables(n, g)

    def gather(v):
        for _ in range(R):
            v = v[..., src]
        return v

    tg = chain_time(jax.jit(gather), ct.data)
    print(f"automorphism gather alone: {1000*tg/R:.3f} ms")


if __name__ == "__main__":
    main()
