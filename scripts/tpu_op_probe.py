"""Roofline probe: per-kernel cost of the primitive HE ops on the real
TPU, against HBM speed-of-light bounds (BASELINE.md: "per-kernel
NTTs/sec/chip at HBM/MXU speed-of-light bounds").

Each kernel chains R sequential dependent applications inside one jit so
the ~40 ms relay launch overhead amortizes away.  For every kernel we
account the MINIMUM algorithmic HBM traffic (inputs + outputs + key/table
material that cannot stay resident in VMEM across applications) and
report achieved GB/s as a fraction of the chip's HBM bandwidth.  All
these kernels are memory-bound on TPU: the arithmetic per byte is far
below the VPU/MXU compute:bandwidth ratio, so HBM is the binding
roofline; the matmul NTT is additionally checked against the MXU bound.

Usage: python scripts/tpu_op_probe.py [--n 8192] [--reps 20] [--cpu]
       [--json out.json]

v5e peak numbers (public spec): HBM 819 GB/s, bf16 197 TFLOP/s.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

HBM_GBPS = 819.0       # TPU v5e HBM bandwidth
MXU_TFLOPS = 197.0     # TPU v5e bf16 peak


def jax_block(x):
    import jax

    jax.block_until_ready(x)


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


def slope_time(make_chain, x, R: int):
    """Per-application seconds via the slope between R- and 3R-length
    chains: cancels the fixed program-launch cost (~40 ms on the
    remote-compile relay), which at small R dominates and fakes a
    ~2 ms/op floor."""
    t1 = chain_time(make_chain(R), x)
    t3 = chain_time(make_chain(3 * R), x)
    return max((t3 - t1) / (2 * R), 1e-9)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=8192)
    ap.add_argument("--reps", type=int, default=20)
    ap.add_argument(
        "--batch", type=int, default=1,
        help="leading ciphertext batch axis (the network regime: conv/"
        "square/dense stages run tens-to-hundreds of columns per op; "
        "B=1 measures the latency floor of one small tensor instead)",
    )
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--json", default=None)
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
    B = args.batch
    k = 7
    qs = ntt_primes(n, 31, k)  # LoLa-like chain
    t_plain = ntt_primes(n, 20, 1)[0]
    rng = np.random.default_rng(0)
    xshape = (B, k, n) if B > 1 else (k, n)
    x = jnp.asarray(
        rng.integers(0, min(qs), size=xshape).astype(np.uint32)
    )

    results = {"n": n, "k": k, "batch": B, "platform": jax.default_backend(),
               "hbm_gbps_peak": HBM_GBPS, "kernels": {}}

    def report(name, seconds_per_app, min_bytes, note="", extra=None):
        gbps = min_bytes / seconds_per_app / 1e9
        pct = 100.0 * gbps / HBM_GBPS
        row = {
            "ms": round(1000 * seconds_per_app, 4),
            "min_hbm_bytes": int(min_bytes),
            "achieved_gbps": round(gbps, 1),
            "pct_of_hbm_bound": round(pct, 1),
        }
        if extra:
            row.update(extra)
        if note:
            row["note"] = note
        results["kernels"][name] = row
        print(
            f"{name:42s} {1000*seconds_per_app:9.3f} ms  "
            f"{gbps:7.1f} GB/s  {pct:5.1f}% of HBM bound {note}"
        )

    # ---- NTT pair (forward+inverse) on [k, n] uint32 ------------------
    # Min traffic per pair: read 4kn + write 4kn (twiddles stay in VMEM).
    ntt_pair_bytes = 8 * k * n * B

    def rep_ntt(ntt):
        def make(reps):
            def f(v):
                for _ in range(reps):
                    v = ntt.forward(ntt.inverse(v))
                return v
            return jax.jit(f)
        return make

    ntt_b = get_ntt_context(n, qs)
    tb = slope_time(rep_ntt(ntt_b), x, R)
    report("butterfly NTT fwd+inv pair", tb, ntt_pair_bytes,
           extra={"ntt_pairs_per_sec_per_chip": round(1.0 / tb, 1)})

    ntt_m = MatmulNTTContext(n, qs)
    tm = slope_time(rep_ntt(ntt_m), x, R)
    # MXU bound for the 4-step formulation: per limb per transform,
    # two [n1, n1] x [n1, n2] passes in 3x3 digit planes of bf16.
    n1 = 1 << ((n - 1).bit_length() + 1) // 2
    flops = 2 * k * 2 * (2 * n1 * n * 9) * B  # pair = fwd+inv, 9 digit planes
    mxu_ms = 1000 * flops / (MXU_TFLOPS * 1e12)
    report("matmul (4-step MXU) NTT fwd+inv pair", tm, ntt_pair_bytes,
           extra={"mxu_bound_ms": round(mxu_ms, 4),
                  "pct_of_mxu_bound": round(100 * mxu_ms / (1000 * tm), 1),
                  "ntt_pairs_per_sec_per_chip": round(1.0 / tm, 1)})

    from cryptonets_tpu.kernels.pallas_ntt import PallasNTTContext

    ntt_p = PallasNTTContext(n, qs)
    tp = slope_time(rep_ntt(ntt_p), x, R)
    report("pallas fused NTT fwd+inv pair", tp, ntt_pair_bytes,
           extra={"ntt_pairs_per_sec_per_chip": round(1.0 / tp, 1)})

    # ---- rotation / key switch ---------------------------------------
    # P-less hybrid (alpha=1, LoLaSmall/Large style) and digit mode
    # (dbc=12, LoLa style).  Min traffic: ct in+out 2*2*4kn, switch keys
    # read once per application: hybrid alpha=1 -> 2 * k*k*4n bytes;
    # digit dbc -> 2 * (k*D)*k*4n bytes.
    def gen_keys(bfv_obj, seed):
        """Keygen on the host CPU backend when the default backend is a
        (relay-attached) accelerator — the keygen program's remote
        compile would otherwise dominate the probe's wall time (same
        rationale as api/factory.py _generate_keys)."""
        if jax.default_backend() == "cpu":
            return bfv_obj.keygen(seed=seed)
        cpu = jax.local_devices(backend="cpu")[0]
        with jax.default_device(cpu):
            keys = jax.block_until_ready(bfv_obj.keygen(seed=seed))
        return jax.device_put(keys, jax.devices()[0])

    for mode, kw in (
        ("hybrid-alpha1", dict(ks_alpha=1)),
        ("digit-dbc12", dict(dbc=12)),
        ("digit-dbc8", dict(dbc=8)),  # the shipped `lola` preset mode
    ):
        params = BFVParams(n, t_plain, coeff_modulus=qs, **kw)
        bfv = BFV(params)
        keys = gen_keys(bfv, 1)
        pt = (
            np.stack(
                [params.plain_to_residues(rng.integers(0, 100, n))
                 for _ in range(B)]
            )
            if B > 1
            else params.plain_to_residues(rng.integers(0, 100, n))
        )
        ct = bfv.encrypt(keys, jnp.asarray(pt), jax.random.key(1))
        g = bfv.galois_elt_rows(1)

        def rot_chain(reps, bfv=bfv, keys=keys, g=g):
            def rot(c):
                for _ in range(reps):
                    c = bfv.apply_galois(c, g, keys)
                return c
            return jax.jit(rot)

        tr = slope_time(rot_chain, ct, R)
        if mode.startswith("hybrid"):
            key_bytes = 2 * k * k * 4 * n
        else:
            D = params.digits_per_limb
            key_bytes = 2 * (k * D) * k * 4 * n
        rot_bytes = 16 * k * n * B + key_bytes
        report(f"rotation+keyswitch [{mode}]", tr, rot_bytes)

        if mode == "hybrid-alpha1":
            # ---- BEHZ multiply + relin --------------------------------
            # Min traffic: two input cts read 2*16kn/2... a,b [2,k,n]
            # each 8kn, output [2,k,n] 8kn, Bsk intermediates ~ 2 passes
            # of [3, k+2, n] (write+read) = 2*3*(k+2)*4n, relin keys
            # 2*k*k*4n.
            kb = len(params.bsk_list)
            mul_bytes = (B * (3 * 8 * k * n + 2 * 2 * 3 * kb * 4 * n)
                         + 2 * k * k * 4 * n)

            def mul_chain(reps, bfv=bfv, keys=keys, ct=ct):
                def mul(c):
                    for _ in range(reps):
                        c = bfv.relinearize(bfv.multiply(c, ct), keys)
                    return c
                return jax.jit(mul)

            tmu = slope_time(mul_chain, ct, R)
            report("BEHZ ct x ct multiply + relin", tmu, mul_bytes)

            # ---- gamma decrypt ----------------------------------------
            # Min traffic: ct read 8kn, output 4n.  Each rep feeds its
            # result back into the next input — identical repeated
            # decrypts of one ciphertext get CSE'd by XLA and time as 0.
            from cryptonets_tpu.crypto.modular import add_mod as _add_mod

            def dec_chain(reps, bfv=bfv, keys=keys):
                def dec(c):
                    acc = None
                    for _ in range(reps):
                        r = bfv.decrypt_residues_mod_t(keys, c)
                        acc = r if acc is None else acc ^ r
                        bump = jnp.broadcast_to(
                            (r % jnp.uint32(3))[..., None, None, :],
                            c.data.shape,
                        )
                        c = type(c)(_add_mod(c.data, bump, bfv.p.chain_q.q))
                    return acc
                return jax.jit(dec)

            td = slope_time(dec_chain, ct, R)
            report("gamma decrypt (scale-and-round)", td,
                   B * (8 * k * n + 4 * n))

            # ---- automorphism gather alone ----------------------------
            from cryptonets_tpu.crypto.bfv import _automorphism_tables

            src, _neg = _automorphism_tables(n, g)

            def gather_chain(reps, src=src):
                def gather(v):
                    for _ in range(reps):
                        v = v[..., src]
                    return v
                return jax.jit(gather)

            tg = slope_time(gather_chain, ct.data, R)
            report("automorphism gather alone", tg, B * 2 * 8 * k * n)

    if args.json:
        with open(args.json, "w") as fh:
            json.dump(results, fh, indent=1)
        print(f"wrote {args.json}")


if __name__ == "__main__":
    main()
