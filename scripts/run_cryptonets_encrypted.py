"""Drive the CryptoNets MNIST encrypted batch end-to-end and report the
reference-comparable numbers (ref `CryptoNets/CryptoNets.cs:20-107`,
README.md:84-94: 27.9 s / 8192-image batch, ~3.4 ms/image).

Measures keygen, per-batch wall time (first batch = compile, later
batches = steady state), amortized ms/image, and — as the accuracy-parity
evidence available offline — exact prediction agreement between the
encrypted run and the Raw oracle on the same records.

Usage: python scripts/run_cryptonets_encrypted.py [--batch 8192]
       [--batches 2] [--cpu]
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
    ap.add_argument("--batch", type=int, default=8192)
    ap.add_argument("--batches", type=int, default=2)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument(
        "--stages", action="store_true",
        help="per-layer timing breakdown (mirrors the reference's "
        "Encrypt/Conv/Square/Dense run log, README.md:84-94); each layer "
        "is its own program so totals run slower than the fused path",
    )
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    import numpy as np

    from cryptonets_tpu.data.preprocess import synthetic_mnist_records
    from cryptonets_tpu.models import cryptonets_mnist
    from cryptonets_tpu.nn.jit import EncryptedForward

    total = args.batch * args.batches
    records = synthetic_mnist_records(total, seed=2)

    # raw oracle on the same records
    head_r, fac_r, reader_r = cryptonets_mnist.build(
        False, args.batch, records=[(l, f.copy()) for l, f in records]
    )
    head_r.prepare_network()
    raw_preds = []
    while True:
        m = head_r.get_next()
        if m is None:
            break
        raw_preds.append(np.argmax(m.decrypt(), axis=1))
    raw_preds = np.concatenate(raw_preds)
    print(f"# raw oracle done: {len(raw_preds)} records", file=sys.stderr)

    t0 = time.time()
    head, fac, reader = cryptonets_mnist.build(
        True, args.batch, records=records
    )
    head.prepare_network()
    keygen_s = time.time() - t0
    print(f"# factory+keygen+prepare: {keygen_s:.1f}s", file=sys.stderr)

    if args.stages:
        from cryptonets_tpu.nn.jit import StagedForward

        sfwd = StagedForward(head)
        for bi in range(args.batches):
            timings: dict = {}
            t0 = time.time()
            m = sfwd(timings)
            dec = m.decrypt()
            timings["Decrypt"] = time.time() - t0 - sum(timings.values())
            total_s = sum(timings.values())
            tag = "warmup(compile)" if bi == 0 else "steady"
            print(f"# --- batch {bi+1} ({tag}): {total_s:.2f}s", file=sys.stderr)
            for k, v in timings.items():
                print(f"#   {k:<24s} {v:8.2f}s", file=sys.stderr)
            preds = np.argmax(dec, axis=1)[: len(reader.labels)]
            ref = raw_preds[bi * args.batch: bi * args.batch + len(preds)]
            agree = int((preds == ref).sum())
            print(f"#   pred agreement vs raw: {agree}/{len(preds)}", file=sys.stderr)
        print(json.dumps({
            "metric": "CryptoNets-MNIST per-stage breakdown (last batch)",
            "stages_s": {k: round(v, 3) for k, v in timings.items()},
            "total_s": round(total_s, 3),
        }))
        return

    fwd = EncryptedForward(head, jit=True)
    batch_times = []
    enc_preds = []
    bi = 0
    while True:
        t0 = time.time()
        m = fwd()
        if m is None:
            break
        dec = m.decrypt()
        dt = time.time() - t0
        batch_times.append(dt)
        enc_preds.append(np.argmax(dec, axis=1)[: len(reader.labels)])
        bi += 1
        print(
            f"# batch {bi}: {dt:.2f}s "
            f"({1000.0 * dt / args.batch:.3f} ms/image)",
            file=sys.stderr,
        )
        if bi >= args.batches:
            break
    enc_preds = np.concatenate(enc_preds)
    agree = int((enc_preds == raw_preds[: len(enc_preds)]).sum())
    steady = batch_times[-1] if len(batch_times) > 1 else batch_times[0]
    print(
        json.dumps(
            {
                "metric": "CryptoNets-MNIST encrypted batch (8192 images)",
                "value": round(steady, 3),
                "unit": "s",
                "vs_baseline": round(27.9 / steady, 3),
                "ms_per_image": round(1000.0 * steady / args.batch, 4),
                "keygen_s": round(keygen_s, 2),
                "first_batch_s": round(batch_times[0], 2),
                "pred_agreement_vs_raw": f"{agree}/{len(enc_preds)}",
            }
        )
    )
    assert agree == len(enc_preds), "encrypted predictions diverge from raw"


if __name__ == "__main__":
    main()
