"""Headline benchmark: encrypted-inference latency vs the reference.

Prints a JSON metric line {"metric", "value", "unit", "vs_baseline"}.
A first JSON line is emitted IMMEDIATELY after the first timed record
(so a driver timeout can never erase a finished measurement); if more
records follow, the LAST line printed is the refined median — both are
honest measurements of the same pipeline.

Robustness (round-3 postmortem: the driver's 20-min timeout fired during
a cold-cache keygen compile and the bench produced nothing):
  * factory keygen runs on the host CPU backend (api/factory.py
    _generate_keys) — no remote-relay compile on the critical path;
  * every phase logs a timestamped stderr line;
  * a BENCH_DEADLINE_S watchdog (default 1050 s) stops timing records
    early and emits whatever was measured;
  * SIGTERM/SIGALRM emit the best-so-far metric before dying.

Env knobs:
  BENCH_NETWORK = LoLa | LoLaSmall | LoLaDense | LoLaLarge | Cifar |
                   Caltech | CryptoNets
                   (default LoLa: the published 2.2 s single-image
                   pipeline; CryptoNets = the 8192-image SIMD batch vs
                   the published 27.9 s; Cifar vs its published 740 s;
                   Caltech vs the 156-234 ms README run log; LoLaSmall
                   vs the LoLa paper's 0.29 s small-network figure;
                   LoLaDense / LoLaLarge have NO published latency —
                   vs_baseline is null, recorded for PARITY.md)
  BENCH_RECORDS = number of timed records/batches (default 3)
  BENCH_DEADLINE_S = wall-clock budget before self-preserving emission
  BENCH_PLATFORM = cpu to force CPU
  BENCH_FUSE = 0 to disable the fused single-launch pipeline
  BENCH_BUDGET = 1 to also report the end-of-network noise budget
"""

from __future__ import annotations

import json
import os
import signal
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BASELINE_S = 2.2
T_START = time.time()
DEADLINE_S = float(os.environ.get("BENCH_DEADLINE_S", "1050"))

# mutable bench state shared with the signal handlers
STATE: dict = {"lats": [], "out_base": None, "phase": "init", "emitted": 0}


def log(msg: str) -> None:
    print(f"# [{time.time() - T_START:7.1f}s] {msg}", file=sys.stderr,
          flush=True)


def emit(final: bool) -> None:
    """Print the JSON metric line from the current state (stdout)."""
    import numpy as np

    base = STATE["out_base"]
    lats = STATE["lats"]
    if base is None or not lats:
        return
    lat = float(np.median(lats))
    out = dict(base)
    out["value"] = round(lat, 4)
    if out.get("_baseline"):
        out["vs_baseline"] = round(out["_baseline"] / lat, 3)
    else:
        out["vs_baseline"] = None
    out.pop("_baseline", None)
    if out.get("_per_image_div"):
        out["ms_per_image"] = round(1000.0 * lat / out["_per_image_div"], 4)
    out.pop("_per_image_div", None)
    out["records"] = len(lats)
    print(json.dumps(out), flush=True)
    STATE["emitted"] += 1


def _die_gracefully(signum, frame):
    if STATE["emitted"] == 0 and STATE["lats"]:
        emit(final=False)
    if not STATE["lats"]:
        # nothing measured: document how far we got (value null is a
        # failure marker, not a metric)
        print(json.dumps({
            "metric": STATE.get("metric", "unknown"),
            "value": None,
            "unit": "s",
            "vs_baseline": None,
            "error": f"killed in phase '{STATE['phase']}' "
                     f"at {time.time() - T_START:.0f}s",
        }), flush=True)
    log(f"terminated by signal {signum} in phase {STATE['phase']}")
    os._exit(0 if STATE["lats"] else 1)


def remaining() -> float:
    return DEADLINE_S - (time.time() - T_START)


def main():
    signal.signal(signal.SIGTERM, _die_gracefully)
    signal.signal(signal.SIGALRM, _die_gracefully)
    signal.alarm(max(5, int(DEADLINE_S + 20)))  # last-resort self-kill

    # on-disk key cache (repo-local, like .jax_cache): repeat bench runs
    # of the same geometry skip keygen entirely (~1 s load + transfer)
    os.environ.setdefault(
        "CRYPTONETS_KEY_CACHE",
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     ".key_cache"),
    )

    if os.environ.get("BENCH_PLATFORM") == "cpu":
        os.environ.setdefault(
            "XLA_FLAGS", "--xla_force_host_platform_device_count=1"
        )
        import jax

        jax.config.update("jax_platforms", "cpu")
    import numpy as np

    network = os.environ.get("BENCH_NETWORK", "LoLa")
    n_records = int(os.environ.get("BENCH_RECORDS", "3"))
    fuse = os.environ.get("BENCH_FUSE", "1") != "0"
    if network == "CryptoNets":
        run_cryptonets_batch(n_records)
        return
    vmap_b = int(os.environ.get("BENCH_VMAP", "0"))
    if vmap_b > 1:
        run_vmap_throughput(network, vmap_b, n_records)
        return

    from cryptonets_tpu.data.preprocess import synthetic_mnist_records
    from cryptonets_tpu.models import lola_mnist
    from cryptonets_tpu.nn.jit import EncryptedForward

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
            "LoLa": BASELINE_S, "LoLaBsgs": BASELINE_S,
            "LoLaPacked": BASELINE_S, "LoLaSmall": 0.29,
        }.get(network)
        metric = f"{network}-MNIST encrypted single-image latency"

    STATE["metric"] = metric
    STATE["out_base"] = {
        "metric": metric, "value": None, "unit": "s",
        "_baseline": baseline_s,
    }

    # raw oracle on record 0: the timed encrypted pipeline must reproduce
    # these logits exactly (fixed-point arithmetic is deterministic) —
    # a latency number over a noise-corrupted output is worthless.
    STATE["phase"] = "raw-oracle"
    head_r, _, _ = builder(False, records=[(l, f.copy()) for l, f in records])
    head_r.prepare_network()
    mr = head_r.get_next()
    raw0 = np.asarray(
        (mr.get_column(0) if hasattr(mr, "get_column") else mr).decrypt(),
        dtype=float,
    )
    log("raw oracle done")

    STATE["phase"] = "factory+keygen+prepare"
    t0 = time.time()
    head, factory, reader = builder(True, records=records)
    head.prepare_network()
    keygen_s = time.time() - t0
    log(f"factory+keygen+prepare: {keygen_s:.1f}s")
    STATE["out_base"]["keygen_s"] = round(keygen_s, 1)

    fwd = EncryptedForward(head, jit=True, fuse_io=fuse)
    log(f"fused single-launch pipeline: {fwd.fuse_io}")
    # warm-up record: trace + compile; also the correctness gate
    STATE["phase"] = "warmup-compile"
    t0 = time.time()
    m = fwd()
    dec0 = np.asarray(m.get_column(0).decrypt(), dtype=float)
    log(f"warmup (compile) record: {time.time() - t0:.1f}s")
    nshared = min(len(dec0), len(raw0))
    if not np.allclose(dec0[:nshared], raw0[:nshared], rtol=1e-9):
        log(f"MISMATCH enc={dec0[:10]} raw={raw0[:10]}")
        raise SystemExit("encrypted output disagrees with raw oracle")
    log("encrypted output matches raw oracle exactly")

    if os.environ.get("BENCH_BUDGET") == "1":
        from cryptonets_tpu.api.tracker import CryptoTracker

        budget = CryptoTracker.test_vector_budget(m.get_column(0), warn=False)
        log(f"end-of-network noise budget: {budget} bits")
        STATE["out_base"]["final_budget_bits"] = budget

    STATE["phase"] = "timing"
    for i in range(n_records):
        t0 = time.time()
        m = fwd()
        m.get_column(0).decrypt()
        STATE["lats"].append(time.time() - t0)
        log(f"record latency {STATE['lats'][-1]:.3f}s")
        if STATE["emitted"] == 0:
            emit(final=False)  # a finished measurement can't be erased
        if remaining() < 1.5 * max(STATE["lats"]) and i + 1 < n_records:
            log(f"deadline approaching ({remaining():.0f}s left): "
                f"stopping after {i + 1}/{n_records} records")
            break
    if len(STATE["lats"]) > 1 or STATE["emitted"] == 0:
        emit(final=True)


def run_vmap_throughput(network: str, B: int, n_launches: int):
    """Record-batched throughput (BENCH_VMAP=B): vmap B records of a
    single-image network into ONE fused device launch — device slot
    encode + RLWE encrypt + network + gamma decrypt + slot decode for
    all B records per program — and report ms/record.  Amortizes the
    ~40 ms relay launch floor that dominates the single-record numbers
    of the small models (Caltech is one dense layer; the reference
    amortizes with its 8192-slot SIMD batch instead,
    `README.md:178-197`).  Gate: every record's decoded output matches
    the Raw oracle exactly."""
    import numpy as np

    metric = f"{network} encrypted throughput at record-batch {B}"
    STATE["metric"] = metric
    STATE["out_base"] = {
        "metric": metric, "value": None, "unit": "s",
        "_baseline": None, "_per_image_div": B, "record_batch": B,
    }

    if network == "Caltech":
        from cryptonets_tpu.data.preprocess import synthetic_feature_records
        from cryptonets_tpu.models import caltech101

        def builder(encrypt, records=None):
            return caltech101.build(encrypt, records=records)

        records = synthetic_feature_records(
            B, caltech101.N_FEATURES, seed=11
        )
    else:
        from cryptonets_tpu.data.preprocess import synthetic_mnist_records
        from cryptonets_tpu.models import lola_mnist

        builder = lola_mnist.BUILDERS[network]
        records = synthetic_mnist_records(B, seed=11)

    STATE["phase"] = "raw-oracle"
    head_r, _, _ = builder(False, records=[(l, f.copy()) for l, f in records])
    head_r.prepare_network()
    raws = []
    while True:
        mr = head_r.get_next()
        if mr is None:
            break
        col = mr.get_column(0) if hasattr(mr, "get_column") else mr
        raws.append(np.asarray(col.decrypt(), dtype=float))
    log(f"raw oracle done: {len(raws)} records")

    STATE["phase"] = "factory+keygen+prepare"
    import jax
    import jax.numpy as jnp

    from cryptonets_tpu.nn.jit import EncryptedForward
    from cryptonets_tpu.utils.hoist import hoist_jit

    t0 = time.time()
    head, fac, reader = builder(True, records=records)
    head.prepare_network()
    log(f"factory+keygen+prepare: {time.time() - t0:.1f}s")
    STATE["out_base"]["keygen_s"] = round(time.time() - t0, 1)
    assert fac._device_encode and fac._device_decode, (
        "BENCH_VMAP needs device-side encode/decode (plain primes < 2^31)"
    )

    fwd = EncryptedForward(head, jit=False)
    # host side: scaled-int slot buffers per record (cheap index math),
    # device side: the SAME fused single-record body the fuse_io path
    # compiles (nn/jit.py fused_record_fn), vmapped over records
    bufs_list, metas = [], None
    while True:
        raw = fwd.reader.get_next()
        if raw is None:
            break
        buf, metas = fwd.slot_bufs(raw)
        bufs_list.append(buf)
    V, C, dim, scale = metas
    bufs = jnp.stack(bufs_list)  # [B, P, V*C, n]
    rngs = jax.random.split(fac.fresh_key(), B)
    fused_record, capture = fwd.fused_record_fn(V, C, dim, scale)

    def fused_slots(buf, rng):
        return fused_record(buf, rng)[1]

    vfused = hoist_jit(jax.vmap(fused_slots))

    STATE["phase"] = "warmup-compile"
    t0 = time.time()
    outs = jax.block_until_ready(vfused(bufs, rngs))
    log(f"warmup (compile) batch: {time.time() - t0:.1f}s")

    # correctness gate: every record exact vs the raw oracle
    vdim, vscale, vfmt, _ = capture["meta"][0]

    def join(slots_b):
        if vfmt == "sparse":
            per = [slots_b[pi, :, 0].astype(np.int64)[:vdim]
                   for pi in range(fac.P)]
            vals = fac.join_split_numbers(per)
        else:
            vals = fac.join_decoded_blocks(slots_b, vdim)
        return np.array([float(v) for v in vals]) / vscale

    for b in range(B):
        dec = join(np.asarray(outs[0][b]))
        nshared = min(len(dec), len(raws[b]))
        if not np.allclose(dec[:nshared], raws[b][:nshared], rtol=1e-9):
            log(f"MISMATCH record {b}: enc={dec[:5]} raw={raws[b][:5]}")
            raise SystemExit("vmap output disagrees with raw oracle")
    log(f"all {B} records match the raw oracle exactly")

    STATE["phase"] = "timing"
    for i in range(n_launches):
        t0 = time.time()
        outs = jax.block_until_ready(vfused(bufs, rngs))
        # host CRT join for every record (part of serving)
        slots0 = np.asarray(outs[0])
        for b in range(B):
            join(slots0[b])
        STATE["lats"].append(time.time() - t0)
        log(f"batch latency {STATE['lats'][-1]:.3f}s "
            f"({1000 * STATE['lats'][-1] / B:.1f} ms/record)")
        if STATE["emitted"] == 0:
            emit(final=False)
        if remaining() < 1.5 * max(STATE["lats"]) and i + 1 < n_launches:
            log("deadline approaching: stopping early")
            break
    if len(STATE["lats"]) > 1 or STATE["emitted"] == 0:
        emit(final=True)


def run_cryptonets_batch(n_batches: int):
    """The reference's headline workload: 8192-image SIMD batch
    (`CryptoNets/CryptoNets.cs:20-107`, 27.9 s published).  Timed per
    steady-state batch; gate = exact logit equality on the warmup batch
    plus full prediction agreement on every batch."""
    import numpy as np

    from cryptonets_tpu.data.preprocess import synthetic_mnist_records
    from cryptonets_tpu.models import cryptonets_mnist
    from cryptonets_tpu.nn.jit import EncryptedForward

    batch = int(os.environ.get("BENCH_BATCH", "8192"))
    if n_batches > 2:  # 2 steady batches bound raw-oracle cost
        log(f"BENCH_RECORDS={n_batches} clamped to 2 steady batches "
            "(raw-oracle cost grows per batch)")
    n_batches = min(n_batches, 2)
    total = batch * (n_batches + 1)
    metric = "CryptoNets-MNIST encrypted 8192-image batch"
    STATE["metric"] = metric
    STATE["out_base"] = {
        "metric": metric, "value": None, "unit": "s",
        "_baseline": 27.9,  # README.md:84-94 run log
        "_per_image_div": batch,
    }

    records = synthetic_mnist_records(total, seed=11)
    STATE["phase"] = "raw-oracle"
    head_r, _, _ = cryptonets_mnist.build(
        False, batch, records=[(l, f.copy()) for l, f in records]
    )
    head_r.prepare_network()
    raw_logits = []
    while True:
        mr = head_r.get_next()
        if mr is None:
            break
        raw_logits.append(np.asarray(mr.decrypt(), dtype=float))
    raw_preds = np.concatenate([np.argmax(r, axis=1) for r in raw_logits])
    log(f"raw oracle done: {len(raw_preds)} records")

    STATE["phase"] = "factory+keygen+prepare"
    t0 = time.time()
    head, factory, reader = cryptonets_mnist.build(True, batch, records=records)
    head.prepare_network()
    keygen_s = time.time() - t0
    log(f"factory+keygen+prepare: {keygen_s:.1f}s")
    STATE["out_base"]["keygen_s"] = round(keygen_s, 1)

    fuse = os.environ.get("BENCH_FUSE", "1") != "0"
    fwd = EncryptedForward(head, jit=True, fuse_io=fuse)
    log(f"fused single-launch pipeline: {fwd.fuse_io}")
    STATE["phase"] = "warmup-compile"
    t0 = time.time()
    m = fwd()
    dec = np.asarray(m.decrypt(), dtype=float)
    log(f"warmup (compile) batch: {time.time() - t0:.1f}s")
    r0 = raw_logits[0]
    if not np.allclose(dec[: r0.shape[0]], r0, rtol=1e-9):
        d0 = dec[: r0.shape[0]]
        bad = ~np.isclose(d0, r0, rtol=1e-9)
        log(f"MISMATCH: {bad.sum()}/{bad.size} entries differ; "
            f"first bad rows {sorted(set(np.where(bad)[0][:8].tolist()))}")
        log(f"enc[0,:5]={d0[0][:5]} raw[0,:5]={r0[0][:5]}")
        i, j = np.argwhere(bad)[0]
        log(f"first bad [{i},{j}]: enc={d0[i, j]!r} raw={r0[i, j]!r}")
        try:
            from cryptonets_tpu.api.tracker import CryptoTracker

            log(f"budget col0: "
                f"{CryptoTracker.test_vector_budget(m.get_column(0), warn=False)}")
        except Exception as e:  # pragma: no cover - diagnostics only
            log(f"budget probe failed: {e}")
        raise SystemExit("encrypted batch logits disagree with raw oracle")
    log("warmup batch logits match raw oracle exactly")
    agree_n = r0.shape[0]

    STATE["phase"] = "timing"
    for bi in range(n_batches):
        t0 = time.time()
        m = fwd()
        if m is None:
            break
        dec = np.asarray(m.decrypt(), dtype=float)
        STATE["lats"].append(time.time() - t0)
        preds = np.argmax(dec, axis=1)[: len(reader.labels)]
        ref = raw_preds[agree_n: agree_n + len(preds)]
        agree_n += len(preds)
        assert (preds == ref).all(), "encrypted predictions diverge from raw"
        log(f"batch latency {STATE['lats'][-1]:.2f}s "
            f"({1000.0 * STATE['lats'][-1] / batch:.3f} ms/img), "
            f"preds match {len(preds)}/{len(preds)}")
        if STATE["emitted"] == 0:
            emit(final=False)
        if remaining() < 1.5 * max(STATE["lats"]) and bi + 1 < n_batches:
            log("deadline approaching: stopping early")
            break
    if len(STATE["lats"]) > 1 or STATE["emitted"] == 0:
        emit(final=True)


if __name__ == "__main__":
    main()
