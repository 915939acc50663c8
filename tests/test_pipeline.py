"""Layer-pipeline parallelism (parallel/pipeline.py): the encrypted
chain staged across devices must produce EXACTLY the single-program
outputs, with each stage's program (and key material) pinned to its own
device."""

from __future__ import annotations

import jax
import numpy as np

from cryptonets_tpu.parallel.dryrun import build_tiny_lola, records_for
from cryptonets_tpu.parallel.pipeline import PipelineForward


def test_pipeline_matches_raw_and_places_stages():
    recs = records_for(5, seed=17)

    raw_head, _, raw_reader = build_tiny_lola(encrypt=False)
    raw_reader.set_source_records([(l, f.copy()) for l, f in recs])
    raws = []
    while True:
        m = raw_head.get_next()
        if m is None:
            break
        raws.append(np.asarray(m.get_column(0).decrypt(), float))

    head, fac, reader = build_tiny_lola(encrypt=True)
    reader.set_source_records([(l, f.copy()) for l, f in recs])
    pipe = PipelineForward(head, n_stages=4)
    outs = pipe.run_stream(len(recs))
    assert len(outs) == len(raws)
    for out, raw in zip(outs, raws):
        enc = np.asarray(out.get_column(0).decrypt(), float)
        np.testing.assert_allclose(enc[: len(raw)], raw, atol=1e-9)

    # stages landed on 4 DISTINCT devices, and each stage's hoisted
    # constants (weights/masks/keys) are resident on its own device
    devs = [dev for _, _, dev in pipe._progs]
    assert len(set(devs)) == 4, devs
    for jitted, _, dev in pipe._progs:
        state = next(iter(jitted._cache.values()))
        for c in state["consts"]:
            assert list(c.devices()) == [dev], (c.devices(), dev)


def test_pipeline_single_stage_equals_multi():
    recs = records_for(3, seed=19)
    outs = {}
    for s in (1, 3):
        head, fac, reader = build_tiny_lola(encrypt=True)
        reader.set_source_records([(l, f.copy()) for l, f in recs])
        pipe = PipelineForward(head, n_stages=s)
        outs[s] = [
            np.asarray(o.get_column(0).decrypt(), float)
            for o in pipe.run_stream(len(recs))
        ]
    for a, b in zip(outs[1], outs[3]):
        np.testing.assert_array_equal(a, b)
