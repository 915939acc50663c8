"""Hybrid NTT context: batch-size dispatch between the pallas kernel
and the butterfly pipeline must be invisible — bit-identical transforms
on both sides of the threshold (pallas runs in interpret mode on CPU,
so the ring is kept tiny)."""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from cryptonets_tpu.crypto.ntt import (
    HYBRID_BATCH_THRESHOLD,
    get_hybrid_ntt_context,
    get_ntt_context,
)
from cryptonets_tpu.crypto.primes import ntt_primes


def test_hybrid_matches_butterfly_both_regimes():
    n = 256
    qs = ntt_primes(n, 30, 2)
    hyb = get_hybrid_ntt_context(n, qs)
    ref = get_ntt_context(n, qs)
    rng = np.random.default_rng(0)
    for lead in ((), (2,), (HYBRID_BATCH_THRESHOLD + 1,)):
        x = jnp.asarray(
            rng.integers(0, min(qs), size=lead + (len(qs), n)).astype(
                np.uint32
            )
        )
        np.testing.assert_array_equal(
            np.asarray(hyb.forward(x)), np.asarray(ref.forward(x))
        )
        np.testing.assert_array_equal(
            np.asarray(hyb.inverse(x)), np.asarray(ref.inverse(x))
        )
        # round trip
        np.testing.assert_array_equal(
            np.asarray(hyb.inverse(hyb.forward(x))), np.asarray(x)
        )
