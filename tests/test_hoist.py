"""hoist_jit: trace-time constants (switch keys, masks, weight forms)
must become program ARGUMENTS, not HLO literals (round-2 VERDICT item 1 —
the HTTP 413 bench failure was ~240 MB of Galois keys baked into the
relay-shipped HLO)."""

import numpy as np
import jax.numpy as jnp

from cryptonets_tpu.api import CrtBfvFactory
from cryptonets_tpu.crypto.primes import ntt_primes
from cryptonets_tpu.utils.hoist import hoist_jit

N = 256


def _toy_factory():
    return CrtBfvFactory(
        plain_primes=ntt_primes(N, 17, 2), n=N,
        coeff_modulus=ntt_primes(N, 30, 5), dbc=16, seed=7,
    )


def test_hoist_matches_eager_and_strips_constants():
    fac = _toy_factory()
    v = fac.get_encrypted_vector(np.arange(8, dtype=float), scale=2.0)
    w = fac.get_plain_vector(np.arange(8, 16, dtype=float), scale=2.0)

    def fwd(data):
        from cryptonets_tpu.api.vector import HEVector

        x = HEVector(fac, data=data, dim=8, scale=2.0)
        y = x.pointwise_multiply(w)      # plain mult form (const)
        y = y.rotate(2)                  # Galois key (const)
        y = y.pointwise_multiply(y)      # ct x ct + relin key (const)
        return y.data

    eager = np.asarray(fwd(v.data))
    jitted = hoist_jit(fwd)
    out = np.asarray(jitted(v.data))
    np.testing.assert_array_equal(eager, out)

    # the compiled program must take the keys as arguments: the switch
    # keys the trace touched must appear among the hoisted constants
    # (plain jax.jit would bake them into the HLO as literals instead)
    import jax

    state = next(iter(jitted._cache.values()))
    const_ids = {id(c) for c in state["consts"]}
    g = fac.bfv[0].galois_elt_rows(2)
    for arr in (
        fac.keys.relin.k0,
        fac.keys.relin.k1,
        fac.keys.galois[g].k0,
        fac.keys.galois[g].k1,
    ):
        assert id(arr) in const_ids, "switch key was not hoisted"
    # and the key bytes are gone from the program text
    keys_bytes = sum(
        int(np.prod(a.shape)) * 4
        for a in (fac.keys.relin.k0, fac.keys.relin.k1)
    )
    txt = jitted.lower(v.data).as_text()
    naive = jax.jit(fwd).lower(v.data).as_text()
    assert len(naive) - len(txt) > keys_bytes, (
        f"hoisted {len(txt)} vs naive {len(naive)} chars"
    )

    # repeated calls reuse the cached program (one cache entry)
    out2 = np.asarray(jitted(v.data))
    np.testing.assert_array_equal(eager, out2)
    assert len(jitted._cache) == 1


def test_opcounts_replayed_on_cached_calls():
    """Per-call op totals identical for call 1 (trace) and call 2
    (cache hit) — round-2 VERDICT weak item 5."""
    from cryptonets_tpu.utils.opcount import OPS

    fac = _toy_factory()
    v = fac.get_encrypted_vector(np.arange(8, dtype=float), scale=2.0)

    def fwd(data):
        from cryptonets_tpu.api.vector import HEVector

        x = HEVector(fac, data=data, dim=8, scale=2.0)
        return x.rotate(1).rotate(2).data

    jitted = hoist_jit(fwd)
    deltas = []
    for _ in range(3):
        before = OPS.snapshot()
        jitted(v.data)
        after = OPS.snapshot()
        deltas.append(
            {k: after[k] - before.get(k, 0) for k in after
             if after[k] != before.get(k, 0)}
        )
    assert deltas[0] == deltas[1] == deltas[2]
    assert deltas[0].get("rotation", 0) == 2


def test_hoist_retraces_on_shape_change():
    f = hoist_jit(lambda x: x * jnp.asarray(np.arange(4.0)))
    a = f(jnp.ones((4,)))
    b = f(jnp.ones((2, 4)))
    np.testing.assert_allclose(np.asarray(a), np.arange(4.0))
    assert np.asarray(b).shape == (2, 4)
    assert len(f._cache) == 2
