"""Exact modular contraction on the MXU: out[m] = sum_o W[m,o] * x[o] mod q.

The CryptoNets dense layers (ref `PoolLayer.cs` used as a dense layer,
`CryptoNets.cs:47-57`) contract hundreds of ciphertext columns against an
integer weight matrix.  Doing that as per-(map, column) constant multiplies
(the reference's thread-task structure) is VPU/HBM-bound and makes XLA
materialize a gathered copy of the whole input per output map; as a digit-
plane matmul it is one MXU contraction.

Exactness on integer-less MXU paths: both operands split into 7-bit digit
planes stored as int8; each int8 x int8 matmul accumulates in int32
(products < 2**14, so contractions up to 2**17 long stay exact), and
digit planes recombine with Shoup constant multiplies mod each RNS limb
modulus.  The NTT-domain ciphertext residues are position-wise values, so
the contraction commutes with the NTT and runs directly on NTT-domain
tensors.
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np
import jax.numpy as jnp

from ..crypto.modular import add_mod, mul_const_mod, shoup_precompute_host

DB = 7  # digit bits; 2**14-bit products keep int32 exact to O = 2**17
NP_X = 5  # ceil(31 / DB) planes cover any residue < 2**31


@lru_cache(maxsize=None)
def _pow_tables_np(q_list: tuple[int, ...]):
    """2**(DB*s) mod q per limb, with Shoup companions: [S, k, 1] x2.

    Cached as NUMPY so a value created under one jit trace never leaks
    into another (jnp conversion happens per call site)."""
    S = 2 * NP_X - 1
    k = len(q_list)
    w = np.zeros((S, k, 1), np.uint32)
    sh = np.zeros_like(w)
    for s in range(S):
        for li, q in enumerate(q_list):
            v = (1 << (DB * s)) % q
            w[s, li, 0] = v
            sh[s, li, 0] = shoup_precompute_host(v, q)
    return w, sh


def _pow_tables(q_list: tuple[int, ...]):
    w, sh = _pow_tables_np(q_list)
    return jnp.asarray(w), jnp.asarray(sh)


def _weight_planes(w_int, q_list) -> np.ndarray:
    """Integer weights [M, O] -> int8 digit planes [NP, k, M, O]."""
    M, O = w_int.shape
    k = len(q_list)
    planes = np.zeros((NP_X, k, M, O), np.int8)
    for li, q in enumerate(q_list):
        wl = np.array(
            [[int(v) % q for v in row] for row in w_int], np.uint32
        )
        for d in range(NP_X):
            planes[d, li] = ((wl >> (DB * d)) & ((1 << DB) - 1)).astype(
                np.int8
            )
    return planes


def exact_mod_contract(w_int, x, q_list, q_col):
    """sum_o W[m, o] * x[..., o, ...] mod q, batched over RNS limbs.

    w_int:  [M, O] integer weights (any sign/magnitude; reduced mod q_l).
    x:      uint32 [P, O, C, s, k, N] residues (k = len(q_list)).
    q_col:  broadcastable modulus column for [..., k, N] tensors.
    Returns uint32 [P, M, C, s, k, N].
    """
    O = x.shape[1]
    assert O * ((1 << DB) - 1) ** 2 < (1 << 31), "contraction too long"
    wp = jnp.asarray(_weight_planes(np.asarray(w_int), tuple(q_list)))
    mask = jnp.uint32((1 << DB) - 1)
    xp = [
        ((x >> jnp.uint32(DB * d)) & mask).astype(jnp.int8)
        for d in range(NP_X)
    ]
    pw, pw_sh = _pow_tables(tuple(int(q) for q in q_list))
    # fold each digit-pair product into the modular accumulator right
    # away (addition mod q is associative/commutative, so this equals
    # the old bucket-by-shift order): peak live memory is 2 output-sized
    # tensors instead of 2*NP_X-1 shift buckets — at CIFAR scale the
    # buckets alone were ~11 GB of HBM.
    acc = None
    for di in range(NP_X):
        for dj in range(NP_X):
            m = jnp.einsum(
                "kmo,pocskn->pmcskn",
                wp[di],
                xp[dj],
                preferred_element_type=jnp.int32,
            )
            s = di + dj
            term = mul_const_mod(m.astype(jnp.uint32), pw[s], pw_sh[s], q_col)
            acc = term if acc is None else add_mod(acc, term, q_col)
    return acc
