"""Baby-step/giant-step diagonal matvec for large dense layers.

The reference evaluates a dense layer over a packed vector as one
DotProduct per output row (`EncryptedSealBfvMatrix.cs:79-120`,
`LLDenseLayer.cs:63-75`): R rows x ~log2(n/2) key-switched rotations
each.  For LoLa-CIFAR's conv-as-dense layer (R=5488 outputs over 16268
inputs, `LolaCifarCryptoNet.cs:91-106`) that is ~77k key switches — the
dominant share of the reference's ~740 s per image — and the per-row
masks alone would need ~10 GB on chip.

TPU-native replacement: the Halevi-Shoup BSGS diagonal decomposition,
adapted to BFV's 2x(n/2) slot-row structure.  Write each slot index as
(r, c) with row r in {0,1} and column c in [0, row).  RotateRows by s
maps value at (r, (c+s) mod row) into slot (r, c) (left rotation), and
RotateColumns swaps the rows.  Grouping the matrix entries W[i, j] by
column displacement d = (c_j - c_i) mod row and row flip f = r_i ^ r_j:

    y = sum_d sum_f diag[d, f] * rot_d(u_f),     u_0 = v, u_1 = colswap(v)
    diag[d, f][(r, c)] = W[(r, c), ((r^f)*row + (c+d) mod row)]

and with d = g*a + b (baby b < g, giant a < G = row/g), pre-rotating the
diagonals by -g*a at the SLOT level (free, host-side):

    y = sum_a rot_{g*a}( sum_{b,f} diag'[a, b, f] * rot_b(u_f) )
    diag'[a, b, f][(r, c)] = W[(r, c'), ((r^f)*row + (c+b) mod row)],
    c' = (c - g*a) mod row

Cost: F*(g-1) baby rotations (computed incrementally, each a single-hop
+1 key switch) + (G-1) giant rotations (Horner: y = acc_0 + rot_g(acc_1 +
rot_g(...)), each a single power-of-two hop) + one column swap — ~190-250
key switches TOTAL for any R, vs R*log2(row).  The diagonal plaintexts
are held as one int32 slot-value table shared across plain primes and
limbs; their encode (Z_t iNTT + per-limb NTT_q) runs on device inside the
network program, chunked per giant step, so nothing close to the full
[P, row*F, k, N] mult-form tensor is ever materialized.

Requires a factory with device-side encoding (every plain prime t <
2**31 and < min q) and a single-block dense input.  Output packing: y[i]
in flat slot i, exactly the reference's ForceDenseFormat placement.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..crypto.bfv import Ciphertext, mod_sum
from ..crypto.modular import add_mod
from ..utils.opcount import OPS


def _choose_g(row: int, F: int, cap: int = 256) -> int:
    """Power-of-two baby count minimizing F*(g-1) + (row/g - 1)."""
    best_g, best_cost = 1, None
    g = 1
    while g <= min(row, cap):
        cost = F * (g - 1) + (row // g - 1)
        if best_cost is None or cost < best_cost:
            best_g, best_cost = g, cost
        g *= 2
    return best_g


class BsgsDenseForm:
    """Host-side preparation: diagonal slot-value table for W [R, D].

    `g` overrides the baby count (must be a power of two <= n/2): with
    HOISTED baby steps (one shared digit decomposition, see
    `_hoisted_babies_hat`) babies are nearly free, so the optimal g is
    much larger than `_choose_g`'s rotation-count model suggests —
    bounded in practice by Galois-key HBM (one switch key per step
    1..g-1) and the [P, g, F, 2, k, N] baby tensor."""

    def __init__(self, factory, w_int: np.ndarray, out_dim: int,
                 in_dim: int, g: int | None = None):
        n = factory.n
        row = n // 2
        R, D = int(out_dim), int(in_dim)
        assert R <= n and D <= n, (R, D, n)
        assert w_int.shape == (R, D), (w_int.shape, R, D)
        w_int = np.asarray(w_int, dtype=np.int64)
        # _encode_diag_chunk does a single conditional +t for negatives
        # (no general mod-t reduction), so every |weight| must fit below
        # the SMALLEST plain prime — not merely below 2**31.
        t_min = min(factory.plain_primes)
        assert np.abs(w_int).max(initial=0) < t_min, (
            "BSGS weight magnitude >= smallest plain prime "
            f"({np.abs(w_int).max(initial=0)} >= {t_min}); residues would "
            "be silently wrong"
        )
        if not getattr(factory, "_device_encode", False):
            raise ValueError(
                "BSGS dense matvec needs device-side encoding "
                "(every plain prime < 2**31); use the per-row path"
            )
        self.factory = factory
        self.out_dim = R
        self.in_dim = D
        # flip axis needed only when inputs/outputs span both slot rows
        F = 2 if (R > row or D > row) else 1
        self.F = F
        if g is None:
            g = _choose_g(row, F)
        assert g & (g - 1) == 0 and 1 <= g <= row, g
        G = row // g
        self.g, self.G = g, G

        Wfull = np.zeros((n, n), np.int64)
        Wfull[:R, :D] = w_int
        r = np.arange(n) // row           # [n] slot row
        c = np.arange(n) % row            # [n] slot column
        imap = np.asarray(factory.encoders[0].index_map)
        table = np.zeros((G, g, F, n), np.int32)
        active = []
        jcol = ((c[None, :] + np.arange(g)[:, None]) % row)  # [g, n]
        for a in range(G):
            i_idx = r * row + (c - g * a) % row               # [n]
            chunk = np.zeros((g, F, n), np.int64)
            for f in range(F):
                j_idx = (r[None, :] ^ f) * row + jcol          # [g, n]
                chunk[:, f, :] = Wfull[i_idx[None, :], j_idx]
            if chunk.any():
                active.append(a)
                # store index-mapped (encoder input order) slot values
                t_im = np.zeros_like(chunk)
                t_im[..., imap] = chunk
                table[a] = t_im.astype(np.int32)
        self.table = table
        self.active = active  # ascending


def _encode_diag_chunk(fac, tbl_a):
    """In-trace device encode: [g, F, n] int32 index-mapped slot values ->
    plaintext mult forms [P, g, F, k, N] (Z_t iNTT + NTT_q + Montgomery).
    Coefficients mod t broadcast over limbs since t < every q."""
    g, F, n = tbl_a.shape
    k = len(fac.coeff_modulus)
    flat = tbl_a.reshape(g * F, 1, n)
    per = []
    for pi in range(fac.P):
        t = jnp.int32(fac.plain_primes[pi])
        buf = jnp.where(flat < 0, flat + t, flat).astype(jnp.uint32)
        coeffs = fac._enc_ntt[pi].inverse(buf)            # [gF, 1, n] mod t
        res = jnp.broadcast_to(coeffs, (g * F, k, n))
        per.append(fac.bfv[0].prepare_plain_mult(res))
    return jnp.stack(per).reshape(fac.P, g, F, k, n)


def hoist_eligible(fac, g: int) -> bool:
    """True when bsgs_matvec will run HOISTED baby steps: per-step
    Galois keys present, a key-switch mode whose switched result stays
    in the NTT domain (digit, or P-less RNS groups), and an NTT
    implementation with the Longa-Naehrig evaluation ordering —
    `ntt_automorphism_perm` encodes THAT ordering, so the 'matmul'
    impl's own 4-step ordering must take the chained fallback."""
    bfv0 = fac.bfv[0]
    p = bfv0.p
    return (
        g > 1
        and (not p.ks_hybrid or p.n_special == 0)
        and p.ntt_impl in ("butterfly", "pallas", "hybrid")
        and all(
            bfv0.galois_elt_rows(b) in fac.keys.galois
            for b in range(1, g)
        )
    )


def _hoisted_babies_hat(fac, ub, g):
    """HOISTED baby rotations, all in the NTT domain (Halevi-Shoup
    hoisting adapted to digit key switching): digit-decompose + NTT the
    input ONCE, then every rotation is a gather (evaluation-point
    permutation, `ntt_automorphism_perm`) + one switch-key inner
    product — ZERO additional NTTs per baby, vs a full key switch
    (~k*D*(k)+2k limb transforms) per baby in the chained path.

    Digit smallness under the automorphism: sigma permutes and negates
    coefficients, so sigma(D_d(c1)) has coefficients +-2^dbc in the
    CENTERED sense — the key-switch noise bound is unchanged, and
    sigma(c1) = sum_d w_d * sigma(D_d(c1)) holds exactly as ring
    elements, so the switched result equals (up to fresh key-switch
    noise) the unhoisted rotation.

    ub: [P, F, 2, k, N] -> bab_hat [P, g, F, 2, k, N] (NTT domain)."""
    import jax

    from ..crypto.modular import mul_const_mod

    bfv0 = fac.bfv[0]
    p = bfv0.p
    cq = p.chain_q
    c0, c1 = ub[..., 0, :, :], ub[..., 1, :, :]     # [P, F, k, N]
    c0_hat = p.ntt_q.forward(c0)
    c1_hat = p.ntt_q.forward(c1)
    if p.ks_hybrid:
        # P-less RNS-group decomposition (ks_alpha, n_special == 0:
        # keys live mod Q, no mod-down — the only hybrid flavor whose
        # switched result stays in the NTT domain)
        y = mul_const_mod(c1, *p.ks_inv_punct_grp, cq.q)
        w, w_sh = p.ks_grp_conv                      # [k, kp, 1]
        terms = mul_const_mod(
            y[..., :, None, :], w, w_sh, p.chain_qp.q[None, :, :]
        )                                            # [P, F, k, kp, N]
        ds = []
        for i0, i1 in p.ks_groups:
            seg = terms[..., i0:i1, :, :]
            ds.append(
                mod_sum(seg, p.chain_qp.q, axis=-3)
                if i1 - i0 > 1
                else seg[..., 0, :, :]
            )
        dig = jnp.stack(ds, axis=0)                  # [omega, P, F, kp, N]
        dhat = p.ntt_qp.forward(dig)
    else:
        dig = bfv0._decompose_digits(c1)             # [kD, P, F, k, N]
        dhat = p.ntt_q.forward(dig)
    perms, k0s, k1s = fac.stacked_baby_rotations(g)

    def body(_, xs):
        perm, k0, k1 = xs                            # [N], [kD, k, N] x2
        dp = dhat[..., perm]
        t0 = mod_sum(
            cq.mont_mul(dp, k0[:, None, None]), cq.q, axis=0
        )
        t1 = mod_sum(
            cq.mont_mul(dp, k1[:, None, None]), cq.q, axis=0
        )
        c0r = add_mod(c0_hat[..., perm], t0, cq.q)
        return None, jnp.stack([c0r, t1], axis=-3)   # [P, F, 2, k, N]

    _, rot = jax.lax.scan(body, None, (perms, k0s, k1s))
    base = jnp.stack([c0_hat, c1_hat], axis=-3)      # [P, F, 2, k, N]
    bab = jnp.concatenate([base[None], rot], axis=0)  # [g, P, F, 2, k, N]
    return jnp.moveaxis(bab, 0, 1)                   # [P, g, F, 2, k, N]


def bsgs_matvec(form: BsgsDenseForm, data):
    """Apply the prepared diagonal form to ciphertext data
    [P, 1, 2, k, N]; returns output ciphertext data [P, 1, 2, k, N].

    Dense diagonal supports (the CIFAR/LoLaLarge conv-as-dense case) run
    the baby chain and the giant Horner accumulation as `lax.scan`s —
    the loop body compiles ONCE instead of G times, which keeps the HLO
    small enough for remote-compile relays (a fully unrolled 128-step
    giant loop OOM-killed the relay's compile helper).  Sparse supports
    keep the unrolled Python loop, which skips all-zero giant chunks
    (fewer rotations, less key-switch noise)."""
    import jax

    fac = form.factory
    bfv0 = fac.bfv[0]
    p = bfv0.p
    q = p.chain_q.q
    keys = fac.keys
    g, G, F = form.g, form.G, form.F
    if not form.active:
        raise ValueError("BSGS form has no nonzero diagonals")

    u = data[:, 0]                                        # [P, 2, k, N]
    if F == 2:
        OPS.count("rotation", 1)
        uf = bfv0.rotate_columns(Ciphertext(u), keys).data
        ub = jnp.stack([u, uf], axis=1)                   # [P, F, 2, k, N]
    else:
        ub = u[:, None]

    # ---- baby steps: rot_b(u) for b < g.  HOISTED when eligible (see
    # hoist_eligible): one shared decomposition + per-step NTT-domain
    # gathers (zero NTTs per baby).  Otherwise the single-hop chain.
    hoist = hoist_eligible(fac, g)
    if hoist:
        OPS.count("rotation", F * (g - 1))
        bab_hat = _hoisted_babies_hat(fac, ub, g)         # [P, g, F, 2, k, N]
    else:
        # (op counts reflect EXECUTED key switches per path: the scanned
        # baby chain performs g switches — the last one is discarded —
        # while the unrolled chain performs g-1)
        OPS.count("rotation", F * (g if g > 8 else g - 1))
        if g > 8:
            def baby_body(cur, _):
                return bfv0.rotate_rows(Ciphertext(cur), 1, keys).data, cur

            _, bab = jax.lax.scan(baby_body, ub, None, length=g)
            bab = jnp.moveaxis(bab, 0, 1)                 # [P, g, F, 2, k, N]
        else:
            babies = [ub]
            cur = ub
            for _ in range(1, g):
                cur = bfv0.rotate_rows(Ciphertext(cur), 1, keys).data
                babies.append(cur)
            bab = jnp.stack(babies, axis=1)
        bab_hat = p.ntt_q.forward(bab)                    # [P, g, F, 2, k, N]

    tbl = jnp.asarray(form.table)    # constant -> hoisted to a program arg

    def chunk_acc(tbl_a):
        """[g, F, n] diag chunk -> coefficient-domain acc [P, 2, k, N]."""
        forms = _encode_diag_chunk(fac, tbl_a)            # [P, g, F, k, N]
        prod = p.chain_q.mont_mul(bab_hat, forms[:, :, :, None])
        acc_hat = mod_sum(
            prod.reshape(prod.shape[0], g * F, *prod.shape[3:]), q, axis=1
        )
        return p.ntt_q.inverse(acc_hat)

    if len(form.active) > max(4, G // 4):
        # dense support: Horner over ALL giant steps as one scanned body,
        # z <- rot_g(z) + acc_a for a = G-1 .. 0.  The scan encodes and
        # multiplies ALL G chunks (zero chunks included) and performs G
        # key switches (the first on a zero ciphertext), so the telemetry
        # counts the executed graph, not the sparse-equivalent work.
        OPS.count("plain_multiplication", g * F * G)
        OPS.count("rotation", G)

        def giant_body(z, tbl_a):
            acc = chunk_acc(tbl_a)
            z = add_mod(
                bfv0.rotate_rows(Ciphertext(z), g, keys).data, acc, q
            )
            return z, None

        z0 = jnp.zeros_like(u)
        z, _ = jax.lax.scan(giant_body, z0, tbl[::-1])
    else:
        # sparse support: unrolled, skipping all-zero chunks
        OPS.count("plain_multiplication", g * F * len(form.active))
        OPS.count("rotation", len(form.active))
        z = None
        prev = None
        for a in reversed(form.active):
            acc = chunk_acc(tbl[a])
            if z is None:
                z = acc
            else:
                z = add_mod(
                    bfv0.rotate_rows(
                        Ciphertext(z), g * (prev - a), keys
                    ).data,
                    acc,
                    q,
                )
            prev = a
        if prev:
            z = bfv0.rotate_rows(Ciphertext(z), g * prev, keys).data
    return z[:, None]                                     # [P, 1, 2, k, N]
