"""Persistence: keys, ciphertext vectors/matrices (ref key save/load as
zip-of-streams `EncryptedSealBfvVector.cs:104-134` and base64 ciphertext
framing `AtomicSealBfvVector.cs:1273-1345`).

Format: a single .npz per artifact with a JSON config entry.  Key files
may exclude the secret key (`IFactory.cs:296-304` semantics): a factory
loaded from a public-only file encrypts and evaluates but refuses to
decrypt, matching the reference's client/server split.

Wire-format note (vs the reference): the reference frames ciphertexts
as TEXT — per-vector header lines plus one base64-encoded SEAL blob per
ciphertext (`AtomicSealBfvVector.cs:1273-1345`) — because its payloads
are opaque native-SEAL buffers.  Here a ciphertext IS a uint32 limb
tensor, so the natural wire format is a binary .npz: the [P, C, size,
k, N] array verbatim plus a JSON metadata entry (dim/scale/format/
signedness — the same fields the reference's text header carries).
Functionally equivalent (client encrypt -> ship -> server evaluate ->
ship -> client decrypt round-trips in tests/test_serial.py), ~25%
smaller than base64, and zero-copy to device.
"""

from __future__ import annotations

import io
import json

import numpy as np
import jax.numpy as jnp


def _key_arrays(keys) -> dict:
    out = {
        "k__s_hat_mont": keys.s_hat_mont,
        "k__s2_hat_mont": keys.s2_hat_mont,
        "k__p0": keys.p0_hat_mont,
        "k__p1": keys.p1_hat_mont,
        "k__relin_k0": keys.relin.k0,
        "k__relin_k1": keys.relin.k1,
        "k__s_small": keys.s_small,
    }
    for g, sk in keys.galois.items():
        out[f"g{g}__k0"] = sk.k0
        out[f"g{g}__k1"] = sk.k1
    return out


def save_keys(factory, path: str, include_secret: bool = True):
    """Persist factory configuration + keys (optionally public-only)."""
    p0 = factory.params[0]
    cfg = dict(
        plain_primes=list(factory.plain_primes),
        n=factory.n,
        coeff_modulus=[int(q) for q in factory.coeff_modulus],
        dbc=p0.dbc,
        n_special=p0.n_special,
        ks_alpha=p0.ks_alpha,
        ntt_impl=p0.ntt_impl,
        include_secret=include_secret,
    )
    arrays = {
        k: np.asarray(v) for k, v in _key_arrays(factory.keys).items()
    }
    if not include_secret:
        for name in ("k__s_hat_mont", "k__s2_hat_mont", "k__s_small"):
            arrays[name] = np.zeros_like(arrays[name])
    np.savez_compressed(path, config=json.dumps(cfg), **arrays)


def load_factory(path: str):
    """Rebuild a CrtBfvFactory from a key file WITHOUT regenerating keys."""
    from ..crypto.bfv import KeySet, SwitchKeys
    from .factory import CrtBfvFactory

    with np.load(path, allow_pickle=False) as z:
        cfg = json.loads(str(z["config"]))
        arrays = {k: z[k] for k in z.files if k != "config"}
    fac = CrtBfvFactory.__new__(CrtBfvFactory)
    fac.__init__(
        plain_primes=tuple(cfg["plain_primes"]),
        n=cfg["n"],
        coeff_modulus=tuple(cfg["coeff_modulus"]),
        dbc=cfg["dbc"],
        n_special=cfg.get("n_special", 0),
        ks_alpha=cfg.get("ks_alpha", 0),
        ntt_impl=cfg.get("ntt_impl", "butterfly"),
        seed=0,
        _skip_keygen=True,
    )
    galois = {}
    for name in arrays:
        if name.startswith("g") and name.endswith("__k0"):
            g = int(name[1:].split("__")[0])
            galois[g] = SwitchKeys(
                k0=jnp.asarray(arrays[f"g{g}__k0"]),
                k1=jnp.asarray(arrays[f"g{g}__k1"]),
            )
    fac.keys = KeySet(
        s_hat_mont=jnp.asarray(arrays["k__s_hat_mont"]),
        s2_hat_mont=jnp.asarray(arrays["k__s2_hat_mont"]),
        p0_hat_mont=jnp.asarray(arrays["k__p0"]),
        p1_hat_mont=jnp.asarray(arrays["k__p1"]),
        relin=SwitchKeys(
            k0=jnp.asarray(arrays["k__relin_k0"]),
            k1=jnp.asarray(arrays["k__relin_k1"]),
        ),
        galois=galois,
        s_small=jnp.asarray(arrays["k__s_small"]),
    )
    fac.has_secret_key = bool(cfg["include_secret"])
    if not fac.has_secret_key:
        print(
            "Warning: key file has no secret key; decryption is disabled"
        )
    return fac


def save_vector(vec, fh):
    """Serialize an encrypted HEVector to a binary stream."""
    meta = dict(
        dim=vec.dim, scale=vec.scale, fmt=vec.fmt,
        is_signed=vec.is_signed,
    )
    buf = io.BytesIO()
    np.savez_compressed(
        buf, meta=json.dumps(meta), data=np.asarray(vec.data)
    )
    fh.write(buf.getvalue())


def load_vector(factory, fh):
    from .vector import HEVector

    with np.load(io.BytesIO(fh.read()), allow_pickle=False) as z:
        meta = json.loads(str(z["meta"]))
        data = jnp.asarray(z["data"])
    return HEVector(
        factory, data=data, dim=meta["dim"], scale=meta["scale"],
        fmt=meta["fmt"], is_signed=meta["is_signed"],
    )


def save_matrix(mat, fh):
    meta = dict(
        fmt=mat.fmt,
        vecs=[
            dict(dim=v.dim, scale=v.scale, fmt=v.fmt, is_signed=v.is_signed)
            for v in mat.vectors
        ],
    )
    buf = io.BytesIO()
    np.savez_compressed(
        buf,
        meta=json.dumps(meta),
        **{f"v{i}": np.asarray(v.data) for i, v in enumerate(mat.vectors)},
    )
    fh.write(buf.getvalue())


def load_matrix(factory, fh):
    from .matrix import HEMatrix
    from .vector import HEVector

    with np.load(io.BytesIO(fh.read()), allow_pickle=False) as z:
        meta = json.loads(str(z["meta"]))
        vecs = [
            HEVector(
                factory,
                data=jnp.asarray(z[f"v{i}"]),
                dim=m["dim"], scale=m["scale"], fmt=m["fmt"],
                is_signed=m["is_signed"],
            )
            for i, m in enumerate(meta["vecs"])
        ]
    return HEMatrix(factory, vecs, meta["fmt"])
