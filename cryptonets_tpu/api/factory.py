"""Factories: parameter/key owners and vector/matrix constructors.

Reference counterparts: `EncryptedSealBfvFactory` (CRT multi-plain-prime
production path, `IFactory.cs:240-410`) and `RawFactory` (plaintext oracle,
`IFactory.cs:138-238`).  TPU-native differences:

  * One shared key set across all plain primes (keys depend only on the
    coefficient chain; the reference regenerates per prime).
  * No environment pooling — ops are pure functions; the plain-prime axis
    is a leading tensor axis batched in one kernel launch instead of one
    .NET Task per prime (`EncryptedSealBfvVector.cs:225-236`).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..crypto.bfv import BFV, BFVParams
from ..crypto.encoder import BatchEncoder
from ..crypto.hostmath import CRT, center
from ..crypto.primes import default_coeff_modulus_128

# Reference default factory: 5 plain primes, n=4096 (`IFactory.cs:244-253`).
DEFAULT_PLAIN_PRIMES = (40961, 65537, 114689, 147457, 188417)


class CrtBfvFactory:
    """The production factory: CRT "double decker" over plain primes.

    Each value is split into residues mod each plain prime; each residue
    stream is an independent BFV pipeline over the SAME coefficient chain
    and key set, stacked on a leading P axis.
    """

    def __init__(
        self,
        plain_primes=DEFAULT_PLAIN_PRIMES,
        n: int = 4096,
        coeff_count: int | None = None,
        coeff_modulus=None,
        dbc: int = 16,
        seed: int = 0,
        rot_steps=(),
        n_special: int = 0,
        ks_alpha: int = 0,
        ntt_impl: str | None = None,
        _skip_keygen: bool = False,
    ):
        # operator override wins over both the caller/preset choice and
        # the measured default (A/B knob for in-network NTT experiments)
        import os as _os

        _env_impl = _os.environ.get("CRYPTONETS_NTT")
        if _env_impl:
            ntt_impl = _env_impl
        if ntt_impl is None:
            # Pallas fused NTT is bit-exact with butterfly (keys
            # interchangeable).  ISOLATED batched microbenchmarks show
            # the XLA butterfly pipeline 3x faster at B>=64
            # (bench_data/roofline_batched_*.json), but IN-NETWORK the
            # relation inverts hard: routing batched transforms to
            # butterfly ('hybrid') measured LoLa at 3.09-3.45 s/record
            # vs 1.18-1.45 s all-pallas, and its extra stage liveness
            # OOM'd CryptoNets' HBM — isolated chains let XLA schedule
            # 13 stages back-to-back with nothing else resident, which
            # the real programs never do.  'hybrid' remains available
            # for experimentation; pallas is the measured default.  Off
            # TPU pallas would run in interpret mode, so keep butterfly.
            ntt_impl = (
                "pallas" if jax.default_backend() == "tpu" else "butterfly"
            )
        self.n = n
        self.ntt_impl = ntt_impl
        self.plain_primes = tuple(int(t) for t in plain_primes)
        self.P = len(self.plain_primes)
        chain = tuple(coeff_modulus) if coeff_modulus else default_coeff_modulus_128(n)
        if coeff_count is not None:
            chain = chain[:coeff_count]
        self.coeff_modulus = chain
        self.params = [
            BFVParams(
                n, t, coeff_modulus=chain, dbc=dbc, seed=seed,
                n_special=n_special, ks_alpha=ks_alpha, ntt_impl=ntt_impl,
            )
            for t in self.plain_primes
        ]
        self.bfv = [BFV(p) for p in self.params]
        self.has_secret_key = True
        # Keys are plain-modulus independent: generate once, share across P.
        self.keys = (
            None
            if _skip_keygen
            else self._generate_keys(seed=seed, rot_steps=rot_steps)
        )
        self.encoders = [BatchEncoder(n, t) for t in self.plain_primes]
        self.plain_crt = CRT(list(self.plain_primes))
        self._rng_key = jax.random.key(seed ^ 0x5EED)
        self._mask_cache: dict = {}
        self._plain_cache: dict = {}
        self._stacked_galois_cache: dict = {}
        # single-launch encrypt/decrypt across all plain primes (each
        # extra launch costs ~40ms on relay-attached TPUs)
        self._encrypt_jit = jax.jit(self._encrypt_all)
        self._decrypt_jit = jax.jit(self._decrypt_all)
        # device-side slot encoding: the encoder iNTT over Z_t runs
        # on-chip inside the encrypt launch when every plain prime fits
        # uint32 (uploads slots, not residues: k times smaller)
        self._device_encode = all(
            t < (1 << 31) and t < min(self.coeff_modulus)
            for t in self.plain_primes
        )
        if self._device_encode:
            from ..crypto.ntt import get_ntt_context

            self._enc_ntt = [
                get_ntt_context(n, (t,)) for t in self.plain_primes
            ]
            self._encrypt_dev_jit = jax.jit(self._encrypt_all_dev)
        # device-side slot DECODE (forward NTT over Z_t on-chip): decrypt
        # returns slot values, not coefficients, so the host does only the
        # tiny CRT join (the reference decodes in native C++ behind
        # BatchEncoder.Decode; here decode fuses into the decrypt launch)
        self._device_decode = all(t < (1 << 31) for t in self.plain_primes)
        if self._device_decode:
            from ..crypto.ntt import get_ntt_context

            self._dec_ntt = get_ntt_context(n, self.plain_primes)
            self._index_map = jnp.asarray(self.encoders[0].index_map)
            self._decrypt_decode_jit = jax.jit(self._decrypt_decode_all)
        # big plain moduli (CryptoNets/CIFAR): device scale-and-round to
        # two uint32 planes, exact int64 host join, C++ slot decode
        self._device_decode_big = all(
            (1 << 31) <= t < (1 << 62) for t in self.plain_primes
        )
        if self._device_decode_big:
            self._decrypt_big_jit = jax.jit(self._decrypt_big_all)

    def _decrypt_big_all(self, data):
        """[P, C, size, k, N] -> (W mod 2^32, W mod m2) uint32 [P, C, N]."""
        from ..crypto.bfv import Ciphertext

        los, m2s = [], []
        for pi in range(self.P):
            lo, m2 = self.bfv[pi].decrypt_big_t_planes(
                self.keys, Ciphertext(data[pi])
            )
            los.append(lo)
            m2s.append(m2)
        return jnp.stack(los), jnp.stack(m2s)

    def _decode_big_slots(self, lo, m2, pi: int) -> np.ndarray:
        """Join planes + slot-decode for prime pi: [C, N] -> [C*n] object."""
        W = self.bfv[pi].join_big_t_planes(lo, m2)  # [C, N] uint64
        return np.concatenate(
            [self.encoders[pi].decode(W[b]) for b in range(W.shape[0])]
        )

    def _decrypt_decode_all(self, data):
        """[P, C, size, k, N] -> slot values mod t_p [P, C, N] (uint32).
        One program: gamma decrypt + forward NTT over Z_t + slot gather."""
        res = self._decrypt_all(data)              # [P, C, N] coeffs mod t
        ev = self._dec_ntt.forward(
            jnp.swapaxes(res, 0, 1)                # [C, P, N]: P = limb axis
        )
        slots = jnp.take(ev, self._index_map, axis=-1)
        return jnp.swapaxes(slots, 0, 1)           # [P, C, N]

    def _encrypt_all_dev(self, bufs, rng):
        """bufs: [P, C, n] uint32 index-mapped slot values (mod t_p) ->
        ciphertext data [P, C, 2, k, N]; the Z_t iNTT runs on device and
        coefficients broadcast to the limb axis (t < every q_i)."""
        import jax as _jax

        rngs = _jax.random.split(rng, self.P)
        k = len(self.coeff_modulus)
        C = bufs.shape[1]
        outs = []
        for pi in range(self.P):
            coeffs = self._enc_ntt[pi].inverse(bufs[pi][:, None, :])
            res = jnp.broadcast_to(coeffs, (C, k, self.n))
            outs.append(
                self.bfv[pi].encrypt(self.keys, res, rngs[pi]).data
            )
        return jnp.stack(outs)

    def _encrypt_all(self, res_all, rng):
        """res_all [P, C, k, N] -> ciphertext data [P, C, 2, k, N]."""
        import jax as _jax

        rngs = _jax.random.split(rng, self.P)
        return jnp.stack(
            [
                self.bfv[pi].encrypt(self.keys, res_all[pi], rngs[pi]).data
                for pi in range(self.P)
            ]
        )

    def _decrypt_all(self, data):
        """[P, C, size, k, N] -> plaintext residues mod t_p [P, C, N]."""
        from ..crypto.bfv import Ciphertext

        return jnp.stack(
            [
                self.bfv[pi].decrypt_residues_mod_t(
                    self.keys, Ciphertext(data[pi])
                )
                for pi in range(self.P)
            ]
        )

    # ------------------------------------------------------------ keygen
    def _generate_keys(self, seed: int, rot_steps):
        """Generate the shared key set, preferring a host-CPU keygen.

        On relay-attached TPUs the keygen program pays a slow REMOTE
        compile whenever the relay's compile cache is cold (~100 s
        observed with a warm local cache; ~20 min fully cold — the
        round-3 driver bench died inside exactly this phase).  Key
        tensors are NTT-domain VALUES; 'butterfly', 'pallas' and
        'hybrid' share the Longa-Naehrig ordering, 'matmul' has its own
        (4-step) evaluation-point ordering.  When a local CPU backend
        exists we generate keys there in the MATCHING ordering — local
        compile, seconds — and ship the ~240 MB key set to the device
        once (~0.4 s on this rig).  `CRYPTONETS_KEYGEN=device` forces
        the on-device path.
        """
        import os

        mode = os.environ.get("CRYPTONETS_KEYGEN", "auto")
        cacheable = self.ntt_impl in ("butterfly", "pallas", "hybrid",
                                      "matmul")
        # keys are interchangeable within an ordering class only
        kg_ntt = "matmul" if self.ntt_impl == "matmul" else "butterfly"
        cache_file = None
        if cacheable and os.environ.get("CRYPTONETS_KEY_CACHE"):
            cache_file = self._key_cache_path(seed, rot_steps)
            cached = self._load_cached_keys(cache_file)
            if cached is not None:
                return cached
        if (
            mode != "device"
            and jax.default_backend() != "cpu"
            and cacheable
        ):
            try:
                cpu = jax.local_devices(backend="cpu")[0]
            except RuntimeError:
                cpu = None
            if cpu is not None:
                p0 = self.params[0]
                with jax.default_device(cpu):
                    kg_params = BFVParams(
                        self.n,
                        self.plain_primes[0],
                        coeff_modulus=self.coeff_modulus,
                        dbc=p0.dbc,
                        seed=seed,
                        n_special=p0.n_special,
                        ks_alpha=p0.ks_alpha,
                        ntt_impl=kg_ntt,
                    )
                    keys = BFV(kg_params).keygen(
                        seed=seed, rot_steps=rot_steps
                    )
                    keys = jax.block_until_ready(keys)
                if cache_file:
                    self._save_cached_keys(cache_file, keys)
                return jax.device_put(keys, jax.devices()[0])
        keys = self.bfv[0].keygen(seed=seed, rot_steps=rot_steps)
        if cache_file:
            self._save_cached_keys(cache_file, jax.block_until_ready(keys))
        return keys

    def _key_cache_path(self, seed: int, rot_steps) -> str:
        """Cache file for this key geometry.  OPT-IN via the
        CRYPTONETS_KEY_CACHE env var (a directory): the file holds the
        SECRET key material, so this is for benchmarking / single-tenant
        server use where the cache dir is in the operator's own trust
        domain (bench.py enables it; the library default is off)."""
        import hashlib
        import os

        p0 = self.params[0]
        # keys are NTT-domain: the cache key carries the evaluation-point
        # ordering class ('ln' = butterfly/pallas/hybrid, 'mm' = matmul);
        # the legacy keyset-v1 tag is kept for 'ln' so pre-existing cache
        # files still hit.
        ordering = "mm" if self.ntt_impl == "matmul" else "ln"
        fields = [
            "keyset-v1", self.n, self.coeff_modulus, p0.dbc,
            p0.n_special, p0.ks_alpha, int(seed),
            tuple(sorted(int(s) for s in rot_steps)),
        ]
        if ordering != "ln":
            fields.append(ordering)
        desc = repr(tuple(fields))
        h = hashlib.sha256(desc.encode()).hexdigest()[:24]
        d = os.environ["CRYPTONETS_KEY_CACHE"]
        os.makedirs(d, exist_ok=True)
        return os.path.join(d, f"keys-{h}.npz")

    def _load_cached_keys(self, path: str):
        import os

        from ..crypto.bfv import KeySet, SwitchKeys

        if not os.path.exists(path):
            return None
        z = np.load(path)
        galois = {}
        for name in z.files:
            if name.startswith("g_") and name.endswith("_k0"):
                g = int(name[2:-3])
                galois[g] = SwitchKeys(
                    k0=jnp.asarray(z[name]),
                    k1=jnp.asarray(z[f"g_{g}_k1"]),
                )
        keys = KeySet(
            s_hat_mont=jnp.asarray(z["s_hat_mont"]),
            s2_hat_mont=jnp.asarray(z["s2_hat_mont"]),
            p0_hat_mont=jnp.asarray(z["p0_hat_mont"]),
            p1_hat_mont=jnp.asarray(z["p1_hat_mont"]),
            relin=SwitchKeys(
                k0=jnp.asarray(z["relin_k0"]), k1=jnp.asarray(z["relin_k1"])
            ),
            galois=galois,
            s_small=jnp.asarray(z["s_small"]),
        )
        return jax.device_put(keys, jax.devices()[0])

    @staticmethod
    def _save_cached_keys(path: str, keys) -> None:
        arrays = {
            "s_hat_mont": np.asarray(keys.s_hat_mont),
            "s2_hat_mont": np.asarray(keys.s2_hat_mont),
            "p0_hat_mont": np.asarray(keys.p0_hat_mont),
            "p1_hat_mont": np.asarray(keys.p1_hat_mont),
            "relin_k0": np.asarray(keys.relin.k0),
            "relin_k1": np.asarray(keys.relin.k1),
            "s_small": np.asarray(keys.s_small),
        }
        for g, sk in keys.galois.items():
            arrays[f"g_{g}_k0"] = np.asarray(sk.k0)
            arrays[f"g_{g}_k1"] = np.asarray(sk.k1)
        import os

        # The cache holds SECRET key material (s_hat_mont/s_small):
        # create the file 0o600 and keep the cache dir 0o700 so other
        # local users can't read keys bench.py auto-caches.
        try:
            os.chmod(os.path.dirname(path) or ".", 0o700)
        except OSError:
            pass
        tmp = path + ".tmp"
        fd = os.open(tmp, os.O_WRONLY | os.O_CREAT | os.O_TRUNC, 0o600)
        with os.fdopen(fd, "wb") as fh:
            np.savez(fh, **arrays)
        os.replace(tmp, path)

    # -------------------------------------------------------------- helpers
    @property
    def slot_count(self) -> int:
        return self.n

    @property
    def block_size(self) -> int:
        return self.n

    def fresh_key(self):
        self._rng_key, k = jax.random.split(self._rng_key)
        return k

    def stacked_galois(self, g_tuple):
        """(src [L,N], negm [L,N], k0 [L,...], k1 [L,...]) stacks for a
        static ladder of Galois elements — the xs of
        `BFV.rotate_accumulate_scan`.  Built once per ladder (eager
        device stack of existing key tensors) and cached; under an
        enclosing trace the stacks hoist to shared program arguments
        like any other key material (utils/hoist.py)."""
        cached = self._stacked_galois_cache.get(g_tuple)
        if cached is None:
            from ..crypto.bfv import _automorphism_tables_np

            # ensure_compile_time_eval: the first call often happens
            # INSIDE a trace (the sum tree of a jitted forward); the
            # stacks must be CONCRETE arrays, or the cache would hold
            # tracers that leak into later traces (measured: the
            # weak-scaling batch curve's second jit crashed with
            # UnexpectedTracerError).
            with jax.ensure_compile_time_eval():
                tabs = [
                    _automorphism_tables_np(self.n, g) for g in g_tuple
                ]
                srcs = jnp.asarray(np.stack([t[0] for t in tabs]))
                negms = jnp.asarray(np.stack([t[1] for t in tabs]))
                k0s = jnp.stack(
                    [self.keys.galois[g].k0 for g in g_tuple]
                )
                k1s = jnp.stack(
                    [self.keys.galois[g].k1 for g in g_tuple]
                )
            cached = (srcs, negms, k0s, k1s)
            self._stacked_galois_cache[g_tuple] = cached
        return cached

    def stacked_baby_rotations(self, g: int):
        """(perm [g-1, N] int32, k0 [g-1, kD, ...], k1) stacks for the
        hoisted BSGS baby steps 1..g-1 (api/bsgs.py): NTT-domain
        automorphism gather tables plus that step's switch keys.
        Requires Galois keys for every step (factory rot_steps)."""
        key = ("bsgs_baby", g)
        cached = self._stacked_galois_cache.get(key)
        if cached is None:
            from ..crypto.ntt import ntt_automorphism_perm

            bfv0 = self.bfv[0]
            gs = [bfv0.galois_elt_rows(b) for b in range(1, g)]
            # concrete arrays even when first called under a trace (see
            # stacked_galois)
            with jax.ensure_compile_time_eval():
                perms = jnp.asarray(
                    np.stack(
                        [ntt_automorphism_perm(self.n, ge) for ge in gs]
                    )
                )
                k0s = jnp.stack(
                    [self.keys.galois[ge].k0 for ge in gs]
                )
                k1s = jnp.stack(
                    [self.keys.galois[ge].k1 for ge in gs]
                )
            cached = (perms, k0s, k1s)
            self._stacked_galois_cache[key] = cached
        return cached

    def split_big_numbers(self, values) -> list[np.ndarray]:
        """Signed ints -> per-prime residue arrays (ref SplitBigNumbers,
        `EncryptedSealBfvVector.cs:352-379`)."""
        v = np.asarray(values, dtype=object)
        return [(v % t).astype(np.int64) for t in self.plain_primes]

    def join_split_numbers(self, residues) -> np.ndarray:
        """Per-prime slot values -> centered big ints (ref JoinSplitNumbers,
        `EncryptedSealBfvVector.cs:381-411`).  Vectorized object-dtype CRT
        (any input shape; all residue arrays must share it)."""
        crt = self.plain_crt
        M = crt.product
        acc = None
        for r, t, p_i, ip_i in zip(
            residues, self.plain_primes, crt.punctured, crt.inv_punctured
        ):
            unit = (p_i * ip_i) % M
            term = (np.asarray(r, dtype=object) % t) * unit
            acc = term if acc is None else acc + term
        acc = acc % M
        return np.where(acc > M >> 1, acc - M, acc)

    # --------------------------------------------------- CRT string codec
    def get_value_from_string(self, s: str) -> int:
        """Comma-joined per-prime residues -> CRT value in [0, prod t)
        (ref GetValueFromString, `IFactory.cs:395-403`)."""
        parts = [int(x) for x in s.split(",")]
        crt = self.plain_crt
        acc = 0
        for r, punct, inv in zip(parts, crt.punctured, crt.inv_punctured):
            acc += (punct * inv) * r
        return acc % crt.product

    def get_string_from_value(self, value: int) -> str:
        """CRT value -> comma-joined per-prime residues
        (ref GetStringFromValue, `IFactory.cs:405-408`)."""
        return ",".join(str(int(value) % t) for t in self.plain_primes)

    # ------------------------------------------------- slot-domain encoding
    def encode_slots_to_residues(self, slots, prime_idx: int) -> np.ndarray:
        """Slot values (ints mod t) -> coefficient residues [k, N] uint32."""
        t = self.plain_primes[prime_idx]
        if (1 << 31) <= t < (1 << 62):
            # big-t fast path: native C++ NTT + vectorized uint64 residues
            # (the object-int fallback costs minutes at n=8192 x 784 cols)
            try:
                s64 = np.asarray(slots).astype(np.int64)
            except (OverflowError, TypeError):
                s64 = None
            if s64 is not None:
                coeffs = self.encoders[prime_idx].encode_int_big(s64)
                if coeffs is not None:
                    return self.params[prime_idx].plain_to_residues(coeffs)
        coeffs = self.encoders[prime_idx].encode(slots)
        return self.params[prime_idx].plain_to_residues(coeffs)

    def encrypt_blocks(self, int_values, dim: int) -> jnp.ndarray:
        """Signed int slot values (len <= C*n) -> ciphertext data
        [P, C, 2, k, N]; C = ceil(dim / n)."""
        n = self.n
        C = max(1, -(-dim // n))
        vals = np.zeros(C * n, dtype=object)
        vv = np.asarray(int_values, dtype=object)
        vals[: len(vv)] = vv
        return self._encrypt_slotsets(vals.reshape(C, n))

    def decrypt_blocks(self, data, dim: int) -> np.ndarray:
        """[P, C, 2|3, k, N] -> centered big-int slot values [dim]."""
        from ..crypto.bfv import Ciphertext

        if self._device_decode:
            return self.join_decoded_blocks(
                np.asarray(self._decrypt_decode_jit(data)), dim
            )
        if self._device_decode_big:
            lo, m2 = self._decrypt_big_jit(data)
            lo, m2 = np.asarray(lo), np.asarray(m2)
            per_prime = [
                self._decode_big_slots(lo[pi], m2[pi], pi)[:dim]
                for pi in range(self.P)
            ]
            return self.join_split_numbers(per_prime)
        per_prime = []
        for pi in range(self.P):
            coeffs = self.bfv[pi].decrypt(
                self.keys, Ciphertext(data[pi])
            )  # [C, N] object
            slots = np.concatenate(
                [
                    self.encoders[pi].decode(coeffs[b])
                    for b in range(coeffs.shape[0])
                ]
            )
            per_prime.append(slots[:dim])
        return self.join_split_numbers(per_prime)

    def decrypt_columns(self, data, dim: int) -> np.ndarray:
        """Batched matrix decrypt: [P, V, C, size, k, N] -> [V, dim]
        centered big ints, ONE device launch for all V columns (the
        reference decrypts per column in thread tasks)."""
        P, V, C = data.shape[:3]
        flat = data.reshape(P, V * C, *data.shape[3:])
        if self._device_decode:
            slots = np.asarray(self._decrypt_decode_jit(flat))
            slots = slots.reshape(P, V, C * self.n)
            return self.join_split_numbers(
                [slots[pi, :, :dim] for pi in range(P)]
            )
        if self._device_decode_big:
            lo, m2 = self._decrypt_big_jit(flat)
            lo = np.asarray(lo).reshape(P, V, C, self.n)
            m2 = np.asarray(m2).reshape(P, V, C, self.n)
            per_prime = [
                np.stack(
                    [
                        self._decode_big_slots(lo[pi, v], m2[pi, v], pi)[:dim]
                        for v in range(V)
                    ]
                )
                for pi in range(P)
            ]
            return self.join_split_numbers(per_prime)
        return np.stack(
            [self.decrypt_blocks(data[:, v], dim) for v in range(V)]
        )

    def join_decoded_blocks(self, slots_all: np.ndarray, dim: int):
        """Decoded slot residues [P, C, N] -> centered big-int values [dim]."""
        per_prime = [
            slots_all[pi].reshape(-1)[:dim].astype(np.int64)
            for pi in range(self.P)
        ]
        return self.join_split_numbers(per_prime)

    # --------------------------------------------- prepared plaintext forms
    def plain_mult_form(self, int_values, dim: int) -> jnp.ndarray:
        """Slot values -> NTT+Montgomery plaintext multiplier [P, C, k, N]."""
        n = self.n
        C = max(1, -(-dim // n))
        vals = np.zeros(C * n, dtype=object)
        vv = np.asarray(int_values, dtype=object)
        vals[: len(vv)] = vv
        per_prime = []
        for pi in range(self.P):
            res = np.stack(
                [
                    self.encode_slots_to_residues(
                        vals[b * n : (b + 1) * n] % self.plain_primes[pi], pi
                    )
                    for b in range(C)
                ]
            )
            per_prime.append(res)
        res_all = jnp.asarray(np.stack(per_prime).astype(np.uint32))
        return self.bfv[0].prepare_plain_mult(res_all)

    def plain_add_form(self, int_values, dim: int) -> jnp.ndarray:
        """Slot values -> coefficient residues [P, C, k, N] for add_plain."""
        n = self.n
        C = max(1, -(-dim // n))
        vals = np.zeros(C * n, dtype=object)
        vv = np.asarray(int_values, dtype=object)
        vals[: len(vv)] = vv
        per_prime = [
            np.stack(
                [
                    self.encode_slots_to_residues(
                        vals[b * n : (b + 1) * n] % self.plain_primes[pi], pi
                    )
                    for b in range(C)
                ]
            )
            for pi in range(self.P)
        ]
        return jnp.asarray(np.stack(per_prime).astype(np.uint32))

    # ------------------------------------------- vector/matrix constructors
    @staticmethod
    def _scaled_ints(values, scale: float) -> np.ndarray:
        v = np.asarray(values, dtype=np.float64)
        return np.array([int(x) for x in np.round(v * scale)], dtype=object)

    def get_plain_vector(self, values, fmt: str = "dense", scale: float = 1.0):
        from .vector import HEVector

        ints = self._scaled_ints(values, scale)
        return HEVector(
            self, values=ints, dim=len(ints), scale=scale, fmt=fmt
        )

    def get_encrypted_vector(self, values, fmt: str = "dense", scale: float = 1.0):
        from .vector import HEVector

        ints = self._scaled_ints(values, scale)
        dim = len(ints)
        n = self.n
        if fmt == "sparse":
            slotsets = np.stack(
                [np.full(n, v, dtype=object) for v in ints]
            )
        else:
            C = max(1, -(-dim // n))
            buf = np.zeros(C * n, dtype=object)
            buf[:dim] = ints
            slotsets = buf.reshape(C, n)
        data = self._encrypt_slotsets(slotsets)
        return HEVector(self, data=data, dim=dim, scale=scale, fmt=fmt)

    def _encode_slotsets_np(self, slotsets: np.ndarray) -> np.ndarray:
        """[C, n] slot values -> residues [P, C, k, N] (numpy)."""
        small = all(t < (1 << 31) for t in self.plain_primes)
        if small and slotsets.dtype == object:
            try:
                slotsets = slotsets.astype(np.int64)
            except (OverflowError, TypeError):
                small = False
        if small and slotsets.dtype != object:
            return np.stack(
                [
                    self.params[pi].plain_to_residues(
                        self.encoders[pi].encode_int_batch(slotsets)
                    )
                    for pi in range(self.P)
                ]
            )
        return np.stack(
            [
                np.stack(
                    [
                        self.encode_slots_to_residues(
                            row % self.plain_primes[pi], pi
                        )
                        for row in slotsets
                    ]
                )
                for pi in range(self.P)
            ]
        )

    def encode_bufs(self, slotsets_int: np.ndarray) -> np.ndarray:
        """[..., n] integer slot values -> index-mapped [P, ..., n] uint32
        buffers for the device-side encode (the only host work of encrypt)."""
        s64 = slotsets_int.astype(np.int64)
        bufs = np.zeros((self.P,) + s64.shape, np.uint32)
        for pi, t in enumerate(self.plain_primes):
            imap = self.encoders[pi].index_map
            bufs[pi][..., imap] = (s64 % t).astype(np.uint32)
        return bufs

    def _encrypt_slotsets(self, slotsets: np.ndarray) -> jnp.ndarray:
        """[C, n] slot values -> ciphertext data [P, C, 2, k, N]."""
        if self._device_encode:
            ss = slotsets
            if ss.dtype == object:
                try:
                    ss = ss.astype(np.int64)
                except (OverflowError, TypeError):
                    ss = None
            if ss is not None:
                return self._encrypt_dev_jit(
                    jnp.asarray(self.encode_bufs(ss)), self.fresh_key()
                )
        per_prime = self._encode_slotsets_np(slotsets)
        res_all = jnp.asarray(per_prime.astype(np.uint32))
        return self._encrypt_jit(res_all, self.fresh_key())

    def get_plain_matrix(self, m, fmt: str = "col", scale: float = 1.0):
        from .matrix import HEMatrix

        m = np.asarray(m, dtype=np.float64)
        vecs = m.T if fmt == "col" else m
        return HEMatrix(
            self,
            [self.get_plain_vector(v, "dense", scale) for v in vecs],
            fmt,
        )

    def get_encrypted_matrix(self, m, fmt: str = "col", scale: float = 1.0):
        """Encrypt ALL rows/columns with one device launch (the reference
        parallelizes per column, `IFactory.cs:353-380`)."""
        from .matrix import HEMatrix
        from .vector import HEVector

        m = np.asarray(m, dtype=np.float64)
        vecs = m.T if fmt == "col" else m
        V, dim = vecs.shape
        n = self.n
        C = max(1, -(-dim // n))
        ints = np.round(vecs * scale).astype(np.int64)
        slotsets = np.zeros((V * C, n), np.int64)
        padded = np.zeros((V, C * n), np.int64)
        padded[:, :dim] = ints
        slotsets[:] = padded.reshape(V * C, n)
        data = self._encrypt_slotsets(slotsets)  # [P, V*C, 2, k, N]
        data = data.reshape(
            self.P, V, C, *data.shape[2:]
        )
        cols = [
            HEVector(
                self, data=data[:, i], dim=dim, scale=scale, fmt="dense"
            )
            for i in range(V)
        ]
        return HEMatrix(self, cols, fmt)

    def get_matrix(self, vectors, fmt: str = "col"):
        from .matrix import HEMatrix

        return HEMatrix(self, list(vectors), fmt)

    def get_zero_vector(self, dim: int, scale: float = 1.0):
        """A transparent (noise-free) encryption of zero — used for conv
        padding columns; the reference encrypts literal zeros instead
        (`PoolLayer.cs:68-80`), which is equivalent but costlier."""
        from .vector import HEVector

        C = max(1, -(-dim // self.n))
        k = len(self.coeff_modulus)
        data = jnp.zeros((self.P, C, 2, k, self.n), jnp.uint32)
        return HEVector(self, data=data, dim=dim, scale=scale, fmt="dense")

    def add_plain_data(self, data, form, sub: bool = False) -> jnp.ndarray:
        """ct data [P,...] +/- plain residues [P,...]: per-prime Delta."""
        from ..crypto.bfv import Ciphertext

        out = []
        for pi in range(self.P):
            op = self.bfv[pi].sub_plain if sub else self.bfv[pi].add_plain
            out.append(op(Ciphertext(data[pi]), form[pi]).data)
        return jnp.stack(out)

    def _cached_mask(self, key, build):
        """Mask-form cache that never stores trace-time tracers (forms
        built inside a jit trace would leak into later traces)."""
        if key not in self._mask_cache:
            out = build()
            if isinstance(out, jax.core.Tracer):
                return out
            self._mask_cache[key] = out
        return self._mask_cache[key]

    def mask_mult_form(self, lo: int, hi: int) -> jnp.ndarray:
        """0/1 row-position-range mask (both rows), prepared for multiply.
        mask[i] = 1 iff lo <= (i mod (n/2)) < hi.  Cached."""

        def build():
            row = self.n // 2
            pos = np.arange(self.n) % row
            m = ((pos >= lo) & (pos < hi)).astype(np.int64)
            return self.plain_mult_form(m, self.n)

        return self._cached_mask((lo, hi), build)

    def flat_mask_form(self, lo: int, hi: int) -> jnp.ndarray:
        """0/1 mask over FLAT slots [lo, hi) (spans rows naturally)."""

        def build():
            m = np.zeros(self.n, np.int64)
            m[lo:hi] = 1
            return self.plain_mult_form(m, self.n)

        return self._cached_mask(("flat", lo, hi), build)

    def unit_mask_form(self, col: int) -> jnp.ndarray:
        """Mask selecting exactly flat slot `col` (ForceOutputInColumn)."""

        def build():
            m = np.zeros(self.n, np.int64)
            m[col] = 1
            return self.plain_mult_form(m, self.n)

        return self._cached_mask(("unit", col), build)


class RawFactory:
    """Plaintext-double oracle backend (ref `IFactory.cs:138-238`)."""

    def __init__(self, block_size: int = 8192):
        self.block_size = block_size

    @property
    def slot_count(self) -> int:
        return self.block_size

    @property
    def n(self) -> int:
        return self.block_size

    def get_plain_vector(self, values, fmt: str = "dense", scale: float = 1.0):
        from .raw import RawVector

        v = RawVector(values, scale, self.block_size)
        v.fmt = fmt
        return v

    # the raw backend "encrypts" to itself (ref RawFactory)
    get_encrypted_vector = get_plain_vector

    def get_plain_matrix(self, m, fmt: str = "col", scale: float = 1.0):
        from .raw import RawMatrix

        return RawMatrix(m, scale, fmt, self.block_size)

    get_encrypted_matrix = get_plain_matrix

    def get_matrix(self, vectors, fmt: str = "col"):
        from .raw import RawMatrix, RawVector

        arr = np.stack([v.v for v in vectors])
        m = arr.T if fmt == "col" else arr
        return RawMatrix.from_scaled(
            m, vectors[0].scale, fmt, self.block_size
        )

    def get_zero_vector(self, dim: int, scale: float = 1.0):
        from .raw import RawVector

        return RawVector.from_scaled(
            np.zeros(dim), scale, self.block_size
        )
