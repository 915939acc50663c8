"""Parameter presets: map each reference app's SEAL configuration onto the
TPU-native 31-bit-limb chains at the same total modulus width.

The reference truncates SEAL's CoeffModulus128(n) chain with
SmallModulusCount (`AtomicSealBfvVector.cs:148-149`); our chains have
narrower (31-bit) limbs, so we match the TOTAL bit width of the truncated
SEAL chain — same security, same noise capacity, more (perfectly
parallel) limbs.
"""

from __future__ import annotations

import math

from ..crypto.primes import default_coeff_modulus_128, ntt_primes

# SEAL 3.2 CoeffModulus128 limb bit widths per ring degree (public
# constants of SEAL's defaultparams.h).
SEAL_128_CHAIN_BITS = {
    1024: [27],
    2048: [54],
    4096: [36, 36, 37],
    8192: [43, 43, 44, 44, 44],
    16384: [48, 48, 48, 49, 49, 49, 49, 49, 49],
}


def coeff_count_for(n: int, small_modulus_count: int | None = None) -> int:
    """Number of 31-bit limbs matching the (truncated) SEAL chain width."""
    bits = SEAL_128_CHAIN_BITS[n]
    if small_modulus_count is not None:
        bits = bits[:small_modulus_count]
    total = sum(bits)
    ours = default_coeff_modulus_128(n)
    per = ours[0].bit_length()
    return min(math.ceil(total / per), len(ours))


# Per-app factory configs, verbatim plain primes from the reference
# (SURVEY.md section 2.4).
#
# Key-switch mode per preset.  n_special > 0 = hybrid (special-prime)
# switching: data limbs plus special limbs stay within the ring degree's
# 128-bit total-modulus budget (SECURITY_BITS_128), so security matches
# the reference while rotations/relin run ~3x fewer NTTs with ~2^dbc less
# key-switch noise.  ks_alpha > 0 (without n_special) = P-less RNS-group
# switching: same NTT savings, costs ~31*alpha bits of key-switch noise —
# used where the full data chain is needed (no room for special primes)
# but the budget slack absorbs it.  Splits validated by encrypted
# end-to-end runs (match vs raw backend + final noise budgets > 0).
CONFIGS = {
    "default": dict(  # `IFactory.cs:244-253`
        plain_primes=(40961, 65537, 114689, 147457, 188417), n=4096,
    ),
    # CryptoNets, TPU-native plaintext CRT: the reference's two ~39-bit
    # primes (`CryptoNets.cs:17`, ~78.6-bit capacity) force the host
    # big-int encode/decode path (no 64-bit integer datapath on TPU) —
    # measured 24 s of the 8192-image batch is host slot-encode while
    # ALL on-device compute is ~3 s (scripts/stage_breakdown.py
    # --network CryptoNets, r5).  Three ~30-bit NTT-friendly primes give
    # ~90-bit CRT capacity — strictly more than the reference's message
    # width — with device-side encode/decode and the fused single-launch
    # pipeline.  Exact integer arithmetic, verified against the Raw
    # oracle per batch; verbatim-prime config kept as `cryptonets_bigt`.
    # ntt_impl="butterfly": at CryptoNets' batch shapes (835-column
    # stacks) the XLA butterfly pipeline is both faster AND correct on
    # real TPU, while the pallas-based run of the identical program
    # failed the raw-agreement gate (all entries corrupt) — the SAME
    # program is exact on CPU and every isolated pallas repro up to
    # 1.1 GiB operands is bit-exact, so the cause (some interaction
    # inside the giant fused program) is unresolved; see CLAUDE.md for
    # the repro command.  bench.py's exact-oracle gate catches any
    # affected config before a latency is ever reported.
    "cryptonets": dict(
        plain_primes=ntt_primes(8192, 30, 3), n=8192,
        ntt_impl="butterfly",
    ),
    "cryptonets_bigt": dict(  # `CryptoNets.cs:17`
        plain_primes=(549764251649, 549764284417), n=8192,
    ),
    "lola": dict(  # `LoLaCryptonets.cs:208` — needs the full 7-limb data
        # chain for its two squares + plain-mult stages (217 of the 218
        # security bits at n=8192), so special primes don't fit; digit
        # decomposition at dbc=8 is used.  Noise depends hard on the
        # PIPELINE built on this preset:
        #  * reference packing (`build_lola`/LoLaPacked — the interleave
        #    mask multiplies and deep rotation trees): dbc=16 -> 0-5
        #    bits final (one observed exhaustion); dbc=12 -> min 5 /
        #    median 7 over 100 seeds; dbc=8 -> min 7 / median 10 over
        #    the committed sweep (scripts/noise_sweep.py,
        #    bench_data/noise_sweep_lola*.json).  P-less ks_alpha=1
        #    (~31 bits of key-switch noise per rotation) exhausts it.
        #  * TPU-native hoisted-BSGS packing (`build_lola_bsgs`, the
        #    shipped "LoLa"): no mask multiplies, far fewer switch
        #    accumulations — 46-47 bits of final budget at dbc=8.
        plain_primes=(557057, 638977, 737281, 786433), n=8192, dbc=8,
    ),
    "lola_dense": dict(  # `LoLaCryptonets.cs:123` (SMC 7 of 9 @ 16384)
        # SMC-7 = 340 SEAL bits; 11 data limbs (341 bits) measurably
        # exhausts at the last interleaved dense layer (the interleave
        # mask multiplies cost ~t bits each), so trade one special
        # prime for a 12th data limb: 372 data bits + 62 special =
        # 434 <= 438-bit security budget, final budget 23 bits.
        plain_primes=(34359771137, 34360754177), n=16384,
        coeff_count=coeff_count_for(16384, 7) + 1, n_special=2,
    ),
    "lola_small": dict(  # `LoLaCryptonets.cs:283` (SMC 3 of 5 @ 8192)
        plain_primes=(2277377, 2424833), n=8192,
        coeff_count=coeff_count_for(8192, 3), n_special=2,
    ),
    # LoLaLarge, TPU-native plaintext CRT: the reference's three primes
    # (`LoLaCryptonets.cs:341`) are a hair ABOVE 2**31 (2148728833 =
    # 2**31 + 1.85M), which alone forces the host big-int encode path.
    # Three ~30-bit NTT-friendly primes give ~90 bits of capacity vs the
    # ~82.5-bit peak message (measured, see build_lola_large), with every
    # pipeline on the device fast paths incl. the BSGS conv-as-dense.
    # Verbatim-prime config kept as `lola_large_bigt`.
    "lola_large": dict(
        plain_primes=ntt_primes(16384, 30, 3), n=16384,
        coeff_count=coeff_count_for(16384, 7), n_special=3,
    ),
    "lola_large_bigt": dict(  # `LoLaCryptonets.cs:341`
        plain_primes=(2148728833, 2148794369, 2149810177), n=16384,
        coeff_count=coeff_count_for(16384, 7), n_special=3,
    ),
    # CIFAR, TPU-native plaintext CRT: the reference packs its ~79.55-bit
    # messages (`LolaCifarCryptoNet.cs:28-30`) into 2x~40-bit plain primes
    # (`:35`), which forces host big-int encode/decode (no 64-bit integer
    # datapath on TPU).  Three ~30-bit NTT-friendly primes give ~90 bits
    # of CRT message capacity — strictly more than the reference's
    # 79.55+1-bit requirement — with every pipeline on the device fast
    # paths (fused single-launch encrypt/network/decrypt, device-encoded
    # BSGS diagonals).  Same exact integer arithmetic, verified
    # bit-for-bit against the Raw oracle; the verbatim-prime config is
    # kept as `cifar_bigt` below for parity documentation.
    "cifar": dict(
        plain_primes=ntt_primes(16384, 30, 3), n=16384,
        coeff_count=coeff_count_for(16384, 8), n_special=1,
    ),
    "cifar_bigt": dict(  # `LolaCifarCryptoNet.cs:35` (SMC 8 of 9 @ 16384)
        plain_primes=(957181001729, 957181034497), n=16384,
        coeff_count=coeff_count_for(16384, 8), n_special=1,
    ),
    "caltech": dict(  # `Caltech101.cs:21` (SMC 2 of 3 @ 4096)
        plain_primes=(4300801,), n=4096,
        coeff_count=coeff_count_for(4096, 2),
    ),
}

# total-modulus security check: data + special limbs within budget
from ..crypto.primes import SECURITY_BITS_128  # noqa: E402

for _name, _cfg in CONFIGS.items():
    _k = _cfg.get("coeff_count") or len(
        default_coeff_modulus_128(_cfg["n"])
    )
    _bits = 31 * (_k + _cfg.get("n_special", 0))
    assert _bits <= SECURITY_BITS_128[_cfg["n"]], (_name, _bits)


def make_factory(name: str, encrypt: bool = True, seed: int = 0, **overrides):
    """Build the encrypted (CrtBfv) or Raw factory for a preset."""
    from ..api.factory import CrtBfvFactory, RawFactory

    cfg = dict(CONFIGS[name])
    cfg.update(overrides)
    if not encrypt:
        return RawFactory(cfg["n"])
    return CrtBfvFactory(seed=seed, **cfg)
