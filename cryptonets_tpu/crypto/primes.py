"""NTT-friendly prime chains and security-budgeted default parameters.

The reference uses SEAL 3.2's `DefaultParams.CoeffModulus128(n)` chains of
36-49 bit primes (`HE Wrapper/AtomicSealBfvVector.cs:140-161`).  TPUs have
no 64-bit integer datapath, so the TPU-native design keeps every RNS limb
modulus below 2**31 and uses proportionally more limbs; the *total* modulus
bit budget per ring degree follows the same 128-bit-security table as
SEAL/the HE standard, so security is preserved.  The limb axis is
embarrassingly parallel, which is exactly what the VPU/MXU want.
"""

from __future__ import annotations

from functools import lru_cache

from .hostmath import is_prime, root_of_unity

# Max total log2(q) for 128-bit security by ring degree n (HE standard /
# SEAL's CoeffModulus128 totals: 4096->109, 8192->218, 16384->438).
SECURITY_BITS_128 = {1024: 27, 2048: 54, 4096: 109, 8192: 218, 16384: 438, 32768: 881}


@lru_cache(maxsize=None)
def ntt_primes(n: int, bits: int, count: int, below: int | None = None) -> tuple[int, ...]:
    """`count` primes p = 1 (mod 2n) of exactly `bits` bits, descending.

    Deterministic: always scans downward from `below` (default 2**bits).
    """
    step = 2 * n
    hi = below if below is not None else (1 << bits)
    # Largest candidate = 1 mod 2n strictly below hi.
    p = (hi - 2) // step * step + 1
    out = []
    while len(out) < count:
        if p < (1 << (bits - 1)):
            raise ValueError(f"not enough {bits}-bit NTT primes for n={n}")
        if is_prime(p):
            out.append(p)
        p -= step
    return tuple(out)


@lru_cache(maxsize=None)
def default_coeff_modulus_128(n: int, limb_bits: int = 31) -> tuple[int, ...]:
    """TPU-native analogue of SEAL's CoeffModulus128(n): a chain of
    sub-2**31 NTT primes whose total bits fit the 128-bit-security budget."""
    budget = SECURITY_BITS_128[n]
    count = budget // limb_bits
    if count == 0:
        count, limb_bits = 1, budget
    return ntt_primes(n, limb_bits, count)


@lru_cache(maxsize=None)
def aux_base_primes(n: int, count: int, avoid: tuple[int, ...]) -> tuple[int, ...]:
    """Auxiliary-base primes (for BEHZ multiply) disjoint from `avoid`.

    Scans 31-bit primes downward so they are the largest available —
    BEHZ needs prod(B) > prod(q) * headroom, so bigger is safer.
    """
    step = 2 * n
    p = ((1 << 31) - 2) // step * step + 1
    out = []
    avoid_set = set(avoid)
    while len(out) < count:
        if is_prime(p) and p not in avoid_set:
            out.append(p)
        p -= step
        if p < (1 << 29):
            raise ValueError("ran out of aux primes")
    return tuple(out)


@lru_cache(maxsize=None)
def min_primitive_2n_root(p: int, n: int) -> int:
    """Smallest primitive 2n-th root of unity mod p (deterministic tables)."""
    w = root_of_unity(2 * n, p)
    # Minimize over all primitive 2n-th roots (odd powers of w) for a
    # canonical choice, like SEAL's try_minimal_primitive_root.
    best = w
    cur = w
    w2 = w * w % p
    for _ in range(n - 1):
        cur = cur * w2 % p
        if cur < best:
            best = cur
    return best
