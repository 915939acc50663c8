"""Host-side exact integer math (Python ints): primality, roots, CRT.

These run at parameter-build time (trace time), never on device.  The
reference delegates the analogous precomputation to SEAL's C++ `BigUInt`
and `SmallModulus` machinery plus .NET `BigInteger`
(`HE Wrapper/EncryptedSealBfvVector.cs:72-90`).
"""

from __future__ import annotations

import math

# Deterministic Miller-Rabin witnesses valid for all n < 3.3e24.
_MR_WITNESSES = (2, 3, 5, 7, 11, 13, 17, 19, 23, 29, 31, 37)


def is_prime(n: int) -> bool:
    if n < 2:
        return False
    for p in _MR_WITNESSES:
        if n % p == 0:
            return n == p
    d = n - 1
    r = 0
    while d % 2 == 0:
        d //= 2
        r += 1
    for a in _MR_WITNESSES:
        x = pow(a, d, n)
        if x in (1, n - 1):
            continue
        for _ in range(r - 1):
            x = x * x % n
            if x == n - 1:
                break
        else:
            return False
    return True


def modinv(a: int, m: int) -> int:
    """Inverse of a mod m (m need not be prime; a coprime to m)."""
    g, x = _egcd(a % m, m)
    if g != 1:
        raise ValueError(f"{a} not invertible mod {m}")
    return x % m


def _egcd(a: int, b: int) -> tuple[int, int]:
    old_r, r = a, b
    old_s, s = 1, 0
    while r:
        q = old_r // r
        old_r, r = r, old_r - q * r
        old_s, s = s, old_s - q * s
    return old_r, old_s


def _factorize(n: int) -> list[int]:
    """Distinct prime factors by trial division + recursion (small cofactors)."""
    out = []
    d = 2
    while d * d <= n:
        if n % d == 0:
            out.append(d)
            while n % d == 0:
                n //= d
        d += 1 if d == 2 else 2
    if n > 1:
        out.append(n)
    return out


def primitive_root(p: int) -> int:
    """Smallest generator of Z_p^* (p prime)."""
    order = p - 1
    factors = _factorize(order)
    g = 2
    while True:
        if all(pow(g, order // f, p) != 1 for f in factors):
            return g
        g += 1


def root_of_unity(order: int, p: int) -> int:
    """A primitive `order`-th root of unity mod prime p (order | p-1)."""
    if (p - 1) % order != 0:
        raise ValueError(f"{order} does not divide {p}-1")
    g = primitive_root(p)
    w = pow(g, (p - 1) // order, p)
    assert pow(w, order, p) == 1 and pow(w, order // 2, p) != 1
    return w


def bit_reverse(x: int, bits: int) -> int:
    out = 0
    for _ in range(bits):
        out = (out << 1) | (x & 1)
        x >>= 1
    return out


def center(x: int, q: int) -> int:
    """Map residue x in [0,q) to the centered representative in (-q/2, q/2]."""
    x %= q
    return x - q if x > q // 2 else x


class CRT:
    """CRT composition/decomposition over a list of pairwise-coprime moduli.

    Mirrors the precompute in the reference's plaintext "double decker"
    (`EncryptedSealBfvVector.PreCompute`, `EncryptedSealBfvVector.cs:79-90`)
    but is also used for the ciphertext coefficient modulus q = prod(q_i).
    """

    def __init__(self, moduli: list[int]):
        self.moduli = list(moduli)
        self.product = math.prod(self.moduli)
        # x = sum_i (x_i * inv_i mod q_i) * punctured_i  (mod product)
        self.punctured = [self.product // m for m in self.moduli]
        self.inv_punctured = [
            modinv(pi % m, m) for pi, m in zip(self.punctured, self.moduli)
        ]

    def compose(self, residues: list[int]) -> int:
        """Residues (one per modulus) -> value in [0, product)."""
        acc = 0
        for r, inv, pi, m in zip(
            residues, self.inv_punctured, self.punctured, self.moduli
        ):
            acc += ((r % m) * inv % m) * pi
        return acc % self.product

    def compose_centered(self, residues: list[int]) -> int:
        return center(self.compose(residues), self.product)

    def decompose(self, value: int) -> list[int]:
        return [value % m for m in self.moduli]
