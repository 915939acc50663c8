"""Basic example (ref `Basic Example/Program.cs`): default-factory keygen,
then encrypted norm^2, slot-sum, and elementwise multiply on a small
vector.

CLI: python -m cryptonets_tpu.models.basic_example
"""

from __future__ import annotations

import time

import numpy as np

from .presets import make_factory


def run(verbose: bool = True):
    t0 = time.time()
    factory = make_factory("default", encrypt=True)
    keygen_s = time.time() - t0
    if verbose:
        print(f"Generating keys took {keygen_s:0.2f} seconds")

    v = np.arange(1.0, 11.0)  # [1..10]
    enc = factory.get_encrypted_vector(v, "dense", scale=1.0)

    t0 = time.time()
    norm2 = enc.dot_product(enc)
    s = enc.sum_all_slots()
    prod = enc.pointwise_multiply(
        factory.get_plain_vector(v[::-1], "dense", scale=1.0)
    )
    results = dict(
        norm_squared=float(norm2.decrypt()[0]),
        sum=float(s.decrypt()[0]),
        elementwise=prod.decrypt()[: len(v)],
    )
    compute_s = time.time() - t0
    if verbose:
        print(f"norm^2 = {results['norm_squared']}")
        print(f"sum = {results['sum']}")
        print(f"elementwise = {results['elementwise']}")
        print(f"Computation took {compute_s:0.2f} seconds")
    results["keygen_seconds"] = keygen_s
    results["compute_seconds"] = compute_s
    return results


if __name__ == "__main__":
    run()
