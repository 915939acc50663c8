"""cryptonets_tpu — a TPU-native homomorphic-encryption inference framework.

A from-scratch re-design of the capabilities of microsoft/CryptoNets
(C#/SEAL 3.2) for TPUs: the BFV scheme is implemented as JAX/Pallas
kernels over uint32 RNS limb tensors, the CryptoNets/LoLa neural layer
zoo composes into single jitted XLA programs, and scaling happens over
`jax.sharding` device meshes rather than thread pools.

Layering (mirrors reference layers L0-L4, see SURVEY.md):
  crypto/   - L0: BFV scheme: modular arithmetic, NTT, keygen, encrypt,
              homomorphic ops (reference: Microsoft SEAL 3.2, native NuGet)
  kernels/  - TPU kernels for the hot paths (MXU matmul-NTT, exact
              digit-plane modular matmul)
  api/      - L1: scale-tracked HE vector/matrix API + plaintext Raw backend
              (reference: `HE Wrapper/`)
  nn/       - L2: layer zoo, convolution index algebra, readers
              (reference: `NeuralNetworks/`)
  models/   - L3: CryptoNets-MNIST, LoLa variants, CIFAR, Caltech-101
  data/     - L4: dataset preprocessing and weight loading
  parallel/ - device-mesh sharding of ciphertext batches / RNS limbs
  runtime/  - native C++ host runtime (encoder NTT over 64-bit plain
              moduli, CRT composition, IO)
"""

__version__ = "0.1.0"


def _enable_persistent_compilation_cache():
    """Point JAX's persistent compilation cache at a repo-local directory.

    Cold-process compiles on the remote-compile TPU rig cost minutes
    (keygen ~4 min, full-network warmup ~8 min measured in round 1);
    with the cache, every re-run of the same program deserializes the
    executable instead.  Opt out with CRYPTONETS_JAX_CACHE=0, redirect
    with CRYPTONETS_JAX_CACHE=<dir>.
    """
    import os

    d = os.environ.get("CRYPTONETS_JAX_CACHE")
    if d == "0":
        return
    if not d:
        d = os.path.join(os.path.dirname(os.path.dirname(__file__)), ".jax_cache")
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", os.path.abspath(d))
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:  # older/newer jax without these flags: best effort
        pass


_enable_persistent_compilation_cache()
