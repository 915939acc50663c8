"""Multi-chip scaling: device meshes over {batch, limb} axes.

The reference is single-process (SURVEY.md 2.5); its parallelism axes map
to TPU meshes as: ciphertext batch -> data-parallel axis (weak scaling,
zero comms until decrypt), RNS limbs -> tensor-parallel axis (collectives
at base-conversion reductions), plain-CRT primes -> pure batch axis.
"""

from .mesh import make_mesh, shard_ciphertext_data, batch_sharding
from .distributed import (
    init_multihost,
    local_record_slice,
    global_ciphertext_batch,
)
from .pipeline import PipelineForward
