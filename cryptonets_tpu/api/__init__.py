"""L1: scale-tracked HE vector/matrix API over the BFV core (ref `HE Wrapper/`).

The reference's factory/environment pattern collapses here: JAX is
functional, so there are no per-thread environments to pool — a factory
holds parameters + keys, and every op is a pure traced function.
"""

from .factory import CrtBfvFactory, RawFactory
from .vector import HEVector
from .matrix import HEMatrix
from .raw import RawMatrix, RawVector
