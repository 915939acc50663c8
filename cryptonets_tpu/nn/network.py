"""Layer-graph contract: singly-linked pull pipeline (ref INetwork/
BaseLayer, `NeuralNetworks/INetwork.cs`, `BaseLayer.cs`).

Networks are linked lists of layers; data is pulled from the reader at the
tail via get_next().  Verbose mode prints per-layer wall time and probes
the noise budget of output column 0, mirroring `BaseLayer.cs:31-42`.
"""

from __future__ import annotations

import time

from ..utils.opcount import OPS


class Layer:
    def __init__(self, source: "Layer | None" = None, factory=None):
        self.source = source
        self._factory = factory
        self.layer_prepared = False
        self.verbose = False

    # ------------------------------------------------------------ plumbing
    @property
    def factory(self):
        if self._factory is not None:
            return self._factory
        return self.source.factory

    @factory.setter
    def factory(self, f):
        self._factory = f

    def get_source(self):
        return self.source

    def output_dimension(self) -> int:
        return self.source.output_dimension()

    def get_output_scale(self) -> float:
        return self.source.get_output_scale()

    # ------------------------------------------------------------- prepare
    def prepare(self):
        pass

    def prepare_network(self):
        if self.source is not None:
            self.source.prepare_network()
        if self.verbose:
            t0 = time.time()
            self.prepare()
            self.layer_prepared = True
            print(
                f"Prepare {type(self).__name__} computed in "
                f"{time.time() - t0:.3f} seconds"
            )
        else:
            self.prepare()
            self.layer_prepared = True

    # --------------------------------------------------------------- apply
    def apply(self, m):
        raise NotImplementedError

    def get_next(self):
        if not self.layer_prepared:
            self.prepare()
            self.layer_prepared = True
        m = self.source.get_next()
        if m is None:
            return None
        if self.verbose:
            OPS.reset()
            t0 = time.time()
            res = self.apply(m)
            dims = getattr(m, "row_count", "?"), getattr(m, "column_count", "?")
            print(
                f"Layer {type(self).__name__} computed in "
                f"{time.time() - t0:.3f} seconds; layer width {dims}"
            )
            from ..api.tracker import test_budget

            test_budget(res, self.factory)
            OPS.print()
            return res
        return self.apply(m)

    def set_verbose(self, flag: bool = True):
        """Enable verbose on this layer and all sources (ref
        `CryptoNets.cs:81-82` loop)."""
        layer = self
        while layer is not None:
            layer.verbose = flag
            layer = layer.source
        return self


class InputLayer(Layer):
    """Input layers additionally expose per-record labels."""

    labels: list

    def get_source(self):
        return None
