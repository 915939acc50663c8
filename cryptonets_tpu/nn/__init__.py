"""L2: neural-network layer zoo over the HE API (ref `NeuralNetworks/`)."""

from .convolution import ConvolutionEngine
from .network import Layer, InputLayer
from .layers import (
    DebugLayer,
    EncryptLayer,
    PoolLayer,
    SquareActivation,
    TimingLayer,
)
from .lola import (
    LLDenseLayer,
    LLDuplicateLayer,
    LLInterleaveLayer,
    LLInterleavedDenseLayer,
    LLPackedDenseLayer,
    LLPoolLayer,
    LLPreConvLayer,
    LLVectorizeLayer,
)
from .readers import BatchReader, LLConvReader, LLSingleLineReader, WeightsReader
