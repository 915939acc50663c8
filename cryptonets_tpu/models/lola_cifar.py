"""LoLa CIFAR-10 (ref `CifarCryptoNet/LolaCifarCryptoNet.cs`): 3x32x32
input -> 8x8-s2 conv (83 maps) -> Vectorize -> Square -> 10x10-s2-pad4
conv-as-dense (112 maps) -> Square -> Dense(10).  Upstream weight blob
(CifarWeight.csv) is a missing large blob; biases ship, weights fall back
to seeded synthetic values unless a CSV is supplied.

CLI: python -m cryptonets_tpu.models.lola_cifar [-e] [--records K]
"""

from __future__ import annotations

import argparse
import time

import numpy as np

from ..data import weights_extract
from ..data.preprocess import synthetic_cifar_records
from ..nn import (
    ConvolutionEngine,
    EncryptLayer,
    LLConvReader,
    LLDenseLayer,
    LLPoolLayer,
    LLVectorizeLayer,
    SquareActivation,
    TimingLayer,
    WeightsReader,
)
from ..nn.jit import EncryptedForward
from .presets import make_factory


def build(
    encrypt: bool = True, records=None, file_name=None, seed: int = 0,
    weights_csv=None, bias_csv=None,
):
    # rot_steps: single-hop Galois key for the Vectorize stack stride
    # (14x14 = 196 windows per conv map) so the 83-piece interleave runs
    # as one scanned Horner loop (api/vector.py fast path)
    factory = make_factory("cifar", encrypt, seed, rot_steps=(-196,))
    if weights_csv and bias_csv:
        wr = WeightsReader(weights_csv, bias_csv)
        w0, b0 = np.asarray(wr.weights[0]), np.asarray(wr.biases[0])
        w1, b1 = np.asarray(wr.weights[1]), np.asarray(wr.biases[1])
        w2, b2 = np.asarray(wr.weights[2]), np.asarray(wr.biases[2])
    else:
        syn = weights_extract.synthetic_weights(
            {
                "w0": 83 * 3 * 64, "b0": 83,
                "w1": 112 * 83 * 100, "b1": 112,
                # dense head over the conv-as-dense output: 112 maps x
                # 7x7 windows = 5488 inputs
                "w2": 10 * 112 * 49, "b2": 10,
            },
            seed=3,
        )
        w0, b0 = syn["w0"], syn["b0"]
        w1, b1 = syn["w1"], syn["b1"]
        w2, b2 = syn["w2"], syn["b2"]
    geo = dict(
        input_shape=[3, 32, 32],
        kernel_shape=[3, 8, 8],
        upper_padding=[0, 1, 1],
        lower_padding=[0, 1, 1],
        stride=[1000, 2, 2],
    )
    reader = LLConvReader(
        make_factory("cifar", False),
        file_name=file_name,
        sparse_format=False,
        normalization_factor=1.0 / 256.0,
        scale=8.0,
        **geo,
    )
    if records is not None:
        reader.set_source_records(records)
    enc = EncryptLayer(reader)
    enc.factory = factory
    t0l = TimingLayer(enc, start_counters=["Inference-Time"])
    conv1 = LLPoolLayer(
        t0l, map_count=[83, 1, 1], weights=w0, bias=b0,
        weights_scale=256.0, **geo,
    )
    vec2 = LLVectorizeLayer(conv1)
    act3 = SquareActivation(vec2)
    conv_engine = ConvolutionEngine(
        input_shape=[83, 14, 14],
        kernel_shape=[83, 10, 10],
        upper_padding=[0, 4, 4],
        lower_padding=[0, 4, 4],
        stride=[83, 2, 2],
        map_count=[112, 1, 1],
    )
    dense4 = LLDenseLayer(
        act3,
        weights=conv_engine.get_dense_weights(w1).ravel(),
        bias=conv_engine.get_dense_bias(b1),
        weights_scale=512.0,
        input_format="dense",
        force_dense_format=True,
    )
    act5 = SquareActivation(dense4)
    dense6 = LLDenseLayer(
        act5, weights=w2, bias=b2, weights_scale=512.0, input_format="dense"
    )
    head = TimingLayer(dense6, stop_counters=["Inference-Time"])
    return head, factory, reader


def evaluate(encrypt=True, n_records=1, records=None, file_name=None,
             use_jit=True, verbose=False, seed=0):
    if records is None and file_name is None:
        records = synthetic_cifar_records(n_records, seed=4)
    head, factory, reader = build(
        encrypt, records=records, file_name=file_name, seed=seed
    )
    if verbose:
        head.set_verbose(True)
    head.prepare_network()
    run = EncryptedForward(head, jit=True) if (encrypt and use_jit) else None
    errs = 0
    latencies = []
    for i in range(n_records):
        t0 = time.time()
        m = run() if run is not None else head.get_next()
        if m is None:
            break
        dec = m.get_column(0).decrypt()
        latencies.append(time.time() - t0)
        pred = int(np.argmax(dec[:10]))
        label = reader.labels[0]
        errs += int(pred != label)
        print(
            f"errs {errs}/{i+1} accuracy {100 - 100.0*errs/(i+1):0.3f}% "
            f"latency {latencies[-1]:0.2f}s prediction {pred} label {label}"
        )
    return dict(errs=errs, count=len(latencies), latencies=latencies)


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("-e", "--encrypt", action="store_true")
    ap.add_argument("-v", "--verbose", action="store_true")
    ap.add_argument("--records", type=int, default=1)
    ap.add_argument("--data", default=None)
    ap.add_argument("--weights-csv", default=None)
    ap.add_argument("--bias-csv", default=None)
    args = ap.parse_args()
    evaluate(
        encrypt=args.encrypt, n_records=args.records,
        file_name=args.data, verbose=args.verbose,
    )


if __name__ == "__main__":
    main()
