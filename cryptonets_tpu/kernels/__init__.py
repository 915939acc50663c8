"""TPU kernels for the hot paths: MXU matmul-NTT and Pallas variants."""
