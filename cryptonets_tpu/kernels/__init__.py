"""TPU kernels for the hot paths: the MXU matmul-NTT (kernels/matmul_ntt.py)
and the exact digit-plane modular matmul (kernels/modmatmul.py).
"""
