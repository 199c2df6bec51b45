"""Vectorized kernels: image codec, Z-order/Hilbert keys, hashing/sketches."""
