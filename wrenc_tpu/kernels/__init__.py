"""JAX/Pallas TPU kernels: batched intra prediction (all modes as matmuls),
integer transforms, (dependent) quantization, and RD cost reductions.
Every kernel is golden-tested bit-exact against the scalar spec model."""
