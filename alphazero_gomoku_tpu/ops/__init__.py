"""Low-level JAX/Pallas ops: line detection, symmetries, fused kernels."""
