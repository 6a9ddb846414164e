"""Compute ops for the TPU-native LBM framework (pure JAX, jit-friendly)."""
