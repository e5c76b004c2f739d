"""Vectorized UDF surface: Arrow-batched wrappers over the pure kernels."""
