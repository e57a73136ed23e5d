"""Vectorized numpy kernels + pure scalar helpers used by the Spark operators."""
