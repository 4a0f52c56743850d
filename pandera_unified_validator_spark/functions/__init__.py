"""Reusable column-function library (JVM-side expressions + Arrow UDFs)."""

from .vectors import cosine, cosine_pandas_udf, dot, hyperplane_signature_udf, l2_norm

__all__ = ["dot", "l2_norm", "cosine", "cosine_pandas_udf", "hyperplane_signature_udf"]
