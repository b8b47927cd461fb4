"""Scalar/column-level helpers. All JVM-side expressions (no Python UDFs)."""
