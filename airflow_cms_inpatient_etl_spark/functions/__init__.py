"""Scalar/aggregate function helpers (JVM-side expressions only)."""
