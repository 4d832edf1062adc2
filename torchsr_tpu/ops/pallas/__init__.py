"""Pallas TPU kernels for hot paths (populated by the perf pass)."""
