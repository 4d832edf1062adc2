"""Utilities: checkpointing, logging/observability, image I/O."""
