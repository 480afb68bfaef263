"""Checkpointing, profiling, observability."""
