"""Utilities: metrics, IO, checkpointing, profiling."""
