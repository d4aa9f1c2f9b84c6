"""Utilities: image output, profiling, metrics."""
