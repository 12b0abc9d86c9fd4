"""Utilities: writer, profiler, metrics, colormaps, jax setup."""
