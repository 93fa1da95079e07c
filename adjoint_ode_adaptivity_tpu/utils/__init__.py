"""Utilities: benchmarking, timing, plotting, animation."""
