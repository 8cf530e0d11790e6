"""Command-line entry points (train / eval / precompute)."""
