"""Command-line drivers, flag-compatible with the reference scripts."""
