"""Command-line tools preserving the reference pipeline's flag vocabulary."""
