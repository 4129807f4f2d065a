"""CLI entry points mirroring the reference surface."""
