"""Column-level helpers exposed as the engine's function surface."""

from .patterns import pattern_matches

__all__ = ["pattern_matches"]
