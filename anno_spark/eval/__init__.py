"""Evaluation operators (SURVEY §2.9)."""

from .relation_eval import relation_prf, strict_match_counts

__all__ = ["relation_prf", "strict_match_counts"]
