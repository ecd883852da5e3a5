"""Spark operators: extraction, resolution, graph, dedup, similarity,
text statistics, multimodal plumbing."""
