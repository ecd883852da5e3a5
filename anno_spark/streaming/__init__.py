"""Structured Streaming surfaces of the engine."""
