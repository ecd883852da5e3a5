"""Pipeline plans: staged KG construction with snapshot checkpoints."""
