"""CLI command handlers (reference anno/src/cli/commands/*.rs)."""
