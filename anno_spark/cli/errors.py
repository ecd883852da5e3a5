"""CLI error type (reference Result<(), String> Err arm, main.rs:280-286)."""


class CliError(Exception):
    """A user-facing CLI failure; main() prints `error: <msg>` and exits 1."""
