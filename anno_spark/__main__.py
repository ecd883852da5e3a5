"""`python -m anno_spark` — the user-facing CLI entry point.

Mirrors the reference `anno` binary (anno-cli/src/main.rs:217-287).
"""

import sys

from .cli import main

if __name__ == "__main__":
    sys.exit(main())
