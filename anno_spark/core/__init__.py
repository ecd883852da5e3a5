"""Pure-Python operator payloads.

These functions run inside Arrow-batched pandas UDFs on executors and double
as the single-process oracle for the pytest parity suite. They are written
from scratch to match the observable behavior of the reference pipeline
(file:line citations in each module's docstrings).
"""
