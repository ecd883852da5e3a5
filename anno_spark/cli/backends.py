"""Model backend registry (reference anno/src/cli/parser.rs:134-237).

Each backend is a callable ``text -> list[Mention]``; the implementations
are the exact pure-Python cores the Spark Arrow UDFs execute
(anno_spark.core.regex_ner / heuristic_ner / stacked), so the CLI and the
distributed pipeline extract identically.  ONNX-gated backends mirror the
reference's feature gates: they resolve but raise with the reference's tip
string when the runtime is unavailable (parser.rs:200-214).
"""

from __future__ import annotations

from ..core import heuristic_ner, regex_ner, stacked
from .errors import CliError
from .utils import find_similar_models

# parser.rs:136-164 — value enum (statistical is a heuristic alias;
# minimal merged into heuristic; auto routes to stacked).
BACKENDS = {
    "pattern": regex_ner.extract_entities,
    "heuristic": heuristic_ner.extract_entities,
    "statistical": heuristic_ner.extract_entities,
    "minimal": heuristic_ner.extract_entities,
    "auto": stacked.extract_entities,
    "stacked": stacked.extract_entities,
}

# parser.rs:149-163 — ML backends exist in the enum but need the onnx
# runtime; gated the same way operators/ml_ner.py gates OnnxNerModel.
_ONNX_BACKENDS = ("gliner", "gliner2", "nuner", "w2ner")

DEFAULT_BACKEND = "stacked"


def backend_names() -> list[str]:
    return list(BACKENDS) + list(_ONNX_BACKENDS)


def create_model(name: str):
    """parser.rs:167-216 — name → extractor callable, or a CliError with
    suggestions (main.rs:294-326 find_similar_models)."""
    if name in BACKENDS:
        return BACKENDS[name]
    if name in _ONNX_BACKENDS:
        # Reference gates these behind --features onnx (parser.rs:200-214);
        # here the gate is the onnxruntime import.  When the runtime exists,
        # wire an operators.ml_ner.OnnxNerModel with a real model path via
        # `models info <name>` — until then this raises the reference's tip.
        raise CliError(
            f"Failed to load {name}: onnx runtime support is not available "
            f"in this environment.\n"
            f"  Tip: Use 'python -m anno_spark models info {name}' to check model status."
        )
    suggestions = find_similar_models(name, backend_names())
    hint = f" Did you mean: {', '.join(suggestions)}?" if suggestions else ""
    raise CliError(f"Unknown model '{name}'.{hint}")
