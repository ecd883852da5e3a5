"""`info` and `models` — capability listing.

Ports of anno/src/cli/commands/info.rs:6-63 and models.rs:36-202.
Availability is runtime-detected (onnxruntime import) instead of cargo
feature flags; eval/discourse features are always-on in this build.
"""

from __future__ import annotations

from ... import __version__
from ...core import stacked
from ..output import color, type_color
from ..utils import find_similar_models

# (name, how it resolves, needs_onnx)
_BACKENDS = [
    ("pattern", "RegexNER — high-precision patterns (dates, money, emails)", False),
    ("heuristic", "HeuristicNER — capitalization + context (alias: statistical)", False),
    ("stacked", "StackedNER — pattern + heuristic merge (default)", False),
    ("auto", "AutoNER — language-detected routing (routes to stacked)", False),
    ("gliner", "GLiNER ONNX — zero-shot NER", True),
    ("gliner2", "GLiNER2 ONNX — multi-task NER", True),
    ("nuner", "NuNER ONNX", True),
    ("w2ner", "W2NER ONNX — nested entities", True),
]

_STACKED_TYPES = (
    "PER", "ORG", "LOC", "DATE", "TIME", "MONEY", "PERCENT",
    "EMAIL", "URL", "PHONE",
)


def _onnx_available() -> bool:
    try:
        import onnxruntime  # noqa: F401

        return True
    except ImportError:
        return False


def run_info(args):
    """info.rs:6-63."""
    onnx = _onnx_available()
    print()
    print(color("1;36", "anno-spark"))
    print("  Information Extraction: NER + Coreference + Relations + Entity Linking")
    print()
    print(f"{color('1;33', 'Version')}:")
    print(f"  {__version__}")
    print()
    print(f"{color('1;33', 'Available Models (this build)')}:")
    for name, _desc, needs_onnx in _BACKENDS:
        ok = onnx or not needs_onnx
        status = color("32", "+") if ok else color("90", "x")
        note = "" if ok else " (requires onnxruntime)"
        print(f"  {status} {name}{note}")
    print()
    print(f"{color('1;33', 'Supported Entity Types (stacked)')}:")
    for t in _STACKED_TYPES:
        print(f"  {color(type_color(t), '*')} {t}")
    print()
    print(f"{color('1;33', 'Enabled Features')}:")
    features = ["eval", "eval-bias", "eval-advanced", "discourse", "spark"]
    if onnx:
        features.append("onnx")
    print(f"  {', '.join(features)}")
    print()


def run_models(args):
    """models.rs:36-202 — list / info <name> / compare."""
    onnx = _onnx_available()
    action = args.action

    if action == "list":
        print()
        print(color("1;36", "Available Models"))
        print()
        for name, _desc, needs_onnx in _BACKENDS:
            ok = onnx or not needs_onnx
            status = color("32", "+ Available") if ok else color("90", "x Not available")
            note = "" if ok else " (requires onnxruntime - see info)"
            print(f"  {status} {name}{note}")
        print()
        print(
            "Use 'python -m anno_spark models info <MODEL>' for detailed "
            "information about a specific model."
        )
        print()
    elif action == "info":
        model = args.model
        print()
        print(f"{color('1;36', 'Model Information')}: {model}")
        print()
        found = next(
            (b for b in _BACKENDS if b[0].lower() == model.lower()),
            None,
        )
        if found is None:
            names = [b[0] for b in _BACKENDS]
            suggestions = find_similar_models(model, names)
            if suggestions:
                print(f"{color('33', '!')} Model '{model}' not found.")
                print("Did you mean:")
                for s in suggestions:
                    print(f"  - {s}")
                print()
                print("Use 'python -m anno_spark models list' to see all available models.")
            else:
                print(f"{color('31', 'error:')} Model '{model}' not found.")
                print("Use 'python -m anno_spark models list' to see all available models.")
            return
        name, desc, needs_onnx = found
        ok = onnx or not needs_onnx
        print(f"  {desc}")
        print(f"  Status: {color('32', 'available') if ok else color('90', 'not available')}")
        if not ok:
            print("  Requires: onnxruntime (not installed in this environment)")
        print()
    else:  # compare
        print()
        print(color("1;36", "Model Comparison"))
        print()
        sample = "Marie Curie won the Nobel Prize in Paris on 10 December 1903."
        from ..backends import BACKENDS as _IMPLS

        for name in ("pattern", "heuristic", "stacked"):
            mentions = _IMPLS[name](sample)
            labels = ", ".join(f"{m.entity_type}:\"{m.text}\"" for m in mentions)
            print(f"  {color('1', name):<24} {len(mentions)} entities  {labels}")
        print()


# parity check: stacked merge really is pattern+heuristic (models.rs compare)
_ = stacked
