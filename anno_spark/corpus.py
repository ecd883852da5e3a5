"""Deterministic synthetic Common-Crawl-style corpus (FIXTURES.md §1).

Every page is a pure function of ``doc_id`` (no RNG state), so the corpus
can be generated distributedly via ``spark.range(n) → mapInPandas`` and is
byte-stable across runs and parallelism levels. Sentence bodies are drawn
from the reference's own test vocabulary (benches/ner.rs:40-43,
regex.rs:707-733, cdcr.rs:684-1045, grounded.rs:1076-1091) so expected
entities, triples, and cross-doc clusters are known by construction.

The HTML wrappers exercise every branch of the T1 extractor: script/style
skipping, block-tag spacing, the fixed named-entity set, decimal numeric
entities, unknown entities kept verbatim, and unterminated ``&foo<b>``.

Schema: pages(url string, warc_ts timestamp, html binary, text string,
lang string) — BASELINE.json input_hint.
"""

from __future__ import annotations

import datetime

from .core.minhash import fnv1a_seeded
from .core.textops import detect_language, extract_text_from_html

# Cross-doc identities with surface variants (mirrors the CDCR golden
# corpora construction, cdcr.rs:684-1045).
PERSONS = (
    ("Elon Musk", ("Elon Musk", "Mr. Musk")),
    ("Marie Curie", ("Marie Curie", "Curie")),
    ("Tim Cook", ("Tim Cook",)),
    ("Satya Nadella", ("Satya Nadella", "Nadella")),
    ("Angela Merkel", ("Angela Merkel", "Merkel")),
    ("Steve Jobs", ("Steve Jobs",)),
)
ORGS = (
    ("Apple Inc.", ("Apple Inc.", "Apple")),
    ("Tesla Inc.", ("Tesla Inc.", "Tesla")),
    ("Microsoft Corp.", ("Microsoft Corp.", "Microsoft")),
    ("Acme Corp.", ("Acme Corp.", "Acme Corporation")),
    ("Globex Corporation", ("Globex Corporation", "Globex Corp.")),
)
LOCS = (
    ("California", ("California",)),
    ("Paris", ("Paris",)),
    ("Berlin", ("Berlin",)),
    ("Tokyo", ("Tokyo",)),
    ("London", ("London",)),
)

# Relation sentence templates; triples known by construction given the
# reference trigger tables (inference.rs:2094-2128).
_REL_SENTENCES = (
    "{per} works for {org}.",           # WORKS_FOR
    "{per} founded {org}.",             # CEO_OF ("founded" is a CEO_OF trigger)
    # NOTE: not "{per} is CEO of {org}" — the heuristic span builder swallows
    # "CEO of <Org>" into one ORG mention (org_suffix), so no pair remains.
    "{per} leads {org}.",               # CEO_OF ("leads" trigger)
    "{org} headquartered in {loc}.",    # LOCATED_IN
    "{per} comes from {loc}.",          # BORN_IN ("from"; no "in"/"at" substring)
    "{org} is a subsidiary of {org2}.",  # PART_OF
)

_STRUCTURED_SENTENCES = (
    "Meeting scheduled for January 15, 2025 at $500 per hour, estimated 15% completion.",
    "Meeting on Jan 15 at 3:30 PM. Cost: $500. Contact: bob@acme.com or (555) 123-4567. Completion: 75%.",
    "The deadline is 2024-01-15 and the budget is $1.5M, roughly 3.5% of revenue.",
    "Visit https://example.com/report for details or email alice@example.org by 12/31/2024.",
    "Der Termin ist am 15. Januar 2024 in Berlin.",
    "La réunion aura lieu le 15 janvier 2024 à Paris.",
    "会議は2024年1月15日に東京で開催されます。",
    "Встреча состоится 15 января 2024 года.",
)

_COREF_SENTENCES = (
    "Marie Curie won the Nobel Prize. She was a physicist.",
    "Elon Musk spoke at the event. He announced new plans.",
    "Apple released a new product. It was well received.",
)

_NOISE_SENTENCES = (
    "The quick brown fox jumps over the lazy dog.",
    "Please note that this page has moved.",
    "Contact us today for more information about our services.",
)

_CATEGORIES = ("tech", "business", "science", "politics", "news", "noise", "intl")


def _pick(doc_id: int, salt: int, options):
    return options[fnv1a_seeded(str(doc_id).encode(), salt) % len(options)]


def _variant(doc_id: int, salt: int, pool):
    _, variants = _pick(doc_id, salt, pool)
    return _pick(doc_id, salt + 101, variants)


# Scale-proportional entity diversity: one synthetic organization per
# ~40 docs (with alias variants), so the distinct-surface population —
# and therefore the LSH/CC workload — grows with corpus size the way a
# real web crawl's does instead of staying a fixed 50-surface vocabulary.
_ORG_STEMS = ("Vertex", "Quantum", "Stellar", "Nimbus", "Aurora", "Zenith", "Orion", "Helix")


def _base26(n: int) -> str:
    out = []
    while True:
        out.append(chr(ord("a") + n % 26))
        n //= 26
        if n == 0:
            return "".join(reversed(out))


def synthetic_org(doc_id: int) -> str:
    bucket = doc_id // 40
    stem = _ORG_STEMS[fnv1a_seeded(str(bucket).encode(), 31) % len(_ORG_STEMS)]
    name = f"{stem}{_base26(bucket)}"
    # alias variants of one identity; "X Corp" ⊂ "X Corporation" gives the
    # 0.8 substring-containment edge (similarity.rs:37-92) that links them
    v = fnv1a_seeded(str(doc_id).encode(), 32) % 2
    return f"{name} Corp." if v == 0 else f"{name} Corporation"


def page_body(doc_id: int) -> str:
    """Deterministic sentence body for one page."""
    category = _CATEGORIES[doc_id % len(_CATEGORIES)]
    parts: list[str] = []
    if category == "noise":
        parts.append(_pick(doc_id, 1, _NOISE_SENTENCES))
        parts.append(_pick(doc_id, 2, _NOISE_SENTENCES))
    elif category == "intl":
        parts.append(_pick(doc_id, 3, _STRUCTURED_SENTENCES[4:]))
        parts.append(_pick(doc_id, 4, _NOISE_SENTENCES))
    else:
        per = _variant(doc_id, 5, PERSONS)
        org = _variant(doc_id, 6, ORGS)
        org2 = _variant(doc_id + 7919, 6, ORGS)
        loc = _variant(doc_id, 8, LOCS)
        tmpl = _pick(doc_id, 9, _REL_SENTENCES)
        parts.append(tmpl.format(per=per, org=org, org2=org2, loc=loc))
        parts.append(_pick(doc_id, 10, _STRUCTURED_SENTENCES[:4]))
        if fnv1a_seeded(str(doc_id).encode(), 11) % 3 == 0:
            parts.append(_pick(doc_id, 12, _COREF_SENTENCES))
        if fnv1a_seeded(str(doc_id).encode(), 13) % 4 == 0:
            parts.append(_pick(doc_id, 14, _NOISE_SENTENCES))
        parts.append(f"Analysts at {synthetic_org(doc_id)} released a report.")
    return " ".join(parts)


def page_html(doc_id: int) -> str:
    """Wrap the body in HTML exercising every T1 extractor branch."""
    body = page_body(doc_id)
    category = _CATEGORIES[doc_id % len(_CATEGORIES)]
    v = fnv1a_seeded(str(doc_id).encode(), 21) % 4
    title = f"Document {doc_id} &amp; friends"
    style = "<style>p { color: red; }</style>"
    # NOTE: no '<' inside the script body — the reference's tag scanner would
    # consume the closing </script> into the tag buffer and skip the rest of
    # the page (url_resolver.rs:60-85 quirk; covered by a dedicated test).
    script = '<script>var x = 1; console.log("&amp;");</script>'
    quirks = (
        "<p>Entities: &lt;tag&gt; &quot;q&quot; &apos;a&apos; &nbsp;sp &#65;dec &#x41;hex &unknown; tail</p>",
        "<p>Unterminated &foo<b>bold</b> and bare & amp here</p>",
        "<div>Smart quotes: &#8220;hello&#8221; &#8217;s</div>",
        "<li>List item one</li><li>List item two</li>",
    )
    html = (
        f"<html><head><title>{title}</title>{style}{script}</head>"
        f"<body><h1>{category} report {doc_id}</h1>"
        f"<p>{body}</p>"
        f"{quirks[v]}"
        f"<div>Footer for document {doc_id}.</div>"
        "</body></html>"
    )
    return html


def page_record(doc_id: int) -> dict:
    """Full pages row for one doc_id. ``text`` is computed by the T1 oracle
    (the byte-identity invariant); ``lang`` by the T3 detector."""
    html = page_html(doc_id)
    text = extract_text_from_html(html)
    category = _CATEGORIES[doc_id % len(_CATEGORIES)]
    return {
        "url": f"https://example-42.test/{category}/{doc_id}",
        "warc_ts": datetime.datetime(2024, 1, 1) + datetime.timedelta(seconds=doc_id),
        "html": html.encode("utf-8"),
        "text": text,
        "lang": detect_language(text),
    }


def is_held_out(url: str) -> bool:
    """FIXTURES.md §6 — deterministic 20% held-out split."""
    return fnv1a_seeded(url.encode(), 0) % 5 == 0


def generate_pages_pandas(doc_ids):
    """→ pandas DataFrame of page rows (used inside mapInPandas and tests)."""
    import pandas as pd

    return pd.DataFrame([page_record(int(d)) for d in doc_ids])
