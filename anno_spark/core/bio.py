"""BIO tag-sequence adapter: spans <-> IOB1/IOB2/IOE1/IOE2/IOBES tags.

Behavioral port of the reference BIO adapter (reference:
anno/src/eval/bio_adapter.rs:1-993): decode tagged token sequences to
entity spans, encode spans back to tags, validate scheme transitions,
and repair invalid model output (the no-CRF failure mode).

Per-sequence pure Python — runs inside ``mapInPandas`` extraction tasks
over a ``tokens: array<string>, tags: array<string>`` pair of columns
(the shape the eval loaders emit), so it distributes with the documents.

Reference quirks preserved:

* Character offsets assume single-space joining: token i starts at
  ``sum(len(t)+1 for earlier t)`` (bio_adapter.rs:153-159).
* Unknown tag shapes fall back to ``O`` silently (rs:88-93); prefix
  comparison is case-insensitive for the prefix, ``_`` is accepted as
  the separator.
* IOB2 decoding is lenient on orphan ``I`` (starts a new entity,
  rs:210-214); strictness lives in ``validate_bio_sequence`` /
  ``repair_bio_sequence`` instead.
* ``entities_to_bio`` processes entities in input order over a shared
  tag array — overlapping entities overwrite earlier tags (rs:412-505).
* IOBES repair promotes an orphan ``I``/``E`` to ``S`` (single), not
  ``B`` (rs:641-655).
"""

from __future__ import annotations

from anno_spark.core.entity import Mention

__all__ = [
    "SCHEMES",
    "bio_to_entities",
    "entities_to_bio",
    "validate_bio_sequence",
    "repair_bio_sequence",
    "normalize_entity_type",
]

SCHEMES = ("IOB1", "IOB2", "IOE1", "IOE2", "IOBES")

# string_to_entity_type (bio_adapter.rs:392-408), collapsed onto the
# engine's string labels (core/entity.py; EntityType::as_label parity)
_TYPE_ALIASES = {
    "PER": "PER", "PERSON": "PER",
    "ORG": "ORG", "ORGANIZATION": "ORG",
    "LOC": "LOC", "LOCATION": "LOC", "GPE": "LOC",
    "MISC": "MISC", "MISCELLANEOUS": "MISC",
    "DATE": "DATE",
    "TIME": "TIME",
    "MONEY": "MONEY", "CURRENCY": "MONEY",
    "PERCENT": "PERCENT", "PERCENTAGE": "PERCENT",
}


def normalize_entity_type(s: str) -> str:
    """Alias collapse; unknown types keep their (upper-cased) label —
    the Custom-type path (bio_adapter.rs:407)."""
    return _TYPE_ALIASES.get(s.upper(), s.upper())


class _Tag:
    """ParsedTag (bio_adapter.rs:63-113)."""

    __slots__ = ("prefix", "entity_type")

    def __init__(self, tag: str):
        if tag in ("O", "o"):
            self.prefix = "O"
            self.entity_type = None
            return
        if len(tag) >= 2 and tag[1] in ("-", "_"):
            self.prefix = tag[0].upper()
            self.entity_type = tag[2:]
            return
        # fallback: treat as O (rs:88-93)
        self.prefix = "O"
        self.entity_type = None

    @property
    def is_outside(self):
        return self.prefix == "O"

    @property
    def is_begin(self):
        return self.prefix == "B"

    @property
    def is_inside(self):
        return self.prefix == "I"

    @property
    def is_end(self):
        return self.prefix in ("E", "L")

    @property
    def is_single(self):
        return self.prefix in ("S", "U")


def _build_entity(tokens, offsets, start_idx, end_idx, entity_type) -> Mention:
    """Entity from a token range (bio_adapter.rs:360-388)."""
    text = " ".join(tokens[start_idx:end_idx + 1])
    return Mention(
        text=text,
        entity_type=normalize_entity_type(entity_type),
        start=offsets[start_idx][0],
        end=offsets[end_idx][1],
        confidence=1.0,
        pattern="bio",
        source="bio",
    )


def bio_to_entities(tokens: list, tags: list, scheme: str = "IOB2") -> list:
    """Decode a tagged token sequence to Mention spans
    (bio_adapter.rs:139-357).

    Raises ``ValueError`` on token/tag length mismatch; unknown schemes
    raise ``ValueError`` (the Rust enum cannot be out of range).
    """
    if scheme not in SCHEMES:
        raise ValueError(f"unknown BIO scheme: {scheme}")
    if len(tokens) != len(tags):
        raise ValueError(
            f"Token count ({len(tokens)}) != tag count ({len(tags)})")

    offsets = []
    current = 0
    for token in tokens:
        offsets.append((current, current + len(token)))
        current += len(token) + 1  # +1 for space (rs:153-159)

    entities: list = []
    open_entity: tuple | None = None  # (start_idx, type)

    def close(end_idx):
        nonlocal open_entity
        if open_entity is not None:
            start_idx, etype = open_entity
            entities.append(_build_entity(tokens, offsets, start_idx,
                                          end_idx, etype))
            open_entity = None

    for i, tag_str in enumerate(tags):
        tag = _Tag(tag_str)
        if scheme == "IOB2":
            if tag.is_begin or tag.is_single:
                close(i - 1)
                if tag.entity_type is not None:
                    open_entity = (i, tag.entity_type)
                if tag.is_single:
                    close(i)
            elif tag.is_inside:
                if open_entity is not None:
                    if tag.entity_type != open_entity[1]:
                        # type mismatch: close and start new (rs:198-208)
                        close(i - 1)
                        if tag.entity_type is not None:
                            open_entity = (i, tag.entity_type)
                elif tag.entity_type is not None:
                    # orphan I: lenient new entity (rs:210-214)
                    open_entity = (i, tag.entity_type)
            elif tag.is_end:
                close(i)
            elif tag.is_outside:
                close(i - 1)
        elif scheme == "IOB1":
            if tag.is_begin:
                close(i - 1)
                if tag.entity_type is not None:
                    open_entity = (i, tag.entity_type)
            elif tag.is_inside:
                if open_entity is None or open_entity[1] != tag.entity_type:
                    close(i - 1)
                    if tag.entity_type is not None:
                        open_entity = (i, tag.entity_type)
            elif tag.is_outside:
                close(i - 1)
        elif scheme == "IOBES":
            if tag.is_begin:
                close(i - 1)
                if tag.entity_type is not None:
                    open_entity = (i, tag.entity_type)
            elif tag.is_inside:
                pass  # continue (rs:288)
            elif tag.is_end:
                close(i)
            elif tag.is_single:
                close(i - 1)
                if tag.entity_type is not None:
                    entities.append(_build_entity(tokens, offsets, i, i,
                                                  tag.entity_type))
            elif tag.is_outside:
                close(i - 1)
        else:  # IOE1 / IOE2 (rs:319-341)
            if tag.is_inside or tag.is_begin:
                if open_entity is None and tag.entity_type is not None:
                    open_entity = (i, tag.entity_type)
            elif tag.is_end:
                if open_entity is None and tag.entity_type is not None:
                    open_entity = (i, tag.entity_type)
                close(i)
            elif tag.is_outside:
                close(i - 1)

    close(len(tokens) - 1)
    return entities


def entities_to_bio(token_offsets: list, entities: list,
                    scheme: str = "IOB2") -> list:
    """Encode spans back to one tag per token (bio_adapter.rs:412-505).

    ``token_offsets`` is a list of (start, end) character spans;
    ``entities`` is a list of Mentions (or anything with
    entity_type/start/end).  Overlap rule: a token belongs to an entity
    iff ``tok_start < ent.end and tok_end > ent.start``.
    """
    if scheme not in SCHEMES:
        raise ValueError(f"unknown BIO scheme: {scheme}")
    tags = ["O"] * len(token_offsets)
    for entity in entities:
        type_label = entity.entity_type.upper()
        entity_tokens = [
            i for i, (ts, te) in enumerate(token_offsets)
            if ts < entity.end and te > entity.start
        ]
        if not entity_tokens:
            continue
        n = len(entity_tokens)
        for j, tok_idx in enumerate(entity_tokens):
            if scheme == "IOB2":
                tags[tok_idx] = (f"B-{type_label}" if j == 0
                                 else f"I-{type_label}")
            elif scheme == "IOB1":
                needs_b = (j == 0 and tok_idx > 0
                           and tags[tok_idx - 1].endswith(f"-{type_label}"))
                tags[tok_idx] = (f"B-{type_label}" if needs_b
                                 else f"I-{type_label}")
            elif scheme == "IOBES":
                if n == 1:
                    tags[tok_idx] = f"S-{type_label}"
                elif j == 0:
                    tags[tok_idx] = f"B-{type_label}"
                elif j == n - 1:
                    tags[tok_idx] = f"E-{type_label}"
                else:
                    tags[tok_idx] = f"I-{type_label}"
            elif scheme == "IOE2":
                tags[tok_idx] = (f"E-{type_label}" if j == n - 1
                                 else f"I-{type_label}")
            else:  # IOE1
                needs_e = (j == n - 1 and tok_idx + 1 < len(token_offsets)
                           and tags[tok_idx + 1].endswith(f"-{type_label}"))
                tags[tok_idx] = (f"E-{type_label}" if needs_e
                                 else f"I-{type_label}")
    return tags


def validate_bio_sequence(tags: list, scheme: str = "IOB2") -> list:
    """Transition errors for IOB2/IOBES; other schemes are lenient
    (bio_adapter.rs:510-568)."""
    errors = []
    prev = _Tag("O")
    for i, tag_str in enumerate(tags):
        tag = _Tag(tag_str)
        if scheme == "IOB2":
            if tag.is_inside:
                t = tag.entity_type or "?"
                if prev.is_outside:
                    errors.append(
                        f"Position {i}: I-{t} follows O (should be B-{t})")
                elif tag.entity_type != prev.entity_type:
                    pt = prev.entity_type or "?"
                    errors.append(
                        f"Position {i}: I-{t} follows {prev.prefix}-{pt} "
                        f"(type mismatch)")
        elif scheme == "IOBES":
            t = tag.entity_type or "?"
            if tag.is_end and not prev.is_begin and not prev.is_inside:
                errors.append(f"Position {i}: E-{t} without preceding B or I")
            if tag.is_inside and not prev.is_begin and not prev.is_inside:
                errors.append(f"Position {i}: I-{t} without preceding B or I")
        prev = tag
    return errors


def repair_bio_sequence(tags: list, scheme: str = "IOB2",
                        strategy: str = "promote") -> list:
    """Repair invalid sequences (bio_adapter.rs:601-673).

    ``strategy``: ``promote`` (orphan I -> B, or S in IOBES),
    ``discard`` (-> O), ``lenient`` (unchanged).
    """
    if strategy == "lenient":
        return [str(t) for t in tags]
    result = []
    prev = _Tag("O")
    for tag_str in tags:
        tag = _Tag(tag_str)
        repaired = str(tag_str)
        if scheme == "IOB2":
            if tag.is_inside and (prev.is_outside
                                  or tag.entity_type != prev.entity_type):
                if strategy == "promote":
                    if tag.entity_type is not None:
                        repaired = f"B-{tag.entity_type}"
                else:
                    repaired = "O"
        elif scheme == "IOBES":
            if (tag.is_inside or tag.is_end) and not prev.is_begin \
                    and not prev.is_inside:
                if strategy == "promote":
                    if tag.entity_type is not None:
                        repaired = f"S-{tag.entity_type}"
                else:
                    repaired = "O"
        prev = _Tag(repaired)
        result.append(repaired)
    return result
