"""Per-dataset label mapping — TypeMapper + DatasetSchema/SchemaMapper
(SURVEY §1.1 "broadcast dict inside UDFs"; VERDICT r02 next #7).

Behavioral port of the reference's two label-normalization layers:

* ``TypeMapper`` (anno-core/src/entity.rs:504-679): per-dataset source
  label → EntityType, uppercase-keyed, with ``normalize`` falling back
  to ``EntityType::from_label`` (entity.rs:394-423 — BIO-prefix strip +
  canonical ladder, unknown → Other(UPPER)).
* ``SchemaMapper`` / ``DatasetSchema`` (anno/src/schema.rs:59-258,
  361-607): the unified canonical schema — 10 dataset schemas mapped to
  CanonicalType with information-loss tracking, unknown → Misc, plus
  ``map_to_canonical`` (schema.rs:609-630) and ``label_overlap``
  (schema.rs:573-600).

Entity types are carried as their ``as_label()`` strings (PER/ORG/...,
entity.rs:370-388) to match the mention tables.

Spark-first execution: :func:`normalize_labels` compiles the mapping
into a ``create_map`` literal — the lookup runs as a whole-stage-codegen
JVM expression over the mentions table, not a Python UDF. The dict IS
part of the serialized plan, which is exactly the "broadcast small dim"
shape for a ≤100-entry mapping at 10¹² mentions.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# --- CanonicalType → as_label() string (schema.rs:193-230 via
# EntityType::as_label, entity.rs:370-388) ---------------------------------
PERSON = "PER"
GROUP = "GROUP"
ORGANIZATION = "ORG"
GPE = "GPE"
NATURAL_LOCATION = "LOC"
FACILITY = "FAC"
LOCATION = "LOC"
DATE = "DATE"
TIME = "TIME"
MONEY = "MONEY"
PERCENT = "PERCENT"
QUANTITY = "QUANTITY"
CARDINAL = "CARDINAL"
ORDINAL = "ORDINAL"
CREATIVE_WORK = "WORK_OF_ART"
PRODUCT = "PRODUCT"
EVENT = "EVENT"
LAW = "LAW"
LANGUAGE = "LANGUAGE"
DISEASE = "DISEASE"
CHEMICAL = "CHEMICAL"
GENE = "GENE"
DRUG = "DRUG"
ANIMAL = "ANIMAL"
PLANT = "PLANT"
FOOD = "FOOD"
MISC = "MISC"

# EntityType::from_label ladder (entity.rs:394-423); keys uppercased,
# unknown labels fall through to Other(UPPER).
FROM_LABEL = {
    "PER": PERSON, "PERSON": PERSON,
    "ORG": ORGANIZATION, "ORGANIZATION": ORGANIZATION,
    "LOC": LOCATION, "LOCATION": LOCATION, "GPE": LOCATION,
    "DATE": DATE,
    "TIME": TIME,
    "MONEY": MONEY, "CURRENCY": MONEY,
    "PERCENT": PERCENT, "PERCENTAGE": PERCENT,
    "QUANTITY": QUANTITY,
    "CARDINAL": CARDINAL,
    "ORDINAL": ORDINAL,
    "EMAIL": "EMAIL",
    "URL": "URL", "URI": "URL",
    "PHONE": "PHONE", "TELEPHONE": "PHONE",
}

_BIO_RE = re.compile(r"^(?:B|I|E|S)-")          # from_label strips these
_BIO_RE_EXT = re.compile(r"^(?:B|I|E|S|L|U)-")  # map_to_canonical strips more


def from_label(label: str) -> str:
    """entity.rs:394-423 — BIO strip (one prefix), ladder, Other(UPPER)."""
    label = _BIO_RE.sub("", label, count=1)
    up = label.upper()
    return FROM_LABEL.get(up, up)


class TypeMapper:
    """entity.rs:504-679 — uppercase-keyed source-label mapping with the
    reference's five dataset presets."""

    def __init__(self, mappings: dict[str, str] | None = None):
        self.mappings: dict[str, str] = {}
        for k, v in (mappings or {}).items():
            self.add(k, v)

    def add(self, source: str, target: str) -> None:
        self.mappings[source.upper()] = target

    def map(self, label: str) -> str | None:
        return self.mappings.get(label.upper())

    def normalize(self, label: str) -> str:
        hit = self.map(label)
        return hit if hit is not None else from_label(label)

    def contains(self, label: str) -> bool:
        return label.upper() in self.mappings

    def labels(self):
        return self.mappings.keys()

    # presets (entity.rs:516-645) -----------------------------------------
    @classmethod
    def mit_movie(cls) -> "TypeMapper":
        return cls({
            "ACTOR": PERSON, "DIRECTOR": PERSON, "CHARACTER": PERSON,
            "TITLE": CREATIVE_WORK, "GENRE": "GENRE", "YEAR": DATE,
            "RATING": "RATING", "PLOT": "PLOT",
        })

    @classmethod
    def mit_restaurant(cls) -> "TypeMapper":
        return cls({
            "RESTAURANT_NAME": ORGANIZATION, "LOCATION": LOCATION,
            "CUISINE": "CUISINE", "DISH": "DISH", "PRICE": MONEY,
            "AMENITY": "AMENITY", "HOURS": TIME,
        })

    @classmethod
    def biomedical(cls) -> "TypeMapper":
        return cls({
            "DISEASE": DISEASE, "CHEMICAL": CHEMICAL, "DRUG": DRUG,
            "GENE": GENE, "PROTEIN": "PROTEIN", "DNA": "DNA", "RNA": "RNA",
            "cell_line": "CELL_LINE", "cell_type": "CELL_TYPE",
        })

    @classmethod
    def social_media(cls) -> "TypeMapper":
        return cls({
            "person": PERSON, "corporation": ORGANIZATION,
            "location": LOCATION, "group": ORGANIZATION,
            "product": PRODUCT, "creative_work": CREATIVE_WORK,
            "event": EVENT,
        })

    @classmethod
    def manufacturing(cls) -> "TypeMapper":
        return cls({
            "MATE": "MATERIAL", "MANP": "PROCESS", "MACEQ": "MACHINE",
            "APPL": "APPLICATION", "FEAT": "FEATURE", "PARA": "PARAMETER",
            "PRO": "PROPERTY", "CHAR": "CHARACTERISTIC",
            "ENAT": "ENABLING_TECHNOLOGY", "CONPRI": "CONCEPT_PRINCIPLE",
            "BIOP": "BIO_PROCESS", "MANS": "MAN_STANDARD",
        })


# --- DatasetSchema → {UPPER(label): (canonical as_label, loss reason|None)}
# (schema.rs:373-543; loss strings transcribed verbatim) -------------------
DATASET_SCHEMAS: dict[str, dict[str, tuple[str, str | None]]] = {
    "conll2003": {
        "PER": (PERSON, None), "LOC": (LOCATION, None),
        "ORG": (ORGANIZATION, None), "MISC": (MISC, None),
    },
    "ontonotes": {
        "PERSON": (PERSON, None),
        "NORP": (GROUP, "Nationalities/religions/politics - distinct from formal organizations"),
        "GPE": (GPE, None),
        "LOC": (NATURAL_LOCATION, "Natural locations (mountains, rivers)"),
        "FAC": (FACILITY, "Man-made structures (buildings, bridges)"),
        "ORG": (ORGANIZATION, None),
        "DATE": (DATE, None), "TIME": (TIME, None),
        "MONEY": (MONEY, None), "PERCENT": (PERCENT, None),
        "QUANTITY": (QUANTITY, None), "CARDINAL": (CARDINAL, None),
        "ORDINAL": (ORDINAL, None),
        "PRODUCT": (PRODUCT, None), "EVENT": (EVENT, None),
        "WORK_OF_ART": (CREATIVE_WORK, None), "LAW": (LAW, None),
        "LANGUAGE": (LANGUAGE, None),
    },
    "multinerd": {
        "PER": (PERSON, None), "LOC": (LOCATION, None),
        "ORG": (ORGANIZATION, None), "ANIM": (ANIMAL, None),
        "BIO": (MISC, "Biological entities"), "CEL": (MISC, "Celestial bodies"),
        "DIS": (DISEASE, None), "EVE": (EVENT, None), "FOOD": (FOOD, None),
        "INST": (MISC, "Instruments"), "MEDIA": (CREATIVE_WORK, "Media works"),
        "MYTH": (MISC, "Mythological entities"), "PLANT": (PLANT, None),
        "TIME": (TIME, None), "VEHI": (PRODUCT, "Vehicles"),
    },
    "fewnerd": {
        "PERSON": (PERSON, None), "ORGANIZATION": (ORGANIZATION, None),
        "LOCATION": (LOCATION, None),
        "BUILDING": (FACILITY, "Buildings/structures"),
        "ART": (CREATIVE_WORK, None), "PRODUCT": (PRODUCT, None),
        "EVENT": (EVENT, None), "OTHER": (MISC, None),
    },
    "crossner": {
        "POLITICIAN": (PERSON, "Political role lost"),
        "ELECTION": (EVENT, "Election specificity lost"),
        "POLITICAL_PARTY": (ORGANIZATION, "Political nature lost"),
        "COUNTRY": (GPE, None), "LOCATION": (LOCATION, None),
        "ORGANIZATION": (ORGANIZATION, None), "PERSON": (PERSON, None),
        "MISC": (MISC, None),
    },
    "bc5cdr": {"CHEMICAL": (CHEMICAL, None), "DISEASE": (DISEASE, None)},
    "ncbi_disease": {"DISEASE": (DISEASE, None)},
    "mit_movie": {
        "ACTOR": (PERSON, "Acting role lost"),
        "DIRECTOR": (PERSON, "Directing role lost"),
        "CHARACTER": (PERSON, "Fictional status lost"),
        "TITLE": (CREATIVE_WORK, None), "YEAR": (DATE, None),
        "SONG": (CREATIVE_WORK, "Song vs film lost"),
        "GENRE": (MISC, "Genre semantics lost"),
        "PLOT": (MISC, "Plot description lost"),
        "RATING": (MISC, "Rating semantics lost"),
    },
    "mit_restaurant": {
        "RESTAURANT_NAME": (ORGANIZATION, None), "LOCATION": (LOCATION, None),
        "CUISINE": (MISC, "Cuisine type lost"),
        "DISH": (FOOD, "Dish specifics lost"),
        "PRICE": (MONEY, None), "AMENITY": (MISC, "Amenity type lost"),
        "HOURS": (TIME, None), "RATING": (MISC, "Rating semantics lost"),
    },
    "wnut17": {
        "PERSON": (PERSON, None), "LOCATION": (LOCATION, None),
        "CORPORATION": (ORGANIZATION, None), "PRODUCT": (PRODUCT, None),
        "CREATIVE-WORK": (CREATIVE_WORK, None), "GROUP": (GROUP, None),
    },
}


class SchemaMapper:
    """schema.rs:361-607 — dataset-schema mapping with loss tracking."""

    def __init__(self, schema: str):
        if schema not in DATASET_SCHEMAS:
            raise KeyError(f"unknown dataset schema: {schema!r}")
        self.source_schema = schema
        self._table = DATASET_SCHEMAS[schema]

    def to_canonical(self, label: str) -> str:
        hit = self._table.get(label.upper())
        return hit[0] if hit else MISC  # unknown → Misc (schema.rs:544-549)

    def information_loss(self, label: str) -> str | None:
        hit = self._table.get(label.upper())
        return hit[1] if hit else None

    def all_losses(self) -> dict[str, str]:
        return {k: v[1] for k, v in self._table.items() if v[1] is not None}

    def label_overlap(self, other: "SchemaMapper") -> float:
        """schema.rs:573-600 — Jaccard of canonical-type sets."""
        a = {v[0] for v in self._table.values()}
        b = {v[0] for v in other._table.values()}
        union = a | b
        return len(a & b) / len(union) if union else 0.0


# map_label_heuristic (schema.rs:627-693) — the no-schema fallback.
# Distinct from entity.rs from_label: preserves GPE/FAC as custom place
# types, NORP→GROUP (not ORG), and knows the domain vocabularies.
MAP_LABEL_HEURISTIC = {
    **{k: PERSON for k in ("PER", "PERSON", "ACTOR", "DIRECTOR",
                           "CHARACTER", "POLITICIAN")},
    **{k: GROUP for k in ("NORP", "GROUP", "NATIONALITY", "RELIGION")},
    **{k: ORGANIZATION for k in ("ORG", "ORGANIZATION", "ORGANISATION",
                                 "CORPORATION", "COMPANY",
                                 "POLITICAL_PARTY", "RESTAURANT_NAME")},
    **{k: GPE for k in ("GPE", "COUNTRY", "CITY", "STATE")},
    **{k: FACILITY for k in ("FAC", "FACILITY", "BUILDING")},
    **{k: LOCATION for k in ("LOC", "LOCATION", "GEO")},
    "DATE": DATE, "YEAR": DATE,
    "TIME": TIME, "HOURS": TIME,
    "MONEY": MONEY, "PRICE": MONEY, "CURRENCY": MONEY,
    "PERCENT": PERCENT, "PERCENTAGE": PERCENT,
    "QUANTITY": QUANTITY, "CARDINAL": CARDINAL, "ORDINAL": ORDINAL,
    "PRODUCT": PRODUCT, "PROD": PRODUCT,
    "EVENT": EVENT, "EVE": EVENT, "ELECTION": EVENT,
    **{k: CREATIVE_WORK for k in ("WORK_OF_ART", "CREATIVE-WORK", "TITLE",
                                  "SONG", "ART", "MEDIA")},
    "LAW": LAW, "LANGUAGE": LANGUAGE,
    "DISEASE": DISEASE, "DIS": DISEASE,
    "CHEMICAL": CHEMICAL, "GENE": GENE, "DRUG": DRUG,
    "ANIM": ANIMAL, "ANIMAL": ANIMAL, "PLANT": PLANT,
    "FOOD": FOOD, "DISH": FOOD, "CUISINE": FOOD,
    "VEHI": "VEHICLE", "VEHICLE": "VEHICLE",
    "EMAIL": "EMAIL", "URL": "URL", "URI": "URL",
    "PHONE": "PHONE", "TELEPHONE": "PHONE",
    "MISC": MISC, "MISCELLANEOUS": MISC, "O": MISC, "OTHER": MISC,
}


def map_label_heuristic(label: str) -> str:
    """schema.rs:627-693 — unknown labels preserved as Other(UPPER)."""
    up = label.upper()
    return MAP_LABEL_HEURISTIC.get(up, up)


def map_to_canonical(label: str, schema: str | None = None) -> str:
    """schema.rs:609-630 — the unified mapping entry point. The no-schema
    fallback is :func:`map_label_heuristic`, NOT entity.rs from_label
    (the reference's loader test pins GPE staying distinct)."""
    label = _BIO_RE_EXT.sub("", label, count=1)
    if schema is not None:
        return SchemaMapper(schema).to_canonical(label)
    return map_label_heuristic(label)


# --------------------------------------------------------------------------
# Spark operator — the mapping as a codegen'd map-literal expression


def normalize_labels_expr(
    col: Column, schema: str | None = None, mapper: TypeMapper | None = None
) -> Column:
    """JVM expression computing :func:`map_to_canonical` /
    ``TypeMapper.normalize`` for a label column. The mapping dict is
    inlined as a ``create_map`` literal (part of the plan — the ≤100-entry
    broadcast dim), the BIO strip is one anchored regexp_replace, and the
    fallback mirrors the reference exactly; no Python in the row path."""
    if schema is not None and mapper is not None:
        raise ValueError("pass schema OR mapper, not both")
    if schema is not None:
        stripped = F.regexp_replace(col, "^(?:B|I|E|S|L|U)-", "")
        table = {k: v[0] for k, v in DATASET_SCHEMAS[schema].items()}
        m = F.create_map(*[F.lit(x) for kv in table.items() for x in kv])
        return F.coalesce(m[F.upper(stripped)], F.lit(MISC))
    # TypeMapper.map looks up the RAW uppercased label (no BIO strip,
    # entity.rs:648-651); only the from_label FALLBACK strips the prefix
    # (entity.rs:394-401)
    stripped_up = F.upper(F.regexp_replace(col, "^(?:B|I|E|S)-", ""))
    if mapper is not None and mapper.mappings:
        mm = F.create_map(
            *[F.lit(x) for kv in mapper.mappings.items() for x in kv]
        )
        mapped = mm[F.upper(col)]
    else:
        mapped = F.lit(None).cast("string")
    fl = F.create_map(*[F.lit(x) for kv in FROM_LABEL.items() for x in kv])
    return F.coalesce(mapped, fl[stripped_up], stripped_up)


def normalize_labels(
    mentions: DataFrame,
    schema: str | None = None,
    mapper: TypeMapper | None = None,
    label_col: str = "entity_type",
) -> DataFrame:
    """mentions with ``label_col`` rewritten to the canonical label; the
    original is preserved as ``<label_col>_raw`` (lineage)."""
    return mentions.withColumn(
        f"{label_col}_raw", F.col(label_col)
    ).withColumn(
        label_col, normalize_labels_expr(F.col(label_col), schema, mapper)
    )
