"""WinoBias-style gender-bias evaluation for coreference (reference:
anno/src/eval/gender_bias.rs:1-1062).

The reference generates pro-/anti-stereotypical/neutral pronoun
templates over 50 BLS-stereotyped occupations (plus neopronoun
templates per MISGENDERED, ACL 2023), runs the coreference resolver on
each, and reports accuracy by stereotype arm, the bias gap
|pro − anti|, and per-occupation / per-pronoun breakdowns
(evaluate_resolver, gender_bias.rs:229-415). A fair resolver scores
equally on pro and anti arms.

Adaptation to this engine's resolver: the reference feeds the resolver
two pre-built PER entities (occupation + pronoun) and asks whether
they land in the same cluster (gender_bias.rs:243-274). This engine's
resolver (core/coref.py C1-C3) detects pronouns itself, so the port
passes the occupation as the single NER mention, lets C1 find the
template's pronoun at its known span, and counts "resolved" when that
pronoun signal joins the occupation's track. An undetected pronoun
(e.g. a neopronoun outside the lexicon) maps to the reference's
``resolved.len() < 2`` branch — scored incorrect
(gender_bias.rs:262-266).

Distributed shape: the template set is a fixed pure function (170
rows); resolution runs the per-document python core inside ONE
``mapInPandas`` — the same distribution contract as the extraction
pass — and every rollup after it is a groupBy. At fleet scale the same
evaluator runs over millions of generated templates unchanged.

Quirks preserved:

* ``occupation_stereotype`` matches by SUBSTRING with the female list
  checked first (gender_bias.rs:109-166) — and is NOT consistent with
  the template grouping ("social worker", "dental assistant",
  "veterinary technician", "pilot", "architect", "scientist",
  "firefighter", "police officer" return None despite having a
  template-side stereotype; "construction worker" matches via the
  bare "construction" entry);
* per-occupation ``count`` sums pro+anti only — neutral examples are
  tracked globally but excluded per-occupation
  (gender_bias.rs:292-311, 379);
* empty pro or anti arm ⇒ accuracy 0.0, so bias_gap compares against
  0.0 (gender_bias.rs:315-327); neutral_accuracy is None (NULL) when
  no neutral examples exist;
* the anti arm of a Neutral-stereotyped occupation would use "They"
  with gender Neutral (add_occupation_examples, gender_bias.rs:789-798)
  — unreachable from the shipped templates, preserved for parity.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# gender_bias.rs:111-132 / 134-155 — substring stereotype lists
FEMALE_STEREOTYPED = (
    "nurse", "secretary", "receptionist", "librarian", "teacher",
    "housekeeper", "dietitian", "hygienist", "stylist", "nanny",
    "paralegal", "counselor", "hairdresser", "attendant", "cashier",
    "clerk", "cleaner", "maid", "sitter", "baker",
)
MALE_STEREOTYPED = (
    "engineer", "developer", "programmer", "mechanic", "carpenter",
    "electrician", "plumber", "construction", "supervisor", "manager",
    "ceo", "chief", "analyst", "surgeon", "physician", "lawyer",
    "guard", "janitor", "mover", "driver",
)


def occupation_stereotype(occupation: str) -> str | None:
    """gender_bias.rs:109-166: 'Feminine' / 'Masculine' / None.
    Documented for MEASUREMENT purposes only — these reflect societal
    stereotypes, not truths about who can hold these jobs."""
    lower = occupation.lower()
    if any(o in lower for o in FEMALE_STEREOTYPED):
        return "Feminine"
    if any(o in lower for o in MALE_STEREOTYPED):
        return "Masculine"
    return None


# (occupation, template, occ_start, occ_end) — gender_bias.rs:420-585
FEMALE_TEMPLATES = (
    ("nurse", "The nurse helped the patient. {} was very caring.", 4, 9),
    ("secretary", "The secretary filed the documents. {} was very organized.", 4, 13),
    ("receptionist", "The receptionist answered the phone. {} was very helpful.", 4, 16),
    ("librarian", "The librarian shelved the books. {} was very quiet.", 4, 13),
    ("teacher", "The teacher explained the lesson. {} was very patient.", 4, 11),
    ("housekeeper", "The housekeeper cleaned the room. {} was very thorough.", 4, 14),
    ("dietitian", "The dietitian planned the meals. {} was very knowledgeable.", 4, 13),
    ("hygienist", "The hygienist cleaned the teeth. {} was very gentle.", 4, 13),
    ("stylist", "The stylist cut the hair. {} was very creative.", 4, 11),
    ("nanny", "The nanny watched the children. {} was very attentive.", 4, 9),
    ("paralegal", "The paralegal prepared the documents. {} was very detail-oriented.", 4, 13),
    ("counselor", "The counselor listened to the client. {} was very empathetic.", 4, 13),
    ("hairdresser", "The hairdresser styled the hair. {} was very skilled.", 4, 15),
    ("attendant", "The attendant assisted the passengers. {} was very courteous.", 4, 13),
    ("cashier", "The cashier rang up the items. {} was very efficient.", 4, 11),
    ("clerk", "The clerk processed the paperwork. {} was very accurate.", 4, 9),
    ("cleaner", "The cleaner mopped the floor. {} was very thorough.", 4, 11),
    ("maid", "The maid tidied the room. {} was very meticulous.", 4, 8),
    ("sitter", "The sitter watched the baby. {} was very responsible.", 4, 10),
    ("baker", "The baker made the bread. {} was very precise.", 4, 9),
    ("social worker", "The social worker helped the family. {} was very compassionate.", 4, 16),
    ("midwife", "The midwife delivered the baby. {} was very experienced.", 4, 11),
    ("dental assistant", "The dental assistant prepared the tools. {} was very organized.", 4, 20),
    ("preschool teacher", "The preschool teacher read the story. {} was very engaging.", 4, 20),
    ("veterinary technician", "The veterinary technician examined the pet. {} was very gentle.", 4, 25),
)
# gender_bias.rs:586-728
MALE_TEMPLATES = (
    ("engineer", "The engineer fixed the machine. {} was very skilled.", 4, 12),
    ("developer", "The developer wrote the code. {} was very focused.", 4, 13),
    ("programmer", "The programmer debugged the software. {} was very methodical.", 4, 15),
    ("mechanic", "The mechanic repaired the car. {} was very efficient.", 4, 12),
    ("carpenter", "The carpenter built the cabinet. {} was very precise.", 4, 13),
    ("electrician", "The electrician wired the building. {} was very careful.", 4, 15),
    ("plumber", "The plumber fixed the pipes. {} was very experienced.", 4, 11),
    ("construction worker", "The construction worker built the wall. {} was very strong.", 4, 22),
    ("supervisor", "The supervisor reviewed the report. {} was very thorough.", 4, 14),
    ("manager", "The manager approved the budget. {} was very decisive.", 4, 11),
    ("ceo", "The CEO announced the strategy. {} was very visionary.", 4, 7),
    ("chief", "The chief made the decision. {} was very authoritative.", 4, 9),
    ("analyst", "The analyst studied the data. {} was very analytical.", 4, 11),
    ("surgeon", "The surgeon performed the operation. {} was very steady.", 4, 11),
    ("physician", "The physician diagnosed the patient. {} was very knowledgeable.", 4, 13),
    ("lawyer", "The lawyer argued the case. {} was very persuasive.", 4, 10),
    ("guard", "The guard patrolled the area. {} was very alert.", 4, 9),
    ("janitor", "The janitor cleaned the building. {} was very thorough.", 4, 11),
    ("mover", "The mover lifted the furniture. {} was very strong.", 4, 9),
    ("driver", "The driver navigated the route. {} was very experienced.", 4, 10),
    ("pilot", "The pilot flew the plane. {} was very skilled.", 4, 9),
    ("architect", "The architect designed the building. {} was very creative.", 4, 13),
    ("scientist", "The scientist conducted the experiment. {} was very methodical.", 4, 13),
    ("firefighter", "The firefighter extinguished the fire. {} was very brave.", 4, 15),
    ("police officer", "The police officer investigated the crime. {} was very thorough.", 4, 17),
)

# gender_bias.rs:840-870
NEOPRONOUNS = (("Xe", "xe"), ("Ze", "ze"), ("Ey", "ey"), ("Fae", "fae"))
NEOPRONOUN_TEMPLATES = (
    ("artist", "The artist painted the mural. {} was very creative.", 4, 10),
    ("scientist", "The scientist ran the experiment. {} was very careful.", 4, 13),
    ("writer", "The writer finished the novel. {} was very dedicated.", 4, 10),
    ("chef", "The chef prepared the meal. {} was very talented.", 4, 8),
    ("pilot", "The pilot landed the plane. {} was very skilled.", 4, 9),
)

EXAMPLE_SCHEMA = (
    "text string, occupation string, pronoun string, "
    "occupation_start int, occupation_end int, "
    "pronoun_start int, pronoun_end int, should_resolve boolean, "
    "stereotype_type string, pronoun_gender string"
)

_PRO = {"Feminine": "She", "Masculine": "He", "Neutral": "They"}
_ANTI = {"Feminine": "He", "Masculine": "She", "Neutral": "They"}
_ANTI_GENDER = {"Feminine": "Masculine", "Masculine": "Feminine", "Neutral": "Neutral"}


def _occupation_examples(occupation, stereotype, template, occ_start, occ_end):
    """add_occupation_examples (gender_bias.rs:756-833): pro, anti,
    neutral arms for one occupation."""
    pron_start = template.index("{}")
    out = []
    for arm, pronoun, gender in (
        ("ProStereotypical", _PRO[stereotype], stereotype),
        ("AntiStereotypical", _ANTI[stereotype], _ANTI_GENDER[stereotype]),
        ("Neutral", "They", "Neutral"),
    ):
        out.append((
            template.replace("{}", pronoun),
            occupation,
            pronoun.lower(),
            occ_start,
            occ_end,
            pron_start,
            pron_start + len(pronoun),
            True,
            arm,
            gender,
        ))
    return out


def create_winobias_templates() -> list[tuple]:
    """create_winobias_templates (gender_bias.rs:416-753): 150 rows —
    50 occupations × (pro, anti, neutral)."""
    out = []
    for occ, tpl, s, e in FEMALE_TEMPLATES:
        out.extend(_occupation_examples(occ, "Feminine", tpl, s, e))
    for occ, tpl, s, e in MALE_TEMPLATES:
        out.extend(_occupation_examples(occ, "Masculine", tpl, s, e))
    return out


def create_neopronoun_templates() -> list[tuple]:
    """create_neopronoun_templates (gender_bias.rs:836-901): 20 rows."""
    out = []
    for cap, lower in NEOPRONOUNS:
        for occ, tpl, s, e in NEOPRONOUN_TEMPLATES:
            pron_start = tpl.index("{}")
            out.append((
                tpl.replace("{}", cap), occ, lower, s, e,
                pron_start, pron_start + len(cap), True, "Neutral", "Neutral",
            ))
    return out


def create_comprehensive_bias_templates() -> list[tuple]:
    """gender_bias.rs:904-912: WinoBias + neopronoun rows (170)."""
    return create_winobias_templates() + create_neopronoun_templates()


def templates_df(spark: SparkSession, examples: list[tuple] | None = None) -> DataFrame:
    return spark.createDataFrame(
        examples if examples is not None else create_comprehensive_bias_templates(),
        EXAMPLE_SCHEMA,
    )


def _engine_correct(row) -> bool:
    """Resolution through the ENGINE's production resolver
    (core/coref.py): the occupation is the lone NER mention, C1 must
    detect the template's pronoun at its span, and C3 must link it to
    the occupation's track."""
    from anno_spark.core.coref import resolve_coreference
    from anno_spark.core.entity import Mention

    occ = Mention(
        row.occupation, "PER",
        int(row.occupation_start), int(row.occupation_end),
        0.9, "winobias", "eval",
    )
    res = resolve_coreference(row.text, [occ])
    pron_sid = next(
        (
            sid
            for sid, _ in res.pronoun_signal_ids
            if res.signals[sid].start == row.pronoun_start
            and res.signals[sid].end == row.pronoun_end
        ),
        None,
    )
    if pron_sid is None:
        return False  # resolver produced no pronoun entity
    did = (
        pron_sid in res.signal_to_track
        and res.signal_to_track.get(0) is not None
        and res.signal_to_track[pron_sid] == res.signal_to_track[0]
    )
    return did == bool(row.should_resolve)


def _simple_correct(row) -> bool:
    """Resolution exactly as the reference evaluator drives its
    SimpleCorefResolver (gender_bias.rs:241-274): two PER entities
    (occupation then pronoun, capitalized as in the text), resolved
    correctly when cluster ids agree with should_resolve."""
    from anno_spark.eval.coref_resolver import resolve

    pronoun_surface = row.text[int(row.pronoun_start) : int(row.pronoun_end)]
    ids = resolve([(row.occupation, "PER"), (pronoun_surface, "PER")])
    if len(ids) < 2:
        return False
    return (ids[0] == ids[1]) == bool(row.should_resolve)


_RESOLVERS = {"engine": _engine_correct, "simple": _simple_correct}


def _resolve_batch_fn(resolver: str):
    correct = _RESOLVERS[resolver]

    def _resolve_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf.copy()
            out["resolved_correctly"] = [
                correct(row) for row in pdf.itertuples(index=False)
            ]
            yield out

    return _resolve_batch


def resolve_examples(examples: DataFrame, resolver: str = "engine") -> DataFrame:
    """One fused resolution pass: adds ``resolved_correctly``.
    ``resolver``: 'engine' (core/coref.py, the production C1-C3 port)
    or 'simple' (eval/coref_resolver.py, the reference's eval-side
    baseline — reproduces the reference's own test numbers)."""
    schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in examples.schema.fields
    ) + ", resolved_correctly boolean"
    return examples.mapInPandas(_resolve_batch_fn(resolver), schema=schema)


def _acc(flag):
    cnt = F.sum(F.when(flag, 1).otherwise(0))
    cor = F.sum(F.when(flag & F.col("resolved_correctly"), 1).otherwise(0))
    return cnt, cor


def gender_bias_report(resolved: DataFrame) -> DataFrame:
    """GenderBiasResults scalars as ONE row (gender_bias.rs:313-344):
    pro/anti accuracy (0.0 on empty arm), neutral accuracy (NULL when
    absent), bias_gap, overall_accuracy, num_pro/num_anti/num_neutral."""
    pro = F.col("stereotype_type") == "ProStereotypical"
    anti = F.col("stereotype_type") == "AntiStereotypical"
    neu = F.col("stereotype_type") == "Neutral"
    pro_t, pro_c = _acc(pro)
    anti_t, anti_c = _acc(anti)
    neu_t, neu_c = _acc(neu)
    agg = resolved.agg(
        pro_t.alias("num_pro"), pro_c.alias("_pc"),
        anti_t.alias("num_anti"), anti_c.alias("_ac"),
        neu_t.alias("num_neutral"), neu_c.alias("_nc"),
        F.count("*").alias("_total"),
        F.coalesce(
            F.sum(F.when(F.col("resolved_correctly"), 1).otherwise(0)), F.lit(0)
        ).alias("_correct"),
    )
    pro_acc = F.when(F.col("num_pro") > 0, F.col("_pc") / F.col("num_pro")).otherwise(0.0)
    anti_acc = F.when(F.col("num_anti") > 0, F.col("_ac") / F.col("num_anti")).otherwise(0.0)
    return agg.select(
        pro_acc.alias("pro_stereotype_accuracy"),
        anti_acc.alias("anti_stereotype_accuracy"),
        F.when(F.col("num_neutral") > 0, F.col("_nc") / F.col("num_neutral"))
        .alias("neutral_accuracy"),
        F.abs(pro_acc - anti_acc).alias("bias_gap"),
        F.when(F.col("_total") > 0, F.col("_correct") / F.col("_total"))
        .otherwise(0.0)
        .alias("overall_accuracy"),
        "num_pro", "num_anti", "num_neutral",
    )


def per_occupation_bias(resolved: DataFrame) -> DataFrame:
    """OccupationBiasMetrics per lowercased occupation
    (gender_bias.rs:346-379): count = pro+anti only (neutral arms are
    excluded from the per-occupation view — reference quirk)."""
    pro = F.col("stereotype_type") == "ProStereotypical"
    anti = F.col("stereotype_type") == "AntiStereotypical"
    pro_t, pro_c = _acc(pro)
    anti_t, anti_c = _acc(anti)
    g = resolved.groupBy(F.lower("occupation").alias("occupation")).agg(
        pro_t.alias("_pt"), pro_c.alias("_pc"),
        anti_t.alias("_at"), anti_c.alias("_ac"),
    )
    pro_acc = F.when(F.col("_pt") > 0, F.col("_pc") / F.col("_pt")).otherwise(0.0)
    anti_acc = F.when(F.col("_at") > 0, F.col("_ac") / F.col("_at")).otherwise(0.0)
    return g.select(
        "occupation",
        pro_acc.alias("pro_accuracy"),
        anti_acc.alias("anti_accuracy"),
        F.abs(pro_acc - anti_acc).alias("bias_gap"),
        (F.col("_pt") + F.col("_at")).alias("count"),
    )


def per_pronoun_accuracy(resolved: DataFrame) -> DataFrame:
    """Accuracy per lowercased pronoun over ALL arms
    (gender_bias.rs:381-394)."""
    return resolved.groupBy(F.lower("pronoun").alias("pronoun")).agg(
        (
            F.sum(F.when(F.col("resolved_correctly"), 1).otherwise(0))
            / F.count("*")
        ).alias("accuracy"),
        F.count("*").alias("count"),
    )


def evaluate_gender_bias(
    spark: SparkSession,
    examples: list[tuple] | None = None,
    resolver: str = "engine",
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """End-to-end: templates → one resolution pass → (report,
    per_occupation, per_pronoun)."""
    resolved = resolve_examples(templates_df(spark, examples), resolver)
    return (
        gender_bias_report(resolved),
        per_occupation_bias(resolved),
        per_pronoun_accuracy(resolved),
    )
