"""Round-3 probe-oracle suite (VERDICT r02 next #1/#9).

Two concerns:

* DRIFT GATES — the DuckDB oracles now carry INDEPENDENT literal
  transcriptions of the Spark-side constants (regex pattern sources,
  BPE/rolling-hash constants, language-ID diacritic classes). A shared
  constant would let one transcription bug pass both engines; an
  independent literal plus these equality tests makes divergence fail
  loudly instead.

* PROBE SEMANTICS — the full-stack extraction probes
  (ner_gazetteer_orgs / kg_probe_triples / kg_probe_tracks in
  __spark_entry__) rest on the claim that the planted templates produce
  EXACTLY the positional mentions/triples/tracks the pure-SQL oracles
  derive. These tests pin that claim at the core-extraction level (no
  Spark), for every pool element, so a gazetteer or template edit that
  breaks the derivation fails here before the driver ever runs.
"""

from __future__ import annotations

import re

import __spark_entry__ as entry_mod
from anno_spark.core import heuristic_ner, regex_ner
from anno_spark.core.document import extract_document
from anno_spark.functions.patterns import ORACLE_SAFE_PATTERNS


# --------------------------------------------------------------------------
# drift gates


def test_oracle_safe_patterns_match_reference_sources():
    """Every ORACLE_SAFE_PATTERNS value equals the source of the
    same-named compiled pattern in core.regex_ner (regex.rs:67-215)."""
    by_name = {
        "EMAIL": regex_ner.EMAIL_RE,
        "DATE_ISO": regex_ner.DATE_ISO,
        "PERCENT": regex_ner.PERCENT_RE,
        "MONEY_SYMBOL": regex_ner.MONEY_SYMBOL,
        "URL": regex_ner.URL_RE,
        "DATE_FRENCH_EU": regex_ner.DATE_FRENCH_EU,
        "TIME_24H": regex_ner.TIME_24H,
        "PHONE_INTL": regex_ner.PHONE_INTL,
    }
    assert set(ORACLE_SAFE_PATTERNS) == set(by_name)
    for name, compiled in by_name.items():
        assert ORACLE_SAFE_PATTERNS[name] == compiled.pattern, name


def test_oracle_constants_match_spark_side():
    from anno_spark.operators import textstats
    from anno_spark.plans import oracles

    assert oracles.BPE_RE == textstats.BPE_TOKEN_RE
    assert oracles.ROLL_B == textstats.ROLL_BASE
    assert oracles.ROLL_P == textstats.ROLL_MOD
    assert oracles.ROLL_MAX == textstats.ROLL_MAX_CHARS
    # WS vs WS_CLASS use different escape spellings (\v vs \x0B) — compare
    # the matched character sets over the full byte range instead
    ws_oracle = re.compile(oracles.WS)
    ws_spark = re.compile(textstats.WS_CLASS)
    for i in range(256):
        c = chr(i)
        assert bool(ws_oracle.fullmatch(c)) == bool(ws_spark.fullmatch(c)), hex(i)


def test_lang_char_literals_match_textops():
    from anno_spark.core import textops
    from anno_spark.plans import oracles

    def alpha_sorted(chars):
        return "".join(sorted(c for c in chars if c.isalpha()))

    assert oracles.LANG_DE_CHARS == alpha_sorted(textops._GERMAN_CHARS)
    assert oracles.LANG_FR_CHARS == alpha_sorted(textops._FRENCH_CHARS)
    assert oracles.LANG_ES_CHARS == alpha_sorted(textops._SPANISH_CHARS)


def test_probe_pools_are_reference_gazetteer_members():
    for o in entry_mod._PROBE_ORGS:
        assert o.lower() in heuristic_ner.KNOWN_ORGS_SET, o
        assert o.lower() not in heuristic_ner.ORG_SUFFIX, o
    for p in entry_mod._PROBE_PERSONS:
        assert p.lower() in heuristic_ner.KNOWN_PERSONS, p
        # must not shadow an org/loc (classification checks those first)
        assert p.lower() not in heuristic_ner.KNOWN_ORGS_SET, p
        assert p.lower() not in heuristic_ner.KNOWN_LOCS_SET, p


# --------------------------------------------------------------------------
# probe template semantics (core extraction, every pool element)


def test_gazetteer_probe_positions_every_pair():
    """For every (o1, o2) the gazetteer template yields exactly two
    known_org mentions at the positions the SQL oracle derives."""
    for o1 in entry_mod._PROBE_ORGS:
        for o2 in entry_mod._PROBE_ORGS[:5]:
            text = f"on monday {o1} told reporters that {o2} was ready."
            out = extract_document(text)
            gaz = [m for m in out.mentions if m.pattern == "known_org"]
            assert [(m.text, m.entity_type, m.start, m.end, m.confidence) for m in gaz] == [
                (o1, "ORG", 10, 10 + len(o1), 0.8),
                (o2, "ORG", 31 + len(o1), 31 + len(o1) + len(o2), 0.8),
            ], (o1, o2)
            # and NOTHING else fires on the template
            assert len(out.mentions) == 2, (o1, o2, out.mentions)


def test_relation_probe_triple_every_pair():
    """'earlier P founded O quietly.' → exactly one CEO_OF triple with
    positional spans ('founded' is a CEO_OF trigger before the FOUNDED
    slug is reached — inference.rs:2097-2128 source-order quirk)."""
    for pn in entry_mod._PROBE_PERSONS:
        for og in entry_mod._PROBE_ORGS[:4]:
            text = f"earlier {pn} founded {og} quietly."
            out = extract_document(text)
            assert len(out.triples) == 1, (pn, og, out.triples)
            t = out.triples[0]
            lp = len(pn)
            assert (
                t.subj_text, t.subj_type, t.subj_start, t.subj_end,
                t.pred,
                t.obj_text, t.obj_type, t.obj_start, t.obj_end,
                t.trigger_start, t.trigger_end, t.confidence,
            ) == (
                pn, "PER", 8, 8 + lp,
                "CEO_OF",
                og, "ORG", 17 + lp, 17 + lp + len(og),
                9 + lp, 16 + lp, 0.8,
            ), (pn, og)


def test_relation_probe_tracks_every_person():
    """Same template → exactly two single-signal tracks: (0, person, PER)
    then (1, org, ORG), canonical surface lowercased (utils.rs:424-470)."""
    for pn in entry_mod._PROBE_PERSONS:
        og = entry_mod._PROBE_ORGS[3]
        out = extract_document(f"earlier {pn} founded {og} quietly.")
        got = [
            (tr.track_id, tr.canonical_surface, tr.entity_type, list(tr.signal_ids))
            for tr in out.tracks
        ]
        assert got == [
            (0, pn.lower(), "PER", [0]),
            (1, og.lower(), "ORG", [1]),
        ], (pn, got)


# --------------------------------------------------------------------------
# probe2 construction parity (Spark expression vs DuckDB SQL, same rows)


def test_probe2_text_identical_spark_vs_duckdb(spark, sf_dir):
    import os

    import duckdb

    sdf = (
        entry_mod._probe2_df(spark, sf_dir)
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    doc_pq = os.path.join(sf_dir, "documents.parquet")
    odf = (
        con.sql(
            f"SELECT doc_id, {entry_mod._PROBE2_SQL} AS probe_text "
            f"FROM read_parquet('{doc_pq}') ORDER BY doc_id"
        )
        .df()
        .reset_index(drop=True)
    )
    assert list(sdf["probe_text"]) == list(odf["probe_text"])


def test_gazetteer_probe_pages_match_oracle_pool(spark, sf_dir):
    """The Spark page constructor and the SQL pool indexing agree on
    which org lands in which slot for every doc_id."""
    import os

    import duckdb

    pages = entry_mod._gaz_probe_pages(spark, sf_dir).toPandas()
    pages["doc_id"] = pages["url"].astype("int64")
    pages = pages.sort_values("doc_id").reset_index(drop=True)
    con = duckdb.connect()
    doc_pq = os.path.join(sf_dir, "documents.parquet")
    pool = entry_mod._sql_strs(entry_mod._PROBE_ORGS)
    odf = con.sql(
        f"SELECT doc_id, 'on monday ' || {pool}[cast(doc_id % 24 as int) + 1] || "
        f"' told reporters that ' || {pool}[cast((doc_id * 7 + 3) % 24 as int) + 1] || "
        f"' was ready.' AS text FROM read_parquet('{doc_pq}') ORDER BY doc_id"
    ).df()
    assert list(pages["text"]) == list(odf["text"])
