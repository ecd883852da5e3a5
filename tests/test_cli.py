"""CLI e2e tests (SURVEY §2.11).

Transcribed from the reference CLI test suites:
* tests/cli_integration.rs — model behavior through the CLI surface,
  EvalComparison match taxonomy (282-389)
* tests/crossdoc_cli_output.rs / crossdoc_cli_format.rs — crossdoc output
  format contracts (json metadata envelope, jsonl one-object-per-line,
  tree/summary strings, filters, sorting)
* tests/cli_ux_fixes.rs — input resolution precedence, exit codes

Most tests drive `anno_spark.cli.main` in-process (argv → exit code,
capsys for stdout); two subprocess tests pin the `python -m anno_spark`
module entry itself.
"""

from __future__ import annotations

import json
import subprocess
import sys

import pytest

from anno_spark.cli import main
from anno_spark.eval.comparison import EvalComparison, Sig

TEXT = "Marie Curie won the Nobel Prize in Paris on 10 December 1903."


def run_cli(capsys, *argv):
    rc = main(list(argv))
    captured = capsys.readouterr()
    return rc, captured.out, captured.err


# ---------------------------------------------------------------------------
# extract
# ---------------------------------------------------------------------------


class TestExtract:
    def test_json_format_shape(self, capsys):
        rc, out, _ = run_cli(capsys, "extract", "-t", TEXT, "--format", "json")
        assert rc == 0
        ents = json.loads(out)
        assert {e["text"] for e in ents} >= {"Marie Curie", "Paris"}
        for e in ents:
            assert set(e) == {"text", "type", "start", "end", "confidence",
                              "negated", "quantifier"}
            assert TEXT[e["start"]:e["end"]] == e["text"]

    def test_jsonl_one_object_per_line(self, capsys):
        rc, out, _ = run_cli(capsys, "extract", "-t", TEXT, "--format", "jsonl")
        assert rc == 0
        lines = [l for l in out.splitlines() if l]
        assert len(lines) >= 2
        for line in lines:
            obj = json.loads(line)
            assert set(obj) == {"text", "type", "start", "end", "confidence"}

    def test_tsv_header_and_rows(self, capsys):
        rc, out, _ = run_cli(capsys, "extract", "-t", TEXT, "--format", "tsv")
        assert rc == 0
        lines = out.splitlines()
        assert lines[0] == "start\tend\ttype\tconfidence\tnegated\ttext"
        assert all(len(l.split("\t")) == 6 for l in lines[1:])

    def test_label_filter_case_insensitive(self, capsys):
        # extract.rs:144-156
        rc, out, _ = run_cli(
            capsys, "extract", "-t", TEXT, "--format", "json", "-l", "per"
        )
        ents = json.loads(out)
        assert ents and all(e["type"] == "PER" for e in ents)

    def test_positional_text_without_subcommand(self, capsys):
        # main.rs:251-277 — bare text routes to extract
        rc, out, _ = run_cli(capsys, "Marie", "Curie", "visited", "Paris.")
        assert rc == 0
        assert "Marie Curie" in out

    def test_pattern_model_dates(self, capsys):
        # cli_integration.rs:17-23
        rc, out, _ = run_cli(
            capsys, "extract", "-m", "pattern", "--format", "json",
            "-t", "Meeting on January 15, 2024 at 3:30 PM",
        )
        types = {e["type"] for e in json.loads(out)}
        assert "DATE" in types
        assert "TIME" in types

    def test_pattern_model_contact(self, capsys):
        # cli_integration.rs:49-66
        rc, out, _ = run_cli(
            capsys, "extract", "-m", "pattern", "--format", "json",
            "-t", "Email john@example.com or visit https://example.com",
        )
        types = {e["type"] for e in json.loads(out)}
        assert "EMAIL" in types
        assert "URL" in types

    def test_stacked_model_combines(self, capsys):
        # cli_integration.rs:108-129 — stacked finds both pattern + heuristic
        rc, out, _ = run_cli(
            capsys, "extract", "--format", "json",
            "-t", "Angela Merkel visited Paris on 2024-01-15.",
        )
        types = {e["type"] for e in json.loads(out)}
        assert "PER" in types
        assert "DATE" in types

    def test_negation_flag(self, capsys):
        # cli_integration.rs:218-223
        rc, out, _ = run_cli(
            capsys, "extract", "--format", "json", "--negation",
            "-t", "The CEO did not visit Microsoft.",
        )
        ents = json.loads(out)
        ms = [e for e in ents if e["text"] == "Microsoft"]
        assert ms and ms[0]["negated"] is True

    def test_quantifier_flag(self, capsys):
        # cli_integration.rs:227-233 — "every" → Universal
        rc, out, _ = run_cli(
            capsys, "extract", "--format", "json", "--quantifiers",
            "-t", "I met every Google engineer.",
        )
        ents = json.loads(out)
        gs = [e for e in ents if e["text"] == "Google"]
        assert gs and gs[0]["quantifier"] == "Universal"

    def test_quiet_human_minimal_lines(self, capsys):
        rc, out, _ = run_cli(capsys, "extract", "-q", "-t", "Paris is lovely.")
        assert rc == 0
        assert out.splitlines() == ["[0,5)\tLOC\tParis"]

    def test_export_roundtrip(self, capsys, tmp_path):
        # extract.rs:322-389 → the exported JSON re-imports via crossdoc
        path = tmp_path / "doc.json"
        rc, _, _ = run_cli(
            capsys, "extract", "-q", "--format", "jsonl", "-t", TEXT,
            "--export", str(path),
        )
        assert rc == 0
        doc = json.loads(path.read_text())
        assert doc["id"] == "extract"
        assert doc["text"] == TEXT
        assert doc["signals"] and doc["entities"]
        surfaces = {s["surface"] for s in doc["signals"]}
        assert "Marie Curie" in surfaces

    def test_export_invalid_format_fails(self, capsys, tmp_path):
        rc, _, err = run_cli(
            capsys, "extract", "-q", "--format", "jsonl", "-t", TEXT,
            "--export", str(tmp_path / "x.json"), "--export-format", "bogus",
        )
        assert rc == 1
        assert "Invalid export format" in err

    def test_export_graph_cypher(self, capsys):
        rc, out, _ = run_cli(
            capsys, "extract", "-q", "--export-graph", "neo4j",
            "-t", "Elon Musk founded SpaceX. Elon Musk lives in Texas.",
        )
        assert rc == 0
        assert "CREATE (n" in out
        assert "MATCH (a {id: 'per:elon_musk'})" in out
        # dedup: two Elon Musk mentions, one node
        assert out.count("name: 'Elon Musk'") == 1

    def test_export_graph_networkx_parses(self, capsys):
        rc, out, _ = run_cli(
            capsys, "extract", "-q", "--export-graph", "networkx",
            "-t", "Elon Musk founded SpaceX.",
        )
        # stdout carries the quiet entity listing first, then the graph JSON
        # (reference prints both to stdout; extract.rs:408-419)
        g = json.loads(out[out.index("{"):])
        assert g["directed"] is True
        assert any(n["name"] == "Elon Musk" for n in g["nodes"])

    def test_html_format_rejected(self, capsys):
        # extract.rs:262-267
        rc, _, err = run_cli(capsys, "extract", "-t", TEXT, "--format", "html")
        assert rc == 1
        assert "HTML format not supported" in err

    def test_no_input_fails(self, capsys, monkeypatch):
        monkeypatch.setattr(sys.stdin, "isatty", lambda: True)
        rc, _, err = run_cli(capsys, "extract")
        assert rc == 1
        assert "No input text provided" in err

    def test_file_input(self, capsys, tmp_path):
        p = tmp_path / "in.txt"
        p.write_text("Angela Merkel lives in Berlin.")
        rc, out, _ = run_cli(capsys, "extract", "-f", str(p), "--format", "json")
        assert rc == 0
        assert any(e["text"] == "Berlin" for e in json.loads(out))

    def test_missing_file_fails(self, capsys):
        rc, _, err = run_cli(capsys, "extract", "-f", "/nonexistent/file.txt")
        assert rc == 1
        assert "Failed to read file" in err

    def test_onnx_backend_gated(self, capsys):
        try:
            import onnxruntime  # noqa: F401

            pytest.skip("onnxruntime present; gate not applicable")
        except ImportError:
            pass
        rc, _, err = run_cli(capsys, "extract", "-m", "gliner", "-t", TEXT)
        assert rc == 1
        assert "models info gliner" in err


# ---------------------------------------------------------------------------
# crossdoc
# ---------------------------------------------------------------------------


@pytest.fixture()
def news_dir(tmp_path):
    d = tmp_path / "docs"
    d.mkdir()
    (d / "tech_a.txt").write_text(
        "Jensen Huang announced that Nvidia will build new AI supercomputers."
    )
    (d / "tech_b.txt").write_text(
        "Nvidia's stock reached new highs after Jensen Huang's keynote."
    )
    (d / "tech_c.md").write_text("AMD and Intel responded to Nvidia.")
    (d / "ignored.dat").write_text("Nvidia Nvidia Nvidia")
    sub = d / "sub"
    sub.mkdir()
    (sub / "tech_d.txt").write_text("Nvidia partnered with Microsoft.")
    return d


class TestCrossdoc:
    def test_over_cap_points_at_distributed_pipeline(
        self, capsys, news_dir, monkeypatch
    ):
        # VERDICT r05 next #6: the single-process driver collect is now
        # capped; over the cap the error names the distributed entry point
        from anno_spark.cli.commands import crossdoc as cd

        monkeypatch.setattr(cd, "CROSSDOC_MAX_FILES", 2)
        rc, _, err = run_cli(capsys, "crossdoc", str(news_dir), "--format", "json")
        assert rc != 0
        assert "single-process tool capped" in err
        assert "run_pipeline" in err

    def test_json_metadata_envelope(self, capsys, news_dir):
        # crossdoc_cli_output.rs — metadata + clusters keys
        rc, out, _ = run_cli(capsys, "crossdoc", str(news_dir), "--format", "json")
        assert rc == 0
        d = json.loads(out)
        md = d["metadata"]
        assert md["documents_processed"] == 3  # .dat and sub/ skipped
        assert md["clusters_found"] == len(d["clusters"])
        assert md["threshold"] == 0.6
        assert "filters" in md

    def test_recursive_and_extensions(self, capsys, news_dir):
        rc, out, _ = run_cli(
            capsys, "crossdoc", str(news_dir), "--format", "json", "-r",
            "--extensions", "txt",
        )
        d = json.loads(out)
        assert d["metadata"]["documents_processed"] == 3  # 2 top + 1 sub, .md skipped

    def test_nvidia_clusters_cross_doc(self, capsys, news_dir):
        rc, out, _ = run_cli(
            capsys, "crossdoc", str(news_dir), "--format", "json",
            "--threshold", "0.4", "--require-type-match",
        )
        d = json.loads(out)
        nvidia = [
            c for c in d["clusters"]
            if c["canonical_name"].lower() == "nvidia" and c["entity_type"] == "ORG"
        ]
        assert nvidia and len(nvidia[0]["documents"]) >= 2

    def test_cross_doc_only_filter(self, capsys, news_dir):
        rc, out, _ = run_cli(
            capsys, "crossdoc", str(news_dir), "--format", "json", "--cross-doc-only"
        )
        d = json.loads(out)
        assert all(len(c["documents"]) > 1 for c in d["clusters"])

    def test_type_filter(self, capsys, news_dir):
        rc, out, _ = run_cli(
            capsys, "crossdoc", str(news_dir), "--format", "json", "--type", "org"
        )
        d = json.loads(out)
        assert d["clusters"] and all(c["entity_type"] == "ORG" for c in d["clusters"])

    def test_max_clusters_and_sort(self, capsys, news_dir):
        rc, out, _ = run_cli(
            capsys, "crossdoc", str(news_dir), "--format", "json", "--max-clusters", "1",
            "--threshold", "0.4",
        )
        d = json.loads(out)
        assert len(d["clusters"]) == 1
        # sorted by doc count desc — the single survivor is cross-doc
        assert len(d["clusters"][0]["documents"]) >= 2

    def test_jsonl_lines_parse(self, capsys, news_dir):
        rc, out, _ = run_cli(capsys, "crossdoc", str(news_dir), "--format", "jsonl")
        lines = [l for l in out.splitlines() if l]
        assert lines
        for line in lines:
            c = json.loads(line)
            assert {"id", "canonical_name", "mentions", "documents"} <= set(c)

    def test_tree_format_sections(self, capsys, news_dir):
        rc, out, _ = run_cli(capsys, "crossdoc", str(news_dir), "--format", "tree")
        assert "Cross-Document Entity Coalescing Results" in out
        assert "Summary" in out
        assert "Clusters" in out

    def test_summary_format_sections(self, capsys, news_dir):
        rc, out, _ = run_cli(capsys, "crossdoc", str(news_dir), "--format", "summary")
        assert "Cross-Document Entity Coalescing Summary" in out
        assert "Document Statistics:" in out
        assert "Cluster Statistics:" in out

    def test_output_file_sink(self, capsys, news_dir, tmp_path):
        dest = tmp_path / "out.json"
        rc, out, _ = run_cli(
            capsys, "crossdoc", str(news_dir), "--format", "json", "-o", str(dest)
        )
        assert rc == 0
        assert out == ""
        assert json.loads(dest.read_text())["metadata"]["documents_processed"] == 3

    def test_import_grounded_docs(self, capsys, tmp_path):
        # crossdoc.rs:245-424 — import pre-extracted GroundedDocument JSON
        d1 = {
            "id": "doc1",
            "text": "Nvidia builds chips.",
            "entities": [
                {"text": "Nvidia", "entity_type": "ORG", "start": 0, "end": 6,
                 "confidence": 0.9}
            ],
        }
        d2 = {
            "id": "doc2",
            "text": "Nvidia stock rose.",
            "entities": [
                {"text": "Nvidia", "entity_type": "ORG", "start": 0, "end": 6,
                 "confidence": 0.9}
            ],
        }
        p1, p2 = tmp_path / "d1.json", tmp_path / "d2.json"
        p1.write_text(json.dumps(d1))
        p2.write_text(json.dumps(d2))
        rc, out, _ = run_cli(
            capsys, "crossdoc", "--import", str(p1), "--import", str(p2),
            "--format", "json",
        )
        d = json.loads(out)
        assert d["metadata"]["documents_processed"] == 2
        top = d["clusters"][0]
        assert top["canonical_name"] == "Nvidia"
        assert sorted(top["documents"]) == ["doc1", "doc2"]

    def test_import_glob(self, capsys, tmp_path):
        for i in range(3):
            (tmp_path / f"g{i}.json").write_text(
                json.dumps({"id": f"g{i}", "text": "Apple.", "entities": [
                    {"text": "Apple", "entity_type": "ORG", "start": 0, "end": 5,
                     "confidence": 0.9}]})
            )
        rc, out, _ = run_cli(
            capsys, "crossdoc", "--import", str(tmp_path / "g*.json"),
            "--format", "json",
        )
        assert json.loads(out)["metadata"]["documents_processed"] == 3

    def test_import_missing_file_fails(self, capsys):
        rc, _, err = run_cli(
            capsys, "crossdoc", "--import", "/nope/missing.json", "--format", "json"
        )
        assert rc == 1
        assert "Import file not found" in err

    def test_directory_required_without_import(self, capsys):
        rc, _, err = run_cli(capsys, "crossdoc", "--format", "json")
        assert rc == 1
        assert "Directory is required" in err

    def test_unsupported_format_rejected(self, capsys, news_dir):
        # argparse enforces the choices= contract with exit code 2
        with pytest.raises(SystemExit) as exc:
            main(["crossdoc", str(news_dir), "--format", "human"])
        assert exc.value.code == 2

    def test_coalesce_alias(self, capsys, news_dir):
        rc, out, _ = run_cli(capsys, "coalesce", str(news_dir), "--format", "summary")
        assert rc == 0
        assert "Coalescing Summary" in out


# ---------------------------------------------------------------------------
# pipeline
# ---------------------------------------------------------------------------


class TestPipeline:
    def test_coref_and_kb_link(self, capsys):
        rc, out, _ = run_cli(
            capsys, "pipeline", "--coref", "--link-kb", "--format", "json",
            "Barack Obama met Angela Merkel. He praised her.",
        )
        docs = json.loads(out)
        assert len(docs) == 1
        doc = docs[0]
        # two PER tracks, pronouns linked to them (utils.rs:322-548)
        chains = {t["canonical_surface"]: t["signal_ids"] for t in doc["tracks"]}
        assert len(chains["barack obama"]) == 2  # Barack Obama + He
        assert len(chains["angela merkel"]) == 2  # Angela Merkel + her
        # KB identities with wikidata ids (utils.rs:555-625)
        kb = {i["canonical_name"]: i["kb_id"] for i in doc["identities"]}
        assert kb["barack obama"] == "Q76"
        assert kb["angela merkel"] == "Q567"

    def test_files_and_dir_inputs(self, capsys, tmp_path):
        (tmp_path / "a.txt").write_text("Paris is in France.")
        (tmp_path / "b.md").write_text("Berlin is in Germany.")
        rc, out, _ = run_cli(
            capsys, "pipeline", "-d", str(tmp_path), "--format", "json"
        )
        docs = json.loads(out)
        assert {d["id"] for d in docs} == {"a", "b"}

    def test_cross_doc_mode(self, capsys):
        rc, out, _ = run_cli(
            capsys, "pipeline", "--cross-doc", "--format", "json",
            "Nvidia announced chips.", "Nvidia stock rose.",
        )
        clusters = json.loads(out)
        nvidia = [c for c in clusters if c["canonical_name"] == "Nvidia"]
        assert nvidia and len(nvidia[0]["documents"]) == 2

    def test_no_input_fails(self, capsys):
        rc, _, err = run_cli(capsys, "pipeline")
        assert rc == 1
        assert "No input provided" in err

    def test_output_file(self, capsys, tmp_path):
        dest = tmp_path / "out.json"
        rc, _, _ = run_cli(
            capsys, "pipeline", "--format", "json", "-o", str(dest), "Paris is nice."
        )
        assert rc == 0
        assert json.loads(dest.read_text())[0]["id"] == "text1"


# ---------------------------------------------------------------------------
# eval + validate
# ---------------------------------------------------------------------------


class TestEvalCmd:
    def test_perfect_match(self, capsys):
        rc, out, _ = run_cli(
            capsys, "eval", "--json", "-t", "Marie Curie discovered radium.",
            "-g", "Marie Curie:PER:0:11",
        )
        d = json.loads(out)
        assert d["recall"] == 1.0
        assert any(m["type"] == "correct" for m in d["matches"])

    def test_gold_spec_with_colons_in_text(self, capsys):
        # utils.rs:84-104 — rsplitn keeps URL colons in the text part
        rc, out, _ = run_cli(
            capsys, "eval", "--json", "-m", "pattern",
            "-t", "Visit https://example.com today.",
            "-g", "https://example.com:URL:6:25",
        )
        d = json.loads(out)
        assert d["gold_count"] == 1

    def test_no_gold_fails(self, capsys):
        rc, _, err = run_cli(capsys, "eval", "-t", "hello")
        assert rc == 1
        assert "No gold annotations" in err

    def test_gold_file(self, capsys, tmp_path):
        gold = tmp_path / "gold.jsonl"
        gold.write_text(json.dumps({
            "text": "Marie Curie discovered radium.",
            "entities": [{"text": "Marie Curie", "type": "PER", "start": 0, "end": 11}],
        }) + "\n")
        rc, out, _ = run_cli(
            capsys, "eval", "--json", "-t", "Marie Curie discovered radium.",
            "--gold-file", str(gold),
        )
        assert json.loads(out)["gold_count"] == 1


class TestValidate:
    def test_valid_file(self, capsys, tmp_path):
        p = tmp_path / "ok.jsonl"
        p.write_text(json.dumps({
            "text": "Paris is nice.",
            "entities": [{"text": "Paris", "type": "LOC", "start": 0, "end": 5}],
        }) + "\n")
        rc, out, _ = run_cli(capsys, "validate", str(p))
        assert rc == 0
        assert "All valid" in out

    def test_out_of_bounds_is_error_exit_1(self, capsys, tmp_path):
        p = tmp_path / "bad.jsonl"
        p.write_text(json.dumps({
            "text": "Paris.",
            "entities": [{"text": "Paris", "type": "LOC", "start": 0, "end": 99}],
        }) + "\n")
        rc, _, err = run_cli(capsys, "validate", str(p))
        assert rc == 1
        assert "out of bounds" in err

    def test_surface_mismatch_is_warning_exit_0(self, capsys, tmp_path):
        p = tmp_path / "warn.jsonl"
        p.write_text(json.dumps({
            "text": "Paris is nice.",
            "entities": [{"text": "Berlin", "type": "LOC", "start": 0, "end": 5}],
        }) + "\n")
        rc, out, err = run_cli(capsys, "validate", str(p))
        assert rc == 0
        assert "1 warnings" in out


# ---------------------------------------------------------------------------
# info / models
# ---------------------------------------------------------------------------


class TestInfoModels:
    def test_info_lists_backends(self, capsys):
        rc, out, _ = run_cli(capsys, "info")
        assert rc == 0
        for name in ("pattern", "heuristic", "stacked", "gliner"):
            assert name in out
        assert "PER" in out and "ORG" in out

    def test_models_list(self, capsys):
        rc, out, _ = run_cli(capsys, "models", "list")
        assert rc == 0
        assert "stacked" in out

    def test_models_info_known(self, capsys):
        rc, out, _ = run_cli(capsys, "models", "info", "stacked")
        assert rc == 0
        assert "StackedNER" in out

    def test_models_info_unknown_suggests(self, capsys):
        rc, out, _ = run_cli(capsys, "models", "info", "stacke")
        assert rc == 0
        assert "Did you mean" in out
        assert "stacked" in out

    def test_models_compare_runs(self, capsys):
        rc, out, _ = run_cli(capsys, "models", "compare")
        assert rc == 0
        assert "pattern" in out and "stacked" in out


# ---------------------------------------------------------------------------
# EvalComparison taxonomy (cli_integration.rs:282-389)
# ---------------------------------------------------------------------------


class TestEvalComparison:
    def test_exact_match(self):
        text = "Marie Curie won the Nobel Prize."
        gold = [Sig(0, 0, 11, "Marie Curie", "PER")]
        pred = [Sig(0, 0, 11, "Marie Curie", "PER", 0.95)]
        cmp = EvalComparison.compare(text, gold, pred)
        assert cmp.correct_count() == 1
        assert cmp.error_count() == 0
        assert abs(cmp.f1() - 1.0) < 0.001

    def test_type_mismatch(self):
        text = "Marie Curie won."
        gold = [Sig(0, 0, 11, "Marie Curie", "PER")]
        pred = [Sig(0, 0, 11, "Marie Curie", "ORG", 0.9)]
        cmp = EvalComparison.compare(text, gold, pred)
        assert cmp.correct_count() == 0
        assert any(m["type"] == "type_mismatch" for m in cmp.matches)

    def test_boundary_error_iou(self):
        text = "Marie Curie won."
        gold = [Sig(0, 0, 11, "Marie Curie", "PER")]
        pred = [Sig(0, 0, 5, "Marie", "PER", 0.9)]
        cmp = EvalComparison.compare(text, gold, pred)
        assert cmp.correct_count() == 0
        be = [m for m in cmp.matches if m["type"] == "boundary_error"]
        assert be and abs(be[0]["iou"] - 5 / 11) < 1e-9

    def test_false_positive(self):
        cmp = EvalComparison.compare("x", [], [Sig(0, 0, 1, "x", "PER")])
        assert any(m["type"] == "false_positive" for m in cmp.matches)
        assert cmp.precision() == 0.0

    def test_false_negative(self):
        cmp = EvalComparison.compare("x", [Sig(0, 0, 1, "x", "PER")], [])
        assert any(m["type"] == "false_negative" for m in cmp.matches)
        assert cmp.recall() == 0.0

    def test_docstring_example(self):
        # grounded.rs:2443-2456 doc example: 1 correct + 1 missed
        text = "Marie Curie won the Nobel Prize."
        gold = [Sig(0, 0, 11, "Marie Curie", "PER"),
                Sig(1, 20, 31, "Nobel Prize", "AWARD")]
        pred = [Sig(0, 0, 11, "Marie Curie", "PER", 0.95)]
        cmp = EvalComparison.compare(text, gold, pred)
        assert len(cmp.matches) == 2


# ---------------------------------------------------------------------------
# second-wave subcommands: debug/analyze/query/compare/enhance/strata/
# dataset/benchmark/batch
# ---------------------------------------------------------------------------


class TestDebugCmd:
    def test_text_output_with_tracks_and_identities(self, capsys):
        rc, out, _ = run_cli(
            capsys, "debug", "--coref", "--link-kb",
            "-t", "Barack Obama met Angela Merkel. He praised her.",
        )
        assert rc == 0
        assert "barack obama" in out
        assert "Q76" in out and "Q567" in out
        assert "[PRON: He]" in out

    def test_html_output(self, capsys, tmp_path):
        dest = tmp_path / "report.html"
        rc, out, _ = run_cli(
            capsys, "debug", "--html", "-o", str(dest), "--coref",
            "-t", "Marie Curie won the Nobel Prize.",
        )
        assert rc == 0
        html = dest.read_text()
        assert html.startswith("<!DOCTYPE html>")
        assert "Marie Curie" in html
        assert "<sub>PER</sub>" in html
        assert "Tracks" in html


class TestAnalyzeCmd:
    def test_agreement_breakdown(self, capsys):
        rc, out, _ = run_cli(
            capsys, "analyze", "-t", "Elon Musk founded SpaceX on 14 March 2002."
        )
        assert rc == 0
        assert "DEEP ANALYSIS" in out
        for section in ("pattern", "heuristic", "stacked", "Model Agreement"):
            assert section in out
        assert "Agreed (in stacked from pattern/heuristic)" in out


@pytest.fixture()
def grounded_file(capsys, tmp_path):
    path = tmp_path / "doc.json"
    rc, _, _ = run_cli(
        capsys, "extract", "-q", "--format", "jsonl",
        "-t", "Elon Musk founded SpaceX. Elon Musk lives in Texas.",
        "--export", str(path),
    )
    assert rc == 0
    capsys.readouterr()
    return path


class TestQueryCmd:
    def test_type_filter(self, capsys, grounded_file):
        rc, out, _ = run_cli(capsys, "query", str(grounded_file), "-t", "PER")
        assert rc == 0
        assert "Found 3 entities" in out
        assert "Texas" not in out

    def test_entity_and_confidence_filters(self, capsys, grounded_file):
        rc, out, _ = run_cli(
            capsys, "query", str(grounded_file), "-e", "musk",
            "--min-confidence", "0.7", "--format", "json",
        )
        sigs = json.loads(out)
        assert len(sigs) == 2
        assert all("Musk" in s["surface"] for s in sigs)

    def test_range_filter(self, capsys, grounded_file):
        rc, out, _ = run_cli(
            capsys, "query", str(grounded_file),
            "--start-offset", "0", "--end-offset", "10", "--format", "json",
        )
        sigs = json.loads(out)
        assert [s["surface"] for s in sigs] == ["Elon Musk"]

    def test_clusters_input(self, capsys, tmp_path, news_dir):
        clusters_file = tmp_path / "clusters.json"
        rc, out, _ = run_cli(
            capsys, "crossdoc", str(news_dir), "--format", "jsonl",
            "--threshold", "0.4",
        )
        clusters = [json.loads(l) for l in out.splitlines() if l]
        clusters_file.write_text(json.dumps(clusters))
        rc, out, _ = run_cli(
            capsys, "query", str(clusters_file), "-e", "nvidia", "--format", "json"
        )
        filtered = json.loads(out)
        assert filtered and all(
            "nvidia" in c["canonical_name"].lower() for c in filtered
        )


class TestCompareCmd:
    def test_models_table(self, capsys, tmp_path):
        f = tmp_path / "text.txt"
        f.write_text("Elon Musk founded SpaceX in 2002.")
        rc, out, _ = run_cli(
            capsys, "compare", str(f), "--models",
            "--model-list", "pattern,stacked", "--format", "table",
        )
        assert rc == 0
        assert "Model Comparison" in out
        assert "pattern" in out and "stacked" in out

    def test_document_diff(self, capsys, grounded_file, tmp_path):
        other = tmp_path / "other.json"
        rc, _, _ = run_cli(
            capsys, "extract", "-q", "--format", "jsonl",
            "-t", "Elon Musk founded SpaceX.", "--export", str(other),
        )
        capsys.readouterr()
        rc, out, _ = run_cli(
            capsys, "compare", str(grounded_file), str(other), "--format", "summary"
        )
        assert rc == 0
        assert "Comparison Summary" in out
        assert "Common:" in out

    def test_models_requires_list(self, capsys, tmp_path):
        f = tmp_path / "t.txt"
        f.write_text("x")
        rc, _, err = run_cli(capsys, "compare", str(f), "--models")
        assert rc == 1
        assert "--model-list" in err


class TestEnhanceCmd:
    def test_coref_and_kb(self, capsys, tmp_path):
        doc = tmp_path / "doc.json"
        rc, _, _ = run_cli(
            capsys, "extract", "-q", "--format", "jsonl",
            "-t", "Barack Obama spoke. He smiled.", "--export", str(doc),
        )
        capsys.readouterr()
        out_doc = tmp_path / "enhanced.json"
        rc, out, err = run_cli(
            capsys, "enhance", str(doc), "--coref", "--link-kb",
            "--export", str(out_doc), "--format", "grounded",
        )
        assert rc == 0
        enhanced = json.loads(out_doc.read_text())
        assert enhanced["tracks"]
        kb = {i["canonical_name"]: i["kb_id"] for i in enhanced["identities"]}
        assert kb.get("barack obama") == "Q76"


class TestStrataCmd:
    def test_levels_annotated(self, capsys, tmp_path):
        graph = {
            "nodes": [{"id": n, "name": n, "node_type": "PER"}
                      for n in ("a", "b", "c", "d")],
            "edges": [
                {"source": "a", "target": "b", "relation": "R", "confidence": 1.0},
                {"source": "c", "target": "d", "relation": "R", "confidence": 1.0},
            ],
        }
        f = tmp_path / "graph.json"
        f.write_text(json.dumps(graph))
        rc, out, _ = run_cli(
            capsys, "strata", "--input", str(f), "--levels", "2", "--format", "json"
        )
        assert rc == 0
        clustered = json.loads(out)
        for n in clustered["nodes"]:
            assert "level_0_community" in n["properties"]
            assert "level_1_community" in n["properties"]
        # two disconnected pairs → two level-0 communities
        level0 = {n["properties"]["level_0_community"] for n in clustered["nodes"]}
        assert len(level0) == 2

    def test_unsupported_method(self, capsys, tmp_path):
        f = tmp_path / "g.json"
        f.write_text(json.dumps({"nodes": [], "edges": []}))
        rc, _, err = run_cli(
            capsys, "strata", "--input", str(f), "--method", "raptor"
        )
        assert rc == 1
        assert "Unsupported clustering method" in err

    def test_requires_input(self, capsys):
        rc, _, err = run_cli(capsys, "strata")
        assert rc == 1
        assert "--input" in err


class TestDatasetCmd:
    def test_list(self, capsys):
        rc, out, _ = run_cli(capsys, "dataset", "list")
        assert rc == 0
        assert "wikigold" in out
        assert "synthetic" in out

    def test_info_registry(self, capsys):
        rc, out, _ = run_cli(capsys, "dataset", "info", "-d", "wikigold")
        assert rc == 0
        assert "WikiGold" in out
        assert "Format: conll" in out

    def test_info_synthetic(self, capsys):
        rc, out, _ = run_cli(capsys, "dataset", "info", "-d", "synthetic")
        assert rc == 0
        assert "Examples: 170" in out

    def test_info_unknown(self, capsys):
        rc, _, err = run_cli(capsys, "dataset", "info", "-d", "nope_xyz")
        assert rc == 1
        assert "Unknown dataset" in err

    def test_eval_synthetic(self, capsys):
        rc, out, _ = run_cli(capsys, "dataset", "eval", "-m", "stacked")
        assert rc == 0
        assert "Precision:" in out and "F1:" in out
        assert "170 examples" in out


class TestBenchmarkCmd:
    def test_advanced_suite(self, capsys):
        rc, out, _ = run_cli(capsys, "benchmark", "--suite", "advanced")
        assert rc == 0
        assert out.count("F1=100.0%") == 3

    def test_backends_suite_json(self, capsys):
        rc, out, _ = run_cli(
            capsys, "benchmark", "--suite", "backends", "--format", "json",
            "--max-examples", "10",
        )
        d = json.loads(out)
        assert d["total_examples"] == 10
        assert {b["name"] for b in d["backends"]} == {"Pattern", "Heuristic", "Stacked"}


class TestBatchCmd:
    def test_stdin_jsonl(self, capsys, monkeypatch):
        import io

        monkeypatch.setattr(
            sys, "stdin",
            io.StringIO('{"id":"a","text":"Nvidia rose."}\n'
                        '{"id":"b","text":"Paris is nice."}\n'),
        )
        rc, out, _ = run_cli(capsys, "batch", "--stdin", "--format", "json", "-q")
        docs = json.loads(out)
        assert [d["id"] for d in docs] == ["a", "b"]

    def test_requires_source(self, capsys):
        rc, _, err = run_cli(capsys, "batch")
        assert rc == 1
        assert "--dir" in err

    def test_dir_delegates_to_pipeline(self, capsys, tmp_path):
        (tmp_path / "x.txt").write_text("Berlin is in Germany.")
        rc, out, _ = run_cli(
            capsys, "batch", "-d", str(tmp_path), "--format", "json", "-q"
        )
        docs = json.loads(out)
        assert docs[0]["id"] == "x"


class TestCacheConfigCmds:
    def test_cache_lifecycle(self, capsys, tmp_path):
        d = tmp_path / "cache"
        d.mkdir()
        (d / "stacked-abc.json").write_text("{}")
        (d / "pattern-xyz.json").write_text("{}")
        rc, out, _ = run_cli(capsys, "cache", "--cache-dir", str(d), "list")
        assert rc == 0 and "2 files" in out
        rc, out, _ = run_cli(capsys, "cache", "--cache-dir", str(d), "stats")
        assert "Files: 2" in out
        rc, out, _ = run_cli(
            capsys, "cache", "--cache-dir", str(d), "invalidate",
            "--model", "stacked",
        )
        assert "Removed 1 cache entries" in out
        rc, out, _ = run_cli(capsys, "cache", "--cache-dir", str(d), "clear")
        assert "Cache cleared" in out
        assert not d.exists()

    def test_config_lifecycle(self, capsys, tmp_path):
        d = tmp_path / "conf"
        rc, out, _ = run_cli(
            capsys, "config", "--config-dir", str(d), "save", "myflow",
            "--model", "stacked", "--coref", "--threshold", "0.7",
        )
        assert rc == 0 and "Saved config" in out
        rc, out, _ = run_cli(capsys, "config", "--config-dir", str(d), "list")
        assert "myflow" in out
        rc, out, _ = run_cli(capsys, "config", "--config-dir", str(d), "show", "myflow")
        saved = json.loads(out.split("\n", 1)[1])
        assert saved == {"model": "stacked", "coref": True, "threshold": 0.7}
        rc, out, _ = run_cli(
            capsys, "config", "--config-dir", str(d), "delete", "myflow"
        )
        assert "Deleted config" in out
        rc, _, err = run_cli(
            capsys, "config", "--config-dir", str(d), "show", "myflow"
        )
        assert rc == 1 and "not found" in err


# ---------------------------------------------------------------------------
# --spark path: distributed extraction under the CLI
# ---------------------------------------------------------------------------


class TestSparkPath:
    def test_crossdoc_spark_matches_local(self, capsys, news_dir, spark):
        # getOrCreate reuses the session fixture; byte-equal cluster output
        rc_l, out_local, _ = run_cli(
            capsys, "crossdoc", str(news_dir), "--format", "json",
            "--threshold", "0.4",
        )
        rc_s, out_spark, _ = run_cli(
            capsys, "crossdoc", str(news_dir), "--format", "json",
            "--threshold", "0.4", "--spark",
        )
        assert rc_l == rc_s == 0
        assert json.loads(out_local) == json.loads(out_spark)

    def test_pipeline_spark_matches_local(self, capsys, spark):
        args = ["pipeline", "--coref", "--link-kb", "--format", "json",
                "Barack Obama met Angela Merkel in Berlin. He praised her."]
        rc_l, out_local, _ = run_cli(capsys, *args)
        rc_s, out_spark, _ = run_cli(capsys, *args, "--spark")
        assert rc_l == rc_s == 0
        assert json.loads(out_local) == json.loads(out_spark)


# ---------------------------------------------------------------------------
# module entry (subprocess — pins `python -m anno_spark`)
# ---------------------------------------------------------------------------


class TestModuleEntry:
    def test_subprocess_extract_json(self):
        r = subprocess.run(
            [sys.executable, "-m", "anno_spark", "extract", "-t", TEXT,
             "--format", "json"],
            capture_output=True, text=True, cwd="/root/repo", timeout=120,
        )
        assert r.returncode == 0
        assert any(e["text"] == "Marie Curie" for e in json.loads(r.stdout))

    def test_subprocess_stdin_pipe(self):
        r = subprocess.run(
            [sys.executable, "-m", "anno_spark", "extract", "--format", "jsonl"],
            input="Angela Merkel lives in Berlin.",
            capture_output=True, text=True, cwd="/root/repo", timeout=120,
        )
        assert r.returncode == 0
        texts = [json.loads(l)["text"] for l in r.stdout.splitlines() if l]
        assert "Berlin" in texts

    def test_subprocess_no_args_exit_1(self):
        r = subprocess.run(
            [sys.executable, "-m", "anno_spark"],
            capture_output=True, text=True, cwd="/root/repo", timeout=120,
            stdin=subprocess.DEVNULL,
        )
        assert r.returncode == 1
        assert "No input provided" in r.stderr
