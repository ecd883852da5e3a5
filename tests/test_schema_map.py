"""TypeMapper / DatasetSchema tests (VERDICT r02 next #7) — reference
cases transcribed from anno-core/src/entity.rs:494-679 (incl. the
doctest) and anno/src/schema.rs:59-607, plus Spark-expression parity
against the python port on every label of every schema."""

from __future__ import annotations

from anno_spark.operators import schema_map as sm


class TypeMapperTests:
    pass


class TestTypeMapper:
    def test_doctest_case(self):
        # entity.rs:494-502 doctest
        m = sm.TypeMapper()
        m.add("ACTOR", sm.PERSON)
        m.add("DIRECTOR", sm.PERSON)
        m.add("TITLE", sm.CREATIVE_WORK)
        assert m.map("ACTOR") == "PER"
        assert m.normalize("DIRECTOR") == "PER"

    def test_mit_movie_preset(self):
        m = sm.TypeMapper.mit_movie()
        assert m.normalize("ACTOR") == "PER"
        assert m.normalize("TITLE") == "WORK_OF_ART"
        assert m.normalize("YEAR") == "DATE"
        assert m.normalize("GENRE") == "GENRE"
        # case-insensitive keys (entity.rs:646-647 uppercases on add+map)
        assert m.normalize("actor") == "PER"

    def test_biomedical_preset_keys_are_uppercased(self):
        m = sm.TypeMapper.biomedical()
        # added as "cell_line" but stored uppercased
        assert m.map("CELL_LINE") == "CELL_LINE"
        assert m.normalize("cell_type") == "CELL_TYPE"

    def test_normalize_falls_back_to_from_label(self):
        m = sm.TypeMapper.mit_movie()
        assert m.normalize("B-PER") == "PER"   # BIO strip in fallback
        assert m.normalize("gpe") == "LOC"     # ladder
        assert m.normalize("frobnicator") == "FROBNICATOR"  # Other(UPPER)

    def test_map_does_not_strip_bio_prefix(self):
        # TypeMapper.map uppercases but never strips (entity.rs:648-651);
        # the strip happens only in the from_label fallback
        m = sm.TypeMapper.mit_movie()
        assert m.map("B-ACTOR") is None
        assert m.normalize("B-ACTOR") == "ACTOR"  # fallback → Other("ACTOR")


class TestFromLabel:
    def test_ladder(self):
        assert sm.from_label("PERSON") == "PER"
        assert sm.from_label("organization") == "ORG"
        assert sm.from_label("GPE") == "LOC"
        assert sm.from_label("CURRENCY") == "MONEY"
        assert sm.from_label("URI") == "URL"
        assert sm.from_label("TELEPHONE") == "PHONE"

    def test_bio_prefixes_single_strip(self):
        assert sm.from_label("B-PER") == "PER"
        assert sm.from_label("S-LOC") == "LOC"
        # only ONE prefix strips (Rust strip_prefix chain)
        assert sm.from_label("B-I-PER") == "I-PER"


class TestSchemaMapper:
    def test_ontonotes_critical_cases(self):
        m = sm.SchemaMapper("ontonotes")
        # CRITICAL: NORP is NOT Organization (schema.rs:392-396)
        assert m.to_canonical("NORP") == "GROUP"
        assert m.information_loss("NORP") is not None
        assert m.to_canonical("GPE") == "GPE"
        assert m.to_canonical("LOC") == "LOC"
        assert m.to_canonical("WORK_OF_ART") == "WORK_OF_ART"
        assert m.to_canonical("nope") == "MISC"  # unknown → Misc

    def test_wnut17(self):
        m = sm.SchemaMapper("wnut17")
        assert m.to_canonical("creative-work") == "WORK_OF_ART"
        assert m.to_canonical("group") == "GROUP"
        assert m.to_canonical("corporation") == "ORG"

    def test_mit_restaurant(self):
        m = sm.SchemaMapper("mit_restaurant")
        assert m.to_canonical("Restaurant_Name") == "ORG"
        assert m.to_canonical("Dish") == "FOOD"
        assert m.to_canonical("Hours") == "TIME"

    def test_label_overlap(self):
        conll = sm.SchemaMapper("conll2003")
        assert conll.label_overlap(sm.SchemaMapper("conll2003")) == 1.0
        assert conll.label_overlap(sm.SchemaMapper("ncbi_disease")) == 0.0

    def test_map_to_canonical_strips_extended_bio(self):
        # schema.rs:609-622 strips L-/U- too
        assert sm.map_to_canonical("U-PER", "conll2003") == "PER"
        assert sm.map_to_canonical("L-LOC", "conll2003") == "LOC"
        assert sm.map_to_canonical("B-NORP", "ontonotes") == "GROUP"
        assert sm.map_to_canonical("B-PERSON") == "PER"  # schema-less


class TestSparkExpression:
    def test_schema_paths_match_python_port(self, spark):
        labels = []
        for schema, table in sm.DATASET_SCHEMAS.items():
            for lab in table:
                labels.extend([lab, lab.lower(), f"B-{lab}", f"U-{lab}"])
        labels += ["unknown_thing", "B-unknown", "MISC"]
        df = spark.createDataFrame([(x,) for x in labels], "entity_type string")
        for schema in sm.DATASET_SCHEMAS:
            out = sm.normalize_labels(df, schema=schema).collect()
            for r in out:
                assert r["entity_type"] == sm.map_to_canonical(
                    r["entity_type_raw"], schema
                ), (schema, r["entity_type_raw"])

    def test_mapper_path_matches_python_port(self, spark):
        mapper = sm.TypeMapper.social_media()
        labels = [
            "person", "corporation", "creative_work", "B-person",
            "PRODUCT", "gpe", "B-LOC", "weird-label", "event",
        ]
        df = spark.createDataFrame([(x,) for x in labels], "entity_type string")
        out = sm.normalize_labels(df, mapper=mapper).collect()
        for r in out:
            assert r["entity_type"] == mapper.normalize(r["entity_type_raw"]), r

    def test_plan_is_pure_expression(self, spark):
        """No Python evaluation node in the plan — the map literal is a
        codegen'd expression."""
        df = spark.createDataFrame([("PER",)], "entity_type string")
        plan = sm.normalize_labels(df, schema="conll2003")._jdf.queryExecution().executedPlan().toString()
        assert "Python" not in plan and "ArrowEval" not in plan
