"""Track-level inter-document coalescing (coalesce/src/resolver.rs).

Transcribed from /root/reference/tests/bug_fixes.rs (the coalesce arms:
singleton clusters :173-209, empty corpus :419-428, single document
:431-456) plus the resolver.rs doctest examples for the two similarity
functions, and e2e coverage of the CLI crossdoc --import track path.
"""

from __future__ import annotations

import json

from anno_spark.core.coalesce import (
    Resolver,
    TrackData,
    embedding_similarity,
    string_similarity,
)


class TestSimilarity:
    def test_string_similarity_doctest(self):
        # resolver.rs:232-240
        assert string_similarity("Marie Curie", "Marie Curie") == 1.0
        assert string_similarity("Marie Curie", "Curie") > 0.0

    def test_string_similarity_is_pure_jaccard(self):
        # NOT the tiered anno similarity: substring gives 1/2, not 0.8
        assert abs(string_similarity("Apple Inc", "Apple") - 0.5) < 1e-9

    def test_string_similarity_empty(self):
        assert string_similarity("", "") == 1.0
        assert string_similarity("Apple", "") == 0.0
        assert string_similarity("", "Apple") == 0.0

    def test_embedding_similarity_doctest(self):
        # resolver.rs:271-279
        assert embedding_similarity([1.0, 0.0, 0.0], [1.0, 0.0, 0.0]) == 1.0

    def test_embedding_similarity_range_mapping(self):
        # opposite vectors: cosine -1 → 0.0; orthogonal: 0 → 0.5
        assert abs(embedding_similarity([1.0, 0.0], [-1.0, 0.0])) < 1e-9
        assert abs(embedding_similarity([1.0, 0.0], [0.0, 1.0]) - 0.5) < 1e-9

    def test_embedding_similarity_degenerate(self):
        assert embedding_similarity([], []) == 0.0
        assert embedding_similarity([1.0], [1.0, 2.0]) == 0.0
        assert embedding_similarity([0.0, 0.0], [1.0, 0.0]) == 0.0


class TestResolver:
    def test_singleton_clusters_create_identities(self):
        # bug_fixes.rs:173-209
        tracks = [
            TrackData("doc1", 0, "Alice", "Person", 0.9),
            TrackData("doc2", 0, "Bob", "Person", 0.9),
        ]
        ids = (Resolver.new().with_threshold(0.9).require_type_match(True)
               .resolve_inter_doc_coref(tracks))
        assert len(ids) == 2, "Singleton clusters should still create identities"

    def test_empty_corpus(self):
        # bug_fixes.rs:419-428
        assert Resolver.new().resolve_inter_doc_coref([]) == []

    def test_single_document(self):
        # bug_fixes.rs:431-456
        ids = Resolver.new().resolve_inter_doc_coref(
            [TrackData("doc1", 0, "Alice", "Person", 0.9)]
        )
        assert ids, "Single document should create at least one identity"

    def test_cross_doc_merge_by_jaccard(self):
        tracks = [
            TrackData("d1", 0, "barack obama", "PER"),
            TrackData("d2", 0, "barack obama", "PER"),
            TrackData("d3", 0, "angela merkel", "PER"),
        ]
        ids = Resolver.new().with_threshold(0.7).resolve_inter_doc_coref(tracks)
        assert len(ids) == 2
        obama = next(i for i in ids if i.canonical_name == "barack obama")
        assert sorted(r[0] for r in obama.track_refs) == ["d1", "d2"]

    def test_type_match_blocks_merge(self):
        tracks = [
            TrackData("d1", 0, "apple", "ORG"),
            TrackData("d2", 0, "apple", "Fruit"),
        ]
        strict = Resolver.new().resolve_inter_doc_coref(tracks)
        loose = Resolver.new().require_type_match(False).resolve_inter_doc_coref(tracks)
        assert len(strict) == 2
        assert len(loose) == 1

    def test_embeddings_preferred_over_surface(self):
        # identical surfaces but opposite embeddings → NOT merged
        tracks = [
            TrackData("d1", 0, "acme", "ORG", embedding=[1.0, 0.0]),
            TrackData("d2", 0, "acme", "ORG", embedding=[-1.0, 0.0]),
        ]
        ids = Resolver.new().with_threshold(0.7).resolve_inter_doc_coref(tracks)
        assert len(ids) == 2
        # similar embeddings with different surfaces → merged
        tracks2 = [
            TrackData("d1", 0, "acme corp", "ORG", embedding=[1.0, 0.0]),
            TrackData("d2", 0, "totally different", "ORG", embedding=[0.9, 0.1]),
        ]
        ids2 = Resolver.new().with_threshold(0.9).resolve_inter_doc_coref(tracks2)
        assert len(ids2) == 1

    def test_override_params(self):
        tracks = [
            TrackData("d1", 0, "alpha beta", "PER"),
            TrackData("d2", 0, "alpha gamma", "PER"),
        ]
        # jaccard = 1/3: default 0.7 keeps them apart; override merges
        assert len(Resolver.new().resolve_inter_doc_coref(tracks)) == 2
        assert len(Resolver.new().resolve_inter_doc_coref(
            tracks, similarity_threshold=0.3)) == 1


class TestCrossdocTrackImport:
    """CLI crossdoc --import with Level-2 tracks routes through the
    coalesce Resolver (crossdoc.rs:442-507)."""

    def _doc(self, doc_id, surface, sig_count=2):
        return {
            "id": doc_id,
            "text": f"{surface} did things. " * sig_count,
            "signals": [
                {"id": i, "surface": surface, "label": "PER",
                 "start": 0, "end": len(surface), "confidence": 0.9}
                for i in range(sig_count)
            ],
            "tracks": [
                {"id": 0, "canonical_surface": surface, "entity_type": "PER",
                 "signal_ids": list(range(sig_count))}
            ],
        }

    def test_track_level_clustering(self, capsys, tmp_path):
        from anno_spark.cli import main

        p1, p2 = tmp_path / "a.json", tmp_path / "b.json"
        p1.write_text(json.dumps(self._doc("doc1", "barack obama")))
        p2.write_text(json.dumps(self._doc("doc2", "barack obama", sig_count=3)))
        rc = main(["crossdoc", "--import", str(p1), "--import", str(p2),
                   "--format", "json", "--threshold", "0.7",
                   "--require-type-match"])
        out = capsys.readouterr().out
        assert rc == 0
        d = json.loads(out)
        top = d["clusters"][0]
        assert top["canonical_name"] == "barack obama"
        assert sorted(top["documents"]) == ["doc1", "doc2"]
        # one mention per signal in each member track (2 + 3)
        assert len(top["mentions"]) == 5

    def test_jaccard_not_containment(self, capsys, tmp_path):
        """The track path scores with pure Jaccard: 'Apple' vs
        'Apple Inc' = 0.5, below a 0.6 threshold — where the CDCR
        signal path's tiered similarity (containment=0.8) would merge."""
        from anno_spark.cli import main

        p1, p2 = tmp_path / "a.json", tmp_path / "b.json"
        p1.write_text(json.dumps(self._doc("doc1", "Apple")))
        p2.write_text(json.dumps(self._doc("doc2", "Apple Inc")))
        rc = main(["crossdoc", "--import", str(p1), "--import", str(p2),
                   "--format", "json", "--threshold", "0.6"])
        d = json.loads(capsys.readouterr().out)
        assert d["metadata"]["clusters_found"] == 2
