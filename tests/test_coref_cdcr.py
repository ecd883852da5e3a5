"""C1–C3 (anno/src/cli/utils.rs:249-548) and X1–X6 (anno/src/eval/cdcr.rs,
similarity.rs) parity tests."""

from anno_spark.core.cdcr import MentionRef, UnionFind, candidate_pairs_lsh, resolve
from anno_spark.core.coref import (
    detect_pronouns,
    is_likely_female,
    is_likely_male,
    normalize_entity_name,
    resolve_coreference,
)
from anno_spark.core.entity import Mention
from anno_spark.core.minhash import (
    band_hashes,
    compute_signature,
    extract_ngrams,
    fnv1a_seeded,
    signature_similarity,
    to_i64,
)
from anno_spark.core.similarity import jaccard_word_similarity, string_similarity


def m(text, etype, start, end):
    return Mention(text, etype, start, end, 0.9, "p", "s")


class TestCoref:
    def test_normalize(self):
        assert normalize_entity_name("  Marie CURIE ") == "marie curie"

    def test_gender_lists(self):
        assert is_likely_male("Elon Musk") and not is_likely_female("Elon Musk")
        assert is_likely_female("Marie Curie") and not is_likely_male("Marie Curie")

    def test_pronoun_detection_word_boundaries(self):
        text = "She sells seashells. Her shelf."
        found = detect_pronouns(text, [])
        surfaces = [x[0].text for x in found]
        assert "She" in surfaces and "Her" in surfaces
        assert all(s.lower() in ("she", "her") for s in surfaces)

    def test_pronoun_not_inside_words(self):
        found = detect_pronouns("The shepherd washed his sheep.", [])
        # "he" inside "shepherd"/"washed" must not match; "his" does
        texts = [(x[0].text, x[0].start) for x in found]
        assert ("his", 20) in texts
        assert not any(t == "he" for t, _ in texts)

    def test_tracks_group_by_normalized_surface(self):
        text = "Marie Curie won. Marie Curie spoke."
        ments = [m("Marie Curie", "PER", 0, 11), m("Marie Curie", "PER", 17, 28)]
        cr = resolve_coreference(text, ments)
        assert len(cr.tracks) == 1
        assert cr.tracks[0].canonical_surface == "marie curie"
        assert cr.tracks[0].signal_ids[:2] == [0, 1]

    def test_pronoun_links_to_nearest_compatible(self):
        text = "Marie Curie won the Nobel Prize. She was a physicist."
        ments = [m("Marie Curie", "PER", 0, 11)]
        cr = resolve_coreference(text, ments)
        she_id = next(i for i, (sid, pt) in enumerate(cr.pronoun_signal_ids))
        sid, ptype = cr.pronoun_signal_ids[she_id]
        assert ptype == "female"
        assert cr.signal_to_track.get(sid) == cr.signal_to_track[0]

    def test_org_pronoun(self):
        text = "Apple released a product. It was well received."
        ments = [m("Apple", "ORG", 0, 5)]
        cr = resolve_coreference(text, ments)
        it_ids = [sid for sid, pt in cr.pronoun_signal_ids if pt == "org"]
        assert it_ids and cr.signal_to_track.get(it_ids[0]) == cr.signal_to_track[0]


class TestSimilarity:
    def test_exact(self):
        assert string_similarity("Apple", "Apple") == 1.0
        assert string_similarity("Apple", "apple") == 1.0

    def test_substring(self):
        assert string_similarity("Apple Inc", "Apple") == 0.8

    def test_jaccard(self):
        assert abs(jaccard_word_similarity("apple inc", "apple") - 0.5) < 1e-9

    def test_empty(self):
        assert string_similarity("", "") == 1.0
        assert string_similarity("a", "") == 0.0

    def test_different(self):
        assert string_similarity("Apple", "Microsoft") < 0.5


class TestMinHash:
    def test_fnv_deterministic(self):
        # pinned value: FNV-1a over "abc" with seed 0 — guards the exact
        # constants (cdcr.rs:384-392)
        assert fnv1a_seeded(b"abc", 0) == 0xE71FA2190541574B

    def test_ngrams(self):
        assert extract_ngrams("abcd") == ["abc", "bcd"]
        assert extract_ngrams("ab") == ["ab"]
        assert extract_ngrams("") == [""]

    def test_signature_shape_and_determinism(self):
        s1 = compute_signature("Apple Inc")
        s2 = compute_signature("apple inc")  # lowercased first
        assert len(s1) == 15 and s1 == s2

    def test_band_hashes(self):
        sig = compute_signature("Apple")
        bh = band_hashes(sig)
        assert len(bh) == 5
        acc = 0
        for v in sig[0:3]:
            acc = (acc * 31 + v) & ((1 << 64) - 1)
        assert bh[0] == acc

    def test_signature_similarity(self):
        s = compute_signature("apple")
        assert signature_similarity(s, s) == 1.0

    def test_to_i64_roundtrip(self):
        assert to_i64(2**63) == -(2**63)
        assert to_i64(5) == 5

    def test_similar_strings_share_buckets(self):
        pairs = candidate_pairs_lsh(["Apple Inc", "Apple Inc", "zzzz qqqq"])
        assert (0, 1) in pairs


class TestCDCR:
    def test_union_find(self):
        uf = UnionFind(4)
        uf.union(0, 1)
        uf.union(2, 3)
        assert uf.find(0) == uf.find(1) and uf.find(2) == uf.find(3)
        assert uf.find(0) != uf.find(2)

    def _mentions(self):
        return [
            MentionRef("d1", 0, "Apple Inc", "ORG"),
            MentionRef("d2", 0, "Apple", "ORG"),
            MentionRef("d3", 0, "Microsoft", "ORG"),
            MentionRef("d1", 1, "Marie Curie", "PER"),
            MentionRef("d2", 1, "Curie", "PER"),
            MentionRef("d4", 0, "Apple", "LOC"),  # type mismatch → separate
        ]

    def test_brute_force_clusters(self):
        clusters = resolve(self._mentions(), use_lsh=False)
        sets = [set(c) for c in clusters]
        assert {0, 1} in sets  # Apple Inc ~ Apple (substring 0.8)
        assert {3, 4} in sets  # Marie Curie ~ Curie
        assert {2} in sets and {5} in sets

    def test_lsh_is_recall_subset_of_brute_force(self):
        # LSH can only drop pairs (blocking false negatives), never add
        # beyond brute force after scoring. With these exact reference
        # hashes, "Marie Curie"/"Curie" (3-gram Jaccard 0.33) is a known
        # LSH miss — same in the reference (cdcr.rs:288-296 parameters).
        bf = resolve(self._mentions(), use_lsh=False)
        lsh = resolve(self._mentions(), use_lsh=True)
        bf_sets = [set(c) for c in bf]
        for cluster in lsh:
            assert any(set(cluster) <= s for s in bf_sets)
        # identical surfaces always share every band → always recalled
        assert {0, 1} in [set(c) for c in lsh]

    def test_type_match_toggle(self):
        ments = [MentionRef("a", 0, "Apple", "ORG"), MentionRef("b", 0, "Apple", "LOC")]
        assert len(resolve(ments, use_lsh=False)) == 2
        assert len(resolve(ments, use_lsh=False, require_type_match=False)) == 1
