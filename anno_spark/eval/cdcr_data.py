"""CDCR resolver facade, cluster model, and the reference sample corpora.

Single-process counterpart of the reference CDCR surface used by the CLI
(`anno crossdoc` over raw text directories) and by the e2e test suite:

* ``Document`` / ``CrossDocCluster`` — anno/src/eval/cdcr.rs:67-260
* ``CDCRConfig`` / ``CDCRResolver`` — cdcr.rs:400-578; the actual
  union-find/LSH mechanics live in :mod:`anno_spark.core.cdcr` (X1-X6) and
  are composed here, not duplicated
* ``CDCRMetrics`` (B³) — cdcr.rs:585-668
* sample corpora ``tech_news_dataset`` / ``political_news_dataset`` /
  ``sports_news_dataset`` / ``financial_news_dataset`` — transcribed
  reference *data* (cdcr.rs:684-1050), the spec for the e2e tests

One documented divergence carried over from core.cdcr: cluster enumeration
is deterministic (ordered by smallest member mention index) where the
reference iterates a HashMap (cdcr.rs:519-535).  Cluster ids are assigned
in that deterministic order.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from ..core.cdcr import MentionRef, resolve as _uf_resolve


@dataclass
class Entity:
    """cdcr.rs mention payload (Entity::new signature order)."""

    text: str
    entity_type: str
    start: int
    end: int
    confidence: float = 1.0


@dataclass
class Document:
    """cdcr.rs:67-100 — a document with pre-extracted entities."""

    id: str
    text: str
    entities: list = field(default_factory=list)  # list[Entity]

    def with_entities(self, entities) -> "Document":
        self.entities = list(entities)
        return self


@dataclass
class CrossDocCluster:
    """cdcr.rs:143-260 — one cross-document entity cluster."""

    id: int
    canonical_name: str
    entity_type: str | None = None
    kb_id: str | None = None
    confidence: float = 1.0
    mentions: list = field(default_factory=list)  # list[(doc_id, entity_idx)]
    documents: list = field(default_factory=list)  # unique doc ids, first-seen order

    def add_mention(self, doc_id: str, entity_idx: int):
        self.mentions.append((doc_id, entity_idx))
        if doc_id not in self.documents:
            self.documents.append(doc_id)

    def __len__(self) -> int:
        return len(self.mentions)

    def len(self) -> int:  # reference API name, used by transcribed tests
        return len(self.mentions)

    def doc_count(self) -> int:
        return len(self.documents)

    def to_json(self) -> dict:
        return {
            "id": self.id,
            "canonical_name": self.canonical_name,
            "entity_type": self.entity_type,
            "kb_id": self.kb_id,
            "confidence": self.confidence,
            "mentions": [[d, i] for d, i in self.mentions],
            "documents": list(self.documents),
        }


@dataclass
class CDCRConfig:
    """cdcr.rs:400-430 defaults (min_similarity 0.5, LSH on)."""

    min_similarity: float = 0.5
    require_type_match: bool = True
    use_lsh: bool = True


class CDCRResolver:
    """cdcr.rs:460-578 — blocking → pairwise similarity → union-find.

    Composes :func:`anno_spark.core.cdcr.resolve`; this class only flattens
    documents to mentions and re-packs clusters into ``CrossDocCluster``
    (canonical = first member's surface, type = first member's type,
    cdcr.rs:524-535).
    """

    def __init__(self, config: CDCRConfig | None = None):
        self.config = config or CDCRConfig()

    @classmethod
    def with_config(cls, config: CDCRConfig) -> "CDCRResolver":
        return cls(config)

    def resolve(self, documents) -> list:
        mentions: list[MentionRef] = []
        for d in documents:
            for idx, e in enumerate(d.entities):
                mentions.append(MentionRef(d.id, idx, e.text, e.entity_type))
        if not mentions:
            return []
        groups = _uf_resolve(
            mentions,
            min_similarity=self.config.min_similarity,
            require_type_match=self.config.require_type_match,
            use_lsh=self.config.use_lsh,
        )
        clusters: list[CrossDocCluster] = []
        for cid, members in enumerate(groups):
            first = mentions[members[0]]
            cluster = CrossDocCluster(cid, first.text, entity_type=first.entity_type)
            for m in members:
                cluster.add_mention(mentions[m].doc_id, mentions[m].entity_idx)
            clusters.append(cluster)
        return clusters


@dataclass
class CDCRMetrics:
    """cdcr.rs:585-668 — B³ over (doc_id, entity_idx) mention keys."""

    b_cubed_precision: float = 0.0
    b_cubed_recall: float = 0.0
    b_cubed_f1: float = 0.0
    num_pred_clusters: int = 0
    num_gold_clusters: int = 0

    @staticmethod
    def _mention_map(clusters):
        out = {}
        for c in clusters:
            members = frozenset((d, i) for d, i in c.mentions)
            for m in members:
                out[m] = members
        return out

    @classmethod
    def compute(cls, predicted, gold) -> "CDCRMetrics":
        pred_map = cls._mention_map(predicted)
        gold_map = cls._mention_map(gold)
        all_mentions = set(pred_map) | set(gold_map)
        if not all_mentions:
            return cls()
        tp = tr = 0.0
        for m in all_mentions:
            p, g = pred_map.get(m), gold_map.get(m)
            if p is not None and g is not None:
                inter = len(p & g)
                tp += inter / len(p)
                tr += inter / len(g)
        n = len(all_mentions)
        precision, recall = tp / n, tr / n
        f1 = 2 * precision * recall / (precision + recall) if precision + recall > 0 else 0.0
        return cls(precision, recall, f1, len(predicted), len(gold))


# =============================================================================
# Sample corpora — transcribed reference data (cdcr.rs:684-1050)
# =============================================================================

PER, ORG, LOC = "PER", "ORG", "LOC"


def tech_news_dataset() -> list:
    """cdcr.rs:684-768 — five AI/semiconductor articles."""
    return [
        Document(
            "tech_01",
            "Jensen Huang announced that Nvidia will build new AI supercomputers. "
            "The chipmaker plans to expand its data center business.",
            [
                Entity("Jensen Huang", PER, 0, 12, 0.95),
                Entity("Nvidia", ORG, 28, 34, 0.94),
            ],
        ),
        Document(
            "tech_02",
            "The CEO of Nvidia revealed plans for Blackwell chips during CES 2025. "
            "Huang said the new GPUs would advance robotics and autonomous systems.",
            [
                Entity("CEO of Nvidia", PER, 4, 17, 0.85),
                Entity("Nvidia", ORG, 11, 17, 0.9),
                Entity("Blackwell", "Product", 37, 46, 0.87),
                Entity("CES 2025", "Event", 60, 68, 0.88),
                Entity("Huang", PER, 70, 75, 0.92),
            ],
        ),
        Document(
            "tech_03",
            "Anthropic and Google DeepMind are competing with Nvidia for AI dominance. "
            "Dario Amodei spoke about AI safety priorities.",
            [
                Entity("Anthropic", ORG, 0, 9, 0.93),
                Entity("Google DeepMind", ORG, 14, 29, 0.92),
                Entity("Nvidia", ORG, 49, 55, 0.91),
                Entity("Dario Amodei", PER, 76, 88, 0.94),
            ],
        ),
        Document(
            "tech_04",
            "Nvidia's stock reached new highs after Jensen Huang's keynote. "
            "The company announced partnerships with major cloud providers.",
            [
                Entity("Nvidia", ORG, 0, 6, 0.94),
                Entity("Jensen Huang", PER, 38, 50, 0.93),
            ],
        ),
        Document(
            "tech_05",
            "AMD and Intel responded to Nvidia's AI chip announcements. "
            "The semiconductor rivals are investing heavily in data center GPUs.",
            [
                Entity("AMD", ORG, 0, 3, 0.93),
                Entity("Intel", ORG, 8, 13, 0.91),
                Entity("Nvidia", ORG, 27, 33, 0.9),
            ],
        ),
    ]


def political_news_dataset() -> list:
    """cdcr.rs:770-830 — four political articles."""
    return [
        Document(
            "pol_01",
            "President Biden met with Chancellor Scholz in Washington. "
            "The two leaders discussed NATO expansion.",
            [
                Entity("President Biden", PER, 0, 14, 0.95),
                Entity("Chancellor Scholz", PER, 24, 41, 0.93),
                Entity("Washington", LOC, 45, 55, 0.92),
                Entity("NATO", ORG, 84, 88, 0.94),
            ],
        ),
        Document(
            "pol_02",
            "Biden and Scholz signed a joint statement on security. "
            "The US President emphasized transatlantic unity.",
            [
                Entity("Biden", PER, 0, 5, 0.94),
                Entity("Scholz", PER, 10, 16, 0.92),
                Entity("US President", PER, 60, 72, 0.88),
            ],
        ),
        Document(
            "pol_03",
            "The German Chancellor held talks with the American President. "
            "Olaf Scholz flew back to Berlin after the summit.",
            [
                Entity("German Chancellor", PER, 4, 21, 0.9),
                Entity("American President", PER, 38, 56, 0.88),
                Entity("Olaf Scholz", PER, 58, 69, 0.93),
                Entity("Berlin", LOC, 82, 88, 0.91),
            ],
        ),
        Document(
            "pol_04",
            "NATO Secretary General praised the Biden-Scholz meeting. "
            "The alliance is preparing for new challenges.",
            [
                Entity("NATO Secretary General", PER, 0, 22, 0.87),
                Entity("Biden", PER, 35, 40, 0.92),
                Entity("Scholz", PER, 41, 47, 0.91),
                Entity("NATO", ORG, 0, 4, 0.94),
            ],
        ),
    ]


def sports_news_dataset() -> list:
    """cdcr.rs:832-900 — four sports articles."""
    return [
        Document(
            "sport_01",
            "Lionel Messi scored twice as Inter Miami defeated Atlanta United 3-1. "
            "The Argentine superstar continues his MLS dominance.",
            [
                Entity("Lionel Messi", PER, 0, 12, 0.96),
                Entity("Inter Miami", ORG, 29, 40, 0.93),
                Entity("Atlanta United", ORG, 50, 64, 0.91),
                Entity("Argentine", "Nationality", 75, 84, 0.87),
            ],
        ),
        Document(
            "sport_02",
            "Messi's brace helped Miami to victory. The former Barcelona star "
            "is in top form.",
            [
                Entity("Messi", PER, 0, 5, 0.95),
                Entity("Miami", ORG, 21, 26, 0.88),
                Entity("Barcelona", ORG, 49, 58, 0.91),
            ],
        ),
        Document(
            "sport_03",
            "Inter Miami's victory over Atlanta keeps them top of the table. "
            "Messi has 15 goals this season.",
            [
                Entity("Inter Miami", ORG, 0, 11, 0.92),
                Entity("Atlanta", ORG, 27, 34, 0.87),
                Entity("Messi", PER, 66, 71, 0.94),
            ],
        ),
        Document(
            "sport_04",
            "The Argentine forward Leo Messi broke another MLS record. "
            "Miami's number 10 is unstoppable.",
            [
                Entity("Argentine forward", PER, 4, 21, 0.85),
                Entity("Leo Messi", PER, 22, 31, 0.94),
                Entity("MLS", ORG, 46, 49, 0.9),
                Entity("Miami", ORG, 59, 64, 0.87),
            ],
        ),
    ]


def financial_news_dataset() -> list:
    """cdcr.rs:890-953 — four financial articles."""
    return [
        Document(
            "fin_01",
            "Apple reported record quarterly revenue of $117 billion. "
            "Tim Cook said iPhone sales exceeded expectations.",
            [
                Entity("Apple", ORG, 0, 5, 0.95),
                Entity("Tim Cook", PER, 59, 67, 0.93),
                Entity("iPhone", "Product", 73, 79, 0.91),
            ],
        ),
        Document(
            "fin_02",
            "The iPhone maker's stock rose 5% after earnings beat. "
            "Apple's CEO expressed confidence in services growth.",
            [
                Entity("iPhone maker", ORG, 4, 16, 0.85),
                Entity("Apple", ORG, 55, 60, 0.94),
                Entity("CEO", PER, 63, 66, 0.8),
            ],
        ),
        Document(
            "fin_03",
            "Cook highlighted Apple's expansion in India. The Cupertino company "
            "is reducing reliance on China.",
            [
                Entity("Cook", PER, 0, 4, 0.91),
                Entity("Apple", ORG, 17, 22, 0.94),
                Entity("India", LOC, 38, 43, 0.92),
                Entity("Cupertino company", ORG, 49, 66, 0.82),
                Entity("China", LOC, 95, 100, 0.91),
            ],
        ),
        Document(
            "fin_04",
            "Microsoft and Google also reported strong results. "
            "But Apple outperformed both tech rivals.",
            [
                Entity("Microsoft", ORG, 0, 9, 0.94),
                Entity("Google", ORG, 14, 20, 0.93),
                Entity("Apple", ORG, 56, 61, 0.94),
            ],
        ),
    ]


def science_news_dataset() -> list:
    """cdcr.rs:956-1033 — four science articles."""
    return [
        Document(
            "sci_01",
            "NASA's Perseverance rover discovered organic molecules on Mars. "
            "The Jezero Crater finding excited scientists.",
            [
                Entity("NASA", ORG, 0, 4, 0.95),
                Entity("Perseverance", "Product", 7, 19, 0.92),
                Entity("Mars", LOC, 54, 58, 0.94),
                Entity("Jezero Crater", LOC, 64, 77, 0.89),
            ],
        ),
        Document(
            "sci_02",
            "The Mars rover collected samples that may contain biosignatures. "
            "NASA plans to bring these samples to Earth.",
            [
                Entity("Mars rover", "Product", 4, 14, 0.87),
                Entity("NASA", ORG, 66, 70, 0.94),
                Entity("Earth", LOC, 101, 106, 0.93),
            ],
        ),
        Document(
            "sci_03",
            "Perseverance has been operating in Jezero Crater since 2021. "
            "The rover has traveled over 10 kilometers.",
            [
                Entity("Perseverance", "Product", 0, 12, 0.93),
                Entity("Jezero Crater", LOC, 35, 48, 0.9),
            ],
        ),
        Document(
            "sci_04",
            "ESA and NASA are collaborating on Mars Sample Return. "
            "The European Space Agency will build the orbiter.",
            [
                Entity("ESA", ORG, 0, 3, 0.92),
                Entity("NASA", ORG, 8, 12, 0.94),
                Entity("Mars", LOC, 34, 38, 0.93),
                Entity("European Space Agency", ORG, 59, 80, 0.91),
            ],
        ),
    ]


def comprehensive_cdcr_dataset() -> list:
    """cdcr.rs:1036-1044 — all five corpora concatenated."""
    return (
        tech_news_dataset()
        + political_news_dataset()
        + sports_news_dataset()
        + financial_news_dataset()
        + science_news_dataset()
    )
