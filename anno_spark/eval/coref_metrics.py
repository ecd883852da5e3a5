"""E4 — coreference metrics suite (anno/src/eval/coref_metrics.rs).

Behavioral port of the reference's MUC, B³, CEAFe/CEAFm, LEA, BLANC and
CoNLL-F1 scorers. A chain is any iterable of hashable mention ids (the
reference uses (start, end) span ids; anything hashable works). All
metrics restrict to the COMMON mentions (present on both sides) exactly
as the reference does (coref_metrics.rs:270-312), and CEAF uses the
reference's greedy assignment (coref_metrics.rs:554-595), not exact
Hungarian — quirk preserved for parity.

These are driver-side scorers for evaluation corpora (thousands of
chains, not the 10¹²-doc corpus): the inputs are already small
aggregates produced by the distributed pipeline.
"""

from __future__ import annotations

from dataclasses import dataclass


@dataclass
class PRF:
    precision: float
    recall: float
    f1: float

    def as_tuple(self):
        return (self.precision, self.recall, self.f1)


def _f1(p: float, r: float) -> float:
    return 2 * p * r / (p + r) if p + r > 0 else 0.0


def _norm(chains) -> list[list]:
    return [list(c) for c in chains if len(list(c))]


def _index(chains) -> dict:
    return {m: i for i, c in enumerate(chains) for m in c}


def _common(pred, gold) -> set:
    ps = {m for c in pred for m in c}
    gs = {m for c in gold for m in c}
    return ps & gs


def muc_score(pred, gold) -> PRF:
    """MUC (Vilain et al. 1995; coref_metrics.rs:336-418): per chain,
    (|mentions| − |partitions in the other side|) / (|mentions| − 1),
    singletons skipped."""
    pred, gold = _norm(pred), _norm(gold)
    common = _common(pred, gold)
    if not common:
        return PRF(0.0, 0.0, 0.0)

    def side(chains, other_index):
        num = den = 0.0
        for chain in chains:
            ms = [m for m in chain if m in common]
            if len(ms) <= 1:
                continue
            partitions = {other_index[m] for m in ms if m in other_index}
            num += len(ms) - max(len(partitions), 1)
            den += len(ms) - 1
        return num / den if den > 0 else 0.0

    r = side(gold, _index(pred))
    p = side(pred, _index(gold))
    return PRF(p, r, _f1(p, r))


def b_cubed_score(pred, gold) -> PRF:
    """B³ (Bagga & Baldwin 1998; coref_metrics.rs:441-527): per-mention
    overlap ratios averaged per side. NOTE (reference parity): the
    overlap denominator is the FULL chain length, not the common-filtered
    length (coref_metrics.rs:477,503)."""
    pred, gold = _norm(pred), _norm(gold)
    common = _common(pred, gold)
    if not common:
        return PRF(0.0, 0.0, 0.0)
    pred_index, gold_index = _index(pred), _index(gold)

    def side(chains, other, other_index):
        total = 0.0
        n = 0
        for chain in chains:
            cset = set(chain)
            for m in chain:
                if m not in common:
                    continue
                n += 1
                if m in other_index:
                    oset = set(other[other_index[m]])
                    total += len(cset & oset) / len(chain)
        return total / n if n else 0.0

    r = side(gold, pred, pred_index)
    p = side(pred, gold, gold_index)
    return PRF(p, r, _f1(p, r))


def _greedy_assignment(pred, gold, sim_fn) -> float:
    """Greedy (not Hungarian) max-similarity 1-1 chain alignment —
    reference quirk at coref_metrics.rs:554-595."""
    if not pred or not gold:
        return 0.0
    sims = []
    for i, p in enumerate(pred):
        for j, g in enumerate(gold):
            s = sim_fn(p, g)
            if s > 0.0:
                sims.append((i, j, s))
    sims.sort(key=lambda t: -t[2])
    used_p, used_g, total = set(), set(), 0.0
    for i, j, s in sims:
        if i not in used_p and j not in used_g:
            total += s
            used_p.add(i)
            used_g.add(j)
    return total


def ceaf_e_score(pred, gold) -> PRF:
    """CEAF-entity / φ4 (Luo 2005; coref_metrics.rs:534-541, 610-639):
    φ4 = |C_p ∩ C_g| (reference uses the RAW count, not the usual
    normalized 2·|∩|/(|p|+|g|) — quirk preserved); P = Σφ/Σ|C_p|,
    R = Σφ/Σ|C_g|."""
    pred, gold = _norm(pred), _norm(gold)

    def phi4(p, g):
        return float(len(set(p) & set(g)))

    sim = _greedy_assignment(pred, gold, phi4)
    n_pred = sum(len(c) for c in pred)
    n_gold = sum(len(c) for c in gold)
    p = sim / n_pred if n_pred else 0.0
    r = sim / n_gold if n_gold else 0.0
    return PRF(p, r, _f1(p, r))


def ceaf_m_score(pred, gold) -> PRF:
    """CEAF-mention / φ3 (coref_metrics.rs:543-552, 640-668):
    φ3 = 2|∩|/(|p|+|g|); P = Σφ/#pred_chains, R = Σφ/#gold_chains."""
    pred, gold = _norm(pred), _norm(gold)

    def phi3(p, g):
        overlap = len(set(p) & set(g))
        return 2.0 * overlap / (len(p) + len(g)) if overlap else 0.0

    sim = _greedy_assignment(pred, gold, phi3)
    p = sim / len(pred) if pred else 0.0
    r = sim / len(gold) if gold else 0.0
    return PRF(p, r, _f1(p, r))


def lea_score(pred, gold) -> PRF:
    """LEA (Moosavi & Strube 2016; coref_metrics.rs:680-830): per entity,
    importance = |common mentions|, resolution = correct links / total
    links (singletons: resolved iff the other side also has it as a
    singleton over common mentions)."""
    pred, gold = _norm(pred), _norm(gold)
    common = _common(pred, gold)
    if not common:
        return PRF(0.0, 0.0, 0.0)
    pred_index, gold_index = _index(pred), _index(gold)

    def side(chains, other, other_index):
        num = den = 0.0
        for chain in chains:
            ms = [m for m in chain if m in common]
            if not ms:
                continue
            importance = float(len(ms))
            den += importance
            if len(ms) == 1:
                m = ms[0]
                if m in other_index:
                    other_common = [x for x in other[other_index[m]] if x in common]
                    if len(other_common) == 1:
                        num += importance
            else:
                correct = 0
                total = len(ms) * (len(ms) - 1) // 2
                for i in range(len(ms)):
                    for j in range(i + 1, len(ms)):
                        a, b = ms[i], ms[j]
                        if (
                            a in other_index
                            and b in other_index
                            and other_index[a] == other_index[b]
                        ):
                            correct += 1
                num += importance * (correct / total if total else 0.0)
        return num / den if den > 0 else 0.0

    r = side(gold, pred, pred_index)
    p = side(pred, gold, gold_index)
    return PRF(p, r, _f1(p, r))


def blanc_score(pred, gold) -> PRF:
    """BLANC (Recasens & Hovy 2010; coref_metrics.rs:851-956): Rand-index
    style average of coref-pair and non-coref-pair P/R/F1 over common
    mentions; fewer than 2 common mentions → perfect by definition."""
    pred, gold = _norm(pred), _norm(gold)
    common = sorted(_common(pred, gold), key=repr)
    if len(common) < 2:
        return PRF(1.0, 1.0, 1.0)
    pred_index, gold_index = _index(pred), _index(gold)

    c_tp = c_fp = c_fn = n_tp = n_fp = n_fn = 0
    for i in range(len(common)):
        for j in range(i + 1, len(common)):
            a, b = common[i], common[j]
            ps = pred_index.get(a) is not None and pred_index.get(a) == pred_index.get(b)
            gs = gold_index.get(a) is not None and gold_index.get(a) == gold_index.get(b)
            if ps and gs:
                c_tp += 1
            elif ps and not gs:
                c_fp += 1
                n_fn += 1
            elif gs and not ps:
                c_fn += 1
                n_fp += 1
            else:
                n_tp += 1

    def prf(tp, fp, fn):
        p = tp / (tp + fp) if tp + fp else 0.0
        r = tp / (tp + fn) if tp + fn else 0.0
        return p, r, _f1(p, r)

    cp, cr, cf = prf(c_tp, c_fp, c_fn)
    np_, nr, nf = prf(n_tp, n_fp, n_fn)
    return PRF((cp + np_) / 2.0, (cr + nr) / 2.0, (cf + nf) / 2.0)


def conll_f1(pred, gold) -> float:
    """CoNLL-2012 official: mean of MUC, B³, CEAFe F1
    (coref_metrics.rs:958-973)."""
    return (
        muc_score(pred, gold).f1
        + b_cubed_score(pred, gold).f1
        + ceaf_e_score(pred, gold).f1
    ) / 3.0


def evaluate_coref(pred, gold) -> dict:
    """All metrics at once → {metric: PRF or float}."""
    return {
        "muc": muc_score(pred, gold),
        "b_cubed": b_cubed_score(pred, gold),
        "ceaf_e": ceaf_e_score(pred, gold),
        "ceaf_m": ceaf_m_score(pred, gold),
        "lea": lea_score(pred, gold),
        "blanc": blanc_score(pred, gold),
        "conll_f1": conll_f1(pred, gold),
    }


def clusters_df_to_chains(df, cluster_col: str, mention_col: str):
    """Spark DataFrame (cluster_id, mention_id) → list of chains, for
    scoring distributed CDCR output against a gold clustering. Collects:
    eval corpora are small by construction (the driver-side boundary is
    explicit, like exports.py)."""
    rows = df.select(cluster_col, mention_col).collect()
    by_cluster: dict = {}
    for r in rows:
        by_cluster.setdefault(r[0], []).append(r[1])
    return list(by_cluster.values())
