"""Demographic-bias evaluation for NER (reference:
anno/src/eval/demographic_bias.rs:1-2914 + bias_config.rs:15-313).

Measures whether name recognition rates differ across ethnicity,
script, gender, and name frequency (and location recognition across
regions): the reference embeds each of 210 census-derived names
(create_diverse_name_dataset, demographic_bias.rs:706-2571) and 42
world locations (:2572-2914) in a deterministic realistic sentence,
runs NER, and reports per-group recognition rates, the max-min
ethnicity parity gap, and the |Latin − avg(non-Latin)| script gap
(evaluate_ner :343-554, evaluate_locations :555-704). bias_config.rs
contributes the statistical wrappers: multi-seed mean/CI
(StatisticalBiasResults::from_values :107-157), Cohen's d (:160-190),
frequency weighting (:215-262), and distribution validation against a
US-census reference with 10% tolerance (:278-313 +
validate_demographic_distribution, demographic_bias.rs:2499-2530).

Distributed shape (same contract as length_bias.py): the name table is
a fixed pure function; recognition runs the REAL extraction stack once
(`extract_documents`) and joins mentions back relationally; every
rollup is a map-side-combinable groupBy, so the same evaluator runs
over millions of generated names unchanged.

Adaptations and preserved quirks:

* template selection — the reference picks a sentence via Rust's
  ``DefaultHasher`` (:2533-2539, :643-705), an implementation-defined
  hash the Rust docs explicitly leave unstable; this port selects with
  the engine's FNV-1a 64 (core/minhash.py), equally deterministic;
* ``confidence`` is taken from the FIRST Person entity in extraction
  order even when a different Person mention satisfied the
  recognition check (:368-376 — transcribed);
* recognition = ANY Person mention whose extracted surface CONTAINS
  the first name (:363-367, containment not equality); locations use
  Location mentions containing the full location name (:566-570);
* the reference's ``statistical`` branch computes the CI from a
  SINGLE value even when multiple seeds are configured (:520-532,
  "for now" in source) — so n=1, std=0, degenerate CI; transcribed;
* gender buckets and intersectional keys only accumulate when gender
  is known (None-gender names appear in ethnicity/script/frequency
  rollups only, :398-404, :417-437);
* frequency weights are the fixed Common/Moderate/Rare → 0.5/0.3/0.2
  map (:493-505).

Demographic labels are MEASUREMENT categories transcribed from the
reference dataset — they exist to detect disparate model behavior, not
to essentialize names.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..core.minhash import fnv1a_seeded

# ---------------------------------------------------------------------------
# sentence templates (demographic_bias.rs:643-705, :2533-2571)

NAME_TEMPLATES = (
    "{} was interviewed by the news team.",
    "The award was presented to {} at the ceremony.",
    "{} published a groundbreaking research paper.",
    "According to {}, the project will launch next month.",
    "{} joined the company as a senior executive.",
    "The conference featured a keynote speech by {}.",
    "{} received recognition for outstanding contributions.",
    "In a statement, {} expressed support for the initiative.",
    "{} was elected to the board of directors.",
    "The research team, led by {}, made significant discoveries.",
    "{} announced plans to expand operations globally.",
    "During the meeting, {} proposed a new strategy.",
    "{} has been appointed as the new department head.",
    "The organization honored {} for years of service.",
    "{} spoke at the international summit in Geneva.",
    "After careful consideration, {} decided to proceed.",
    "{} collaborated with international partners on the project.",
    "The committee selected {} as the recipient of the award.",
    "{} provided expert testimony during the hearing.",
    "In an exclusive interview, {} discussed future plans.",
)

LOCATION_TEMPLATES = (
    "The summit was held in {} last month.",
    "{} has become a major tech hub in recent years.",
    "Tourists flock to {} during the summer months.",
    "The conference in {} attracted thousands of attendees.",
    "{} is known for its vibrant cultural scene.",
    "Business leaders met in {} to discuss trade policies.",
    "{} hosted the international competition this year.",
    "The economic growth in {} has been remarkable.",
    "{} is home to several world-renowned universities.",
    "The climate summit in {} addressed global challenges.",
)


def realistic_sentence(name: str, templates: tuple = NAME_TEMPLATES) -> str:
    """Deterministic template pick (FNV-1a in place of DefaultHasher)."""
    return templates[fnv1a_seeded(name.encode("utf-8"), 0) % len(templates)].format(name)


def realistic_location_sentence(location: str) -> str:
    return realistic_sentence(location, LOCATION_TEMPLATES)


# ---------------------------------------------------------------------------
# bias_config.rs ports (pure, driver-side scalars)

# BiasDatasetConfig::default (bias_config.rs:30-43)
DEFAULT_CONFIG = {
    "min_samples_per_category": 30,
    "frequency_weighted": False,
    "validate_distributions": False,
    "evaluation_seeds": (42, 123, 456, 789, 999),
    "confidence_level": 0.95,
    "detailed": False,
}


def statistical_from_values(values: list, confidence_level: float = 0.95) -> dict:
    """StatisticalBiasResults::from_values (bias_config.rs:107-157):
    sample std, z-score CI (1.96/2.576, scaled otherwise)."""
    if not values:
        return {"mean": 0.0, "std_dev": 0.0, "ci_95": (0.0, 0.0), "min": 0.0,
                "max": 0.0, "effect_size": None, "n": 0, "std_error": 0.0}
    n = len(values)
    mean = sum(values) / n
    variance = (sum((x - mean) ** 2 for x in values) / (n - 1)) if n > 1 else 0.0
    std_dev = math.sqrt(variance)
    std_error = std_dev / math.sqrt(n)
    if confidence_level == 0.95:
        z = 1.96
    elif confidence_level == 0.99:
        z = 2.576
    else:
        z = 1.96 * (confidence_level / 0.95)
    margin = z * std_error
    return {"mean": mean, "std_dev": std_dev,
            "ci_95": (mean - margin, mean + margin),
            "min": min(values), "max": max(values), "effect_size": None,
            "n": n, "std_error": std_error}


def cohens_d(group1: list, group2: list) -> float:
    """compute_effect_size (bias_config.rs:160-190): pooled-std d."""
    if not group1 or not group2:
        return 0.0
    m1 = sum(group1) / len(group1)
    m2 = sum(group2) / len(group2)
    v1 = (sum((x - m1) ** 2 for x in group1) / (len(group1) - 1)) if len(group1) > 1 else 0.0
    v2 = (sum((x - m2) ** 2 for x in group2) / (len(group2) - 1)) if len(group2) > 1 else 0.0
    pooled = math.sqrt((v1 + v2) / 2.0)
    if pooled == 0.0:
        return 0.0
    return (m1 - m2) / pooled


def frequency_weighted_results(recognized: list, frequencies: dict,
                               names: list) -> dict:
    """FrequencyWeightedResults::new (bias_config.rs:215-262); missing
    names default to 1/len(names)."""
    if not recognized:
        return {"unweighted_rate": 0.0, "weighted_rate": 0.0, "n": 0}
    unweighted = sum(recognized) / len(recognized)
    weighted_sum = total = 0.0
    for i, rec in enumerate(recognized):
        if i < len(names):
            freq = frequencies.get(names[i], 1.0 / len(names))
            if rec:
                weighted_sum += freq
            total += freq
    weighted = weighted_sum / total if total > 0.0 else unweighted
    return {"unweighted_rate": unweighted, "weighted_rate": weighted,
            "n": len(recognized)}


def validate_distribution(observed: dict, reference: dict,
                          tolerance: float) -> dict:
    """DistributionValidation::validate (bias_config.rs:278-313)."""
    max_dev = 0.0
    devs = {}
    for cat, ref_v in reference.items():
        dev = abs(observed.get(cat, 0.0) - ref_v)
        devs[cat] = dev
        max_dev = max(max_dev, dev)
    for cat, obs_v in observed.items():
        if cat not in reference:
            devs[cat] = obs_v
            max_dev = max(max_dev, obs_v)
    return {"is_valid": max_dev <= tolerance, "max_deviation": max_dev,
            "category_deviations": devs, "tolerance": tolerance}


# validate_demographic_distribution (demographic_bias.rs:2499-2530):
# approximate US Census 2020 proportions, 10% tolerance.
CENSUS_REFERENCE = {
    "European": 0.60, "Hispanic": 0.19, "AfricanAmerican": 0.13,
    "EastAsian": 0.06, "SouthAsian": 0.02, "MiddleEastern": 0.01,
    "African": 0.01, "Indigenous": 0.01,
}


def validate_demographic_distribution(observed: dict) -> dict:
    total = sum(observed.values())
    normalized = ({k: v / total for k, v in observed.items()}
                  if total > 0.0 else dict(observed))
    return validate_distribution(normalized, CENSUS_REFERENCE, 0.10)


def compute_max_gap(rates: dict) -> float:
    """demographic_bias.rs:706-719 helper: max−min, 0.0 under 2 groups."""
    if len(rates) < 2:
        return 0.0
    vals = list(rates.values())
    return max(vals) - min(vals)


# ---------------------------------------------------------------------------
# datasets (reference data, extracted verbatim)

# create_diverse_name_dataset (demographic_bias.rs:706-2571) — 210
# (first, last, ethnicity, script, gender|None, frequency) tuples.
DIVERSE_NAMES = (
    ("James", "Smith", "European", "Latin", "Masculine", "Common"),
    ("Mary", "Johnson", "European", "Latin", "Feminine", "Common"),
    ("William", "Williams", "European", "Latin", "Masculine", "Common"),
    ("Emma", "Brown", "European", "Latin", "Feminine", "Common"),
    ("Heinrich", "Mueller", "European", "Latin", "Masculine", "Moderate"),
    ("François", "Dubois", "European", "Latin", "Masculine", "Moderate"),
    ("Giulia", "Rossi", "European", "Latin", "Feminine", "Moderate"),
    ("Björk", "Guðmundsdóttir", "European", "Latin", "Feminine", "Rare"),
    ("DeShawn", "Jackson", "AfricanAmerican", "Latin", "Masculine", "Common"),
    ("Latoya", "Williams", "AfricanAmerican", "Latin", "Feminine", "Common"),
    ("Jamal", "Robinson", "AfricanAmerican", "Latin", "Masculine", "Common"),
    ("Aaliyah", "Washington", "AfricanAmerican", "Latin", "Feminine", "Common"),
    ("Tyrone", "Davis", "AfricanAmerican", "Latin", "Masculine", "Common"),
    ("Imani", "Johnson", "AfricanAmerican", "Latin", "Feminine", "Moderate"),
    ("Darnell", "Thompson", "AfricanAmerican", "Latin", "Masculine", "Moderate"),
    ("Shaniqua", "Brown", "AfricanAmerican", "Latin", "Feminine", "Rare"),
    ("José", "García", "Hispanic", "Latin", "Masculine", "Common"),
    ("María", "Rodriguez", "Hispanic", "Latin", "Feminine", "Common"),
    ("Carlos", "Martinez", "Hispanic", "Latin", "Masculine", "Common"),
    ("Isabella", "Lopez", "Hispanic", "Latin", "Feminine", "Common"),
    ("Diego", "Hernandez", "Hispanic", "Latin", "Masculine", "Common"),
    ("Sofía", "González", "Hispanic", "Latin", "Feminine", "Common"),
    ("Javier", "Pérez", "Hispanic", "Latin", "Masculine", "Moderate"),
    ("Guadalupe", "Sánchez", "Hispanic", "Latin", "Neutral", "Moderate"),
    ("Wei", "Wang", "EastAsian", "Latin", "Masculine", "Common"),
    ("Li", "Zhang", "EastAsian", "Latin", "Feminine", "Common"),
    ("Ming", "Chen", "EastAsian", "Latin", "Neutral", "Common"),
    ("伟", "王", "EastAsian", "Chinese", "Masculine", "Common"),
    ("丽", "张", "EastAsian", "Chinese", "Feminine", "Common"),
    ("Takeshi", "Tanaka", "EastAsian", "Latin", "Masculine", "Common"),
    ("Yuki", "Yamamoto", "EastAsian", "Latin", "Neutral", "Common"),
    ("太郎", "田中", "EastAsian", "Japanese", "Masculine", "Common"),
    ("花子", "山本", "EastAsian", "Japanese", "Feminine", "Common"),
    ("Min-jun", "Kim", "EastAsian", "Latin", "Masculine", "Common"),
    ("Seo-yeon", "Park", "EastAsian", "Latin", "Feminine", "Common"),
    ("민준", "김", "EastAsian", "Korean", "Masculine", "Common"),
    ("Raj", "Patel", "SouthAsian", "Latin", "Masculine", "Common"),
    ("Priya", "Sharma", "SouthAsian", "Latin", "Feminine", "Common"),
    ("Arjun", "Singh", "SouthAsian", "Latin", "Masculine", "Common"),
    ("Aisha", "Khan", "SouthAsian", "Latin", "Feminine", "Common"),
    ("Vikram", "Kumar", "SouthAsian", "Latin", "Masculine", "Common"),
    ("Sunita", "Gupta", "SouthAsian", "Latin", "Feminine", "Common"),
    ("राज", "पटेल", "SouthAsian", "Devanagari", "Masculine", "Common"),
    ("प्रिया", "शर्मा", "SouthAsian", "Devanagari", "Feminine", "Common"),
    ("Ahmed", "Hassan", "MiddleEastern", "Latin", "Masculine", "Common"),
    ("Fatima", "Ali", "MiddleEastern", "Latin", "Feminine", "Common"),
    ("Mohammed", "Ibrahim", "MiddleEastern", "Latin", "Masculine", "Common"),
    ("Layla", "Omar", "MiddleEastern", "Latin", "Feminine", "Common"),
    ("Yusuf", "Mustafa", "MiddleEastern", "Latin", "Masculine", "Common"),
    ("Mariam", "Khalil", "MiddleEastern", "Latin", "Feminine", "Common"),
    ("أحمد", "حسن", "MiddleEastern", "Arabic", "Masculine", "Common"),
    ("فاطمة", "علي", "MiddleEastern", "Arabic", "Feminine", "Common"),
    ("Chidi", "Okonkwo", "African", "Latin", "Masculine", "Common"),
    ("Amara", "Adebayo", "African", "Latin", "Feminine", "Common"),
    ("Kwame", "Mensah", "African", "Latin", "Masculine", "Common"),
    ("Nneka", "Nwosu", "African", "Latin", "Feminine", "Common"),
    ("Oluwaseun", "Afolabi", "African", "Latin", "Masculine", "Moderate"),
    ("Chidinma", "Eze", "African", "Latin", "Feminine", "Moderate"),
    ("Tendai", "Moyo", "African", "Latin", "Neutral", "Moderate"),
    ("Zainab", "Diallo", "African", "Latin", "Feminine", "Moderate"),
    ("Ivan", "Petrov", "European", "Latin", "Masculine", "Common"),
    ("Olga", "Ivanova", "European", "Latin", "Feminine", "Common"),
    ("Иван", "Петров", "European", "Cyrillic", "Masculine", "Common"),
    ("Ольга", "Иванова", "European", "Cyrillic", "Feminine", "Common"),
    ("Dmytro", "Shevchenko", "European", "Latin", "Masculine", "Moderate"),
    ("Katarzyna", "Kowalski", "European", "Latin", "Feminine", "Moderate"),
    ("Alexander", "Volkov", "European", "Latin", "Masculine", "Common"),
    ("Sofia", "Kozlova", "European", "Latin", "Feminine", "Common"),
    ("Dmitri", "Sokolov", "European", "Latin", "Masculine", "Common"),
    ("Anastasia", "Popova", "European", "Latin", "Feminine", "Common"),
    ("Robert", "Jones", "European", "Latin", "Masculine", "Common"),
    ("Patricia", "Garcia", "European", "Latin", "Feminine", "Common"),
    ("Michael", "Miller", "European", "Latin", "Masculine", "Common"),
    ("Jennifer", "Davis", "European", "Latin", "Feminine", "Common"),
    ("David", "Rodriguez", "European", "Latin", "Masculine", "Common"),
    ("Linda", "Martinez", "European", "Latin", "Feminine", "Common"),
    ("Richard", "Hernandez", "European", "Latin", "Masculine", "Common"),
    ("Barbara", "Lopez", "European", "Latin", "Feminine", "Common"),
    ("Joseph", "Wilson", "European", "Latin", "Masculine", "Common"),
    ("Elizabeth", "Anderson", "European", "Latin", "Feminine", "Common"),
    ("Thomas", "Thomas", "European", "Latin", "Masculine", "Common"),
    ("Jessica", "Taylor", "European", "Latin", "Feminine", "Common"),
    ("Charles", "Moore", "European", "Latin", "Masculine", "Common"),
    ("Sarah", "Jackson", "European", "Latin", "Feminine", "Common"),
    ("Christopher", "Martin", "European", "Latin", "Masculine", "Common"),
    ("Karen", "Lee", "European", "Latin", "Feminine", "Common"),
    ("Daniel", "Thompson", "European", "Latin", "Masculine", "Common"),
    ("Nancy", "White", "European", "Latin", "Feminine", "Common"),
    ("Matthew", "Harris", "European", "Latin", "Masculine", "Common"),
    ("Betty", "Sanchez", "European", "Latin", "Feminine", "Common"),
    ("Malik", "Anderson", "AfricanAmerican", "Latin", "Masculine", "Common"),
    ("Keisha", "Thomas", "AfricanAmerican", "Latin", "Feminine", "Common"),
    ("Andre", "Harris", "AfricanAmerican", "Latin", "Masculine", "Common"),
    ("Tiffany", "Clark", "AfricanAmerican", "Latin", "Feminine", "Common"),
    ("Marcus", "Lewis", "AfricanAmerican", "Latin", "Masculine", "Common"),
    ("Nicole", "Walker", "AfricanAmerican", "Latin", "Feminine", "Common"),
    ("Darius", "Hall", "AfricanAmerican", "Latin", "Masculine", "Common"),
    ("Monique", "Allen", "AfricanAmerican", "Latin", "Feminine", "Common"),
    ("Terrell", "Young", "AfricanAmerican", "Latin", "Masculine", "Common"),
    ("Danielle", "King", "AfricanAmerican", "Latin", "Feminine", "Common"),
    ("Kendrick", "Wright", "AfricanAmerican", "Latin", "Masculine", "Common"),
    ("Brittany", "Lopez", "AfricanAmerican", "Latin", "Feminine", "Common"),
    ("Jermaine", "Hill", "AfricanAmerican", "Latin", "Masculine", "Common"),
    ("Crystal", "Scott", "AfricanAmerican", "Latin", "Feminine", "Common"),
    ("Antoine", "Green", "AfricanAmerican", "Latin", "Masculine", "Common"),
    ("Ebony", "Adams", "AfricanAmerican", "Latin", "Feminine", "Common"),
    ("Reginald", "Baker", "AfricanAmerican", "Latin", "Masculine", "Common"),
    ("Jasmine", "Nelson", "AfricanAmerican", "Latin", "Feminine", "Common"),
    ("Darnell", "Carter", "AfricanAmerican", "Latin", "Masculine", "Common"),
    ("LaTasha", "Mitchell", "AfricanAmerican", "Latin", "Feminine", "Common"),
    ("Alejandro", "Fernandez", "Hispanic", "Latin", "Masculine", "Common"),
    ("Valentina", "Ramirez", "Hispanic", "Latin", "Feminine", "Common"),
    ("Sebastian", "Torres", "Hispanic", "Latin", "Masculine", "Common"),
    ("Camila", "Flores", "Hispanic", "Latin", "Feminine", "Common"),
    ("Mateo", "Rivera", "Hispanic", "Latin", "Masculine", "Common"),
    ("Lucia", "Gomez", "Hispanic", "Latin", "Feminine", "Common"),
    ("Nicolas", "Diaz", "Hispanic", "Latin", "Masculine", "Common"),
    ("Elena", "Reyes", "Hispanic", "Latin", "Feminine", "Common"),
    ("Gabriel", "Morales", "Hispanic", "Latin", "Masculine", "Common"),
    ("Sofia", "Ortiz", "Hispanic", "Latin", "Feminine", "Common"),
    ("Adrian", "Gutierrez", "Hispanic", "Latin", "Masculine", "Common"),
    ("Isabella", "Chavez", "Hispanic", "Latin", "Feminine", "Common"),
    ("Luis", "Jimenez", "Hispanic", "Latin", "Masculine", "Common"),
    ("Gabriela", "Moreno", "Hispanic", "Latin", "Feminine", "Common"),
    ("Fernando", "Alvarez", "Hispanic", "Latin", "Masculine", "Common"),
    ("Valeria", "Ruiz", "Hispanic", "Latin", "Feminine", "Common"),
    ("Ricardo", "Vargas", "Hispanic", "Latin", "Masculine", "Common"),
    ("Andrea", "Mendoza", "Hispanic", "Latin", "Feminine", "Common"),
    ("Eduardo", "Castillo", "Hispanic", "Latin", "Masculine", "Common"),
    ("Natalia", "Ramos", "Hispanic", "Latin", "Feminine", "Common"),
    ("Hiroshi", "Suzuki", "EastAsian", "Latin", "Masculine", "Common"),
    ("Yuki", "Takahashi", "EastAsian", "Latin", "Neutral", "Common"),
    ("Kenji", "Tanaka", "EastAsian", "Latin", "Masculine", "Common"),
    ("Sakura", "Watanabe", "EastAsian", "Latin", "Feminine", "Common"),
    ("Jun", "Ito", "EastAsian", "Latin", "Neutral", "Common"),
    ("Mei", "Nakamura", "EastAsian", "Latin", "Feminine", "Common"),
    ("Xiaoming", "Li", "EastAsian", "Latin", "Masculine", "Common"),
    ("Xiaoli", "Wang", "EastAsian", "Latin", "Feminine", "Common"),
    ("Jian", "Liu", "EastAsian", "Latin", "Masculine", "Common"),
    ("Yan", "Zhang", "EastAsian", "Latin", "Feminine", "Common"),
    ("Hye-jin", "Park", "EastAsian", "Latin", "Feminine", "Common"),
    ("Seung-ho", "Kim", "EastAsian", "Latin", "Masculine", "Common"),
    ("Ji-woo", "Lee", "EastAsian", "Latin", "Neutral", "Common"),
    ("Soo-jin", "Choi", "EastAsian", "Latin", "Feminine", "Common"),
    ("Min-ho", "Jung", "EastAsian", "Latin", "Masculine", "Common"),
    ("明", "王", "EastAsian", "Chinese", "Masculine", "Common"),
    ("美", "李", "EastAsian", "Chinese", "Feminine", "Common"),
    ("健", "张", "EastAsian", "Chinese", "Masculine", "Common"),
    ("花子", "佐藤", "EastAsian", "Japanese", "Feminine", "Common"),
    ("太郎", "鈴木", "EastAsian", "Japanese", "Masculine", "Common"),
    ("Amit", "Patel", "SouthAsian", "Latin", "Masculine", "Common"),
    ("Kavita", "Sharma", "SouthAsian", "Latin", "Feminine", "Common"),
    ("Rahul", "Singh", "SouthAsian", "Latin", "Masculine", "Common"),
    ("Deepika", "Kumar", "SouthAsian", "Latin", "Feminine", "Common"),
    ("Vikram", "Gupta", "SouthAsian", "Latin", "Masculine", "Common"),
    ("Anjali", "Mehta", "SouthAsian", "Latin", "Feminine", "Common"),
    ("Rohan", "Desai", "SouthAsian", "Latin", "Masculine", "Common"),
    ("Meera", "Joshi", "SouthAsian", "Latin", "Feminine", "Common"),
    ("Siddharth", "Reddy", "SouthAsian", "Latin", "Masculine", "Common"),
    ("Kiran", "Nair", "SouthAsian", "Latin", "Neutral", "Common"),
    ("Arjun", "Iyer", "SouthAsian", "Latin", "Masculine", "Common"),
    ("Divya", "Menon", "SouthAsian", "Latin", "Feminine", "Common"),
    ("Nikhil", "Rao", "SouthAsian", "Latin", "Masculine", "Common"),
    ("Shreya", "Malhotra", "SouthAsian", "Latin", "Feminine", "Common"),
    ("Aditya", "Kapoor", "SouthAsian", "Latin", "Masculine", "Common"),
    ("Pooja", "Agarwal", "SouthAsian", "Latin", "Feminine", "Common"),
    ("Ravi", "Bhatt", "SouthAsian", "Latin", "Masculine", "Common"),
    ("Neha", "Chopra", "SouthAsian", "Latin", "Feminine", "Common"),
    ("Karan", "Verma", "SouthAsian", "Latin", "Masculine", "Common"),
    ("Sanjana", "Saxena", "SouthAsian", "Latin", "Feminine", "Common"),
    ("Omar", "Hassan", "MiddleEastern", "Latin", "Masculine", "Common"),
    ("Zara", "Ali", "MiddleEastern", "Latin", "Feminine", "Common"),
    ("Tariq", "Ibrahim", "MiddleEastern", "Latin", "Masculine", "Common"),
    ("Amina", "Omar", "MiddleEastern", "Latin", "Feminine", "Common"),
    ("Khalil", "Mustafa", "MiddleEastern", "Latin", "Masculine", "Common"),
    ("Noor", "Khalil", "MiddleEastern", "Latin", "Feminine", "Common"),
    ("Rashid", "Mahmoud", "MiddleEastern", "Latin", "Masculine", "Common"),
    ("Samira", "Haddad", "MiddleEastern", "Latin", "Feminine", "Common"),
    ("Bashir", "Nasser", "MiddleEastern", "Latin", "Masculine", "Common"),
    ("Leila", "Fadel", "MiddleEastern", "Latin", "Feminine", "Common"),
    ("Karim", "Said", "MiddleEastern", "Latin", "Masculine", "Common"),
    ("Yasmin", "Malik", "MiddleEastern", "Latin", "Feminine", "Common"),
    ("Jamal", "Rahman", "MiddleEastern", "Latin", "Masculine", "Common"),
    ("Soraya", "Abbas", "MiddleEastern", "Latin", "Feminine", "Common"),
    ("Nabil", "Hakim", "MiddleEastern", "Latin", "Masculine", "Common"),
    ("Rania", "Farid", "MiddleEastern", "Latin", "Feminine", "Common"),
    ("Tariq", "Zaki", "MiddleEastern", "Latin", "Masculine", "Common"),
    ("Dina", "Salem", "MiddleEastern", "Latin", "Feminine", "Common"),
    ("Malik", "Nasir", "MiddleEastern", "Latin", "Masculine", "Common"),
    ("Hala", "Qureshi", "MiddleEastern", "Latin", "Feminine", "Common"),
    ("Kofi", "Mensah", "African", "Latin", "Masculine", "Common"),
    ("Amina", "Diallo", "African", "Latin", "Feminine", "Common"),
    ("Kwame", "Asante", "African", "Latin", "Masculine", "Common"),
    ("Fatou", "Ndiaye", "African", "Latin", "Feminine", "Common"),
    ("Bakary", "Traore", "African", "Latin", "Masculine", "Common"),
    ("Aissatou", "Ba", "African", "Latin", "Feminine", "Common"),
    ("Ibrahim", "Sow", "African", "Latin", "Masculine", "Common"),
    ("Mariama", "Diallo", "African", "Latin", "Feminine", "Common"),
    ("Sekou", "Keita", "African", "Latin", "Masculine", "Common"),
    ("Awa", "Cisse", "African", "Latin", "Feminine", "Common"),
    ("Moussa", "Toure", "African", "Latin", "Masculine", "Common"),
    ("Kadiatou", "Sangare", "African", "Latin", "Feminine", "Common"),
    ("Youssouf", "Kone", "African", "Latin", "Masculine", "Common"),
    ("Aminata", "Diop", "African", "Latin", "Feminine", "Common"),
    ("Boubacar", "Sall", "African", "Latin", "Masculine", "Common"),
    ("Hawa", "Ba", "African", "Latin", "Feminine", "Common"),
    ("Mamadou", "Diallo", "African", "Latin", "Masculine", "Common"),
    ("Ramatoulaye", "Ndiaye", "African", "Latin", "Feminine", "Common"),
    ("Amadou", "Sow", "African", "Latin", "Masculine", "Common"),
    ("Aissata", "Traore", "African", "Latin", "Feminine", "Common"),
)

# create_diverse_location_dataset (demographic_bias.rs:2572-2914) — 42
DIVERSE_LOCATIONS = (
    ("New York", "NorthAmerica", "Latin", "City"),
    ("Los Angeles", "NorthAmerica", "Latin", "City"),
    ("Toronto", "NorthAmerica", "Latin", "City"),
    ("Mexico City", "NorthAmerica", "Latin", "City"),
    ("London", "WesternEurope", "Latin", "City"),
    ("Paris", "WesternEurope", "Latin", "City"),
    ("Berlin", "WesternEurope", "Latin", "City"),
    ("Amsterdam", "WesternEurope", "Latin", "City"),
    ("Moscow", "EasternEurope", "Latin", "City"),
    ("Москва", "EasternEurope", "Cyrillic", "City"),
    ("Warsaw", "EasternEurope", "Latin", "City"),
    ("Kyiv", "EasternEurope", "Latin", "City"),
    ("Tokyo", "EastAsia", "Latin", "City"),
    ("東京", "EastAsia", "Japanese", "City"),
    ("Beijing", "EastAsia", "Latin", "City"),
    ("北京", "EastAsia", "Chinese", "City"),
    ("Seoul", "EastAsia", "Latin", "City"),
    ("서울", "EastAsia", "Korean", "City"),
    ("Mumbai", "SouthAsia", "Latin", "City"),
    ("Delhi", "SouthAsia", "Latin", "City"),
    ("Dhaka", "SouthAsia", "Latin", "City"),
    ("Karachi", "SouthAsia", "Latin", "City"),
    ("Bangkok", "SoutheastAsia", "Latin", "City"),
    ("Singapore", "SoutheastAsia", "Latin", "City"),
    ("Jakarta", "SoutheastAsia", "Latin", "City"),
    ("Ho Chi Minh City", "SoutheastAsia", "Latin", "City"),
    ("Dubai", "MiddleEast", "Latin", "City"),
    ("دبي", "MiddleEast", "Arabic", "City"),
    ("Tehran", "MiddleEast", "Latin", "City"),
    ("Riyadh", "MiddleEast", "Latin", "City"),
    ("Lagos", "Africa", "Latin", "City"),
    ("Nairobi", "Africa", "Latin", "City"),
    ("Cairo", "Africa", "Latin", "City"),
    ("Johannesburg", "Africa", "Latin", "City"),
    ("Addis Ababa", "Africa", "Latin", "City"),
    ("São Paulo", "LatinAmerica", "Latin", "City"),
    ("Buenos Aires", "LatinAmerica", "Latin", "City"),
    ("Bogotá", "LatinAmerica", "Latin", "City"),
    ("Lima", "LatinAmerica", "Latin", "City"),
    ("Sydney", "Oceania", "Latin", "City"),
    ("Melbourne", "Oceania", "Latin", "City"),
    ("Auckland", "Oceania", "Latin", "City"),
)


# ---------------------------------------------------------------------------
# Spark evaluators — one real extraction pass + relational rollups

NAME_COLUMNS = ("url", "name", "first_name", "last_name", "ethnicity",
                "script", "gender", "frequency", "sentence")


def diverse_names_df(spark: SparkSession, names: tuple = DIVERSE_NAMES) -> DataFrame:
    """The 210-name bias table with its deterministic sentences."""
    rows = []
    for i, (first, last, eth, script, gender, freq) in enumerate(names):
        full = f"{first} {last}"  # NameExample::new (:183)
        rows.append((f"bias://name/{i}", full, first, last, eth, script,
                     gender, freq, realistic_sentence(full)))
    return spark.createDataFrame(rows, list(NAME_COLUMNS))


def diverse_locations_df(spark: SparkSession,
                         locations: tuple = DIVERSE_LOCATIONS) -> DataFrame:
    rows = []
    for i, (name, region, script, ltype) in enumerate(locations):
        rows.append((f"bias://loc/{i}", name, region, script, ltype,
                     realistic_location_sentence(name)))
    return spark.createDataFrame(
        rows, ["url", "name", "region", "script", "location_type", "sentence"])


def _recognition(examples: DataFrame, mentions: DataFrame,
                 entity_type: str, contains_col: str) -> DataFrame:
    """Per-example recognized flag + first-Person confidence
    (evaluate_ner :357-376): ANY mention of ``entity_type`` whose
    surface contains ``contains_col``; confidence from the FIRST such-
    typed mention by span order regardless of which one matched
    (reference quirk). One shuffle on url."""
    m = mentions.select(
        F.col("url").alias("m_url"),
        F.col("entity_type").alias("m_type"),
        F.col("text").alias("m_text"),
        F.col("start").alias("m_start"),
        F.col("confidence").alias("m_conf"),
    ).where(F.col("entity_type") == entity_type)
    joined = examples.join(m, examples["url"] == m["m_url"], "left")
    hit = F.contains(F.col("m_text"), F.col(contains_col)).cast("int")
    keys = [c for c in examples.columns]
    return (
        joined.groupBy(*keys)
        .agg(
            F.coalesce(F.max(hit), F.lit(0)).cast("boolean").alias("recognized"),
            F.min_by("m_conf", "m_start").alias("first_person_confidence"),
        )
        .withColumn(
            "confidence",
            F.when(F.col("recognized"), F.col("first_person_confidence")),
        )
        .drop("first_person_confidence")
    )


def name_recognition(spark: SparkSession,
                     names: DataFrame | None = None) -> DataFrame:
    """Run the REAL extraction stack over the bias sentences and flag
    recognition — the distributed core of evaluate_ner (:343-376)."""
    from ..operators.extract import extract_documents, mentions_table

    ex = names if names is not None else diverse_names_df(spark)
    docs = ex.select("url", F.col("sentence").alias("text"))
    mentions = mentions_table(extract_documents(docs))
    return _recognition(ex, mentions, "PER", "first_name")


def location_recognition(spark: SparkSession,
                         locations: DataFrame | None = None) -> DataFrame:
    """evaluate_locations (:555-600): LOC mentions containing the name."""
    from ..operators.extract import extract_documents, mentions_table

    ex = locations if locations is not None else diverse_locations_df(spark)
    docs = ex.select("url", F.col("sentence").alias("text"))
    mentions = mentions_table(extract_documents(docs))
    return _recognition(ex, mentions, "LOC", "name")


def _rate(df: DataFrame, key: F.Column, dimension: str) -> DataFrame:
    return (df.where(key.isNotNull())
              .groupBy(key.alias("key"))
              .agg((F.sum(F.col("recognized").cast("int")) / F.count("*"))
                   .alias("rate"),
                   F.count("*").alias("n"))
              .select(F.lit(dimension).alias("dimension"), "key", "rate", "n"))


def bias_rates(recognition: DataFrame) -> DataFrame:
    """All breakdown maps of DemographicBiasResults (:453-459) as one
    tagged-union table: by_ethnicity / by_script / by_gender /
    by_frequency / intersectional (ethnicity_gender) /
    extended_intersectional (ethnicity_gender_frequency)."""
    gendered = recognition.where(F.col("gender").isNotNull())
    parts = [
        _rate(recognition, F.col("ethnicity"), "ethnicity"),
        _rate(recognition, F.col("script"), "script"),
        _rate(recognition, F.col("gender"), "gender"),
        _rate(recognition, F.col("frequency"), "frequency"),
        _rate(gendered, F.concat_ws("_", "ethnicity", "gender"),
              "intersectional"),
        _rate(gendered, F.concat_ws("_", "ethnicity", "gender", "frequency"),
              "extended_intersectional"),
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def bias_summary(recognition: DataFrame) -> DataFrame:
    """Scalar block of DemographicBiasResults (:449-470): overall rate,
    ethnicity parity gap (max−min), script gap |Latin − avg non-Latin|
    (falling back to 0 when only Latin exists), total tested."""
    rates = bias_rates(recognition)
    eth = rates.where(F.col("dimension") == "ethnicity").agg(
        (F.max("rate") - F.min("rate")).alias("ethnicity_parity_gap"))
    script = (rates.where(F.col("dimension") == "script")
              .agg(
                  F.max(F.when(F.col("key") == "Latin", F.col("rate")))
                   .alias("latin"),
                  F.avg(F.when(F.col("key") != "Latin", F.col("rate")))
                   .alias("non_latin"))
              .select(
                  F.abs(F.coalesce(F.col("latin"), F.lit(0.0))
                        - F.coalesce(F.col("non_latin"), F.col("latin"),
                                     F.lit(0.0)))
                  .alias("script_bias_gap")))
    overall = recognition.agg(
        (F.sum(F.col("recognized").cast("int")) / F.count("*"))
        .alias("overall_recognition_rate"),
        F.count("*").alias("total_tested"))
    return overall.crossJoin(eth).crossJoin(script)


def regional_summary(recognition: DataFrame) -> DataFrame:
    """RegionalBiasResults (:672-703): overall rate, by-region parity
    gap (max−min over present regions), total tested."""
    by_region = _rate(recognition, F.col("region"), "region")
    gap = by_region.agg(
        F.when(F.count("*") >= 2, F.max("rate") - F.min("rate"))
         .otherwise(F.lit(0.0)).alias("regional_parity_gap"))
    overall = recognition.agg(
        (F.sum(F.col("recognized").cast("int")) / F.count("*"))
        .alias("overall_recognition_rate"),
        F.count("*").alias("total_tested"))
    return overall.crossJoin(gap)


def regional_rates(recognition: DataFrame) -> DataFrame:
    """by_region + by_script maps of RegionalBiasResults."""
    return _rate(recognition, F.col("region"), "region").unionByName(
        _rate(recognition, F.col("script"), "script"))
