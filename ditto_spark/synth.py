"""Seeded synthetic ER fixtures (FIXTURES.md F1-F7).

Deterministic generators that plant duplicate clusters with corruptions
mirroring the reference's augmenters:
  - char typos (add/delete/substitute)   create_dataset.py:42-60,
                                         augment_csv_data.py:23-57
  - abbreviations                        create_dataset.py:22-40,74-85
  - word removal                         create_dataset.py:62-72
  - field nulling                        create_dataset.py:87-89
  - span reorder/drop                    ditto_light/augment.py:35-52,161-183

Everything is keyed off (seed, entity index) so results are independent of
partitioning. Two paths:
  * ``gen_docs_pandas`` — driver-side pandas for unit tests (tiny).
  * ``distributed_docs`` — mapInPandas over ``spark.range`` for bench-scale
    input; per-row determinism means the same table at any parallelism.
"""

from __future__ import annotations

import random
from typing import Iterator

import pandas as pd

FIRST = [
    "james", "mary", "robert", "patricia", "john", "jennifer", "michael",
    "linda", "david", "elizabeth", "william", "barbara", "richard", "susan",
    "joseph", "jessica", "thomas", "sarah", "charles", "karen", "aya",
    "mohamed", "wei", "fatima", "carlos", "ana", "yuki", "ivan", "lena",
    "omar",
]
LAST = [
    "smith", "johnson", "williams", "brown", "jones", "garcia", "miller",
    "davis", "rodriguez", "martinez", "hernandez", "lopez", "gonzalez",
    "wilson", "anderson", "thomas", "taylor", "moore", "jackson", "martin",
    "tanaka", "chen", "petrov", "haddad", "kim", "nguyen", "silva", "rossi",
    "kumar", "ali",
]
STREET = [
    "main", "oak", "pine", "maple", "cedar", "elm", "view", "lake",
    "hill", "park", "north", "south", "river", "sunset", "washington",
]
CITY = [
    "springfield", "rivertown", "lakeside", "fairview", "georgetown",
    "salem", "greenville", "bristol", "clinton", "madison",
]
BRAND = [
    "acme", "globex", "initech", "umbrella", "stark", "wayne", "hooli",
    "cyberdyne", "tyrell", "wonka",
]

ABBREV = {
    "street": "st", "avenue": "ave", "road": "rd", "north": "n",
    "south": "s", "william": "wm", "robert": "rob", "michael": "mike",
    "elizabeth": "liz", "jennifer": "jen", "washington": "wash",
}
ALPHA = "abcdefghijklmnopqrstuvwxyz"


def _typo(rng: random.Random, word: str) -> str:
    """Char-level corruption (create_dataset.py:42-60 shape)."""
    if len(word) < 3:
        return word
    op = rng.randrange(3)
    i = rng.randrange(len(word))
    if op == 0:  # substitute
        return word[:i] + rng.choice(ALPHA) + word[i + 1:]
    if op == 1:  # delete
        return word[:i] + word[i + 1:]
    return word[:i] + rng.choice(ALPHA) + word[i:]  # insert


def _corrupt_text(rng: random.Random, text: str) -> str:
    words = text.split()
    out = []
    for w in words:
        r = rng.random()
        if r < 0.12:
            out.append(_typo(rng, w))
        elif r < 0.20 and w in ABBREV:
            out.append(ABBREV[w])
        elif r < 0.26:
            continue  # word removal
        else:
            out.append(w)
    return " ".join(out) if out else text


def _base_entity(rng: random.Random, eid: int) -> list[dict]:
    """One clean entity as a span list (kind/text/media_ref/offset)."""
    name = f"{rng.choice(FIRST)} {rng.choice(LAST)}"
    addr = (
        f"{rng.randrange(1, 9999)} {rng.choice(STREET)} "
        f"{rng.choice(['street', 'avenue', 'road'])} {rng.choice(CITY)}"
    )
    spans = [
        {"kind": "name", "text": name, "media_ref": None},
        {"kind": "address", "text": addr, "media_ref": None},
        {"kind": "brand", "text": rng.choice(BRAND), "media_ref": None},
        {"kind": "price", "text": f"{rng.uniform(1, 500):.2f}", "media_ref": None},
        {"kind": "id", "text": f"SKU{eid:06d}X{rng.randrange(10**6):06d}",
         "media_ref": None},
    ]
    if rng.random() < 0.4:
        spans.append(
            {"kind": "media", "text": "",
             "media_ref": f"img://bucket/{eid}/{rng.randrange(999)}.jpg"}
        )
    return spans


def _corrupt_spans(rng: random.Random, spans: list[dict]) -> list[dict]:
    out = []
    for s in spans:
        if rng.random() < 0.10:
            continue  # span drop (augment.py:161-183 analog)
        s2 = dict(s)
        if s2["text"] and rng.random() < 0.7:
            s2["text"] = _corrupt_text(rng, s2["text"])
        if rng.random() < 0.08:
            s2["text"] = ""  # field nulling (create_dataset.py:87-89)
        out.append(s2)
    if len(out) > 1 and rng.random() < 0.15:  # span reorder
        i = rng.randrange(len(out) - 1)
        out[i], out[i + 1] = out[i + 1], out[i]
    if not out:
        out = [dict(spans[0])]
    return out


def gen_docs_pandas(
    n_entities: int = 200, seed: int = 42, max_dups: int = 4
) -> tuple[pd.DataFrame, pd.DataFrame]:
    """Returns (docs, truth). docs: doc_id, spans (list-of-dict with
    monotone offsets). truth: doc_id -> cluster_id (never fed to engine)."""
    rng = random.Random(seed)
    doc_rows, truth_rows = [], []
    doc_n = 0
    for eid in range(n_entities):
        base = _base_entity(rng, eid)
        n_copies = 1 + (rng.randrange(max_dups + 1) if rng.random() < 0.7 else 0)
        for c in range(n_copies):
            spans = [dict(s) for s in base] if c == 0 else _corrupt_spans(rng, base)
            for off, s in enumerate(spans):
                s["offset"] = off
            doc_id = f"d{doc_n:06d}"
            doc_rows.append({"doc_id": doc_id, "spans": spans})
            truth_rows.append({"doc_id": doc_id, "cluster_id": eid})
            doc_n += 1
    return pd.DataFrame(doc_rows), pd.DataFrame(truth_rows)


def docs_df(spark, n_entities: int = 200, seed: int = 42, max_dups: int = 4):
    """Fixture docs as a Spark DataFrame with DOC_SCHEMA."""
    from ditto_spark.schema import DOC_SCHEMA

    pdf, _ = gen_docs_pandas(n_entities, seed, max_dups)
    rows = [(r["doc_id"],
             [(s["kind"], s["text"], s["media_ref"], s["offset"])
              for s in r["spans"]])
            for r in pdf.to_dict("records")]
    return spark.createDataFrame(rows, DOC_SCHEMA)


def truth_df(spark, n_entities: int = 200, seed: int = 42, max_dups: int = 4):
    _, truth = gen_docs_pandas(n_entities, seed, max_dups)
    return spark.createDataFrame(truth)


def distributed_docs(spark, n_docs: int, seed: int = 42, dup_rate: float = 0.6,
                     hot_fraction: float = 0.0):
    """Bench-scale generator: one doc per row of spark.range(n_docs),
    deterministic per doc index (independent of partitioning).

    Duplicates are planted by mapping several doc indexes to one entity id:
    entity = idx // 3 for a dup_rate fraction, else unique.

    ``hot_fraction`` > 0 plants a genuinely Zipfian head: that fraction
    of doc indexes (every round(1/f)-th) are all corrupted copies of ONE
    entity — their serialized texts share shingles, minhash band keys
    and the sorted-neighborhood key region, so every blocking pass sees
    one massive hot key (the skew-endurance fixture, VERDICT r4 #6).
    """
    from ditto_spark.schema import DOC_SCHEMA

    hot_every = round(1 / hot_fraction) if hot_fraction > 0 else 0

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for idx in pdf["id"].tolist():
                rng = random.Random((seed << 20) ^ idx)
                if hot_every and idx % hot_every == 0:
                    base_rng = random.Random(seed << 22)
                    base = _base_entity(base_rng, 0)
                    spans = (_corrupt_spans(rng, base) if idx
                             else [dict(s) for s in base])
                    for off, s in enumerate(spans):
                        s["offset"] = off
                    out.append({"doc_id": f"d{idx:09d}", "spans": spans})
                    continue
                if rng.random() < dup_rate:
                    eid = idx // 3
                    base_rng = random.Random((seed << 21) ^ eid)
                    base = _base_entity(base_rng, eid)
                    spans = (_corrupt_spans(rng, base)
                             if idx % 3 else [dict(s) for s in base])
                else:
                    eid = 10_000_000 + idx
                    spans = _base_entity(rng, eid)
                for off, s in enumerate(spans):
                    s["offset"] = off
                out.append({"doc_id": f"d{idx:09d}", "spans": spans})
            yield pd.DataFrame(out)

    return spark.range(n_docs).mapInPandas(gen, DOC_SCHEMA)


def cluster_graph_pandas(seed: int = 42) -> tuple[pd.DataFrame, dict[str, str]]:
    """F7: edge list with known components — chains, a triangle, a bridge,
    singletons (as isolated self-loops), and a 50-edge hub for skew."""
    edges = []
    # chain a0-a1-...-a5
    for i in range(5):
        edges.append((f"a{i}", f"a{i+1}"))
    # triangle
    edges += [("t0", "t1"), ("t1", "t2"), ("t2", "t0")]
    # two components joined by a bridge
    edges += [("b0", "b1"), ("b2", "b3"), ("b1", "b2")]
    # skewed hub
    edges += [("hub", f"h{i}") for i in range(50)]
    expected: dict[str, str] = {}
    for i in range(6):
        expected[f"a{i}"] = "a0"
    for n in ("t0", "t1", "t2"):
        expected[n] = "t0"
    for n in ("b0", "b1", "b2", "b3"):
        expected[n] = "b0"
    expected["hub"] = "h0"
    for i in range(50):
        expected[f"h{i}"] = "h0"
    return pd.DataFrame(edges, columns=["src", "dst"]), expected
