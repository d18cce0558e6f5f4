"""Text functions, dedup suite, similarity search."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from ditto_spark.functions.text import (
    FP_MOD,
    fingerprint,
    lang_id,
    quality_score,
    token_count_bpe,
    token_count_ws,
)
from ditto_spark.operators.dedup import (
    embedding_near_dups,
    exact_duplicates,
    minhash_near_dups,
    ngram_jaccard_pairs,
    simhash_df,
    simhash_near_dups,
)
from ditto_spark.operators.similarity import ann_topk_lsh, cosine, cosine_topk


def test_token_counts_and_lang(spark):
    df = spark.createDataFrame(
        [("the cat and the dog, it is big!",),
         ("el perro y la casa que no es",),
         ("zzz qqq",)],
        "text string",
    )
    rows = df.select(
        token_count_ws(F.col("text")).alias("ws"),
        token_count_bpe(F.col("text")).alias("bpe"),
        lang_id(F.col("text")).alias("lang"),
    ).collect()
    assert rows[0].ws == 8
    # the|cat|and|the|dog|,|it|is|big|! -> 10 pieces
    assert rows[0].bpe == 10
    assert rows[0].lang == "en"
    assert rows[1].lang == "es"
    assert rows[2].lang == "und"


def test_quality_and_fingerprint_deterministic(spark):
    df = spark.createDataFrame(
        [("d1", "the quick brown fox jumps over the lazy dog"),
         ("d2", "!!!! ???? ....")],
        "id string, text string",
    )
    rows = {r.id: r for r in df.select(
        "id",
        quality_score(F.col("text")).alias("q"),
        fingerprint(F.col("text")).alias("fp"),
    ).collect()}
    assert rows["d1"].q > rows["d2"].q
    assert 0 <= rows["d1"].fp < FP_MOD
    # order sensitivity
    df2 = spark.createDataFrame([("dog lazy the over jumps fox brown quick the",)],
                                "text string")
    fp2 = df2.select(fingerprint(F.col("text")).alias("fp")).first().fp
    assert fp2 != rows["d1"].fp


def test_exact_duplicates(spark):
    df = spark.createDataFrame(
        [("a", "same text"), ("b", "same text"), ("c", "other")],
        "id string, text string",
    )
    got = exact_duplicates(df, "id", "text").collect()
    assert len(got) == 1
    assert got[0].n_dups == 2 and got[0].representative == "a"


def test_ngram_jaccard_pairs(spark):
    df = spark.createDataFrame(
        [("a", "one two three four five"),
         ("b", "one two three four six"),
         ("c", "totally different words here now")],
        "id string, text string",
    )
    got = {(r.left_id, r.right_id): r.jaccard
           for r in ngram_jaccard_pairs(df, "id", "text", n=3,
                                        threshold=0.2).collect()}
    # shingles(a) = {one two three, two three four, three four five}
    # shingles(b) = {one two three, two three four, three four six}
    # jaccard = 2/4 = 0.5
    assert got == {("a", "b"): 0.5}


def test_minhash_near_dups_recovers_exact_jaccard(spark):
    df = spark.createDataFrame(
        [("a", "alpha beta gamma delta epsilon zeta"),
         ("b", "alpha beta gamma delta epsilon eta"),
         ("c", "unrelated content entirely different")],
        "id string, text string",
    )
    # jaccard(a,b)=0.6 -> needs narrow bands (2 rows) to collide reliably
    got = {(r.left_id, r.right_id) for r in
           minhash_near_dups(df, "id", "text", n_hashes=16, bands=8,
                             verify_threshold=0.3).collect()}
    assert ("a", "b") in got and all("c" not in p for p in got)


def test_minhash_near_dups_bucket_cap_bounds_blob_fanout(spark):
    """A boilerplate blob (many trivial variants of one template) lands
    in shared band buckets; the finite default cap bounds the pair
    fanout to cap-choose-2 per bucket while uncapped goes blob²
    (VERDICT r5 #1). The cap must not cost pairs OUTSIDE the blob."""
    from pyspark.sql import functions as F

    template = ("standard legal boilerplate disclaimer text repeated on "
                "every page of the corpus without any warranty serial")
    blob = [(f"b{i}", f"{template} {i}") for i in range(12)]
    distinct = [("x", "alpha beta gamma delta epsilon zeta eta theta"),
                ("y", "alpha beta gamma delta epsilon zeta eta iota")]
    df = spark.createDataFrame(blob + distinct, "id string, text string")

    kw = dict(n_hashes=16, bands=8, verify_threshold=0.3)
    uncapped = {(r.left_id, r.right_id) for r in
                minhash_near_dups(df, "id", "text",
                                  max_bucket_rows=None, **kw).collect()}
    capped = {(r.left_id, r.right_id) for r in
              minhash_near_dups(df, "id", "text",
                                max_bucket_rows=4, **kw).collect()}
    blob_unc = {p for p in uncapped if p[0].startswith("b")}
    blob_cap = {p for p in capped if p[0].startswith("b")}
    # uncapped: near-complete blob clique (12*11/2=66); capped: bounded
    # by cap²-ish per bucket and strictly fewer
    assert len(blob_unc) > 30
    assert 0 < len(blob_cap) < len(blob_unc)
    assert len(blob_cap) <= 8 * 4 * 3 / 2  # bands x C(cap,2) hard bound
    # pairs outside the blob are unaffected by the cap
    assert ("x", "y") in uncapped and ("x", "y") in capped
    # the default cap (1000) never binds on small buckets: identical to
    # the uncapped baseline here
    default = {(r.left_id, r.right_id) for r in
               minhash_near_dups(df, "id", "text", **kw).collect()}
    assert default == uncapped


def test_simhash_properties(spark):
    base = ("the quick brown fox jumps over the lazy dog and runs across "
            "the wide green field every sunny morning with great joy")
    df = spark.createDataFrame(
        [("a", base),
         ("b", base.replace("dog", "cat")),  # hamming 2 (precomputed)
         ("c", "entirely unrelated text about spark engines")],
        "id string, text string",
    )
    sh = {r.id: r.simhash for r in simhash_df(df, "id", "text").collect()}
    def ham(x, y):
        return bin(x ^ y).count("1")
    assert ham(sh["a"], sh["b"]) == 2  # matches the local reference impl
    assert ham(sh["a"], sh["c"]) > 3
    assert all(0 <= v < 2 ** 32 for v in sh.values())
    # banded join guarantees recall for hamming <= 3 (4 bands, pigeonhole)
    near = {(r.left_id, r.right_id): r.hamming
            for r in simhash_near_dups(df, "id", "text", max_hamming=3
                                       ).collect()}
    assert near == {("a", "b"): 2}


def test_cosine_topk_exact(spark):
    df = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.9, 0.1]), (2, [0.0, 1.0]), (3, [1.0, 0.05])],
        "vec_id int, embedding array<double>",
    )
    out = cosine_topk(df, df.filter("vec_id = 0"), k=2)
    rows = out.orderBy("rank").collect()
    assert [r.neighbor_id for r in rows] == [3, 1]
    expect = (0.9) / (1.0 * math.sqrt(0.81 + 0.01))
    assert abs(rows[1].cosine - round(expect, 6)) < 1e-9


def test_ann_lsh_subset_of_exact(spark):
    import random

    rng = random.Random(1)
    rows = [(i, [rng.gauss(0, 1) for _ in range(16)]) for i in range(200)]
    df = spark.createDataFrame(rows, "vec_id int, embedding array<double>")
    queries = df.filter("vec_id < 5")
    exact = cosine_topk(df, queries, k=5)
    approx = ann_topk_lsh(df, queries, k=5, n_bits=4)
    # approx neighbors must each be genuine vectors with correct cosine:
    joined = approx.alias("x").join(
        exact.alias("e"),
        (F.col("x.query_id") == F.col("e.query_id"))
        & (F.col("x.neighbor_id") == F.col("e.neighbor_id")),
    ).select(F.col("x.cosine").alias("ca"), F.col("e.cosine").alias("ce"))
    assert joined.filter(F.col("ca") != F.col("ce")).count() == 0
    # and with 4 bits on gaussian data, recall is nonzero
    assert approx.count() > 0


def test_embedding_near_dups(spark):
    df = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.999, 0.001]), (2, [0.0, 1.0])],
        "vec_id int, embedding array<double>",
    )
    got = {(r.left_id, r.right_id) for r in
           embedding_near_dups(df, threshold=0.99).collect()}
    assert got == {(0, 1)}


def test_ivf_topk_recall_and_exactness(spark):
    import random

    from ditto_spark.operators.similarity import ivf_topk

    rng = random.Random(3)
    # clustered data: 4 gaussian blobs -> IVF cells align with blobs
    centers = [[5, 0, 0, 0], [0, 5, 0, 0], [0, 0, 5, 0], [0, 0, 0, 5]]
    rows = [(i, [c + rng.gauss(0, 0.3) for c in centers[i % 4]])
            for i in range(400)]
    df = spark.createDataFrame(rows, "vec_id int, embedding array<double>")
    queries = df.filter("vec_id < 8")
    exact = cosine_topk(df, queries, k=5)
    approx = ivf_topk(df, queries, k=5, n_cells=4, n_probe=1)
    # cosines must agree exactly where pairs overlap
    j = approx.alias("x").join(
        exact.alias("e"),
        (F.col("x.query_id") == F.col("e.query_id"))
        & (F.col("x.neighbor_id") == F.col("e.neighbor_id")))
    assert j.filter(F.col("x.cosine") != F.col("e.cosine")).count() == 0
    # blob-aligned cells -> high recall even with n_probe=1
    hit = j.count()
    total = exact.count()
    assert hit / total > 0.9, (hit, total)


def test_ivf_multi_probe_full_recall_on_blobs(spark):
    import random

    from ditto_spark.operators.similarity import ivf_topk

    rng = random.Random(3)
    centers = [[5, 0, 0, 0], [0, 5, 0, 0], [0, 0, 5, 0], [0, 0, 0, 5]]
    rows = [(i, [c + rng.gauss(0, 0.3) for c in centers[i % 4]])
            for i in range(200)]
    df = spark.createDataFrame(rows, "vec_id int, embedding array<double>")
    q = df.filter("vec_id < 6")
    exact = cosine_topk(df, q, k=5)
    approx = ivf_topk(df, q, k=5, n_cells=4, n_probe=2)
    j = approx.alias("x").join(
        exact.alias("e"),
        (F.col("x.query_id") == F.col("e.query_id"))
        & (F.col("x.neighbor_id") == F.col("e.neighbor_id")))
    assert j.count() == exact.count()  # 2-probe covers the blob overlap
    assert j.filter(F.col("x.cosine") != F.col("e.cosine")).count() == 0


def test_ivf_numpy_assignment_matches_literal(spark):
    """The broadcast-numpy cell assignment (the >256-cell scale path,
    VERDICT r3 #2) must route pairs identically to the codegen
    centroid-literal path on the same quantizer."""
    import random

    from ditto_spark.operators.similarity import ivf_topk

    rng = random.Random(5)
    centers = [[5, 0, 0, 0], [0, 5, 0, 0], [0, 0, 5, 0], [0, 0, 0, 5]]
    rows = [(i, [c + rng.gauss(0, 0.3) for c in centers[i % 4]])
            for i in range(300)]
    df = spark.createDataFrame(rows, "vec_id int, embedding array<double>")
    q = df.filter("vec_id < 10")
    lit = ivf_topk(df, q, k=5, n_cells=4, n_probe=2,
                   broadcast_assign=False)
    npy = ivf_topk(df, q, k=5, n_cells=4, n_probe=2,
                   broadcast_assign=True)
    a = {(r.query_id, r.neighbor_id, r.cosine) for r in lit.collect()}
    b = {(r.query_id, r.neighbor_id, r.cosine) for r in npy.collect()}
    assert a == b


def test_rp_lsh_numpy_buckets_match_expression(spark):
    """The vectorized sign-matrix bucketing equals the SQL-reproducible
    expression path bit-for-bit on ARBITRARY float vectors: both paths
    quantize each element to floor(v * RP_QUANT) and sum exactly in
    int64, so the sign bits cannot diverge with summation order
    (ADVICE r4 knife-edge fix)."""
    import random

    from ditto_spark.operators.similarity import rp_lsh_buckets

    rng = random.Random(11)
    dim = 16
    rows = [(i, [rng.gauss(0, 1) for _ in range(dim)])
            for i in range(200)]
    df = spark.createDataFrame(rows, "vec_id int, embedding array<double>")
    expr = {r["id"]: r["bucket"]
            for r in rp_lsh_buckets(df, n_bits=8).collect()}
    fast = {r["id"]: r["bucket"]
            for r in rp_lsh_buckets(df, n_bits=8, dim=dim).collect()}
    assert expr == fast


def test_ann_lsh_multiprobe_recall(spark):
    """Hamming-1 multi-probe dominates single-probe: its candidate set
    is a superset (same bucket + every 1-bit-flip bucket), so recall@k
    vs brute-force never drops and on gaussian data measurably rises;
    candidate volume stays bounded at (1 + n_bits) probe buckets."""
    import random

    rng = random.Random(5)
    rows = [(i, [rng.gauss(0, 1) for _ in range(16)]) for i in range(300)]
    df = spark.createDataFrame(rows, "vec_id int, embedding array<double>")
    queries = df.filter("vec_id < 20")
    truth = {(r.query_id, r.neighbor_id)
             for r in cosine_topk(df, queries, k=5).collect()}

    def recall(result):
        got = {(r.query_id, r.neighbor_id) for r in result.collect()}
        return len(got & truth) / len(truth)

    single = recall(ann_topk_lsh(df, queries, k=5, n_bits=4))
    multi = recall(ann_topk_lsh(df, queries, k=5, n_bits=4,
                                multiprobe=True))
    assert multi >= single
    # measured on this deterministic fixture: single 0.25, multi 0.67
    # (probing the 4 Hamming-1 buckets raises recall ~2.7x while the
    # base index is untouched); pin loose floors against regressions
    assert multi >= 0.5
    assert multi > single  # strictly better on this fixture
    # multiprobe results carry correct exact cosines (re-rank unchanged)
    mp = ann_topk_lsh(df, queries, k=5, n_bits=4, multiprobe=True)
    ex = cosine_topk(df, queries, k=300)
    joined = mp.alias("x").join(
        ex.alias("e"),
        (F.col("x.query_id") == F.col("e.query_id"))
        & (F.col("x.neighbor_id") == F.col("e.neighbor_id")))
    assert joined.filter(F.col("x.cosine") != F.col("e.cosine")).count() == 0


def test_embedding_near_dups_lsh_subset_and_recall(spark):
    """The LSH near-dup path returns a SUBSET of the brute-force pairs
    with identical cosines, and near-identical vectors (the dedup
    target population) are recovered: a 0.999-cosine pair flips a
    hyperplane only on a knife edge, so Hamming<=1 probing catches it."""
    import random

    from ditto_spark.operators.dedup import embedding_near_dups
    from ditto_spark.operators.similarity import embedding_near_dups_lsh

    rng = random.Random(23)
    dim = 16
    base = [[rng.gauss(0, 1) for _ in range(dim)] for _ in range(60)]
    rows = [(i, v) for i, v in enumerate(base)]
    # 10 near-identical copies (tiny perturbation)
    rows += [(100 + i, [x + rng.gauss(0, 0.01) for x in base[i]])
             for i in range(10)]
    df = spark.createDataFrame(rows, "vec_id int, embedding array<double>")
    exact = {(r.left_id, r.right_id): r.cosine for r in
             embedding_near_dups(df, threshold=0.95).collect()}
    lsh = {(r.left_id, r.right_id): r.cosine for r in
           embedding_near_dups_lsh(df, threshold=0.95, n_bits=8,
                                   multiprobe=True).collect()}
    assert set(lsh) <= set(exact)
    for k, v in lsh.items():
        assert v == exact[k]
    # every planted 0.999-dup pair recovered
    planted = {(i, 100 + i) for i in range(10) if (i, 100 + i) in exact}
    assert planted and planted <= set(lsh)
    # vectorized bucketing agrees with the expression path end-to-end
    lsh_np = {(r.left_id, r.right_id): r.cosine for r in
              embedding_near_dups_lsh(df, threshold=0.95, n_bits=8,
                                      dim=dim, multiprobe=True).collect()}
    assert lsh_np == lsh


def test_repeated_ngram_spans_planted(spark):
    """Exact-substring dedup: a 4-token span planted in 3 docs is found
    at the right positions with ndocs=3; unique text and docs shorter
    than n emit nothing (full windows only)."""
    from ditto_spark.operators.dedup import (repeated_ngram_spans,
                                             repeated_span_coverage)

    boiler = "all rights reserved contact us"  # 5 tokens
    rows = [
        ("a", f"alpha beta {boiler} gamma"),
        ("b", f"{boiler} delta epsilon zeta"),
        ("c", f"unique words here then {boiler}"),
        ("d", "totally different content with no overlap at all"),
        ("e", "too short"),  # < n tokens
    ]
    df = spark.createDataFrame(rows, "doc_id string, text string")
    spans = repeated_ngram_spans(df, "doc_id", "text", n=4, min_df=2)
    got = {(r.doc_id, r.start_pos): r.ndocs for r in spans.collect()}
    # the 5-token boilerplate yields two overlapping 4-gram windows,
    # each present in docs a (start 2), b (start 0), c (start 4)
    for doc, base in (("a", 2), ("b", 0), ("c", 4)):
        assert got.get((doc, base)) == 3
        assert got.get((doc, base + 1)) == 3
    assert not any(d == "d" or d == "e" for d, _ in got)

    cov = {r.doc_id: (r.n_tokens, r.covered, r.coverage)
           for r in repeated_span_coverage(
               df, "doc_id", "text", n=4, min_df=2).collect()}
    # doc b: positions 0..4 covered (two overlapping windows union) of 8
    assert cov["b"] == (8, 5, 0.625)
    assert cov["d"] == (8, 0, 0.0)
    assert cov["e"][1] == 0
    # coverage always within [0, 1] and covered <= n_tokens
    for n_tok, covd, c in cov.values():
        assert 0 <= covd <= n_tok and 0.0 <= c <= 1.0


def test_cross_corpus_contamination_planted(spark):
    """Planted overlap: test doc 10 copies a full train 4-gram (hit),
    doc 11 shares no window, doc 12 is too short for one full window."""
    from ditto_spark.operators.dedup import cross_corpus_contamination

    train = spark.createDataFrame(
        [(0, "the quick brown fox jumps over the lazy dog"),
         (2, "completely different training content here")],
        "doc_id long, text string")
    test = spark.createDataFrame(
        [(10, "note the quick brown fox appears here"),
         (11, "nothing shared with training at all whatsoever"),
         (12, "too short")],
        "doc_id long, text string")
    out = {r.doc_id: r for r in cross_corpus_contamination(
        train, test, "doc_id", "text", n=4, min_hits=1).collect()}
    assert len(out) == 3
    # doc 10: 4 windows of its 7 tokens; exactly "the quick brown fox"
    # is a train window
    assert out[10].n_grams == 4 and out[10].n_hit_grams == 1
    assert out[10].contaminated == 1 and out[10].hit_fraction == 0.25
    assert out[11].contaminated == 0 and out[11].n_hit_grams == 0
    assert out[12].n_grams == 0 and out[12].contaminated == 0
    assert out[12].hit_fraction == 0.0


def test_semantic_near_dups_from_raw_text(spark):
    """semantic_near_dups: raw text -> per-worker model encode -> RP-LSH
    bucket join -> cosine-verified pairs. Identical texts must pair at
    cosine ~1; disjoint-vocabulary texts must not pair at a high
    threshold."""
    from ditto_spark.operators.dedup import semantic_near_dups

    rows = [("a1", "quarterly report acme revenue growth outlook"),
            ("a2", "quarterly report acme revenue growth outlook"),
            ("b1", "zebra quantum flute harvest migration pattern")]
    df = spark.createDataFrame(rows, "doc_id string, text string")
    got = {(r.left_id, r.right_id): r.cosine
           for r in semantic_near_dups(df, threshold=0.99).collect()}
    key = ("a1", "a2") if ("a1", "a2") in got else ("a2", "a1")
    assert key in got and got[key] >= 0.99
    assert all("b1" not in k for k in got)
    # deterministic across invocations (frozen default encoder)
    again = {(r.left_id, r.right_id): r.cosine
             for r in semantic_near_dups(df, threshold=0.99).collect()}
    assert again == got
