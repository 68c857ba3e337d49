"""MinHash-LSH near-dup detection vs a pure-Python exact reference on
planted near-duplicates (SURVEY M4 / north-star dedup)."""

from __future__ import annotations

import random

from databricks_end_to_end_streaming_spark.queries.dedup import (
    NEARDUP_THRESHOLD,
    SHINGLE_W,
    lsh_candidate_pairs,
    minhash_signatures,
    verify_jaccard,
)

WORDS = (
    "spark stream batch merge join filter window state store shuffle "
    "column row group agg sort hash scan table query plan"
).split()


def make_docs(n=60, n_dups=12, seed=99):
    rng = random.Random(seed)
    docs = []
    for i in range(n):
        docs.append((i, " ".join(rng.choice(WORDS) for _ in range(80))))
    # plant near-duplicates: copy an original and perturb a few words
    planted = []
    for j in range(n_dups):
        src_id, text = docs[rng.randrange(n)]
        toks = text.split()
        for _ in range(3):  # ~4% of tokens changed
            toks[rng.randrange(len(toks))] = rng.choice(WORDS)
        docs.append((n + j, " ".join(toks)))
        planted.append((src_id, n + j))
    return docs, planted


def word_jaccard(a: str, b: str, w: int = SHINGLE_W) -> float:
    sa = {" ".join(a.split()[i : i + w]) for i in range(max(len(a.split()) - w + 1, 1))}
    sb = {" ".join(b.split()[i : i + w]) for i in range(max(len(b.split()) - w + 1, 1))}
    return len(sa & sb) / len(sa | sb)


def test_lsh_finds_planted_neardups_and_values_match_reference(spark):
    docs, planted = make_docs()
    texts = dict(docs)
    df = spark.createDataFrame(docs, "doc_id long, text string")

    sigs = minhash_signatures(df)
    pairs = lsh_candidate_pairs(sigs)
    verified = verify_jaccard(pairs, df)
    got = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in verified.where(f"jaccard >= {NEARDUP_THRESHOLD}").collect()
    }

    # exact ground truth over ALL pairs (quadratic python loop)
    ids = sorted(texts)
    truth = {}
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            j = word_jaccard(texts[a], texts[b])
            if j >= NEARDUP_THRESHOLD:
                truth[(a, b)] = j

    # planted dups really are near-dups, and all were caught
    assert truth, "fixture produced no true near-dup pairs"
    planted_set = {(min(a, b), max(a, b)) for a, b in planted}
    assert planted_set <= set(truth)
    # verification guarantees no false positives; LSH banding is
    # probabilistic on recall (8x4 banding: ~89% at j=0.7), so assert
    # the planted (high-j) pairs plus a recall floor, not set equality
    assert set(got) <= set(truth)
    assert planted_set <= set(got)
    assert len(got) >= 0.8 * len(truth)
    for pair, j in got.items():
        assert abs(truth[pair] - j) < 1e-9


def test_llm_pipeline_neardup_removal_rule(spark):
    """clean_corpus + LSH removal: quality-gated docs drop, exact dups
    keep the lowest id, near-dup pairs keep the lower id."""
    import pyspark.sql.functions as F

    from databricks_end_to_end_streaming_spark.queries.dedup import (
        NEARDUP_THRESHOLD,
        lsh_candidate_pairs,
        minhash_signatures,
        verify_jaccard,
    )
    from databricks_end_to_end_streaming_spark.queries.pipeline import clean_corpus

    rng = random.Random(42)
    base = " ".join(rng.choice(WORDS) for _ in range(80))
    near = base.split()
    near[3] = "changed"
    docs = [
        (0, base, "en"),
        (1, " ".join(near), "en"),  # near-dup of 0 -> dropped
        (2, base, "en"),  # exact dup of 0 -> dropped (higher id)
        (3, "too short", "en"),  # quality-gated
        (4, " ".join(rng.choice(WORDS) for _ in range(60)), "de"),  # kept
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string, lang string")
    kept = clean_corpus(df)
    assert {r["doc_id"] for r in kept.collect()} == {0, 1, 4}
    sigs = minhash_signatures(kept)
    pairs = verify_jaccard(lsh_candidate_pairs(sigs), kept).where(
        F.col("jaccard") >= NEARDUP_THRESHOLD
    )
    losers = {r["doc_b"] for r in pairs.collect()}
    assert losers == {1}
    final = kept.join(
        pairs.select(F.col("doc_b").alias("doc_id")).distinct(), "doc_id", "left_anti"
    )
    assert {r["doc_id"] for r in final.collect()} == {0, 4}


def test_minhash_signature_is_deterministic(spark):
    docs, _ = make_docs(n=10, n_dups=0)
    df = spark.createDataFrame(docs, "doc_id long, text string")
    s1 = {r["doc_id"]: (r["h0"], r["h7"]) for r in minhash_signatures(df).collect()}
    s2 = {r["doc_id"]: (r["h0"], r["h7"]) for r in minhash_signatures(df).collect()}
    assert s1 == s2


def test_fuzzy_decontamination_flags_planted_contamination(spark, tmp_path):
    """Plant paraphrased benchmark leaks into the corpus slice and run
    the registered fuzzy-decontamination query over a synthetic
    documents table: every contaminated doc (and nothing else) must be
    flagged, with max_jaccard matching the exact word-shingle jaccard."""
    from databricks_end_to_end_streaming_spark.queries import all_queries

    rng = random.Random(41)
    rows = []
    # benchmark docs: ids divisible by 97 (0, 97, 194)
    bench_texts = {}
    for bid in (0, 97, 194):
        t = " ".join(rng.choice(WORDS) for _ in range(80))
        bench_texts[bid] = t
        rows.append((bid, t))
    # clean corpus docs
    for i in range(1, 30):
        rows.append((i, " ".join(rng.choice(WORDS) for _ in range(80))))
    # contaminated corpus docs: light paraphrases of benchmark items
    contaminated = []
    for k, bid in enumerate((0, 97)):
        toks = bench_texts[bid].split()
        for _ in range(3):
            toks[rng.randrange(len(toks))] = rng.choice(WORDS)
        cid = 50 + k
        rows.append((cid, " ".join(toks)))
        contaminated.append((cid, bid))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    df.write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    out = {
        r["doc_id"]: r["max_jaccard"]
        for r in all_queries()["decontaminate_minhash_lsh"](
            spark, str(tmp_path)
        ).collect()
    }
    expect = {
        cid
        for cid, bid in contaminated
        if word_jaccard(
            dict(rows)[cid], bench_texts[bid]
        ) >= NEARDUP_THRESHOLD
    }
    assert set(out) == expect and len(expect) > 0
    for cid, bid in contaminated:
        if cid in out:
            assert abs(
                out[cid] - word_jaccard(dict(rows)[cid], bench_texts[bid])
            ) < 1e-12


def test_prefix_filter_join_exact_at_boundary(spark, tmp_path):
    """Planted pairs straddling t=0.6: J exactly at threshold is kept,
    just below is excluded, and the result agrees with brute force."""
    import itertools

    from databricks_end_to_end_streaming_spark.queries.dedup import (
        PPJOIN_THRESHOLD,
        jaccard_prefix_filter_join,
    )

    # doc texts engineered over 3-word shingles: docs 1/2 share enough
    # consecutive words for J >= 0.6; doc 3 shares a little; doc 4 none.
    base = "alpha beta gamma delta epsilon zeta eta theta"
    rows = [
        (1, base + " iota kappa", "en", "s", 1),
        (2, base + " iota lambda", "en", "s", 1),     # high overlap
        (3, "alpha beta gamma mu nu xi omicron pi", "en", "s", 1),
        (4, "one two three four five six", "en", "s", 1),
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.parquet(f"{tmp_path}/documents.parquet")
    got = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in jaccard_prefix_filter_join(spark, str(tmp_path)).collect()
    }

    # brute force over the same shingle definition
    def shingles(t):
        w = t.lower().split()
        return {" ".join(w[i : i + 3]) for i in range(max(len(w) - 2, 1))}

    sh = {d: shingles(t) for d, t, *_ in rows}
    want = {}
    for a, b in itertools.combinations(sorted(sh), 2):
        inter = len(sh[a] & sh[b])
        j = inter / (len(sh[a]) + len(sh[b]) - inter)
        if j >= PPJOIN_THRESHOLD:
            want[(a, b)] = j
    assert set(got) == set(want) and (1, 2) in got and (1, 4) not in got
    for k in got:
        assert abs(got[k] - want[k]) < 1e-12


def test_neardup_safe_split_never_straddles_clusters(spark):
    """The invariant the query exists for: every near-dup cluster lands
    ENTIRELY inside one split — no near-duplicate pair can leak between
    train and test. Also: the per-doc split (dataset_split_deterministic
    recipe) WOULD straddle on this corpus, proving the cluster-level
    hash is load-bearing, not decorative."""
    import pyspark.sql.functions as F

    from databricks_end_to_end_streaming_spark.queries.dedup import (
        neardup_cluster_relation,
    )
    from databricks_end_to_end_streaming_spark.tables import load_table

    sf = "/root/testdata/sf0.01"
    d = load_table(spark, sf, "documents")
    clusters = neardup_cluster_relation(d)
    assign = d.join(F.broadcast(clusters), "doc_id", "left").withColumn(
        "cluster_id", F.coalesce(F.col("cluster_id"), F.col("doc_id"))
    )

    from databricks_end_to_end_streaming_spark.queries.text import (
        split_bucket,
    )

    by_cluster = assign.withColumn("split", split_bucket(F.col("cluster_id")))
    straddling = (
        by_cluster.groupBy("cluster_id")
        .agg(F.countDistinct("split").alias("k"))
        .where(F.col("k") > 1)
        .count()
    )
    assert straddling == 0

    # real multi-doc clusters exist, so the invariant is non-vacuous
    multi = (
        clusters.groupBy("cluster_id").count().where(F.col("count") > 1)
    )
    assert multi.count() > 0

    # the naive per-DOC hash does straddle at least one cluster here
    by_doc = assign.withColumn("split", split_bucket(F.col("doc_id")))
    naive_straddling = (
        by_doc.groupBy("cluster_id")
        .agg(F.countDistinct("split").alias("k"))
        .where(F.col("k") > 1)
        .count()
    )
    assert naive_straddling > 0


def test_line_dedup_keeps_first_occurrence_and_reassembles_in_order(spark):
    """dedup_lines_first_occurrence core: the (doc_id, seg_idx)-minimal
    copy of every line survives, later copies vanish, and surviving
    segments rejoin in original position order."""
    from databricks_end_to_end_streaming_spark.queries.dedup import (
        LINE_W,
        _first_occurrence_kept,
        cleaned_lines_doc,
        line_segments,
    )

    def line(tag):
        return " ".join(f"{tag}{j}" for j in range(LINE_W))

    a, b, c = line("a"), line("b"), line("c")
    docs = spark.createDataFrame(
        [(10, f"{a} {b}"), (20, f"{b} {c} {b}"), (30, a)],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: (r.n_lines, r.n_kept, r.cleaned_text)
        for r in cleaned_lines_doc(
            _first_occurrence_kept(line_segments(docs))
        ).collect()
    }
    assert got[10] == (2, 2, f"{a} {b}")
    assert got[20] == (3, 1, c)  # both b copies lose to doc 10's
    assert got[30] == (1, 0, "")  # fully scrubbed doc still surfaces


def test_winnowing_density_and_match_guarantee(spark):
    """Schleimer et al. 2003 §3: (a) expected fingerprint density on
    random text is ~2/(w+1); (b) GUARANTEE — any shared token run of
    length >= w + k - 1 produces at least one shared fingerprint; (c)
    the df-cap drops corpus-wide boilerplate fingerprints from pairing."""
    import random

    import pyspark.sql.functions as F

    from databricks_end_to_end_streaming_spark.queries.dedup import (
        WINNOW_DF_CAP,
        WINNOW_K,
        WINNOW_W,
        winnow_fingerprints,
    )

    rng = random.Random(7)
    vocab = [f"tok{i}" for i in range(5000)]  # large vocab: no accidental grams

    def rand_text(n):
        return " ".join(rng.choice(vocab) for _ in range(n))

    shared_run = rand_text(WINNOW_W + WINNOW_K - 1)  # exactly t tokens
    rows = [(i, rand_text(200)) for i in range(40)]
    # plant the run mid-document in docs 100 and 101
    rows.append((100, rand_text(90) + " " + shared_run + " " + rand_text(90)))
    rows.append((101, rand_text(50) + " " + shared_run + " " + rand_text(130)))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    fps = winnow_fingerprints(docs).persist()
    try:
        # (a) density over the random docs: 2/(w+1)±50% (random-text law)
        n_fp = fps.where("doc_id < 100").count()
        n_windows = 40 * (200 - (WINNOW_K + WINNOW_W - 2))
        density = n_fp / n_windows
        assert abs(density - 2 / (WINNOW_W + 1)) < 0.5 * 2 / (WINNOW_W + 1)
        # (b) the guarantee: docs 100 and 101 share >= 1 fingerprint
        shared = (
            fps.where("doc_id = 100")
            .select("fp")
            .join(fps.where("doc_id = 101").select("fp"), "fp", "leftsemi")
            .count()
        )
        assert shared >= 1
        # random docs almost surely share nothing (5000^4 gram space)
        cross = (
            fps.where("doc_id = 0")
            .select("fp")
            .join(fps.where("doc_id = 1").select("fp"), "fp", "leftsemi")
            .count()
        )
        assert cross == 0
    finally:
        fps.unpersist()

    # (c) boilerplate cap: a run shared by MORE than WINNOW_DF_CAP docs
    # must not generate pairs
    boiler = rand_text(WINNOW_W + WINNOW_K - 1)
    brows = [
        (i, rand_text(40) + " " + boiler + " " + rand_text(40))
        for i in range(WINNOW_DF_CAP + 2)
    ]
    bdocs = spark.createDataFrame(brows, "doc_id long, text string")
    bfps = winnow_fingerprints(bdocs)
    dfc = bfps.groupBy("fp").agg(F.count("*").alias("df"))
    hot = dfc.where(F.col("df") > WINNOW_DF_CAP).count()
    assert hot >= 1  # the boilerplate fingerprint really is ubiquitous
