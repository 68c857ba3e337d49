"""Data-quality expectations: declarative rule checks compiled into ONE
aggregation pass per table.

The expectations pattern (Deequ / Great Expectations / Delta Live
Tables "expect" clauses — all public designs) matters at 100 TB for one
reason: naive per-rule checks rescan the table once per rule. Here every
rule over a table becomes a conditional-sum column in a SINGLE scan +
1-row aggregate (map-side partial, nothing shuffles but one row), and
the per-rule report rows are exploded from that one row driver-free.
Uniqueness is the one rule that genuinely needs a shuffle
(count distinct), and it rides the same aggregate.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, SparkSession

from ..tables import load_table
from ..pin import pin
from . import query


def _violations(cond: Column) -> Column:
    """Count rows FAILING the expectation ``cond``."""
    return F.sum(F.when(~cond, 1).otherwise(0)).cast("long")


def expectations_report(
    df: DataFrame, rules: dict[str, Column], uniqueness: str | None = None
) -> DataFrame:
    """(rule, n_checked, n_violations, violation_rate) — one scan.

    ``rules`` maps rule name -> boolean Column that should hold per row;
    ``uniqueness`` optionally names a column expected unique (violations
    = n_rows - n_distinct).
    """
    aggs = [F.count("*").alias("_n")] + [
        _violations(c).alias(f"_v_{i}") for i, (_, c) in enumerate(rules.items())
    ]
    if uniqueness is not None:
        aggs.append(
            (F.count(uniqueness) - F.count_distinct(uniqueness))
            .cast("long")
            .alias("_v_uniq")
        )
    one = df.agg(*aggs)

    entries = [
        F.struct(
            F.lit(name).alias("rule"), F.col(f"_v_{i}").alias("n_violations")
        )
        for i, name in enumerate(rules)
    ]
    if uniqueness is not None:
        entries.append(
            F.struct(
                F.lit(f"unique({uniqueness})").alias("rule"),
                F.col("_v_uniq").alias("n_violations"),
            )
        )
    return (
        one.select(F.col("_n"), F.explode(F.array(*entries)).alias("e"))
        .select(
            F.col("e.rule").alias("rule"),
            F.col("_n").cast("long").alias("n_checked"),
            F.col("e.n_violations").alias("n_violations"),
            (F.col("e.n_violations").cast("double") / F.col("_n")).alias(
                "violation_rate"
            ),
        )
        .orderBy("rule")
    )


@query(
    "dq_expectations_lineitem",
    oracle="""
    WITH one AS (
      SELECT count(*) AS n,
             sum(CASE WHEN NOT (l_quantity BETWEEN 1 AND 50)
                      THEN 1 ELSE 0 END) AS v_qty,
             sum(CASE WHEN NOT (l_discount BETWEEN 0.0 AND 0.1)
                      THEN 1 ELSE 0 END) AS v_disc,
             sum(CASE WHEN NOT (l_shipdate BETWEEN DATE '1992-01-01'
                                AND DATE '1998-12-31')
                      THEN 1 ELSE 0 END) AS v_dates,
             sum(CASE WHEN NOT (l_extendedprice > 0)
                      THEN 1 ELSE 0 END) AS v_price,
             count(l_orderkey) - count(DISTINCT l_orderkey) AS v_uniq
      FROM lineitem
    )
    SELECT rule, n_checked, n_violations, violation_rate FROM (
      SELECT 'quantity_in_1_50' AS rule, CAST(n AS BIGINT) AS n_checked,
             CAST(v_qty AS BIGINT) AS n_violations,
             CAST(v_qty AS DOUBLE) / n AS violation_rate FROM one
      UNION ALL
      SELECT 'discount_in_0_0.1', CAST(n AS BIGINT), CAST(v_disc AS BIGINT),
             CAST(v_disc AS DOUBLE) / n FROM one
      UNION ALL
      SELECT 'shipdate_in_range', CAST(n AS BIGINT), CAST(v_dates AS BIGINT),
             CAST(v_dates AS DOUBLE) / n FROM one
      UNION ALL
      SELECT 'positive_price', CAST(n AS BIGINT), CAST(v_price AS BIGINT),
             CAST(v_price AS DOUBLE) / n FROM one
      UNION ALL
      SELECT 'unique(l_orderkey)', CAST(n AS BIGINT), CAST(v_uniq AS BIGINT),
             CAST(v_uniq AS DOUBLE) / n FROM one
    )
    ORDER BY rule
    """,
)
def dq_expectations_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Expectations over lineitem: range, positivity, and a
    (deliberately failing) uniqueness rule — l_orderkey repeats per
    line, so the report proves non-zero violation counts flow through.
    One scan, one 1-row aggregate."""
    li = load_table(spark, sf_dir, "lineitem")
    return expectations_report(
        li,
        rules={
            "quantity_in_1_50": F.col("l_quantity").between(1, 50),
            "discount_in_0_0.1": F.col("l_discount").between(0.0, 0.1),
            "shipdate_in_range": F.col("l_shipdate").between(
                "1992-01-01", "1998-12-31"
            ),
            "positive_price": F.col("l_extendedprice") > 0,
        },
        uniqueness="l_orderkey",
    )


@query(
    "sample_mixture_weighted",
    oracle="""
    SELECT doc_id, source
    FROM documents
    WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4))::BIGINT
          < (CAST(regexp_extract(source, 'src([0-9]+)', 1) AS INTEGER) % 4 + 1)
            * 16384
    ORDER BY doc_id
    """,
)
def sample_mixture_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-mixture construction: per-SOURCE sampling rates (here
    25/50/75/100% by source index residue — in production a weight
    table) applied as a deterministic md5-bucket threshold per row.
    Seed-free and partitioning-independent like
    ``stratified_sample_per_lang``: reruns at any cluster size keep the
    SAME documents, so mixture recipes are reproducible artifacts. Pure
    narrow filter — no shuffle, no sample() nondeterminism."""
    d = load_table(spark, sf_dir, "documents")
    bucket = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4), 16, 10
    ).cast("long")
    rate_slots = (
        F.regexp_extract("source", "src([0-9]+)", 1).cast("int") % 4 + 1
    )
    return (
        d.where(bucket < rate_slots.cast("long") * 16384)
        .select("doc_id", "source")
        .orderBy("doc_id")
    )


@query(
    "sample_exact_n_per_source",
    oracle="""
    SELECT doc_id, source
    FROM (
      SELECT doc_id, source,
             row_number() OVER (
               PARTITION BY source
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
             ) AS rn
      FROM documents
    ) WHERE rn <= 10
    ORDER BY source, doc_id
    """,
)
def sample_exact_n_per_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-budget sampling: exactly 10 documents per source, chosen by
    md5 hash-rank — the deterministic complement to the rate-based
    ``sample_mixture_weighted`` for when a mixture recipe specifies
    absolute counts ("10k docs from wiki"). Hash-rank = a fixed random
    permutation per source, so the selection is uniform-like yet
    reproducible across reruns, engines, and cluster sizes. Plan: one
    partial-agg'd per-source top-k window over (source, hash) — the
    document text never moves."""
    from pyspark.sql import Window

    d = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy(
        F.md5(F.col("doc_id").cast("string")), "doc_id"
    )
    return (
        d.select("doc_id", "source")
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 10)
        .select("doc_id", "source")
        .orderBy("source", "doc_id")
    )


@query(
    "dq_referential_integrity",
    oracle="""
    SELECT 'lineitem->orders' AS fk_edge,
           (SELECT count(*) FROM lineitem) AS n_child,
           (SELECT count(*) FROM lineitem l
            WHERE NOT EXISTS (SELECT 1 FROM orders o
                              WHERE o.o_orderkey = l.l_orderkey)) AS n_orphans
    UNION ALL
    SELECT 'orders->customer',
           (SELECT count(*) FROM orders),
           (SELECT count(*) FROM orders o
            WHERE NOT EXISTS (SELECT 1 FROM customer c
                              WHERE c.c_custkey = o.o_custkey))
    UNION ALL
    SELECT 'customer->nation',
           (SELECT count(*) FROM customer),
           (SELECT count(*) FROM customer c
            WHERE NOT EXISTS (SELECT 1 FROM nation n
                              WHERE n.n_nationkey = c.c_nationkey))
    UNION ALL
    SELECT 'supplier->nation',
           (SELECT count(*) FROM supplier),
           (SELECT count(*) FROM supplier s
            WHERE NOT EXISTS (SELECT 1 FROM nation n
                              WHERE n.n_nationkey = s.s_nationkey))
    UNION ALL
    SELECT 'nation->region',
           (SELECT count(*) FROM nation),
           (SELECT count(*) FROM nation n
            WHERE NOT EXISTS (SELECT 1 FROM region r
                              WHERE r.r_regionkey = n.n_regionkey))
    """,
)
def dq_referential_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-table referential-integrity audit — the DQ check the
    single-table expectations suite can't express: orphan counts for
    every foreign-key edge of the star schema, one row per edge.

    Scale shape: each edge is a LEFT ANTI join counting the child side;
    parent KEY projections are narrow and the dimension parents
    (nation, region, customer at this scale) broadcast, so the fact
    tables stream through map-side. The counts are exact int64s."""
    edges = [
        ("lineitem->orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
        ("orders->customer", "orders", "o_custkey", "customer", "c_custkey"),
        ("customer->nation", "customer", "c_nationkey", "nation", "n_nationkey"),
        ("supplier->nation", "supplier", "s_nationkey", "nation", "n_nationkey"),
        ("nation->region", "nation", "n_regionkey", "region", "r_regionkey"),
    ]
    out = None
    for edge, child, ck, parent, pk in edges:
        c = load_table(spark, sf_dir, child)
        p = load_table(spark, sf_dir, parent).select(pk).distinct()
        orphans = c.join(
            F.broadcast(p), c[ck] == p[pk], "left_anti"
        ).agg(F.count("*").alias("n_orphans"))
        row = (
            c.agg(F.count("*").alias("n_child"))
            .crossJoin(orphans)
            .select(
                F.lit(edge).alias("fk_edge"),
                F.col("n_child"),
                F.col("n_orphans"),
            )
        )
        out = row if out is None else out.unionByName(row)
    return out


@query(
    "temperature_mixture_weights",
    oracle="""
    WITH c AS (
      SELECT source, lang, count(*) AS n FROM documents GROUP BY 1, 2
    ), z AS (
      SELECT list_reduce(list(sqrt(CAST(n AS DOUBLE)) ORDER BY source, lang),
                         (a, x) -> a + x) AS z,
             CAST(sum(n) AS BIGINT) AS total
      FROM c
    )
    SELECT c.source, c.lang, c.n,
           sqrt(CAST(c.n AS DOUBLE)) / z.z AS weight,
           sqrt(CAST(c.n AS DOUBLE)) / z.z
             * CAST(z.total AS DOUBLE) / CAST(c.n AS DOUBLE) AS upsample
    FROM c CROSS JOIN z
    ORDER BY source, lang
    """,
)
def temperature_mixture_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-based mixture rebalancing weights per (source, lang):
    w ∝ n^α with α = 0.5 — the standard exponential-smoothing scheme for
    multilingual/multi-source corpora (downweights head groups, boosts
    the tail; α = 1 is proportional sampling, α → 0 uniform). The
    ``upsample`` column is each group's effective over/under-sampling
    factor (weight x total / n) to feed straight into
    ``sample_mixture_weighted``.

    α is fixed at 0.5 because n^0.5 is sqrt — correctly rounded by IEEE
    754 in every engine — whereas general pow() carries no cross-engine
    rounding guarantee; the operator's arithmetic is oracle-verified at
    this exponent and the scheme is exponent-generic. The normalizer
    Σ sqrt(n) is a non-associative float sum over the (tiny) group
    relation, so it runs as the corpus-standard sorted fold that DuckDB
    replays bit-for-bit.

    Shape at 100 TB: one partial-agg'd groupBy down to sources x langs
    rows, checkpointed; the 1-row normalizer broadcasts back. Nothing
    else touches the corpus — this is the planning step, the actual
    resample is the downstream md5-threshold sampler (zero-shuffle)."""
    d = load_table(spark, sf_dir, "documents")
    counts = (
        d.groupBy("source", "lang")
        .agg(F.count("*").alias("n"))
        .transform(pin)
    )
    s = F.sqrt(F.col("n").cast("double"))
    zrow = counts.agg(
        F.aggregate(
            F.transform(
                F.sort_array(
                    F.collect_list(F.struct("source", "lang", s.alias("s")))
                ),
                lambda st: st["s"],
            ),
            F.lit(0.0),
            lambda a, x: a + x,
        ).alias("z"),
        F.sum("n").alias("total"),
    )
    weight = s / F.col("z")
    upsample = weight * F.col("total").cast("double") / F.col("n").cast("double")
    return (
        counts.crossJoin(F.broadcast(zrow))
        .select(
            "source",
            "lang",
            "n",
            weight.alias("weight"),
            upsample.alias("upsample"),
        )
        .orderBy("source", "lang")
    )


@query(
    "dsir_importance_selection",
    oracle="""
    WITH toks AS (
      SELECT doc_id, lang,
             string_split(trim(lower(regexp_replace(text, '\\s+', ' ', 'g'))), ' ') AS l
      FROM documents
    ), bigrams AS (
      SELECT doc_id, lang,
             unnest(list_transform(range(1, len(l)), i -> l[i] || ' ' || l[i + 1])) AS bg
      FROM toks
    ), hashed AS (
      SELECT doc_id, lang,
             ('0x' || substr(md5(bg), 1, 2))::BIGINT AS b
      FROM bigrams
    ), doc_tf AS (
      SELECT doc_id, b, CAST(count(*) AS BIGINT) AS tf
      FROM hashed GROUP BY doc_id, b
    ), buckets AS (
      SELECT b,
             CAST(count(*) AS BIGINT) AS cnt_r,
             CAST(count(*) FILTER (WHERE lang = 'en') AS BIGINT) AS cnt_t
      FROM hashed GROUP BY b
    ), totals AS (
      SELECT CAST(sum(cnt_r) AS BIGINT) AS total_r,
             CAST(sum(cnt_t) AS BIGINT) AS total_t
      FROM buckets
    )
    SELECT d.doc_id,
           CAST(sum(d.tf * (k.cnt_t * t.total_r - k.cnt_r * t.total_t))
                AS BIGINT) AS dsir_score
    FROM doc_tf d
    JOIN buckets k USING (b)
    CROSS JOIN totals t
    GROUP BY d.doc_id
    ORDER BY dsir_score DESC, doc_id
    LIMIT 100
    """,
)
def dsir_importance_selection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR-style data selection (Xie et al. 2023, "Data Selection for
    Language Models via Importance Resampling" — public paper): score
    every document by how much its hashed-n-gram feature distribution
    matches a target slice (here lang='en' — in production, a curated
    high-quality corpus) versus the raw pool, then keep the top-N.

    Log-free exact-integer formulation for cross-engine hash parity: the
    usual importance weight sum(tf_b * log(p_t[b]/p_r[b])) is replaced by
    the same-ranking integer lift sum(tf_b * (cnt_t[b]*total_r -
    cnt_r[b]*total_t)) — positive iff the bucket is over-represented in
    the target — so Spark and DuckDB agree bit-for-bit with no libm.

    Shape at 100 TB: bigram explode is narrow; per-(doc, bucket) tf is
    one partial-agg'd shuffle; the bucket distribution table is 256 rows
    (a broadcast join, NOT a shuffle), the totals row is a 1-row
    broadcast; per-doc score is a second partial-agg'd shuffle keyed like
    the first; top-N is TakeOrdered (no global sort). Int64 is exact up
    to ~petatoken corpora (cnt*total < 2^63); beyond that, widen the
    lift to decimal(38,0) on both engines."""
    d = load_table(spark, sf_dir, "documents")
    return (
        dsir_scores(d, target=F.col("lang") == "en")
        .orderBy(F.desc("dsir_score"), "doc_id")
        .limit(100)
    )


def dsir_bigram_buckets(docs: DataFrame, target: Column) -> DataFrame:
    """(doc_id, is_target, b): one row per word-bigram instance with its
    md5 hash bucket (0..255). The shared feature extraction for batch
    and streaming DSIR."""
    from pyspark.sql import Window

    norm = F.trim(F.lower(F.regexp_replace("text", r"\s+", " ")))
    words = docs.select(
        "doc_id",
        target.alias("is_target"),
        F.posexplode(F.split(norm, " ")).alias("pos", "w"),
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    return (
        words.withColumn("w2", F.lead("w").over(w))
        .where(F.col("w2").isNotNull())
        .select(
            "doc_id",
            "is_target",
            F.conv(
                F.substring(F.md5(F.concat_ws(" ", "w", "w2")), 1, 2), 16, 10
            )
            .cast("long")
            .alias("b"),
        )
    )


def dsir_score_from(doc_tf: DataFrame, buckets: DataFrame) -> DataFrame:
    """Score (doc_id, dsir_score) from merged relations: ``doc_tf``
    (doc_id, b, tf) and ``buckets`` (b, cnt_r, cnt_t). Pure integer
    arithmetic — associative, so partial relations folded from any batch
    slicing score identically to a one-shot pass (the streaming stage's
    drained == batch guarantee)."""
    totals = buckets.agg(
        F.sum("cnt_r").alias("total_r"), F.sum("cnt_t").alias("total_t")
    )
    lift = F.col("tf") * (
        F.col("cnt_t") * F.col("total_r") - F.col("cnt_r") * F.col("total_t")
    )
    return (
        doc_tf.join(F.broadcast(buckets), "b")
        .crossJoin(F.broadcast(totals))
        .groupBy("doc_id")
        .agg(F.sum(lift).cast("long").alias("dsir_score"))
    )


def dsir_scores(docs: DataFrame, target: Column) -> DataFrame:
    """Per-doc DSIR integer lift score over hashed word-bigram buckets.

    ``docs`` needs (doc_id, text) plus whatever columns ``target``
    reads; ``target`` is the boolean predicate defining the target
    distribution slice. Returns (doc_id, dsir_score) for every doc with
    at least one bigram. See ``dsir_importance_selection`` for the
    formulation and the 100 TB plan shape.

    The corpus text is exploded ONCE: both downstream relations derive
    from the collapsed per-(doc, bucket) tf (is_target rides along — it
    is functionally dependent on doc_id — so the 256-row distribution
    is a second tiny aggregation over tf, cnt_r = sum(tf), cnt_t =
    sum(tf where target)). The collapsed relation is pinned
    (localCheckpoint) because two consumers fold it; it is bounded by
    256 rows/doc — corpus-metadata-sized, not bigram-stream-sized —
    and pinning it beat the re-explode by ~20% at sf0.1 (and by one
    full text scan at 100 TB)."""
    tf3 = (
        dsir_bigram_buckets(docs, target)
        .groupBy("doc_id", "is_target", "b")
        .agg(F.count("*").alias("tf"))
        .transform(pin)
    )
    buckets = tf3.groupBy("b").agg(
        F.sum("tf").alias("cnt_r"),
        F.sum(F.when(F.col("is_target"), F.col("tf")).otherwise(F.lit(0))).alias(
            "cnt_t"
        ),
    )
    return dsir_score_from(tf3.drop("is_target"), buckets)


# ------------------------------- largest-remainder budget apportionment

APPORTION_BUDGET = 100_000  # documents to sample across languages


@query(
    "apportion_budget_largest_remainder",
    # Exact integer replay: quotas compare as B*n_i div/mod N (never a
    # float share), the leftover-seat ranking orders by integer
    # remainder desc then lang asc, and the seat count R is itself
    # derived in-SQL — both engines walk the identical Hamilton-method
    # arithmetic, so the hash verifies the apportionment, not a rounded
    # approximation of it.
    oracle=f"""
    WITH g AS (
      SELECT lang, CAST(count(*) AS BIGINT) AS n_docs FROM documents
      GROUP BY lang
    ), t AS (
      SELECT g.*, (SELECT sum(n_docs) FROM g) AS total FROM g
    ), q AS (
      SELECT lang, n_docs,
             CAST(({APPORTION_BUDGET} * n_docs) // total AS BIGINT)
               AS base_alloc,
             CAST(({APPORTION_BUDGET} * n_docs) % total AS BIGINT)
               AS remainder
      FROM t
    ), r AS (
      SELECT q.*,
             row_number() OVER (ORDER BY remainder DESC, lang ASC) AS rk,
             {APPORTION_BUDGET} - sum(base_alloc) OVER () AS leftover
      FROM q
    )
    SELECT lang, n_docs, base_alloc, remainder,
           CAST(CASE WHEN rk <= leftover THEN 1 ELSE 0 END AS BIGINT)
             AS extra_seat,
           CAST(base_alloc
                + CASE WHEN rk <= leftover THEN 1 ELSE 0 END AS BIGINT)
             AS alloc
    FROM r ORDER BY lang
    """,
)
def apportion_budget_largest_remainder(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Exact largest-remainder (Hamilton-method) apportionment of a
    sampling budget across languages — the integer sibling of the
    temperature/water-filling mixers: when a training-mix plan says
    "sample exactly B documents proportionally", float shares drift
    (sum of rounded quotas misses B); Hamilton gives base_i =
    floor(B*n_i/N) plus one extra seat to the B - sum(base) largest
    remainders, so the allocations sum to B EXACTLY, deterministically
    (remainder ties break by lang — the published method's convention
    choice, pinned by the oracle).

    Exactness: every quantity is int64 (B*n_i binds at n ~ 9.2e13 docs
    for B = 1e5 — ~2e10x sf0.1; DECIMAL-widen past that); there is no
    float anywhere, so cross-engine equality is arithmetic identity.

    Shape at 100 TB: ONE lang-keyed partial-agg corpus shuffle;
    everything after is window arithmetic over the lang-sized relation
    (the 1-partition window over <= dozens of rows is deliberate)."""
    g = (
        load_table(spark, sf_dir, "documents")
        .groupBy("lang")
        .agg(F.count("*").alias("n_docs"))
        .transform(pin)
    )
    return apportion_over_counts(g)


def apportion_over_counts(g: DataFrame) -> DataFrame:
    """Hamilton scoring core over a (lang, n_docs) count relation —
    shared by the batch query and the streaming twin
    (streaming/apportion_stage.py), whose folded lang-count log is the
    same count monoid."""
    from pyspark.sql import Window

    t = g.crossJoin(
        F.broadcast(g.agg(F.sum("n_docs").alias("total")))
    )
    q = t.select(
        "lang",
        "n_docs",
        F.expr(f"({APPORTION_BUDGET}L * n_docs) div total").alias(
            "base_alloc"
        ),
        (F.lit(APPORTION_BUDGET).cast("long") * F.col("n_docs") % F.col("total")).alias(
            "remainder"
        ),
    )
    w = Window.orderBy(F.desc("remainder"), F.asc("lang"))
    wall = Window.partitionBy()
    r = q.select(
        "lang",
        "n_docs",
        "base_alloc",
        "remainder",
        F.row_number().over(w).alias("rk"),
        (
            F.lit(APPORTION_BUDGET).cast("long")
            - F.sum("base_alloc").over(wall)
        ).alias("leftover"),
    )
    return r.select(
        "lang",
        "n_docs",
        "base_alloc",
        "remainder",
        (F.col("rk") <= F.col("leftover")).cast("long").alias("extra_seat"),
        (
            F.col("base_alloc")
            + (F.col("rk") <= F.col("leftover")).cast("long")
        ).alias("alloc"),
    ).orderBy("lang")
