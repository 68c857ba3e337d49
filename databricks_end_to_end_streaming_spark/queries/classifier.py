"""Model-based quality filtering — the classifier gate stage of the
public LLM data pipelines (GPT-3 Appendix A, LLaMA, RefinedWeb all
train a linear/fastText quality classifier and keep documents it
scores as "reference-like"). The engine's version is the closed-form
nearest-centroid linear model of operators/linear_model.py, trained
on the Gopher rule gate's labels over a deterministic half of the
corpus (weak supervision / rule distillation) and applied to every
document as a broadcast-weights dot product; the held-out half gives
an honest generalization measure.

The reference (a streaming ingest demo, notebooks/medallion/gold.py)
has no model stage — this is a north-star extension, not parity.

Exactness: training statistics are exact int64 (signed hashed-count
sums per class + class sizes); weights, bias, scores and predictions
are fixed IEEE chains over them (sorted folds, no ln), so every query
here hash-verifies against DuckDB.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..operators.linear_model import (
    centroid_bias,
    centroid_scores,
    centroid_stats,
    centroid_weights,
    class_counts,
)
from ..tables import load_table
from . import query
from .text import _GOPHER_STOPS, _occurrences, _occurrences_sql

CLS_DIM = 64  # feature-hash buckets (operators/vectorize.py default)


def weak_quality_labels(docs: DataFrame) -> DataFrame:
    """(doc_id, lab): the Gopher rule gate as weak supervision — the
    same four rules as queries/text.py::gopher_quality_rules (word
    count, mean word length, alpha-word ratio, stopword hits), reduced
    to the 0/1 teacher label the classifier distills."""
    nrm = F.trim(F.regexp_replace("text", r"\s+", " "))
    base = docs.select("doc_id", nrm.alias("nrm"))
    toks = F.split(F.col("nrm"), " ")
    n_tokens = F.size(toks).cast("long")
    char_sum = (F.length("nrm") - (F.size(toks) - F.lit(1))).cast("long")
    alpha_words = F.size(
        F.filter(toks, lambda w: w.rlike("[a-zA-Z]"))
    ).cast("long")
    stop_hits = sum(
        [_occurrences("nrm", w) for w in _GOPHER_STOPS],
        F.lit(0).cast("long"),
    )
    passes = (
        n_tokens.between(50, 100000)
        & (char_sum.cast("double") / n_tokens).between(3.0, 10.0)
        & (alpha_words.cast("double") / n_tokens >= 0.8)
        & (stop_hits >= 2)
    )
    return base.select("doc_id", passes.cast("long").alias("lab"))


def _train_parts(docs: DataFrame):
    """Shared assembly: sparse features over ALL docs, labels, and the
    (stats, counts, weights, bias) trained on the even-doc_id half.
    The split is deterministic and engine-portable (doc_id % 2; swap in
    text.py::split_bucket's md5 split for production ratios)."""
    from ..operators.vectorize import hashed_tf_sparse

    feats = hashed_tf_sparse(docs, dim=CLS_DIM)
    labels = weak_quality_labels(docs)
    train_lab = labels.where(F.col("doc_id") % 2 == 0)
    stats = centroid_stats(
        feats.where(F.col("doc_id") % 2 == 0), train_lab
    )
    counts = class_counts(train_lab)
    return feats, labels, stats, counts


_FEATS_CTE = """
    words AS (
      SELECT doc_id,
             unnest(string_split(trim(lower(regexp_replace(text, '\\s+', ' ', 'g'))), ' ')) AS w
      FROM documents
    ), signed AS (
      SELECT doc_id,
             ('0x' || substr(md5(w), 1, 8))::BIGINT % 64 AS bucket,
             CASE WHEN substr(md5(w), 9, 1) < '8' THEN 1 ELSE -1 END AS s
      FROM words
    ), feats AS (
      SELECT doc_id, bucket, CAST(sum(s) AS BIGINT) AS weight
      FROM signed GROUP BY doc_id, bucket
    )"""

_LAB_CTE = f"""
    nrm AS (
      SELECT doc_id, trim(regexp_replace(text, '\\s+', ' ', 'g')) AS nrm
      FROM documents
    ), gfeat AS (
      SELECT doc_id,
        CAST(len(string_split(nrm, ' ')) AS BIGINT) AS n_tokens,
        CAST(length(nrm) - (len(string_split(nrm, ' ')) - 1) AS BIGINT)
          AS char_sum,
        CAST(len(list_filter(string_split(nrm, ' '),
                             w -> regexp_matches(w, '[a-zA-Z]'))) AS BIGINT)
          AS alpha_words,
        {' + '.join(_occurrences_sql('nrm', w) for w in _GOPHER_STOPS)}
          AS stop_hits
      FROM nrm
    ), lab AS (
      SELECT doc_id,
        CAST(CASE WHEN n_tokens BETWEEN 50 AND 100000
               AND CAST(char_sum AS DOUBLE) / n_tokens BETWEEN 3.0 AND 10.0
               AND CAST(alpha_words AS DOUBLE) / n_tokens >= 0.8
               AND stop_hits >= 2
             THEN 1 ELSE 0 END AS BIGINT) AS lab
      FROM gfeat
    )"""

_TRAIN_CTE = """
    n AS (
      SELECT CAST(sum(CASE WHEN lab = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n0,
             CAST(sum(CASE WHEN lab = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1
      FROM lab WHERE doc_id % 2 = 0
    ), stats AS (
      SELECT f.bucket,
             CAST(sum(f.weight * (1 - l.lab)) AS BIGINT) AS s0,
             CAST(sum(f.weight * l.lab) AS BIGINT) AS s1
      FROM feats f JOIN lab l USING (doc_id)
      WHERE f.doc_id % 2 = 0 GROUP BY f.bucket
    ), wts AS (
      SELECT bucket, s0, s1,
             CAST(s1 AS DOUBLE) / n1 - CAST(s0 AS DOUBLE) / n0 AS w
      FROM stats CROSS JOIN n
    )"""

_SCORE_CTE = """
    bias AS (
      SELECT list_reduce(
               list(CAST(s1 AS DOUBLE) / n1 * (CAST(s1 AS DOUBLE) / n1)
                  - CAST(s0 AS DOUBLE) / n0 * (CAST(s0 AS DOUBLE) / n0)
                    ORDER BY bucket),
               (a, b) -> a + b) * 0.5 AS bias
      FROM stats CROSS JOIN n
    ), mx AS (
      SELECT f.doc_id,
             list_reduce(list(CAST(f.weight AS DOUBLE) * wts.w
                              ORDER BY f.bucket),
                         (a, b) -> a + b) AS mx
      FROM feats f JOIN wts USING (bucket)
      GROUP BY f.doc_id
    ), scored AS (
      SELECT m.doc_id, m.mx - b.bias AS score,
             CAST(CASE WHEN m.mx - b.bias > 0 THEN 1 ELSE 0 END AS BIGINT)
               AS predicted,
             l.lab AS weak_label
      FROM mx m CROSS JOIN bias b JOIN lab l USING (doc_id)
    )"""


@query(
    "quality_classifier_weights",
    oracle=f"""
    WITH {_FEATS_CTE}, {_LAB_CTE}, {_TRAIN_CTE}
    SELECT bucket, s0, s1, w FROM wts ORDER BY bucket
    """,
)
def quality_classifier_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train the quality classifier: exact per-bucket class sums on the
    even-doc_id half plus the derived linear weights. ONE partial-agg'd
    shuffle collapsing (doc, bucket) to <= {CLS_DIM} x 2 cells — the
    sufficient statistics are a sum monoid, so at 100 TB training is a
    single pass and partials from corpus slices merge by addition."""
    d = load_table(spark, sf_dir, "documents")
    _, _, stats, counts = _train_parts(d)
    return centroid_weights(stats, counts).orderBy("bucket")


@query(
    "quality_classifier_scores",
    oracle=f"""
    WITH {_FEATS_CTE}, {_LAB_CTE}, {_TRAIN_CTE}, {_SCORE_CTE}
    SELECT doc_id, score, predicted, weak_label
    FROM scored ORDER BY doc_id
    """,
)
def quality_classifier_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Score EVERY document with the trained weights: the map-only
    broadcast-weights dot product (x.w - bias, folded in bucket order),
    predicted = score > 0. The corpus-side cost at 100 TB is the one
    (doc, bucket) vectorizer shuffle; the model side is a broadcast
    {CLS_DIM}-row relation + a 1-row bias."""
    d = load_table(spark, sf_dir, "documents")
    feats, labels, stats, counts = _train_parts(d)
    weights = centroid_weights(stats, counts)
    bias = centroid_bias(stats, counts)
    scored = centroid_scores(feats, weights, bias)
    return (
        scored.join(labels.withColumnRenamed("lab", "weak_label"), "doc_id")
        .select("doc_id", "score", "predicted", "weak_label")
        .orderBy("doc_id")
    )


@query(
    "quality_classifier_eval",
    oracle=f"""
    WITH {_FEATS_CTE}, {_LAB_CTE}, {_TRAIN_CTE}, {_SCORE_CTE}
    SELECT CAST(count(*) AS BIGINT) AS n_eval,
           CAST(sum(CASE WHEN predicted = weak_label THEN 1 ELSE 0 END)
                AS BIGINT) AS n_agree,
           CAST(sum(CASE WHEN predicted = 1 AND weak_label = 1
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_tp,
           CAST(sum(CASE WHEN predicted = 1 AND weak_label = 0
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_fp,
           CAST(sum(CASE WHEN predicted = 0 AND weak_label = 1
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_fn,
           CAST(sum(CASE WHEN predicted = 0 AND weak_label = 0
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_tn,
           CAST(sum(CASE WHEN predicted = weak_label THEN 1 ELSE 0 END)
                AS DOUBLE) / count(*) AS accuracy
    FROM scored WHERE doc_id % 2 = 1
    """,
)
def quality_classifier_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Held-out evaluation: confusion counts + accuracy of the
    classifier against the rule gate on the odd-doc_id half it never
    trained on — the generalization check that separates a quality
    MODEL from a memorized lookup. 1-row; map + single agg at any
    scale."""
    d = load_table(spark, sf_dir, "documents")
    feats, labels, stats, counts = _train_parts(d)
    weights = centroid_weights(stats, counts)
    bias = centroid_bias(stats, counts)
    scored = centroid_scores(feats, weights, bias).join(
        labels.withColumnRenamed("lab", "weak_label"), "doc_id"
    )
    ev = scored.where(F.col("doc_id") % 2 == 1)
    agree = (F.col("predicted") == F.col("weak_label")).cast("long")
    return ev.agg(
        F.count("*").cast("long").alias("n_eval"),
        F.sum(agree).cast("long").alias("n_agree"),
        F.sum(
            ((F.col("predicted") == 1) & (F.col("weak_label") == 1)).cast(
                "long"
            )
        )
        .cast("long")
        .alias("n_tp"),
        F.sum(
            ((F.col("predicted") == 1) & (F.col("weak_label") == 0)).cast(
                "long"
            )
        )
        .cast("long")
        .alias("n_fp"),
        F.sum(
            ((F.col("predicted") == 0) & (F.col("weak_label") == 1)).cast(
                "long"
            )
        )
        .cast("long")
        .alias("n_fn"),
        F.sum(
            ((F.col("predicted") == 0) & (F.col("weak_label") == 0)).cast(
                "long"
            )
        )
        .cast("long")
        .alias("n_tn"),
        (F.sum(agree).cast("double") / F.count("*")).alias("accuracy"),
    )
