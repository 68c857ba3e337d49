"""Fuzzy string-similarity join (entity resolution) over the ``part``
dimension — the record-linkage primitive every catalog/entity pipeline
needs (match "small ring" to "small king": same entity, one keystroke
apart).

Scale shape: classic BLOCKED similarity join, never all-pairs. The edit-
distance verify runs only on candidate pairs that share a blocking key
(here: any whole token of the name). At 100 TB the entity DICTIONARY
(distinct names) is orders of magnitude smaller than the fact rows —
the distinct-name aggregation collapses the corpus first, then the
token-block self-join touches candidate pairs only (block sizes bound
the quadratic term; a hot block is an AQE skew split, same as the LSH
band join in queries/dedup.py). Background: standard blocking/windowing
record-linkage literature (Fellegi-Sunter tradition) and PassJoin-style
pigeonhole blocking — public literature.

The oracle computes EXACT all-pairs levenshtein (DuckDB at sf0.01 scale),
so driver hash-equality also PROVES the token-blocking recall on this
corpus each round — same discipline as the MinHash-LSH oracle
(queries/dedup.py): if a qualifying pair shared no token, the driver
would flag the miss.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..tables import load_table
from . import query

FUZZY_MAX_DIST = 2  # max levenshtein distance to call two names one entity


@query(
    "fuzzy_part_name_matches",
    oracle=f"""
    WITH names AS (
      SELECT p_name, count(*) AS n_parts
      FROM part GROUP BY p_name
    )
    SELECT a.p_name AS name_a, b.p_name AS name_b,
           CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS edit_dist,
           a.n_parts AS n_parts_a, b.n_parts AS n_parts_b
    FROM names a JOIN names b ON a.p_name < b.p_name
    WHERE levenshtein(a.p_name, b.p_name) <= {FUZZY_MAX_DIST}
    ORDER BY name_a, name_b
    """,
)
def fuzzy_part_name_matches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity-resolution matches among distinct part names: pairs within
    levenshtein distance FUZZY_MAX_DIST, with how many part rows carry
    each name (the weight a canonicalization step would merge). Blocked
    on shared whole tokens; the distinct() collapses a name pair found
    via both its tokens before the (comparatively costly) edit-distance
    verify."""
    p = load_table(spark, sf_dir, "part")
    names = p.groupBy("p_name").agg(F.count("*").alias("n_parts"))
    tok = names.select(
        "p_name", "n_parts", F.explode(
            F.filter(F.split("p_name", " +"), lambda t: t != "")
        ).alias("tok")
    )
    cand = (
        tok.alias("a")
        .join(
            tok.alias("b"),
            (F.col("a.tok") == F.col("b.tok"))
            & (F.col("a.p_name") < F.col("b.p_name")),
        )
        .select(
            F.col("a.p_name").alias("name_a"),
            F.col("b.p_name").alias("name_b"),
            F.col("a.n_parts").alias("n_parts_a"),
            F.col("b.n_parts").alias("n_parts_b"),
        )
        .distinct()
    )
    return (
        cand.withColumn(
            "edit_dist", F.levenshtein("name_a", "name_b").cast("long")
        )
        .where(F.col("edit_dist") <= FUZZY_MAX_DIST)
        .select("name_a", "name_b", "edit_dist", "n_parts_a", "n_parts_b")
        .orderBy("name_a", "name_b")
    )
