"""Behavioral check of the LM fluency filter: disfluent (never-repeated
word salad) documents score below documents built from the corpus's
common phrasing."""

from __future__ import annotations

from databricks_end_to_end_streaming_spark.queries import all_queries


def test_garbled_doc_scores_lowest(spark, workdir):
    common = "the quick brown fox jumps over the lazy dog"
    rows = [(i, common, "en", "src0", len(common)) for i in range(8)]
    garbled = "zqx wvu tsr qpo nml kji hgf edc"
    rows.append((100, garbled, "en", "src0", len(garbled)))
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(f"{workdir}/documents.parquet")
    out = {
        r["doc_id"]: r["mean_bigram_prob"]
        for r in all_queries()["lm_fluency_score"](spark, workdir).collect()
    }
    assert min(out, key=out.get) == 100
    # every bigram of the garbled doc is unique corpus-wide (c12 = c1 =
    # 1), so each term sits at the 2/(1+V) smoothing floor, while the
    # repeated phrasing's bigrams carry c12 = 8 of their heads' mass.
    assert out[0] > 2 * out[100]
