"""Driver-registered queries for the operators/ package (SimHash, ANN,
multimodal). Several began rows-only ("pandas UDFs aren't
SQL-expressible") and were later proven otherwise on the synthetic
corpora — SimHash's bit voting (r6), the video temporal-alignment
pipeline (r13) — and now carry full DuckDB replay oracles; the ones
that remain rows-only (LSH-recall evals, k-means-seeded ANN) are so for
documented algorithmic reasons, with exactness covered in
tests/test_operators.py against NumPy/pure-Python references.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..operators.multimodal import image_feature_stats
from ..operators.simhash import simhash_neardup_pairs
from ..operators.similarity import ann_lsh_topk
from ..pin import pin
from ..tables import load_table
from . import query

# Reserved namespace for synthetic re-ingestion twin ids: real doc_ids
# stay below 2^40, so flagged ids can never collide with a real media id.
REINGEST_ID_FLAG = 1 << 40


def _vid_block_bounds(n_in: int, n_out: int) -> list[tuple[int, int, int]]:
    """(index, lo, hi) block boundaries of operators/phash._grid_means
    for a fixed input extent — the EXACT same floor/upsample formula
    (y0 = i*n_in//n_out; y1 = max(y0+1, next)), in pure Python so the
    oracle below inlines the geometry as VALUES rows and a drifted
    formula shows up as a hash mismatch, not a silent re-derivation."""
    lo = [i * n_in // n_out for i in range(n_out)]
    nxt = lo[1:] + [n_in]
    return [(i, a, max(a + 1, b)) for i, (a, b) in enumerate(zip(lo, nxt))]


_VID_ROWS8 = ", ".join(f"({i},{a},{b})" for i, a, b in _vid_block_bounds(6, 8))
_VID_COLS9 = ", ".join(
    f"({j},{a},{b})" for j, a, b in _vid_block_bounds(16, 9)
)
# bit k of the signed-int64 signature: two's-complement weight (bit 63
# carries -2^63), so summing weights reproduces _signed64 exactly
_VID_BITW = (
    "(CASE WHEN {k} = 63 THEN -9223372036854775808"
    " ELSE (CAST(1 AS BIGINT) << CAST({k} AS INTEGER)) END)"
)



@query(
    "dedup_simhash",
    # Replay oracle: the md5-prefix token hash, bit voting, signature
    # assembly, chunk banding, and Hamming verification are all integer
    # arithmetic, so DuckDB recomputes the IDENTICAL pipeline — a green
    # hash-match verifies the SimHash itself, not just row counts.
    oracle="""
    WITH toks AS (
      SELECT doc_id, tok FROM (
        SELECT doc_id,
               unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS tok
        FROM documents)
      WHERE tok <> ''
    ), hashed AS (
      SELECT doc_id, ('0x' || substr(md5(tok), 1, 15))::BIGINT AS h FROM toks
    ), votes AS (
      SELECT doc_id, bit,
             sum(CASE WHEN (h >> bit) & 1 = 1 THEN 1 ELSE -1 END) AS v
      FROM hashed, (SELECT unnest(range(60)) AS bit) b
      GROUP BY doc_id, bit
    ), sigs AS (
      SELECT doc_id,
             sum(CASE WHEN v > 0 THEN 1::BIGINT << bit ELSE 0 END) AS simhash
      FROM votes GROUP BY doc_id
    ), chunks AS (
      SELECT doc_id, simhash, chunk_id,
             (simhash >> (chunk_id * 15)) & 32767 AS chunk
      FROM sigs, (SELECT unnest([0,1,2,3]) AS chunk_id) c
    ), cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
                      a.simhash AS sa, b.simhash AS sb
      FROM chunks a
      JOIN chunks b ON a.chunk_id = b.chunk_id AND a.chunk = b.chunk
                   AND a.doc_id < b.doc_id
    )
    SELECT doc_a, doc_b, CAST(bit_count(xor(sa, sb)) AS INTEGER) AS hamming
    FROM cand WHERE bit_count(xor(sa, sb)) <= 3
    """,
)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs (hamming <= 3) over documents. Pure
    built-in expressions (operators/simhash.py); the DuckDB oracle
    replays the full integer pipeline."""
    d = load_table(spark, sf_dir, "documents")
    return simhash_neardup_pairs(d)


def _lsh_planes_values_sql(dim: int = 64, n_bits: int = 6, n_tables: int = 8) -> str:
    """The seeded hyperplanes as a SQL VALUES list (table_id, bit, h) —
    lets DuckDB replay the exact bucketing the Spark side computes, so
    the approximate LSH result has a hash-checkable oracle instead of a
    rows-only record. repr() round-trips each float64 exactly."""
    from ..operators.similarity import _planes

    planes = _planes(dim, n_bits, n_tables, seed=42)
    rows = []
    for t in range(n_tables):
        for b in range(n_bits):
            arr = ", ".join(repr(x) for x in planes[t, b])
            rows.append(f"({t}, {b}, [{arr}])")
    return ",\n      ".join(rows)


@query(
    "ann_lsh_cosine_topk",
    # The oracle REPLAYS the seeded hyperplanes (constants baked into the
    # SQL): same sign-pattern buckets, same any-shared-bucket candidate
    # generation, exact cosine re-rank restricted to those candidates.
    # A green hash-match therefore verifies the whole approximate path —
    # bucketing, candidate join, and re-rank — not just row counts.
    oracle=f"""
    WITH planes(table_id, bit, h) AS (
      VALUES {_lsh_planes_values_sql()}
    ),
    corpus AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ),
    buckets AS (
      SELECT vec_id, table_id,
             sum(CASE WHEN list_inner_product(v, h) > 0
                      THEN 1 << bit ELSE 0 END) AS bucket
      FROM corpus, planes
      GROUP BY vec_id, table_id
    ),
    q AS (
      SELECT vec_id AS query_id, v AS qv FROM corpus WHERE vec_id < 8
    ),
    cand AS (
      SELECT DISTINCT q.query_id, bn.vec_id AS neighbor_id
      FROM buckets bq
      JOIN q ON q.query_id = bq.vec_id
      JOIN buckets bn ON bn.table_id = bq.table_id
                     AND bn.bucket = bq.bucket
                     AND bn.vec_id <> bq.vec_id
    ),
    scored AS (
      SELECT c.query_id, c.neighbor_id,
             list_cosine_similarity(q.qv, co.v) AS score
      FROM cand c
      JOIN q ON q.query_id = c.query_id
      JOIN corpus co ON co.vec_id = c.neighbor_id
    )
    SELECT query_id, neighbor_id, CAST(rank AS INTEGER) AS rank FROM (
      SELECT query_id, neighbor_id,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY score DESC, neighbor_id) AS rank
      FROM scored
    ) WHERE rank <= 5
    """,
)
def ann_lsh_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate cosine top-5 for the same query set as
    knn_bruteforce_cosine, via hyperplane-LSH bucketing (the scale path;
    recall vs brute force is pytest-checked; the DuckDB oracle replays
    the seeded hyperplanes, so correctness of the bucketing itself is
    hash-verified)."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    # bucket width sized to corpus: 2^6 buckets x 8 tables keeps ~10%
    # of the corpus as candidates per query at sf0.1 scale
    return ann_lsh_topk(emb, F.broadcast(queries), k=5, n_bits=6, n_tables=8).select(
        "query_id", "neighbor_id", "rank"
    )


@query("ann_ivf_cosine_topk")
def ann_ivf_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF (inverted-file) approximate top-5: k-means coarse quantizer
    trained on a deterministic sample, corpus partitioned into inverted
    lists, queries probe their 3 nearest lists. The clustered-corpus
    counterpart to the hyperplane-LSH path; recall pytest-checked with
    planted twins (tests/test_ivf.py)."""
    from ..operators.similarity import ivf_topk, train_ivf_centroids

    emb = load_table(spark, sf_dir, "embeddings")
    cents = train_ivf_centroids(emb, n_centroids=16)
    queries = emb.where(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    return ivf_topk(emb, queries, cents, k=5, nprobe=3)


@query(
    "multimodal_image_stats",
    # The documents corpus is pure ASCII (verified: octet_length(encode(text))
    # == length(text) at every sf), so per-character code points ARE the
    # UTF-8 bytes the Spark side decodes. mean/std are the same fixed IEEE
    # expression over exact integer moments as image_feature_stats computes,
    # so the doubles match bit-for-bit.
    oracle="""
    WITH bytes AS (
      SELECT doc_id, unicode(substr(text, CAST(i AS INTEGER), 1)) AS b
      FROM (SELECT doc_id, text, unnest(range(1, length(text) + 1)) AS i
            FROM documents)
    ), m AS (
      SELECT doc_id,
             count(*)  AS n,
             sum(b)    AS sx,
             sum(b*b)  AS sx2,
             min(b)    AS mn,
             max(b)    AS mx,
             count(*) FILTER (WHERE b // 64 = 0) AS h0,
             count(*) FILTER (WHERE b // 64 = 1) AS h1,
             count(*) FILTER (WHERE b // 64 = 2) AS h2,
             count(*) FILTER (WHERE b // 64 = 3) AS h3
      FROM bytes GROUP BY doc_id
    )
    SELECT doc_id AS media_id,
           CAST(sx AS DOUBLE) / n AS mean_intensity,
           sqrt(greatest(0.0, CAST(sx2 AS DOUBLE) / n
                - (CAST(sx AS DOUBLE) / n) * (CAST(sx AS DOUBLE) / n)))
             AS std_intensity,
           CAST(mn AS INTEGER) AS min_intensity,
           CAST(mx AS INTEGER) AS max_intensity,
           CAST(h0 AS BIGINT) AS hist_0,
           CAST(h1 AS BIGINT) AS hist_1,
           CAST(h2 AS BIGINT) AS hist_2,
           CAST(h3 AS BIGINT) AS hist_3
    FROM m
    """,
)
def multimodal_image_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal plumbing at driver scale: treat each document's UTF-8
    bytes as a fake/raw 1 x n_chars x 1 raster and run the Arrow-batched
    feature extractor. (Deterministic stub decode — multimodal.py.)

    Driver-facing projection flattens the 4-bin histogram to scalar
    columns (hist_0..hist_3) — array columns can't be canonicalized by
    the driver's sort/hash compare."""
    d = load_table(spark, sf_dir, "documents")
    stats = image_feature_stats(_docs_as_media(d))
    return stats.select(
        "media_id",
        "mean_intensity",
        "std_intensity",
        "min_intensity",
        "max_intensity",
        *[F.col("histogram")[i].alias(f"hist_{i}") for i in range(4)],
    )


def _docs_as_media(d: DataFrame) -> DataFrame:
    """Each document's UTF-8 bytes as a fake/raw 1 x n_chars x 1 raster
    in the media schema — the deterministic in-container image corpus
    the multimodal queries share."""
    return d.select(
        F.col("doc_id").alias("media_id"),
        F.lit("image").alias("kind"),
        F.col("text").cast("binary").alias("payload"),
        F.struct(
            F.length("text").cast("int").alias("width"),
            F.lit(1).alias("height"),
            F.lit(1).alias("channels"),
            F.lit(None).cast("int").alias("sample_rate"),
            F.lit(1).alias("n_frames"),
            F.lit("fake/raw").alias("format"),
        ).alias("meta"),
    )


@query(
    "image_phash_neardup",
    # HASH-ORACLED since r13 (was rows-only), same argument as
    # video_temporal_neardup: on the ASCII fake/raw raster corpus the
    # dHash is exact integer block-mean arithmetic. Height is FIXED at
    # 16 (row blocks are exactly [2i, 2i+2)); width varies per document,
    # so the 9-column boundaries are computed in-SQL from the same
    # floor/upsample formula ((j*w)//9; hi = max(lo+1, next)) instead of
    # inlined VALUES. Exact all-pairs bit_count(xor) <= 3 re-proves the
    # 4-chunk banding recall every round.
    oracle=f"""
    WITH eligible AS (
      SELECT doc_id AS media_id, text,
             CAST(strlen(text) // 16 AS BIGINT) AS w
      FROM documents
      WHERE strlen(text) >= 256 AND length(text) = strlen(text)
    ), cols9 AS (
      SELECT media_id, CAST(j.j AS BIGINT) AS j,
             (j.j * w) // 9 AS x0,
             greatest((j.j * w) // 9 + 1,
                      CASE WHEN j.j = 8 THEN w
                           ELSE ((j.j + 1) * w) // 9 END) AS x1
      FROM eligible, unnest(range(0, 9)) AS j(j)
    ), px AS (
      SELECT media_id, (y.y // 2) AS i, x.x AS x,
             ord(substr(text, CAST(y.y * w + x.x + 1 AS INTEGER), 1)) AS v
      FROM eligible, unnest(range(0, 16)) AS y(y), unnest(range(0, w)) AS x(x)
    ), s9 AS (
      SELECT px.media_id, px.i, c.j,
             CAST(sum(px.v) AS BIGINT) AS s, CAST(count(*) AS BIGINT) AS a
      FROM px JOIN cols9 c ON c.media_id = px.media_id
                          AND px.x >= c.x0 AND px.x < c.x1
      GROUP BY 1, 2, 3
    ), dh AS (
      SELECT l.media_id,
             CAST(sum(CASE WHEN l.s * r.a > r.s * l.a
                      THEN {_VID_BITW.format(k='l.i*8 + l.j')}
                      ELSE 0 END) AS BIGINT) AS dhash
      FROM s9 l
      JOIN s9 r ON r.media_id = l.media_id AND r.i = l.i AND r.j = l.j + 1
      WHERE l.j < 8
      GROUP BY 1
    )
    SELECT a.media_id AS media_a, b.media_id AS media_b,
           CAST(bit_count(xor(a.dhash, b.dhash)) AS INTEGER) AS hamming
    FROM dh a JOIN dh b ON a.media_id < b.media_id
    WHERE bit_count(xor(a.dhash, b.dhash)) <= 3
    ORDER BY media_a, media_b
    """,
)
def image_phash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual image near-dup pairs (operators/phash.py): dHash over
    16-row document rasters, banded Hamming pairing <= 3 bits. Each
    >=256-char document's bytes reshape to a 16 x (n/16) grayscale
    raster so BOTH grid axes carry signal (a 1-row raster degenerates:
    its block means are all ~the text's mean byte, collapsing ~200 docs
    into one alternating-bit hash and spraying ~123k spurious pairs at
    sf0.1; the 2-D shape yields the ~110 REAL near-dup pairs — exact
    duplicates at hamming 0, planted near-dup texts within a few bits).
    Payload drops at the hash; pairing shuffles 2 longs per image
    through the 4 x 16-bit chunk self-join — never O(n^2)."""
    from ..operators.phash import phash_neardup_pairs

    d = load_table(spark, sf_dir, "documents").where(
        (F.length("text") >= 256)
        # ASCII scope (chars == bytes), same rationale as the video/audio
        # oracles; a no-op on the synthetic corpus
        & (F.length("text") == F.octet_length("text"))
    )
    media = d.select(
        F.col("doc_id").alias("media_id"),
        F.lit("image").alias("kind"),
        F.col("text").cast("binary").alias("payload"),
        F.struct(
            F.floor(F.length("text") / 16).cast("int").alias("width"),
            F.lit(16).alias("height"),
            F.lit(1).alias("channels"),
            F.lit(None).cast("int").alias("sample_rate"),
            F.lit(1).alias("n_frames"),
            F.lit("fake/raw").alias("format"),
        ).alias("meta"),
    )
    return phash_neardup_pairs(media).orderBy("media_a", "media_b")


@query("pq_quantize_embeddings")  # rows-only: k-means codebooks aren't SQL
def pq_quantize_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantize the embedding corpus: 64-dim float -> 8 one-byte
    codes (32x compression) + per-vector squared reconstruction error.
    Codes are flattened to scalar columns for the driver check;
    exactness/recall is pytest-covered (tests/test_pq.py)."""
    from ..operators.pq import pq_encode, train_pq_codebooks

    emb = load_table(spark, sf_dir, "embeddings")
    books = train_pq_codebooks(emb)
    coded = pq_encode(emb, books)
    return coded.select(
        "vec_id",
        *[F.col("codes")[i].alias(f"code_{i}") for i in range(8)],
        "recon_err",
    )


@query("ann_pq_adc_topk")  # rows-only: approximate by construction
def ann_pq_adc_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compressed-domain ANN: the same 8-query top-5 task as the
    brute-force/LSH/IVF variants, but scored against PQ codes via
    asymmetric distance (full-precision query x quantized corpus) —
    the memory-bound regime's search path."""
    from ..operators.pq import pq_adc_topk, pq_encode, train_pq_codebooks

    emb = load_table(spark, sf_dir, "embeddings")
    books = train_pq_codebooks(emb)
    coded = pq_encode(emb, books).select("vec_id", "codes")
    queries = emb.where(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    return pq_adc_topk(coded, queries, books, k=5).select(
        "query_id", "neighbor_id", "rank"
    )


@query(
    "cms_token_heavy_hitters",
    # Replay oracle: the md5-prefix bucketing makes the whole sketch
    # deterministic integer arithmetic, so DuckDB rebuilds the IDENTICAL
    # d x w grid and point-queries it — the hash-match verifies the
    # sketch structure and its estimates, not just row counts.
    oracle="""
    WITH toks AS (
      SELECT unnest(regexp_split_to_array(trim(text), ' +')) AS item
      FROM documents
    ), grid AS (
      SELECT row_id,
             ('0x' || substr(md5(item || '|' || CAST(row_id AS VARCHAR)),
                             1, 15))::BIGINT % 256 AS bucket,
             count(*) AS cnt
      FROM toks, (SELECT unnest([0,1,2,3]) AS row_id) r
      GROUP BY 1, 2
    ), cand AS (
      SELECT item FROM (
        SELECT item, count(*) AS n FROM toks
        GROUP BY item ORDER BY n DESC, item LIMIT 20)
    ), probes AS (
      SELECT item, row_id,
             ('0x' || substr(md5(item || '|' || CAST(row_id AS VARCHAR)),
                             1, 15))::BIGINT % 256 AS bucket
      FROM cand, (SELECT unnest([0,1,2,3]) AS row_id) r
    )
    SELECT p.item, CAST(min(coalesce(g.cnt, 0)) AS BIGINT) AS est_count
    FROM probes p
    LEFT JOIN grid g ON g.row_id = p.row_id AND g.bucket = p.bucket
    GROUP BY p.item
    ORDER BY p.item
    """,
)
def cms_token_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min-sketch frequency estimates for the 20 most frequent
    tokens: build the d x w grid over all token occurrences, then
    point-query the candidate set. Estimates are one-sided (>= exact);
    exactness bounds and mergeability are pytest-covered
    (tests/test_cms.py); the DuckDB oracle replays the md5-bucketed
    grid. The exact twin for small corpora is vocab_topk_per_lang."""
    from ..operators.cms import cms_build, cms_estimate
    from ..tables import spread_small_scan

    d = load_table(spark, sf_dir, "documents")
    # r13 (guide §2.3 "aggregate before you shuffle"): ONE corpus token
    # pass into a pinned vocabulary-sized (item, n) count relation —
    # the sketch builds from it WEIGHTED (d md5s per DISTINCT token,
    # not per occurrence; identical grid by sum-of-weights) and the
    # exact top-20 candidate set reads the same relation. Before, the
    # sketch and the candidate count each re-ran the corpus explode,
    # and the sketch hashed every occurrence x depth. Spread front
    # door: one-row-group sf scan (no-op at scale).
    toks = spread_small_scan(d, "doc_id").select(
        F.explode(F.split(F.trim("text"), " +")).alias("item")
    )
    counts = pin(toks.groupBy("item").agg(F.count("*").alias("n")))
    sketch = cms_build(counts, weight_col="n")
    candidates = (
        counts.orderBy(F.desc("n"), "item").limit(20).select("item")
    )
    return cms_estimate(sketch, candidates).orderBy("item")


@query("ann_ivfpq_topk")  # rows-only: approximate by construction
def ann_ivfpq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The production ANN composition (FAISS IVFPQ shape): the coarse
    quantizer bounds candidates (nprobe inverted lists per query) AND
    product quantization bounds per-candidate cost (ADC over 8 one-byte
    codes) — the only variant where both the scan fraction and the
    bytes-per-candidate are sublinear, which is what a 100 TB corpus
    requires. Same 8-query top-5 task as the brute-force / LSH / IVF /
    PQ variants; recall floor + planted-twin pytest in
    tests/test_pq.py."""
    from ..operators.pq import ivfpq_topk, train_pq_codebooks
    from ..operators.similarity import train_ivf_centroids

    emb = load_table(spark, sf_dir, "embeddings")
    cents = train_ivf_centroids(emb, n_centroids=16)
    books = train_pq_codebooks(emb)
    queries = emb.where(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    return ivfpq_topk(emb, queries, cents, books, k=5, nprobe=3).select(
        "query_id", "neighbor_id", "rank"
    )


@query(
    "audio_energy_neardup",
    # HASH-ORACLED since r13 (was rows-only), same argument as the
    # video/image pipelines: on the ASCII byte-PCM corpus the
    # energy-delta hash is exact integer arithmetic — per-clip 65
    # floor-boundary frame ranges computed in-SQL from the operator's
    # formula (lo = i*n//65; hi = max(lo+1, next)), exact int64 frame
    # energies (sum of squared byte samples), each bit a
    # cross-multiplied rational comparison (e[i+1]*c[i] > e[i]*c[i+1]),
    # signatures as two's-complement bit-weight sums. Exact all-pairs
    # bit_count(xor) <= 3 re-proves the 4-chunk banding recall.
    oracle=f"""
    WITH eligible AS (
      SELECT doc_id, text, CAST(strlen(text) AS BIGINT) AS n
      FROM documents
      WHERE strlen(text) >= 130 AND length(text) = strlen(text)
    ), clips AS (
      SELECT doc_id AS media_id, text, n FROM eligible
      UNION ALL
      SELECT doc_id + {REINGEST_ID_FLAG}, text, n
      FROM eligible WHERE doc_id % 7 = 0
    ), fr AS (
      SELECT media_id, text, CAST(i.i AS BIGINT) AS i,
             (i.i * n) // 65 AS lo,
             greatest((i.i * n) // 65 + 1,
                      CASE WHEN i.i = 64 THEN n
                           ELSE ((i.i + 1) * n) // 65 END) AS hi
      FROM clips, unnest(range(0, 65)) AS i(i)
    ), samp AS (
      SELECT media_id, i,
             ord(substr(text, CAST(p.p + 1 AS INTEGER), 1)) AS v
      FROM fr, unnest(range(lo, hi)) AS p(p)
    ), en AS (
      SELECT media_id, i,
             CAST(sum(v * v) AS BIGINT) AS e,
             CAST(count(*) AS BIGINT) AS c
      FROM samp GROUP BY 1, 2
    ), ah AS (
      SELECT l.media_id,
             CAST(sum(CASE WHEN r.e * l.c > l.e * r.c
                      THEN {_VID_BITW.format(k='l.i')}
                      ELSE 0 END) AS BIGINT) AS audiohash
      FROM en l
      JOIN en r ON r.media_id = l.media_id AND r.i = l.i + 1
      WHERE l.i < 64
      GROUP BY 1
    )
    SELECT a.media_id AS media_a, b.media_id AS media_b,
           CAST(bit_count(xor(a.audiohash, b.audiohash)) AS INTEGER)
             AS hamming
    FROM ah a JOIN ah b ON a.media_id < b.media_id
    WHERE bit_count(xor(a.audiohash, b.audiohash)) <= 3
    ORDER BY media_a, media_b
    """,
)
def audio_energy_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio near-dup pairs (operators/audiohash.py): gain-invariant
    energy-delta fingerprints over the document-byte PCM corpus
    (each >=130-byte document's bytes as a mono 8-bit sample stream —
    deterministic in-container audio), banded Hamming pairing <= 3
    bits. The corpus models RE-INGESTION — every 7th clip also arrives
    under a second media id (the most common real dedup case: the same
    recording uploaded twice) — so the pair list deterministically
    contains those hamming-0 matches plus any organic envelope
    near-dups. Payload drops at the hash; 1 long per clip downstream."""
    from ..operators.audiohash import audio_neardup_pairs

    d = load_table(spark, sf_dir, "documents").where(
        (F.length("text") >= 130)
        # ASCII scope (chars == bytes): makes the DuckDB oracle's ord()
        # address the same bytes the binary cast yields; no-op corpus-wise
        & (F.length("text") == F.octet_length("text"))
    )

    def clips(docs: DataFrame, ids: F.Column) -> DataFrame:
        return docs.select(
            ids.alias("media_id"),
            F.lit("audio").alias("kind"),
            F.col("text").cast("binary").alias("payload"),
            F.struct(
                F.length("text").cast("int").alias("width"),
                F.lit(1).alias("height"),
                F.lit(1).alias("channels"),
                F.lit(8000).alias("sample_rate"),
                F.lit(1).alias("n_frames"),
                F.lit("fake/raw").alias("format"),
            ).alias("meta"),
        )

    # Re-ingested twins live in a reserved high-bit namespace (bit 40,
    # ~1.1e12) so a synthetic id can never collide with a real doc_id at
    # any realistic scale factor (real ids stay below 2^40; the old
    # doc_id + 1e6 scheme collided once a corpus passed a million docs).
    media = clips(d, F.col("doc_id")).unionByName(
        clips(
            d.where(F.col("doc_id") % 7 == 0),
            F.col("doc_id") + F.lit(REINGEST_ID_FLAG),
        )
    )
    return audio_neardup_pairs(media).orderBy("media_a", "media_b")


@query(
    "video_temporal_neardup",
    # HASH-ORACLED since r13 (was rows-only): on the fake/raw clip
    # corpus every stage is exact integer arithmetic — frame slicing is
    # byte addressing (the corpus is ASCII, filtered explicitly, so
    # DuckDB's per-character ord() IS the byte), the dHash is
    # block-mean sums compared by cross-multiplication over the FIXED
    # 6x16 geometry (inlined VALUES from the same boundary formula),
    # signatures assemble as two's-complement bit-weight sums, and the
    # alignment vote is count-distinct + argmax algebra. The oracle
    # pairs frames by EXACT all-pairs Hamming (bit_count(xor) <= 3), so
    # a green hash additionally re-proves the Spark side's 4-chunk
    # banding recall (pigeonhole-complete at <= 3 bits) every round —
    # the dedup_simhash / minhash pattern. Real-codec corpora (mp4 via
    # pyav) would be rows-only; this synthetic byte-buffer corpus is
    # the SQL-replayable case.
    oracle=f"""
    WITH eligible AS (
      SELECT doc_id, text,
             least(CAST(strlen(text) // 96 AS BIGINT), 12) AS nf
      FROM documents
      WHERE strlen(text) >= 288 AND length(text) = strlen(text)
    ), clips AS (
      SELECT doc_id AS media_id, text AS payload, nf FROM eligible
      UNION ALL
      SELECT doc_id + {REINGEST_ID_FLAG}, substr(text, 97, 1056), nf - 1
      FROM eligible WHERE doc_id % 5 = 0
    ), frames AS (
      SELECT media_id, payload, CAST(f.f AS BIGINT) AS frame_idx
      FROM clips, unnest(range(0, nf)) AS f(f)
    ), px AS (
      SELECT media_id, frame_idx, y.y AS y, x.x AS x,
             ord(substr(payload,
                        CAST(frame_idx*96 + y.y*16 + x.x + 1 AS INTEGER),
                        1)) AS v
      FROM frames, unnest(range(0, 6)) AS y(y), unnest(range(0, 16)) AS x(x)
    ), rows8(i, y0, y1) AS (VALUES {_VID_ROWS8}),
    cols9(j, x0, x1) AS (VALUES {_VID_COLS9}),
    s9 AS (
      SELECT media_id, frame_idx, r.i AS i, c.j AS j,
             CAST(sum(v) AS BIGINT) AS s, CAST(count(*) AS BIGINT) AS a
      FROM px
      JOIN rows8 r ON px.y >= r.y0 AND px.y < r.y1
      JOIN cols9 c ON px.x >= c.x0 AND px.x < c.x1
      GROUP BY 1, 2, 3, 4
    ), dh AS (
      SELECT l.media_id, l.frame_idx,
             CAST(sum(CASE WHEN l.s * r.a > r.s * l.a
                      THEN {_VID_BITW.format(k='l.i*8 + l.j')}
                      ELSE 0 END) AS BIGINT) AS dhash
      FROM s9 l
      JOIN s9 r ON r.media_id = l.media_id AND r.frame_idx = l.frame_idx
               AND r.i = l.i AND r.j = l.j + 1
      WHERE l.j < 8
      GROUP BY 1, 2
    ), nfm AS (
      SELECT media_id, CAST(count(*) AS BIGINT) AS nf
      FROM dh GROUP BY 1
    ), votes AS (
      SELECT a.media_id AS media_a, b.media_id AS media_b,
             b.frame_idx - a.frame_idx AS "offset",
             CAST(count(DISTINCT a.frame_idx) AS BIGINT) AS aligned_frames
      FROM dh a JOIN dh b
        ON a.media_id < b.media_id
       AND bit_count(xor(a.dhash, b.dhash)) <= 3
      GROUP BY 1, 2, 3
    ), best AS (
      SELECT *,
             row_number() OVER (PARTITION BY media_a, media_b
                                ORDER BY aligned_frames DESC, "offset" ASC)
               AS rn
      FROM votes
    )
    SELECT b.media_a, b.media_b, b."offset", b.aligned_frames,
           least(na.nf, nb.nf) AS min_frames,
           CAST(b.aligned_frames AS DOUBLE)
             / CAST(least(na.nf, nb.nf) AS DOUBLE) AS aligned_frac
    FROM best b
    JOIN nfm na ON na.media_id = b.media_a
    JOIN nfm nb ON nb.media_id = b.media_b
    WHERE b.rn = 1
      AND CAST(b.aligned_frames AS DOUBLE)
            / CAST(least(na.nf, nb.nf) AS DOUBLE) >= 0.6
    ORDER BY media_a, media_b
    """,
)
def video_temporal_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video near-dup pairs (operators/phash.py video_neardup_pairs):
    documents >= 288 bytes become deterministic fake/raw clips (each
    consecutive 96-byte slice is one 6x16 gray frame, <= 12 frames), and
    every 5th clip ALSO re-arrives truncated — first frame dropped, same
    bytes after — under the reserved re-ingestion namespace: the trimmed
    re-upload case. The planted twins must pair at offset -1 with full
    alignment; coincidental single-frame matches fail the >= 60% vote.
    Payload drops at the per-frame hash: 2 longs per frame downstream.

    Clip corpus is scoped to ASCII documents (chars == bytes, explicit
    filter — a no-op on the synthetic corpus) so the DuckDB oracle's
    per-character ord() addresses the same bytes the binary cast
    yields; see the oracle comment for why that makes the whole
    pipeline hash-verifiable here."""
    from ..operators.phash import video_neardup_pairs

    FRAME_BYTES = 96  # 6 rows x 16 cols x 1 channel
    d = (
        load_table(spark, sf_dir, "documents")
        .where(F.length("text") == F.octet_length("text"))
        .select("doc_id", F.col("text").cast("binary").alias("bin"))
    )
    d = d.where(F.length("bin") >= 3 * FRAME_BYTES).withColumn(
        "nf",
        F.least(
            (F.length("bin") / FRAME_BYTES).cast("int"), F.lit(12)
        ),
    )

    def vids(rows: DataFrame, ids: F.Column, payload: F.Column, nf: F.Column) -> DataFrame:
        return rows.select(
            ids.alias("media_id"),
            F.lit("video").alias("kind"),
            payload.alias("payload"),
            F.struct(
                F.lit(16).alias("width"),
                F.lit(6).alias("height"),
                F.lit(1).alias("channels"),
                F.lit(None).cast("int").alias("sample_rate"),
                nf.cast("int").alias("n_frames"),
                F.lit("fake/raw").alias("format"),
            ).alias("meta"),
        )

    base = vids(d, F.col("doc_id"), F.col("bin"), F.col("nf"))
    twins = vids(
        d.where(F.col("doc_id") % 5 == 0),
        F.col("doc_id") + F.lit(REINGEST_ID_FLAG),
        F.expr(f"substring(bin, {FRAME_BYTES + 1}, {FRAME_BYTES * 11})"),
        F.col("nf") - 1,
    )
    return video_neardup_pairs(base.unionByName(twins)).orderBy(
        "media_a", "media_b"
    )


def _mp_planes_values_sql(
    dim: int = 64, n_bits: int = 8, n_tables: int = 4
) -> str:
    """The QUANTIZED hyperplanes as (table_id, bit, h BIGINT[]) VALUES —
    exact integers, so the oracle's margins (and hence bucket signs and
    probe order) are arithmetic identities with the Spark side, not
    1-ulp float races."""
    from ..operators.similarity import quantized_planes

    qp = quantized_planes(dim, n_bits, n_tables, seed=42)
    rows = []
    for t in range(n_tables):
        for b in range(n_bits):
            arr = ", ".join(str(int(x)) for x in qp[t, b])
            rows.append(f"({t}, {b}, CAST([{arr}] AS BIGINT[]))")
    return ",\n      ".join(rows)


@query(
    "ann_multiprobe_lsh_topk",
    # Full replay of multi-probe LSH (Lv et al. 2007): both engines
    # floor-quantize vectors at 2^20 against the inlined quantized
    # planes, so every margin is the same exact int64 — bucket signs
    # AND the ascending-|margin| probe order are arithmetic identities.
    # The corpus indexes home buckets only; queries probe home + the 2
    # lowest-margin single-bit flips per table; exact cosine re-rank on
    # the candidate union. A green hash verifies the probe sequence
    # itself, which float margins could never guarantee cross-engine.
    oracle=f"""
    WITH planes(table_id, bit, h) AS (
      VALUES {_mp_planes_values_sql()}
    ),
    corpus AS (
      SELECT vec_id,
             list_transform(CAST(embedding AS DOUBLE[]),
                            x -> CAST(floor(x * 1048576) AS BIGINT)) AS q,
             CAST(embedding AS DOUBLE[]) AS v
      FROM embeddings
    ),
    margins AS (
      SELECT c.vec_id, p.table_id, p.bit,
             CAST(sum(c.q[d.d + 1] * p.h[d.d + 1]) AS BIGINT) AS m
      FROM corpus c CROSS JOIN planes p, unnest(range(0, 64)) AS d(d)
      GROUP BY 1, 2, 3
    ),
    buckets AS (
      SELECT vec_id, table_id,
             CAST(sum(CASE WHEN m > 0 THEN 1::BIGINT << bit
                      ELSE 0 END) AS BIGINT) AS bucket
      FROM margins GROUP BY 1, 2
    ),
    flips AS (
      SELECT vec_id, table_id, bit,
             row_number() OVER (PARTITION BY vec_id, table_id
                                ORDER BY abs(m) ASC, bit ASC) AS rn
      FROM margins WHERE vec_id < 8
    ),
    qprobes AS (
      SELECT vec_id AS query_id, table_id, bucket
      FROM buckets WHERE vec_id < 8
      UNION ALL
      SELECT f.vec_id, f.table_id,
             CAST(xor(b.bucket, 1::BIGINT << f.bit) AS BIGINT)
      FROM flips f
      JOIN buckets b ON b.vec_id = f.vec_id AND b.table_id = f.table_id
      WHERE f.rn <= 2
    ),
    cand AS (
      SELECT DISTINCT q.query_id, bn.vec_id AS neighbor_id
      FROM qprobes q
      JOIN buckets bn ON bn.table_id = q.table_id
                     AND bn.bucket = q.bucket
      WHERE bn.vec_id <> q.query_id
    ),
    scored AS (
      SELECT c.query_id, c.neighbor_id,
             list_cosine_similarity(qq.v, co.v) AS score
      FROM cand c
      JOIN corpus qq ON qq.vec_id = c.query_id
      JOIN corpus co ON co.vec_id = c.neighbor_id
    )
    SELECT query_id, neighbor_id, CAST(rank AS INTEGER) AS rank FROM (
      SELECT query_id, neighbor_id,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY score DESC, neighbor_id) AS rank
      FROM scored
    ) WHERE rank <= 5
    """,
)
def ann_multiprobe_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-probe LSH approximate cosine top-5 for the standard query
    set: the corpus hashes to HOME buckets only (4 tables x 8 bits)
    while each query additionally probes the 2 lowest-|margin|
    single-bit flips per table — buying back the recall extra tables
    would cost in CORPUS index replication with query-side-only work
    (at 100 TB the index is the expensive side; probes are 12 tiny
    bucket keys per query). Margins are exact fixed-point int64 (both
    engines floor-quantize at 2^20 against the same inlined integer
    planes), so the probe sequence is hash-verified, not approximately
    replayed; recall vs brute force is pytest-checked beside the
    single-probe variant."""
    from ..operators.similarity import ann_multiprobe_topk

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    return ann_multiprobe_topk(emb, queries, k=5).select(
        "query_id", "neighbor_id", "rank"
    )
