"""Training-data pipeline queries: dedup / similarity / text analysis /
multimodal plumbing over the ``documents`` and ``embeddings`` tables.

Every hash used here is md5-derived (engine-portable), so even MinHash
and SimHash — normally "non-SQL-expressible" — get full DuckDB oracles.
The oracle SQL mirrors the Spark expression tree operation-for-operation
(same fold order, same division order) so doubles agree bit-for-bit.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_spark.ops import dedup, multimodal, similarity, text
from etl_spark.queries import load, register

# shared DuckDB fragments (mirror etl_spark.ops.text exactly)
_TOKS = "list_filter(string_split(text, ' '), x -> x <> '')"
_SHINGLES = (
    "CASE WHEN len(toks) >= 3 THEN list_transform(generate_series(1, len(toks) - 2),"
    " i -> array_to_string(toks[i:i+2], ' ')) ELSE [] END"
)
_STOPS = "('the', 'a', 'and', 'of', 'to', 'in', 'is')"
_DDOT = "list_dot_product(CAST({a} AS DOUBLE[]), CAST({b} AS DOUBLE[]))"


def _cos_sql(a: str, b: str) -> str:
    return (
        f"{_DDOT.format(a=a, b=b)} / "
        f"(sqrt({_DDOT.format(a=a, b=a)}) * sqrt({_DDOT.format(a=b, b=b)}))"
    )


# --------------------------------------------------------------------------
# text analysis
# --------------------------------------------------------------------------


@register(
    "docs_token_stats",
    f"""
    WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents)
    SELECT doc_id,
           CAST(len(toks) AS BIGINT) AS n_tokens,
           CAST(len(list_distinct(toks)) AS BIGINT) AS n_distinct_tokens,
           floor((list_sum(list_transform(toks, x -> length(x))) / len(toks)) * 10000)
             / 10000 AS avg_token_len
    FROM t
    """,
)
def docs_token_stats(spark: SparkSession, sf: str) -> DataFrame:
    return text.token_stats(load(spark, sf, "documents"))


@register(
    "docs_quality",
    f"""
    WITH t AS (SELECT doc_id, length(text) AS n_chars, {_TOKS} AS toks FROM documents),
         s AS (SELECT doc_id, n_chars, len(toks) AS n,
                      len(list_filter(toks, x -> x IN {_STOPS})) AS stop_hits,
                      list_sum(list_transform(toks, x -> length(x))) AS sum_len
               FROM t)
    SELECT doc_id, CAST(n_chars AS BIGINT) AS n_chars, CAST(n AS BIGINT) AS n_tokens,
           CAST(stop_hits AS BIGINT) AS stop_hits,
           floor((least(n / 100.0, 1.0) * 0.5 + (stop_hits / n) * 0.3
                 + least((sum_len / n) / 8.0, 1.0) * 0.2) * 10000) / 10000 AS quality
    FROM s
    """,
)
def docs_quality(spark: SparkSession, sf: str) -> DataFrame:
    return text.quality_score(load(spark, sf, "documents"))


@register(
    "docs_lang_guess",
    f"""
    WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
         h AS (SELECT doc_id,
                 len(list_filter(toks, x -> x IN ('the','a','and','of','is'))) AS en,
                 len(list_filter(toks, x -> x IN ('der','die','das','und','ist'))) AS de,
                 len(list_filter(toks, x -> x IN ('le','la','les','et','est'))) AS fr,
                 len(list_filter(toks, x -> x IN ('el','los','las','y','es'))) AS es
               FROM t)
    SELECT doc_id,
           CASE WHEN en >= de AND en >= fr AND en >= es AND en > 0 THEN 'en'
                WHEN de >= fr AND de >= es AND de > 0 THEN 'de'
                WHEN fr >= es AND fr > 0 THEN 'fr'
                WHEN es > 0 THEN 'es'
                ELSE 'unk' END AS lang_guess,
           CAST(en AS BIGINT) AS en_hits, CAST(de AS BIGINT) AS de_hits,
           CAST(fr AS BIGINT) AS fr_hits, CAST(es AS BIGINT) AS es_hits
    FROM h
    """,
)
def docs_lang_guess(spark: SparkSession, sf: str) -> DataFrame:
    return text.lang_id(load(spark, sf, "documents"))


@register(
    "docs_fingerprint",
    f"""
    WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
         d AS (SELECT doc_id, list_distinct({_SHINGLES}) AS sh FROM t)
    SELECT doc_id,
           list_aggregate(list_transform(sh, s -> md5(s)), 'min') AS fp_min_hash,
           CAST(len(sh) AS BIGINT) AS n_shingles
    FROM d
    """,
)
def docs_fingerprint(spark: SparkSession, sf: str) -> DataFrame:
    return text.fingerprint(load(spark, sf, "documents"))


@register(
    "docs_split_assign",
    """
    SELECT doc_id,
           CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '#split'), 1, 15))::BIGINT
                % 100 AS BIGINT) AS pct_bucket,
           CASE WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '#split'), 1, 15))::BIGINT
                     % 100 < 80 THEN 'train'
                WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '#split'), 1, 15))::BIGINT
                     % 100 < 90 THEN 'val'
                ELSE 'test' END AS split
    FROM documents
    """,
)
def docs_split_assign(spark: SparkSession, sf: str) -> DataFrame:
    """Deterministic 80/10/10 train/val/test assignment by content-free
    id hash — the standard leak-proof split (same doc always lands in the
    same split on every engine / every run; no shuffle at all)."""
    h = text.md5_long(F.concat(F.col("doc_id").cast("string"), F.lit("#split")))
    pct = (h % 100).cast("long")
    split = (
        F.when(pct < 80, F.lit("train")).when(pct < 90, F.lit("val")).otherwise(
            F.lit("test")
        )
    )
    return load(spark, sf, "documents").select(
        "doc_id", pct.alias("pct_bucket"), split.alias("split")
    )


@register(
    "docs_corpus_summary",
    f"""
    WITH t AS (SELECT doc_id, lang, {_TOKS} AS toks FROM documents),
         s AS (SELECT lang, CAST(len(toks) AS BIGINT) AS n_tokens FROM t)
    SELECT lang, COUNT(*) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
           MIN(n_tokens) AS min_tokens, MAX(n_tokens) AS max_tokens
    FROM s GROUP BY ROLLUP(lang)
    """,
)
def docs_corpus_summary(spark: SparkSession, sf: str) -> DataFrame:
    """Dataset-card corpus statistics: per-language token accounting with
    a grand-total rollup row (exact integer sums — no float parity risk)."""
    toks = text.tokens(F.col("text"))
    return (
        load(spark, sf, "documents")
        .select("lang", F.size(toks).cast("long").alias("n_tokens"))
        .rollup("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
            F.min("n_tokens").alias("min_tokens"),
            F.max("n_tokens").alias("max_tokens"),
        )
    )


# --------------------------------------------------------------------------
# deduplication
# --------------------------------------------------------------------------


@register(
    "dedup_exact_docs",
    """
    SELECT md5(text) AS text_md5, COUNT(*) AS n_docs, MIN(doc_id) AS keep_doc_id
    FROM documents GROUP BY md5(text)
    """,
)
def dedup_exact_docs(spark: SparkSession, sf: str) -> DataFrame:
    return dedup.exact_dup_groups(load(spark, sf, "documents"))


@register(
    "dedup_ngram_jaccard",
    f"""
    WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
         sh AS (SELECT doc_id AS _id, unnest(list_distinct({_SHINGLES})) AS shingle FROM t),
         sizes AS (SELECT _id, COUNT(*) AS n FROM sh GROUP BY _id),
         inter AS (SELECT a._id AS id_a, b._id AS id_b, COUNT(*) AS n_common
                   FROM sh a JOIN sh b ON a.shingle = b.shingle AND a._id < b._id
                   GROUP BY a._id, b._id)
    SELECT id_a, id_b, n_common,
           floor((n_common / (sa.n + sb.n - n_common)) * 1000000) / 1000000 AS jaccard
    FROM inter JOIN sizes sa ON sa._id = id_a JOIN sizes sb ON sb._id = id_b
    WHERE floor((n_common / (sa.n + sb.n - n_common)) * 1000000) / 1000000 >= 0.05
    """,
)
def dedup_ngram_jaccard(spark: SparkSession, sf: str) -> DataFrame:
    return dedup.ngram_jaccard_pairs(load(spark, sf, "documents"), threshold=0.05)


@register(
    "dedup_minhash_signatures",
    f"""
    WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
         d AS (SELECT doc_id, list_distinct({_SHINGLES}) AS sh FROM t)
    SELECT doc_id,
           {', '.join(
               f"list_aggregate(list_transform(sh, s -> md5(s || '#{i}')), 'min') AS mh{i}"
               for i in range(6)
           )}
    FROM d
    """,
    # local-only: the MinHash signature stage is driver-verified inside
    # dedup_minhash_lsh_pairs (same signature CTE feeds the band join)
    export=False,
)
def dedup_minhash_signatures(spark: SparkSession, sf: str) -> DataFrame:
    return dedup.minhash_signature(load(spark, sf, "documents"), n_hashes=6)


@register(
    "dedup_minhash_lsh_pairs",
    f"""
    WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
         d AS (SELECT doc_id, list_distinct({_SHINGLES}) AS sh FROM t),
         sig AS (SELECT doc_id,
                   {', '.join(
                       f"list_aggregate(list_transform(sh, s -> md5(s || '#{i}')), 'min') AS mh{i}"
                       for i in range(6)
                   )}
                 FROM d WHERE len(sh) > 0),
         bands AS (
           SELECT doc_id, 0 AS band, mh0 || '|' || mh1 AS band_key FROM sig
           UNION ALL SELECT doc_id, 1, mh2 || '|' || mh3 FROM sig
           UNION ALL SELECT doc_id, 2, mh4 || '|' || mh5 FROM sig)
    SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_bands
    FROM bands a JOIN bands b
      ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id
    GROUP BY a.doc_id, b.doc_id
    """,
)
def dedup_minhash_lsh_pairs(spark: SparkSession, sf: str) -> DataFrame:
    return dedup.minhash_lsh_pairs(
        load(spark, sf, "documents"), n_hashes=6, band_size=2
    )


@register(
    "dedup_cluster_neardups",
    f"""
    WITH RECURSIVE
      t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
      d AS (SELECT doc_id, list_distinct({_SHINGLES}) AS sh FROM t),
      sig AS (SELECT doc_id,
                {', '.join(
                    f"list_aggregate(list_transform(sh, s -> md5(s || '#{i}')), 'min') AS mh{i}"
                    for i in range(6)
                )}
              FROM d WHERE len(sh) > 0),
      bands AS (
        SELECT doc_id, 0 AS band, mh0 || '|' || mh1 AS band_key FROM sig
        UNION ALL SELECT doc_id, 1, mh2 || '|' || mh3 FROM sig
        UNION ALL SELECT doc_id, 2, mh4 || '|' || mh5 FROM sig),
      pairs AS (
        SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        FROM bands a JOIN bands b
          ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id),
      edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
                UNION SELECT id_b, id_a FROM pairs),
      reach(node, label) AS (
        SELECT doc_id, doc_id FROM documents
        UNION
        SELECT e.src, r.label FROM reach r JOIN edges e ON e.dst = r.node)
    SELECT node AS doc_id, MIN(label) AS cluster_id FROM reach GROUP BY node
    """,
)
def dedup_cluster_neardups(spark: SparkSession, sf: str) -> DataFrame:
    """Near-duplicate CLUSTERING: MinHash-LSH candidate pairs -> connected
    components (min-label propagation) -> one canonical keeper per
    cluster.  The oracle expresses the same fixpoint as a recursive CTE."""
    docs = load(spark, sf, "documents")
    pairs = dedup.minhash_lsh_pairs(docs, n_hashes=6, band_size=2)
    return dedup.duplicate_clusters(pairs, docs)


@register(
    "dedup_simhash_docs",
    """
    WITH t AS (SELECT doc_id,
                 list_distinct(list_filter(string_split(text, ' '), x -> x <> '')) AS toks
               FROM documents),
         tok AS (SELECT doc_id, unnest(toks) AS tok FROM t),
         v AS (SELECT doc_id, ('0x' || substr(md5(tok), 1, 4))::BIGINT AS v FROM tok),
         votes AS (SELECT doc_id, bit,
                     SUM((CAST(floor(v / power(2, bit)) AS BIGINT) % 2) * 2 - 1) AS tally
                   FROM v, (SELECT unnest(generate_series(0, 15)) AS bit) bits
                   GROUP BY doc_id, bit)
    SELECT doc_id,
           CAST(SUM(CASE WHEN tally > 0 THEN CAST(power(2, bit) AS BIGINT) ELSE 0 END)
                AS BIGINT) AS simhash
    FROM votes GROUP BY doc_id
    """,
    # local-only: toy 16-bit form superseded by dedup_simhash64_pairs
    export=False,
)
def dedup_simhash_docs(spark: SparkSession, sf: str) -> DataFrame:
    return dedup.simhash(load(spark, sf, "documents"), bits=16)


def _simhash64_oracle(max_distance: int = 3, wb: int = 16, nw: int = 4) -> str:
    # mirrors dedup.simhash_words + simhash_hamming_pairs expression tree
    v_cols = ", ".join(
        f"('0x' || substr(md5(tok || '@{w}'), 1, 4))::BIGINT AS v{w}"
        for w in range(nw)
    )
    vote_cols = ", ".join(
        f"SUM(((v{w} >> {bit}) & 1) * 2 - 1) AS t_{w}_{bit}"
        for w in range(nw)
        for bit in range(wb)
    )
    word_cols = ", ".join(
        "CAST("
        + " + ".join(
            f"(CASE WHEN t_{w}_{bit} > 0 THEN {1 << bit} ELSE 0 END)"
            for bit in range(wb)
        )
        + f" AS BIGINT) AS w{w}"
        for w in range(nw)
    )
    band_sel = " UNION ALL ".join(
        f"SELECT doc_id, {w} AS band, w{w} AS wv FROM sig" for w in range(nw)
    )
    ham = " + ".join(f"bit_count(xor(sa.w{w}, sb.w{w}))" for w in range(nw))
    return f"""
    WITH t AS (SELECT doc_id, list_distinct({_TOKS}) AS toks FROM documents),
         tok AS (SELECT doc_id, unnest(toks) AS tok FROM t),
         v AS (SELECT doc_id, {v_cols} FROM tok),
         votes AS (SELECT doc_id, {vote_cols} FROM v GROUP BY doc_id),
         sig AS (SELECT doc_id, {word_cols} FROM votes),
         bands AS ({band_sel}),
         cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
                  FROM bands a JOIN bands b
                    ON a.band = b.band AND a.wv = b.wv AND a.doc_id < b.doc_id)
    SELECT id_a, id_b, CAST({ham} AS BIGINT) AS hamming
    FROM cand JOIN sig sa ON sa.doc_id = id_a JOIN sig sb ON sb.doc_id = id_b
    WHERE {ham} <= {max_distance}
    """


@register("dedup_simhash64_pairs", _simhash64_oracle())
def dedup_simhash64_pairs(spark: SparkSession, sf: str) -> DataFrame:
    """64-bit SimHash near-dup pairs via hamming banding: 4×16-bit words,
    exact (pigeonhole-complete) for distance <= 3.  Band equi-joins only —
    plan shape pinned in tests/test_plan_quality.py."""
    return dedup.simhash_hamming_pairs(
        load(spark, sf, "documents"), max_distance=3
    )


@register(
    "dedup_embedding_neardup",
    f"""
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           floor(({_cos_sql('a.embedding', 'b.embedding')}) * 10000) / 10000 AS cos_sim
    FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
    WHERE floor(({_cos_sql('a.embedding', 'b.embedding')}) * 10000) / 10000 >= 0.5
    """,
    # local-only: the quadratic all-pairs baseline; the driver-verified
    # artifact is the sign-LSH bucketed twin below
    export=False,
)
def dedup_embedding_neardup(spark: SparkSession, sf: str) -> DataFrame:
    return dedup.embedding_neardup_pairs(
        load(spark, sf, "embeddings"), threshold=0.5, bucket_bits=0
    )


_SIGN_BUCKET_SQL = " + ".join(
    f"(CASE WHEN {{v}}[{i + 1}] >= 0 THEN {1 << i} ELSE 0 END)" for i in range(8)
)


@register(
    "dedup_embedding_neardup_bucketed",
    f"""
    WITH b AS (SELECT vec_id, embedding,
                 CAST({_SIGN_BUCKET_SQL.format(v='embedding')} AS BIGINT) AS bkt
               FROM embeddings)
    SELECT a.vec_id AS id_a, c.vec_id AS id_b,
           floor(({_cos_sql('a.embedding', 'c.embedding')}) * 10000) / 10000 AS cos_sim
    FROM b a JOIN b c ON a.bkt = c.bkt AND a.vec_id < c.vec_id
    WHERE floor(({_cos_sql('a.embedding', 'c.embedding')}) * 10000) / 10000 >= 0.3
    """,
)
def dedup_embedding_neardup_bucketed(spark: SparkSession, sf: str) -> DataFrame:
    """The SCALE path for embedding near-dup, oracle-checked: sign-LSH
    bucket equi-join (O(n²/2^b) candidate pairs), never a cross join.
    The plan shape is pinned by tests/test_plan_quality.py.  Threshold
    0.3 keeps the driver check non-trivial (~24 pairs at sf0.01 — the
    0.5-cosine pairs mostly straddle bucket boundaries at 2^8 buckets)."""
    return dedup.embedding_neardup_pairs(
        load(spark, sf, "embeddings"), threshold=0.3, bucket_bits=8
    )


# --------------------------------------------------------------------------
# similarity search
# --------------------------------------------------------------------------


@register(
    "ann_cosine_topk",
    f"""
    WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 8),
         base AS (SELECT vec_id AS neighbor_id, embedding AS v FROM embeddings),
         scored AS (SELECT query_id, neighbor_id,
                      {_cos_sql('qv', 'v')} AS cos
                    FROM q JOIN base ON neighbor_id <> query_id),
         ranked AS (SELECT query_id, neighbor_id,
                      CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                           ORDER BY cos DESC, neighbor_id) AS BIGINT) AS rank
                    FROM scored)
    SELECT query_id, neighbor_id, rank FROM ranked WHERE rank <= 5
    """,
)
def ann_cosine_topk(spark: SparkSession, sf: str) -> DataFrame:
    emb = load(spark, sf, "embeddings")
    return similarity.brute_force_topk(emb, emb.filter(F.col("vec_id") < 8), k=5)


@register(
    "ann_sign_lsh_buckets",
    # reuse the ONE sign-bucket SQL fragment so this oracle can never
    # drift from the bucketed-near-dup oracle or similarity.sign_bucket
    f"""
    SELECT bucket, COUNT(*) AS n_vectors FROM (
      SELECT CAST({{expr}} AS BIGINT) AS bucket
      FROM embeddings) GROUP BY bucket
    """.format(expr=_SIGN_BUCKET_SQL.format(v="embedding")),
)
def ann_sign_lsh_buckets(spark: SparkSession, sf: str) -> DataFrame:
    emb = load(spark, sf, "embeddings")
    return (
        emb.select(similarity.sign_bucket(F.col("embedding"), 8).alias("bucket"))
        .groupBy("bucket")
        .agg(F.count("*").alias("n_vectors"))
    )


# random-hyperplane LSH: seeded-numpy hyperplanes are not reproducible in
# SQL; local-only (pytest determinism + partitioning-invariance tests) —
# the driver-verified LSH artifact is ann_sign_lsh_buckets
@register("ann_random_hyperplane_buckets", export=False)
def ann_random_hyperplane_buckets(spark: SparkSession, sf: str) -> DataFrame:
    emb = load(spark, sf, "embeddings")
    return (
        similarity.random_hyperplane_buckets(emb, bits=8, dim=64, seed=42)
        .groupBy("bucket")
        .agg(F.count("*").alias("n_vectors"))
    )


# local-only: random-centroid IVF superseded by ann_ivf_kmeans_topk
@register("ann_ivf_topk", export=False)
def ann_ivf_topk(spark: SparkSession, sf: str) -> DataFrame:
    emb = load(spark, sf, "embeddings")
    return similarity.ivf_topk(
        emb, emb.filter(F.col("vec_id") < 8), k=5, n_cells=16, n_probe=4
    )


def ivf_kmeans_oracle_for(sf_dir: str, n_cells: int = 16, n_probe: int = 4, k: int = 5) -> str:
    """DuckDB oracle for the IVF k-means query, generated for a specific
    sf dir: the centroids are deterministic given the data (hash-ordered
    sample + seeded Lloyd — bit-equality of the Spark and Spark-free fits
    is pinned by tests), so they are embedded as DOUBLE[] literals and
    cell assignment becomes the same (dot desc, cell asc) ordering the
    Spark fold expressions compute.

    Only valid for the fold-expression assignment path: above
    ``literal_max_cells`` (64) ``ivf_topk`` switches to the BLAS matmul
    whose float-summation ORDER differs from DuckDB's strict-left-fold
    ``list_dot_product`` — a near-tie between two cells could then
    assign differently and hash-fail a correct query, so oracle
    generation refuses rather than silently diverging (r4 review)."""
    if n_cells > 64:
        raise ValueError(
            f"IVF oracle is only bit-reproducible on the fold path "
            f"(n_cells <= 64, got {n_cells}); the matmul path's summation "
            "order diverges from list_dot_product on near-ties"
        )
    cents = similarity.fit_centroids_local(
        f"{sf_dir}/embeddings.parquet", n_cells=n_cells
    )
    vals = ", ".join(
        f"({ci}, [{', '.join(repr(float(x)) for x in cents[ci])}]::DOUBLE[])"
        for ci in range(len(cents))
    )
    return f"""
    WITH cents AS (SELECT * FROM (VALUES {vals}) v(cell, cv)),
      q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
            FROM embeddings WHERE vec_id < 8),
      base AS (SELECT vec_id AS neighbor_id, CAST(embedding AS DOUBLE[]) AS v
               FROM embeddings),
      bcell AS (SELECT neighbor_id, cell FROM (
         SELECT neighbor_id, cell,
                ROW_NUMBER() OVER (PARTITION BY neighbor_id ORDER BY d DESC, cell) AS rn
         FROM (SELECT neighbor_id, cell, list_dot_product(v, cv) AS d
               FROM base CROSS JOIN cents)) WHERE rn = 1),
      qcell AS (SELECT query_id, cell FROM (
         SELECT query_id, cell,
                ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY d DESC, cell) AS rn
         FROM (SELECT query_id, cell, list_dot_product(qv, cv) AS d
               FROM q CROSS JOIN cents)) WHERE rn <= {n_probe}),
      cand AS (SELECT DISTINCT query_id, neighbor_id
               FROM qcell JOIN bcell USING (cell) WHERE neighbor_id <> query_id),
      scored AS (SELECT query_id, neighbor_id, {_cos_sql('qv', 'v')} AS cos
                 FROM cand JOIN q USING (query_id) JOIN base USING (neighbor_id)),
      ranked AS (SELECT query_id, neighbor_id,
                   CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                        ORDER BY cos DESC, neighbor_id) AS BIGINT) AS rank
                 FROM scored)
    SELECT query_id, neighbor_id, rank FROM ranked WHERE rank <= {k}
    """


# The driver runs oracles at sf0.01 (pre-registered DuckDB views); the
# local parity replica regenerates this oracle for whatever sf it tests.
# LAZY (ADVICE r3): the pyarrow read + k-means fit run at oracle_sql()
# time, not package import; a missing/corrupt embeddings file degrades
# the query to the rows-only check via resolved_oracles.
def _ivf_oracle() -> str:
    return ivf_kmeans_oracle_for(
        os.environ.get("ETL_SPARK_ORACLE_SF", "/root/testdata/sf0.01")
    )


@register("ann_ivf_kmeans_topk", _ivf_oracle)
def ann_ivf_kmeans_topk(spark: SparkSession, sf: str) -> DataFrame:
    """Production IVF path: centroids fit with sampled spherical k-means
    (deterministic hash-ordered sample), then assign → co-partition →
    local-brute-force.  Assignment runs as JVM fold expressions over the
    centroid literals (whole-stage codegen, bit-identical to the oracle's
    list_dot_product), so this is a full rows+schema+hash check.
    Measured recall vs exact: 0.7 at sf0.01 vs 0.4 with random centroids
    (equal n_probe)."""
    emb = load(spark, sf, "embeddings")
    cents = similarity.fit_centroids(emb, n_cells=16)
    return similarity.ivf_topk(
        emb, emb.filter(F.col("vec_id") < 8), k=5, n_cells=16, n_probe=4,
        centroids=cents,
    )


def pq_adc_oracle_for(
    sf_dir: str, n_subspaces: int = 16, n_centroids: int = 64, k: int = 5
) -> str:
    """DuckDB oracle for the PQ/ADC query — the same literal-embedding
    recipe that made the IVF query hash-checkable.  Everything the Spark
    path derives driver-side is deterministic given the data, so it is
    re-derived Spark-free and embedded as SQL literals:

    - codebooks (hash-ordered sample + seeded per-subspace k-means;
      Spark/local bit-equality pinned by tests) -> centroid vectors and
      their numpy-computed ||c||² as a VALUES table;
    - per-query ADC lookup tables (the exact arrays pq_topk broadcasts)
      -> DOUBLE[] literals.

    Encoding is recomputed relationally (argmin over ||c||² − 2·x·c per
    subspace, ties to the lowest centroid — numpy argmin's rule), and the
    ADC distance is an EXPLICIT 16-term sum in subspace order, matching
    the JVM's left-fold over element_at lookups bit-for-bit."""
    import numpy as np

    import pyarrow.parquet as papq

    books = similarity.fit_pq_codebooks_local(
        f"{sf_dir}/embeddings.parquet",
        n_subspaces=n_subspaces,
        n_centroids=n_centroids,
    )
    n_sub, n_cent, sub = books.shape
    csq = (books**2).sum(axis=2)  # same expression pq_encode ranks with
    book_vals = ", ".join(
        f"({s}, {ci}, [{', '.join(repr(float(x)) for x in books[s, ci])}]::DOUBLE[],"
        f" {float(csq[s, ci])!r})"
        for s in range(n_sub)
        for ci in range(n_cent)
    )
    tbl = papq.read_table(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    lut_vals = ", ".join(
        f"({int(qid)}, [{', '.join(repr(float(x)) for x in similarity.adc_lut(np.asarray(vec, dtype=np.float64), books))}]::DOUBLE[])"
        for qid, vec in zip(
            tbl.column("vec_id").to_pylist(), tbl.column("embedding").to_pylist()
        )
        if int(qid) < 8
    )
    dist = " + ".join(
        f"l.lut[{s * n_cent + 1} + c.code[{s + 1}]]" for s in range(n_sub)
    )
    return f"""
    WITH books AS (SELECT * FROM (VALUES {book_vals}) b(s, ci, cv, csq)),
      luts AS (SELECT * FROM (VALUES {lut_vals}) l(query_id, lut)),
      base AS (SELECT vec_id AS neighbor_id, CAST(embedding AS DOUBLE[]) AS v
               FROM embeddings),
      nrm AS (SELECT neighbor_id,
                     list_transform(v, x -> x / greatest(
                         sqrt(list_dot_product(v, v)), 1e-12)) AS x
              FROM base),
      codes AS (
        SELECT neighbor_id, s, ci FROM (
          SELECT n.neighbor_id, b.s, b.ci,
                 ROW_NUMBER() OVER (
                   PARTITION BY n.neighbor_id, b.s
                   ORDER BY b.csq - 2 * list_dot_product(
                     list_slice(n.x, b.s * {sub} + 1, b.s * {sub} + {sub}), b.cv),
                   b.ci) AS rn
          FROM nrm n CROSS JOIN books b) WHERE rn = 1),
      codearr AS (SELECT neighbor_id, list(ci ORDER BY s) AS code
                  FROM codes GROUP BY neighbor_id),
      scored AS (
        SELECT l.query_id, c.neighbor_id, {dist} AS d
        FROM codearr c CROSS JOIN luts l
        WHERE c.neighbor_id <> l.query_id),
      ranked AS (
        SELECT query_id, neighbor_id,
               CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                    ORDER BY d, neighbor_id) AS BIGINT) AS rank
        FROM scored)
    SELECT query_id, neighbor_id, rank FROM ranked WHERE rank <= {k}
    """


def _pq_oracle() -> str:
    return pq_adc_oracle_for(
        os.environ.get("ETL_SPARK_ORACLE_SF", "/root/testdata/sf0.01")
    )


@register("ann_pq_adc_topk", _pq_oracle)
def ann_pq_adc_topk(spark: SparkSession, sf: str) -> DataFrame:
    """Product-quantization ANN with asymmetric-distance search: vectors
    compress to 16 B codes (one Arrow matmul pass), then the search scan
    is a pure-JVM sum of lookup-table element_at's over the code column.
    Full rows+schema+hash check via codebook/LUT literal embedding.
    Measured recall@5 vs exact cosine: 0.55 at 16x64 on random gaussians
    (PQ's adversarial case)."""
    emb = load(spark, sf, "embeddings")
    books = similarity.fit_pq_codebooks(emb)
    return similarity.pq_topk(emb, emb.filter(F.col("vec_id") < 8), books, k=5)


@register(
    "emb_label_stats",
    f"""
    SELECT label, COUNT(*) AS n_vectors,
           floor((SUM(sqrt({_DDOT.format(a='embedding', b='embedding')})) / COUNT(*))
                 * 10000) / 10000 AS avg_norm
    FROM embeddings GROUP BY label
    """,
)
def emb_label_stats(spark: SparkSession, sf: str) -> DataFrame:
    norm = similarity.l2_norm(F.col("embedding"))
    return (
        load(spark, sf, "embeddings")
        .groupBy("label")
        .agg(
            F.count("*").alias("n_vectors"),
            text.floor_round(F.sum(norm) / F.count("*"), 4).alias("avg_norm"),
        )
    )


@register(
    "udaf_geomean_event_value",
    """
    SELECT event_type,
           floor(exp(SUM(ln(value)) / COUNT(*)) * 10000) / 10000 AS geo_mean,
           COUNT(*) AS n
    FROM events GROUP BY event_type
    """,
)
def udaf_geomean_event_value(spark: SparkSession, sf: str) -> DataFrame:
    """Custom UDAF surface: grouped-agg pandas UDF (Arrow-vectorized).

    Computed as exp(sum(ln x)/n) in BOTH engines with an explicit
    sequential reduction shape; floor-rounded for cross-engine parity.
    """
    import numpy as np
    from pyspark.sql.functions import PandasUDFType, pandas_udf

    # NB: explicit functionType — `from __future__ import annotations`
    # stringizes hints, defeating pandas_udf signature inference here
    # sort before summation: the shuffle delivers group rows in arbitrary
    # order, and float addition is not associative — sorting pins one
    # deterministic accumulation order across runs/partitionings
    @pandas_udf("double", PandasUDFType.GROUPED_AGG)
    def ln_sum(v):
        return float(np.sort(np.log(v.to_numpy(dtype="float64"))).sum())

    # Spark disallows mixing pandas and JVM aggregates in one agg —
    # the row count is a pandas aggregate too
    @pandas_udf("long", PandasUDFType.GROUPED_AGG)
    def n_rows(v):
        return len(v)

    return (
        load(spark, sf, "events")
        .groupBy("event_type")
        .agg(ln_sum("value").alias("_lnsum"), n_rows("value").alias("n"))
        .select(
            "event_type",
            text.floor_round(F.exp(F.col("_lnsum") / F.col("n")), 4).alias("geo_mean"),
            "n",
        )
    )


# applyInPandas grouped-map: numpy centroid per label.  numpy's pairwise
# summation differs from SQL's fold by ~1 ulp, so the comparable scalar
# is the FLOOR-ROUNDED centroid norm (1e-4 grid: a boundary-straddling
# divergence needs the two sums to differ across a multiple of 1e-4 —
# vanishingly unlikely at these magnitudes, same recipe emb_label_stats
# uses).  Dims fixed at 64 (the embeddings fixture schema).
@register(
    "emb_centroids_grouped",
    """
    WITH m AS (
      SELECT label, i, AVG(CAST(embedding[i] AS DOUBLE)) AS mu
      FROM embeddings CROSS JOIN generate_series(1, 64) s(i)
      GROUP BY label, i),
    norms AS (SELECT label, sqrt(SUM(mu * mu)) AS nrm FROM m GROUP BY label),
    counts AS (SELECT label, COUNT(*) AS n_vectors FROM embeddings GROUP BY label)
    SELECT label, n_vectors, floor(nrm * 10000) / 10000 AS centroid_norm
    FROM norms JOIN counts USING (label)
    """,
)
def emb_centroids_grouped(spark: SparkSession, sf: str) -> DataFrame:
    import math

    import numpy as np
    import pandas as pd

    def centroid(pdf: pd.DataFrame) -> pd.DataFrame:
        mat = np.vstack(pdf["embedding"].to_numpy())
        c = mat.mean(axis=0, dtype=np.float64)
        nrm = float(np.sqrt((c * c).sum()))
        return pd.DataFrame(
            {
                "label": [int(pdf["label"].iloc[0])],
                "n_vectors": [len(pdf)],
                "centroid_norm": [math.floor(nrm * 10000) / 10000],
            }
        )

    return (
        load(spark, sf, "embeddings")
        .groupBy("label")
        .applyInPandas(centroid, "label int, n_vectors long, centroid_norm double")
    )


# --------------------------------------------------------------------------
# multimodal plumbing (decoders stubbed -> rows-only checks)
# --------------------------------------------------------------------------


def _mm_features_oracle() -> str:
    # The decoders fall back to deterministic byte math when PIL/soundfile
    # are absent (this container): every feature is a pure function of
    # sha256(payload) and payload length, so the whole mapInPandas surface
    # is SQL-expressible.  h0/h1/h2 are the first three digest bytes.
    rates = "CASE h0 % 5 WHEN 0 THEN 8000 WHEN 1 THEN 16000 WHEN 2 THEN 22050 WHEN 3 THEN 44100 ELSE 48000 END"
    # NULL text: the pandas decoders coalesce a null payload to b'' (all
    # byte-derived features defined), but Spark's frame_key
    # sha2(concat(NULL,...)) null-propagates — so sha/n_bytes/h* use
    # coalesce(text,'') while frame_key keeps raw text (DuckDB's ||
    # null-propagates identically)
    return f"""
    WITH h AS (
      SELECT doc_id AS media_id, text, sha256(coalesce(text, '')) AS sha,
             octet_length(encode(coalesce(text, ''))) AS n_bytes,
             ('0x' || substr(sha256(coalesce(text, '')), 1, 2))::BIGINT AS h0,
             ('0x' || substr(sha256(coalesce(text, '')), 3, 2))::BIGINT AS h1,
             ('0x' || substr(sha256(coalesce(text, '')), 5, 2))::BIGINT AS h2
      FROM documents),
    aud AS (
      SELECT media_id, sample_rate, n_channels,
             greatest(1, (n_bytes * 1000) // (sample_rate * n_channels * 2)) AS duration_ms
      FROM (SELECT media_id, n_bytes, {rates} AS sample_rate,
                   1 + h1 % 2 AS n_channels FROM h)),
    vid AS (
      SELECT media_id,
             unnest(generate_series(0,
               greatest(CAST(floor(n_bytes / 100) AS BIGINT), 1) - 1, 10)) AS frame_idx,
             sha256(text || '#frame') AS frame_key
      FROM h)
    SELECT media_id, modality, feature, value FROM (
      SELECT media_id, 'image' AS modality, 'n_bytes' AS feature,
             CAST(n_bytes AS VARCHAR) AS value FROM h
      UNION ALL SELECT media_id, 'image', 'sha256', sha FROM h
      UNION ALL SELECT media_id, 'image', 'width', CAST(64 + h0 % 192 AS VARCHAR) FROM h
      UNION ALL SELECT media_id, 'image', 'height', CAST(64 + h1 % 192 AS VARCHAR) FROM h
      UNION ALL SELECT media_id, 'image', 'mode',
                CASE h2 % 3 WHEN 0 THEN 'RGB' WHEN 1 THEN 'RGBA' ELSE 'L' END FROM h
      UNION ALL SELECT media_id, 'audio', 'sample_rate', CAST(sample_rate AS VARCHAR) FROM aud
      UNION ALL SELECT media_id, 'audio', 'n_channels', CAST(n_channels AS VARCHAR) FROM aud
      UNION ALL SELECT media_id, 'audio', 'duration_ms', CAST(duration_ms AS VARCHAR) FROM aud
      UNION ALL SELECT media_id, 'video', 'frame',
                CAST(frame_idx AS VARCHAR) || ':' || frame_key FROM vid
    )
    """


def _melt(df: DataFrame, modality: str, cols: list[str]) -> DataFrame:
    pairs: list = []
    for c in cols:
        pairs += [F.lit(c), F.col(c).cast("string")]
    return df.select(
        "media_id", F.explode(F.create_map(*pairs)).alias("feature", "value")
    ).select("media_id", F.lit(modality).alias("modality"), "feature", "value")


def _mm_oracle_if_fallback() -> str | None:
    """ADVICE r3: the SQL oracle hard-codes the sha256-byte-math fallback
    decoders.  On an environment where PIL/soundfile ARE installed the
    Spark side emits real decoder features — registering the oracle there
    would fail a correct query (or silently validate only the fallback).
    Gate at resolution time: real decoders present → rows-only check."""
    if multimodal._HAVE_PIL or multimodal._HAVE_SOUNDFILE:
        return None
    return _mm_features_oracle()


@register("mm_features", _mm_oracle_if_fallback)
def mm_features(spark: SparkSession, sf: str) -> DataFrame:
    """All three multimodal extraction paths (image / audio / video) in
    one long-format feature table — exercising the full mapInPandas
    plumbing (Arrow batch streaming, one batch in flight per task) AND
    value-hash-checked against a DuckDB oracle: with the env-blocked
    decoders the fallback features are deterministic byte math, so even
    the binary-column path gets the strong rows+schema+hash gate."""
    docs = load(spark, sf, "documents")
    img = multimodal.extract_image_features(
        multimodal.synthesize_media(docs, "doc_id", "text", kind="image")
    )
    aud = multimodal.extract_audio_features(
        multimodal.synthesize_media(docs, "doc_id", "text", kind="audio")
    )
    vid = multimodal.sample_video_frames(
        multimodal.synthesize_media(docs, "doc_id", "text", kind="video"),
        every_n=10,
    )
    return (
        _melt(img, "image", ["n_bytes", "sha256", "width", "height", "mode"])
        .unionByName(
            _melt(aud, "audio", ["sample_rate", "n_channels", "duration_ms"])
        )
        .unionByName(
            vid.select(
                "media_id",
                F.lit("video").alias("modality"),
                F.lit("frame").alias("feature"),
                F.concat(
                    F.col("frame_idx").cast("string"), F.lit(":"), F.col("frame_key")
                ).alias("value"),
            )
        )
    )


def _secret_scan_oracle() -> str:
    # presence-per-kind mirrors F.size(secret_hits): the patterns are
    # RE2-compatible (word boundaries + non-capturing groups), so DuckDB's
    # regexp_matches agrees with Python re on "does this kind appear"
    from etl_spark.ops.secrets import SECRET_PATTERNS

    kinds = " + ".join(
        f"(CASE WHEN regexp_matches(text, '{p}') THEN 1 ELSE 0 END)"
        for _name, p in SECRET_PATTERNS
    )
    return f"""
    SELECT n_secret_kinds, COUNT(*) AS n_docs FROM (
      SELECT CAST({kinds} AS BIGINT) AS n_secret_kinds FROM documents
    ) GROUP BY n_secret_kinds
    """


@register("docs_secret_scan", _secret_scan_oracle())
def docs_secret_scan(spark: SparkSession, sf: str) -> DataFrame:
    """Credential scan over the corpus (iterator pandas UDF — compiled
    pattern set amortized per worker).  The aggregate (docs per number of
    distinct secret kinds) IS SQL-expressible: kind-presence only needs
    regexp_matches, where Python-re and RE2 semantics coincide."""
    from etl_spark.ops.secrets import scan_secrets

    return (
        scan_secrets(load(spark, sf, "documents"))
        .groupBy("n_secret_kinds")
        .agg(F.count("*").alias("n_docs"))
    )


def _redact_oracle() -> str:
    from etl_spark.ops.secrets import SECRET_PATTERNS

    any_hit = " OR ".join(
        f"regexp_matches(text, '{p}')" for _n, p in SECRET_PATTERNS
    )
    # NULL text: scan_secrets coalesces null hit-lists to zero kinds and
    # KEEPS the doc — `NOT (regexp_matches(NULL,...))` would silently drop
    # it here, so null-text rows pass the filter explicitly
    return f"""
    SELECT doc_id, text, lang, source, n_chars FROM documents
    WHERE text IS NULL OR NOT ({any_hit})
    """


@register("docs_redact_clean", _redact_oracle())
def docs_redact_clean(spark: SparkSession, sf: str) -> DataFrame:
    """Corpus-hygiene output: the documents table minus anything carrying
    a credential (broadcast anti-join against the small flagged set).
    Value-hash compares FULL text — the strongest per-row check of the
    scanner + anti-join path."""
    from etl_spark.ops.secrets import redact_flagged

    return redact_flagged(load(spark, sf, "documents")).select(
        "doc_id", "text", "lang", "source", "n_chars"
    )


