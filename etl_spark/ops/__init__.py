"""Training-data pipeline operators (first-class, beyond the CDC core).

Large-scale corpus preparation ops a 100 TB training-data pipeline needs:

- ``text``        — tokenization, shingling, quality scoring, language-ID,
                    document fingerprinting (all JVM-codegen expressions)
- ``dedup``       — exact, n-gram Jaccard, MinHash+LSH, SimHash,
                    embedding-cosine near-duplicate detection
- ``similarity``  — brute-force cosine top-k + sign-LSH bucketed ANN
- ``multimodal``  — opaque-binary payload plumbing with stubbed decoders

Design rule: every op is either pure Spark builtin expressions (stays in
whole-stage codegen, shuffles only on its grouping keys) or an explicitly
Arrow-vectorized pandas UDF.  Hash functions are built from ``md5`` hex
strings so the DuckDB oracle in ``__spark_entry__.oracle_sql`` can
reproduce them bit-for-bit (xxhash64/murmur differ across engines; md5
does not).
"""
