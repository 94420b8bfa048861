"""Deterministic change-event generator (FIXTURES.md §1.4).

Every attribute is a pure function of ``seq`` (via xxhash64 with a fixed
seed), built entirely from JVM-side Spark expressions: the same generator
produces test fixtures at 10^3 rows and bench streams at 10^7+ rows with
zero driver-side materialization.  The pandas oracle (etl_spark.oracle)
does NOT re-derive events — it replays the generated events, so only
normalization/tagging/hashing semantics are dual-implemented.

Content strings intentionally contain CRLF line endings, trailing
whitespace, non-NFC unicode, and missing/extra final newlines so the
normalization pipeline is exercised on every run.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# epoch base for deterministic ts derivation: 2026-01-01T00:00:00Z
TS_EPOCH = 1767225600

_EXTS = ["py", "rs", "go", "js", "java", "c", "cpp", "md", "txt", "sh"]

# combining e-acute (NFD) — NFC-normalizes to a single codepoint; proves
# the NFC stage actually ran
_NFD_ACCENT = "cafe\u0301"  # NFD: e + combining acute


def _h(col, seed: int, salt: int):
    return F.xxhash64(col, F.lit(seed), F.lit(salt))


def events_df(
    spark: SparkSession,
    n: int,
    seed: int = 42,
    n_parts: int = 4,
    n_repos: int = 20,
    paths_per_repo: int = 50,
    hot_pct: int = 0,
    hot_repo: str = "repo-hot",
    delete_pct: int = 5,
    start_seq: int = 0,
    content_bytes: int = 0,
) -> DataFrame:
    """Deterministic event stream of ``n`` events starting at ``start_seq``.

    hot_pct: percentage of events landing on ``hot_repo`` (skew fixture 6).
    content_bytes: pad content to ~this size with deterministic source-like
    filler lines (real repos average KBs per file; the default tiny bodies
    are for fixture speed, benches should pass ~2048+ so the normalize/
    hash pipeline does realistic per-row work).
    """
    df = spark.range(start_seq, start_seq + n).withColumnRenamed("id", "seq")
    s = F.col("seq")

    is_hot = F.pmod(_h(s, seed, 1), F.lit(100)) < F.lit(hot_pct)
    repo = F.when(is_hot, F.lit(hot_repo)).otherwise(
        F.concat(F.lit("repo-"), F.pmod(_h(s, seed, 2), F.lit(n_repos)).cast("string"))
    )
    # hot repo gets its own (larger) path space so its key count scales too
    n_paths = F.when(is_hot, F.lit(paths_per_repo * 4)).otherwise(F.lit(paths_per_repo))
    path_id = F.pmod(_h(s, seed, 3), n_paths)
    ext = F.element_at(
        F.array(*[F.lit(e) for e in _EXTS]),
        (F.pmod(_h(s, seed, 4), F.lit(len(_EXTS))) + 1).cast("int"),
    )
    path = F.concat(
        F.lit("src/m"),
        F.pmod(_h(s, seed, 5), F.lit(8)).cast("string"),
        F.lit("/f"),
        path_id.cast("string"),
        F.lit("."),
        ext,
    )

    opr = F.pmod(_h(s, seed, 6), F.lit(100))
    op = (
        F.when((opr < F.lit(delete_pct)) & (s > F.lit(start_seq + 100)), F.lit("delete"))
        .when(opr < F.lit(delete_pct + 45), F.lit("update"))
        .otherwise(F.lit("insert"))
    )

    # messy content variants exercising every normalization rule
    v = F.pmod(_h(s, seed, 7), F.lit(5))
    body = F.concat(
        F.lit("// "),
        repo,
        F.lit(":"),
        path,
        F.lit(" v"),
        s.cast("string"),
        F.when(v == 0, F.lit("\r\nint x = 1;   \r\nreturn x;\n"))
        .when(v == 1, F.lit("\nline with trailing spaces   \nnext\t\n\n\n"))
        .when(v == 2, F.lit(f"\n{_NFD_ACCENT} unicode line\n"))
        .when(v == 3, F.lit("\nno final newline"))
        .otherwise(F.lit("\nplain line\n")),
    )
    if content_bytes > 0:
        # deterministic source-like filler: mixes CRLF + trailing spaces so
        # every normalization rule still does real work on every line; the
        # per-event version marker keeps content unique per (key, seq)
        filler_line = "    let value_%d = compute(input);   \r\n"
        line = F.concat(
            F.lit("    let value_"),
            F.pmod(s, F.lit(97)).cast("string"),
            F.lit(" = compute(input);   \r\n"),
        )
        reps = max(1, content_bytes // len(filler_line % 0))
        body = F.concat(body, F.repeat(line, reps))
    content = F.when(op == F.lit("delete"), F.lit(None).cast("string")).otherwise(body)

    # 5% of events carry an explicit lang that must win over the tagger
    lang = F.when(
        F.pmod(_h(s, seed, 8), F.lit(100)) < F.lit(5), F.lit("ada")
    ).otherwise(F.lit(None).cast("string"))

    return df.select(
        s.alias("seq"),
        F.pmod(s, F.lit(n_parts)).cast("int").alias("part_id"),
        op.alias("op"),
        F.timestamp_seconds(F.lit(TS_EPOCH) + s).alias("ts"),
        repo.alias("repo"),
        path.alias("path"),
        F.substring(F.sha2(F.concat(F.lit("c"), s.cast("string")), 256), 1, 40).alias("commit"),
        lang.alias("lang"),
        content.alias("content"),
        F.lit(None).cast("map<string,string>").alias("extra"),
    )


def write_event_batches(
    df: DataFrame,
    out_dir: str,
    n_batches: int,
    order: str = "seq",
    duplicate_pct: int = 0,
    seed: int = 42,
) -> list[str]:
    """Split an event DataFrame into ``n_batches`` parquet file-drops.

    order='seq'      — batch k holds the k-th contiguous seq range (in-order
                       binlog tail).
    order='shuffled' — events are hash-assigned to batches (out-of-order /
                       late delivery; fixture 2).
    duplicate_pct    — that percentage of events is ALSO re-emitted into a
                       later batch (at-least-once source; fixture 3).
    """
    os.makedirs(out_dir, exist_ok=True)
    bounds = df.select(F.min("seq").alias("lo"), F.max("seq").alias("hi")).first()
    lo, hi = bounds["lo"], bounds["hi"]
    span = (hi - lo + 1 + n_batches - 1) // n_batches

    if order == "shuffled":
        assign = F.pmod(_h(F.col("seq"), seed, 99), F.lit(n_batches))
    else:
        assign = F.floor((F.col("seq") - F.lit(lo)) / F.lit(span))
    tagged = df.withColumn("_b", assign)

    if duplicate_pct > 0:
        # a re-delivered event always arrives AFTER (or with) its original
        # delivery — the binlog prefix-replay contract; an earlier arrival
        # would be reordering, not duplication.  orig_b must match the
        # ACTUAL assignment above (hash for shuffled, range for seq).
        dups = df.filter(F.pmod(_h(F.col("seq"), seed, 98), F.lit(100)) < F.lit(duplicate_pct))
        if order == "shuffled":
            orig_b = F.pmod(_h(F.col("seq"), seed, 99), F.lit(n_batches))
        else:
            orig_b = F.floor((F.col("seq") - F.lit(lo)) / F.lit(span))
        dup_assign = F.least(
            F.lit(n_batches - 1), orig_b + 1 + F.pmod(_h(F.col("seq"), seed, 97), F.lit(2))
        )
        tagged = tagged.unionByName(dups.withColumn("_b", dup_assign))

    paths = []
    for b in range(n_batches):
        p = os.path.join(out_dir, f"batch-{b:05d}.parquet")
        chunk = tagged.filter(F.col("_b") == b).drop("_b")
        # one file per drop: emulates a binlog segment landing atomically.
        # Small row groups (spark.hadoop.parquet.block.size in the engine
        # conf) keep the single file SPLITTABLE — readers get scan
        # parallelism without any repartition shuffle.
        chunk.coalesce(1).write.mode("overwrite").parquet(p + ".tmp")
        part = [f for f in os.listdir(p + ".tmp") if f.endswith(".parquet")]
        os.replace(os.path.join(p + ".tmp", part[0]), p)
        for leftover in os.listdir(p + ".tmp"):
            os.remove(os.path.join(p + ".tmp", leftover))
        os.rmdir(p + ".tmp")
        paths.append(p)
    return paths
