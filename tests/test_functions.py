"""Unit tests: normalization / lang tagging / sha256 — Spark vs Python
twins, plus the plan-shape guard (no per-row Python, BASELINE.json:15)."""

from __future__ import annotations

import hashlib

import pandas as pd
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from etl_spark.functions.hashing import content_sha256, content_sha256_py
from etl_spark.functions.lang import tag_lang, tag_lang_py
from etl_spark.functions.normalize import normalize_content, normalize_content_py
from etl_spark.plans.guard import assert_vectorized

CASES = [
    "plain\n",
    "crlf line\r\nsecond\r\n",
    "lone cr\rnext\n",
    "trailing spaces   \nmore\t\n",
    "no final newline",
    "many newlines\n\n\n\n",
    "",
    "   ",
    "\n",
    "café nfd accent\n",  # NFC-normalizes
    "tab\tinside\n",
    "mixed   \r\n\r\nend  ",
    "é already nfc\n",
]


def _spark_norm(spark, values):
    df = spark.createDataFrame([(v,) for v in values], "content string")
    out = df.select(normalize_content(F.col("content")).alias("n"))
    assert_vectorized(out)
    return [r["n"] for r in out.collect()]


def test_normalize_matches_python_twin(spark):
    got = _spark_norm(spark, CASES)
    want = [normalize_content_py(v) for v in CASES]
    assert got == want


def test_normalize_null_passthrough(spark):
    df = spark.createDataFrame([(None,)], "content string")
    out = df.select(normalize_content(F.col("content")).alias("n")).collect()
    assert out[0]["n"] is None


@settings(max_examples=30, deadline=None)
@given(
    st.lists(
        st.text(
            alphabet=st.characters(
                codec="utf-8", exclude_characters=["\x00"]
            ),
            max_size=80,
        ),
        min_size=1,
        max_size=20,
    )
)
def test_normalize_property(spark, texts):
    got = _spark_norm(spark, texts)
    want = [normalize_content_py(v) for v in texts]
    assert got == want


def test_sha256_matches_hashlib(spark):
    vals = [c for c in CASES if c]
    df = spark.createDataFrame([(v,) for v in vals], "content string")
    got = [r["h"] for r in df.select(content_sha256(F.col("content")).alias("h")).collect()]
    want = [hashlib.sha256(v.encode("utf-8")).hexdigest() for v in vals]
    assert got == want
    assert content_sha256_py(vals[0]) == want[0]


LANG_CASES = [
    # (path, content, explicit, expected)
    ("a/b/main.py", "print(1)\n", None, "python"),
    ("x.rs", "fn main() {}\n", None, "rust"),
    ("script", "#!/usr/bin/env python3\nprint(1)\n", None, "python"),
    ("run", "#!/bin/bash\nset -e\n", None, "shell"),
    ("noext", "plain text\n", None, None),
    ("weird.zzz", "???\n", None, None),
    ("x.PY", "caps ext\n", None, "python"),
    ("a.tar.gz", "bin\n", None, None),
    ("m.c", "int main;\n", "ada", "ada"),  # explicit wins
    ("d/e.jsx", "x\n", None, "javascript"),
]


def test_lang_tagging(spark):
    df = spark.createDataFrame(
        [(p, c, e) for p, c, e in [(a, b, c) for a, b, c, _ in LANG_CASES]],
        "path string, content string, lang string",
    )
    out = df.select(
        tag_lang(F.col("path"), F.col("content"), F.col("lang")).alias("t")
    ).collect()
    got = [r["t"] for r in out]
    want = [exp for _, _, _, exp in LANG_CASES]
    assert got == want
    # python twin agrees
    assert [tag_lang_py(p, c, e) for p, c, e, _ in LANG_CASES] == want


def test_plan_guard_catches_per_row_udf(spark):
    from pyspark.sql.functions import udf

    bad = udf(lambda x: x, "string")
    df = spark.range(3).select(bad(F.col("id").cast("string")).alias("x"))
    with pytest.raises(AssertionError, match="BatchEvalPython"):
        assert_vectorized(df)
