"""Byte-parity: Spark Column-expression implementations vs the plain-
Python reference functions, over adversarial corpora (SURVEY §5.2 item 2).
"""

import pytest
from pyspark.sql import functions as F

from neo4j_document_pipeline_spark.functions.text import (
    col_canonicalize,
    col_normalize_name_for_key,
    col_norm_space,
    col_safe_label,
    py_canonicalize,
    py_norm_space,
    py_normalize_name_for_key,
    py_safe_label,
)

ADVERSARIAL = [
    "", " ", "\t", "\r", "\n", "\r\n", "a", "  a  ",
    "a\r\nb\rc\nd", "a\n\n\n\nb", "x  \t\ny", "a  b\t\tc",
    "a\r \r\ra",                       # the non-idempotent reference case
    "trailing space \nand\ttabs\t\n", "многоязычный  текст\r\n",
    "emoji 🙂  test", "a" * 200 + "  " + "b" * 200,
    "line1   \nline2\t\nline3", "\n\n\nx\n\n\n", "Phase Two", "phase-2!",
    "  Six   Goals ", "one two three4five", "Al-Khwarizmi's algebra",
    "UPPER lower MiXeD", "dots.and,commas;here", "tab\tin\tmiddle",
    " nbsp ", "quote\"inside'",
]


@pytest.fixture(scope="module")
def adversarial_df(spark):
    return spark.createDataFrame([(i, s) for i, s in enumerate(ADVERSARIAL)],
                                 "i int, s string")


def _compare(df, col_fn, py_fn):
    rows = df.select("i", "s", col_fn(F.col("s")).alias("out")).collect()
    for r in rows:
        expected = py_fn(r["s"])
        assert r["out"] == expected, (
            f"input {r['s']!r}: spark={r['out']!r} python={expected!r}")


def test_col_canonicalize_byte_parity(adversarial_df):
    _compare(adversarial_df, col_canonicalize, py_canonicalize)


def test_col_safe_label_parity(adversarial_df):
    _compare(adversarial_df, col_safe_label, py_safe_label)


def test_col_norm_space_parity(adversarial_df):
    _compare(adversarial_df, col_norm_space, py_norm_space)


def test_col_normalize_name_key_parity(adversarial_df):
    _compare(adversarial_df, col_normalize_name_for_key,
             py_normalize_name_for_key)


def test_canonicalize_parity_on_fixture_docs(spark):
    """Byte-identity on the real reference fixture documents."""
    rows = []
    for p in ["/root/reference/Test Files/house_of_wisdom_baghdad.markdown",
              "/root/reference/Test Files/vaseline_benefits.markdown"]:
        with open(p, encoding="utf-8") as f:
            rows.append((p, f.read()))
    df = spark.createDataFrame(rows, "p string, s string")
    got = df.select("p", col_canonicalize(F.col("s")).alias("out"),
                    "s").collect()
    for r in got:
        assert r["out"] == py_canonicalize(r["s"]), r["p"]
