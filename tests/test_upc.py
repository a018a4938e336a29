"""Property tests for UPC/GTIN column logic (SURVEY §5.3.3): the Spark
column expression must agree with an independent pure-Python GS1
reference implementation on arbitrary inputs."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from upc_sku_data_loader_spark.functions.upc import (
    gtin_check_digit,
    upc_normalize,
)


def ref_check_digit(body: str) -> int:
    """GS1 spec, written independently of the column version: weights
    3,1,3,1… from the RIGHTMOST body digit leftwards."""
    total = 0
    for i, ch in enumerate(reversed(body)):
        total += int(ch) * (3 if i % 2 == 0 else 1)
    return (10 - total % 10) % 10


def ref_normalize(raw: str, width: int = 13) -> str:
    digits = "".join(c for c in raw if c.isdigit())
    return digits.rjust(width, "0")[:width] if len(digits) <= width else digits


@given(st.lists(st.from_regex(r"[0-9]{12}", fullmatch=True), min_size=1, max_size=50))
@settings(max_examples=20, deadline=None)
def test_check_digit_matches_reference(spark, bodies):
    df = spark.createDataFrame([(b,) for b in bodies], "body string")
    got = {
        r["body"]: r["cd"]
        for r in df.withColumn("cd", gtin_check_digit("body")).collect()
    }
    for b in bodies:
        assert got[b] == ref_check_digit(b), b


@given(
    st.lists(
        st.text(alphabet="0123456789-abc XY.", min_size=0, max_size=13),
        min_size=1,
        max_size=30,
    )
)
@settings(max_examples=15, deadline=None)
def test_normalize_matches_reference(spark, raws):
    df = spark.createDataFrame([(i, r) for i, r in enumerate(raws)], "i int, raw string")
    got = {r["i"]: r["norm"] for r in df.withColumn("norm", upc_normalize("raw")).collect()}
    for i, raw in enumerate(raws):
        digits = "".join(c for c in raw if c.isdigit())
        if len(digits) <= 13:
            assert got[i] == digits.rjust(13, "0"), raw


def test_known_upc_check_digits(spark):
    # Public examples: GTIN-13 4006381333931 (body 400638133393 → cd 1),
    # UPC-A 036000291452 (body 03600029145 → cd 2).
    gtin13 = spark.createDataFrame([("400638133393",)], "body string")
    assert gtin13.select(gtin_check_digit("body", body_len=12).alias("cd")).first()[
        "cd"
    ] == 1
    upc_a = spark.createDataFrame([("03600029145",)], "body string")
    assert upc_a.select(gtin_check_digit("body", body_len=11).alias("cd")).first()[
        "cd"
    ] == 2
