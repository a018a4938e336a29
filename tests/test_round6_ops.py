"""Round-6 operator properties: basket lift (q23), Holt trend (t11),
SQL UDFs (s8) — engine-independent invariants beyond the parity hash."""

from __future__ import annotations

from pyspark.sql import functions as F

from upc_sku_data_loader_spark import plans  # noqa: F401
from upc_sku_data_loader_spark.registry import QUERIES


def test_q23_metric_bounds(spark, sf_dir):
    rows = QUERIES["q23_basket_lift"](spark, sf_dir).collect()
    for r in rows:
        assert r["brand_a"] < r["brand_b"]
        assert r["pair_orders"] >= 20
        # support <= confidence (conf divides by the smaller brand count)
        assert 0 < r["support_micro"] <= r["confidence_micro"] <= 1_000_000
        assert r["lift_micro"] >= 0


def test_t11_holt_tracks_constant_series(spark):
    # On a constant series the level equals the series and trend stays 0.
    import pandas as pd

    pdf = pd.DataFrame(
        {
            "user_id": [1] * 8,
            "ts": pd.date_range("2025-01-01", periods=8, freq="h"),
            "event_id": range(8),
            "value": [42.0] * 8,
            "event_type": ["purchase"] * 8,
            "props": ["{}"] * 8,
        }
    )
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        pdf.to_parquet(f"{d}/events.parquet")
        out = QUERIES["t11_holt_trend"](spark, d).orderBy("rn").collect()
    assert len(out) == 8
    for r in out:
        assert r["level_micro"] == 42_000_000
        assert r["trend_micro"] == 0
        assert r["forecast_micro"] == 42_000_000


def test_t11_first_row_initialization(spark, sf_dir):
    out = QUERIES["t11_holt_trend"](spark, sf_dir)
    first = out.filter(F.col("rn") == 1)
    bad = first.filter(
        (F.col("trend_micro") != 0)
        | (F.col("level_micro") != F.expr("CAST(ROUND(value * 1000000) AS BIGINT)"))
    ).count()
    assert bad == 0
    # one rn=1 row per user present in the purchase stream
    assert first.count() == out.select("user_id").distinct().count()


def test_s8_sql_udf_inlines_to_pushed_scan(spark, sf_dir):
    df = QUERIES["s8_sql_udf"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # the SQL UDF must dissolve into the scan: no python/udf eval nodes
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan
    assert df.count() > 0
