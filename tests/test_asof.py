"""As-of join (C8) vs pandas ``merge_asof`` ground truth on randomized
small frames — exercises ties, missing keys, and before-first-event
rows (SURVEY §7 'hard parts' #2)."""

from __future__ import annotations

import numpy as np
import pandas as pd

from upc_sku_data_loader_spark.operators.asof import asof_join


def test_asof_matches_pandas_merge_asof(spark):
    rng = np.random.default_rng(7)
    left = pd.DataFrame(
        {
            "k": rng.integers(0, 5, 200),
            "lts": rng.integers(0, 1000, 200).astype("int64"),
            "payload": np.arange(200),
        }
    )
    right = pd.DataFrame(
        {
            "k": rng.integers(0, 6, 80),  # key 5 never matches
            "rts": rng.integers(0, 1000, 80).astype("int64"),
            "val": rng.normal(size=80).round(6),
        }
    ).drop_duplicates(["k", "rts"])

    got = (
        asof_join(
            spark.createDataFrame(left),
            spark.createDataFrame(right),
            on="k",
            left_ts="lts",
            right_ts="rts",
            right_values=["val"],
        )
        .toPandas()
        .sort_values(["k", "lts", "payload"])
        .reset_index(drop=True)
    )

    expected = pd.merge_asof(
        left.sort_values("lts", kind="stable"),
        right.sort_values("rts", kind="stable"),
        left_on="lts",
        right_on="rts",
        by="k",
        direction="backward",  # latest right at-or-before left ts
    ).sort_values(["k", "lts", "payload"]).reset_index(drop=True)

    assert len(got) == len(left)
    pd.testing.assert_series_equal(
        got["asof_val"], expected["val"], check_names=False
    )
    pd.testing.assert_series_equal(
        got["asof_rts"].astype("float64"), expected["rts"].astype("float64"),
        check_names=False,
    )


def test_asof_null_right_value_not_backfilled(spark):
    """If the latest at-or-before right row carries a NULL value, the
    output must surface that NULL — not silently substitute an older
    row's value (all asof_* columns must come from the SAME right row)."""
    left = spark.createDataFrame([(1, 100), (1, 250)], "k int, lts long")
    right = spark.createDataFrame(
        [(1, 50, 1.5), (1, 200, None)], "k int, rts long, val double"
    )
    rows = {
        r["lts"]: r
        for r in asof_join(
            left, right, on="k", left_ts="lts", right_ts="rts",
            right_values=["val"],
        ).collect()
    }
    assert rows[100]["asof_rts"] == 50 and rows[100]["asof_val"] == 1.5
    # latest right row at ts=200 has NULL val: ts and val must agree
    assert rows[250]["asof_rts"] == 200 and rows[250]["asof_val"] is None
