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
