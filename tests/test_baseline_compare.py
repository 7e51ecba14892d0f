"""Differential test: the reference-style single-threaded pandas transform
(tools/baseline_compare.py) and the engine's run_campaign_performance plan
produce value-identical results on the same raw insight rows — the pandas
twin doubles as an independent second oracle for the X1 pipeline."""

from __future__ import annotations

import os
import sys

import pandas as pd

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))


def test_pandas_twin_matches_engine(spark):
    from baseline_compare import KEYS, _ListSource, gen_rows, pandas_pipeline

    from projeto_de_etl_com_api_do_meta_spark.plans.pipelines import (
        run_campaign_performance,
    )

    rows = gen_rows(n_ads=120, n_days=10, seed=7)
    ref = pandas_pipeline(rows)
    got = run_campaign_performance(_ListSource(spark, rows)).toPandas()

    def canon(df):
        d = df.sort_values(KEYS).reset_index(drop=True)
        for c in d.columns:
            if d[c].dtype == "float64":
                d[c] = d[c].round(6)
            else:
                d[c] = d[c].astype(str)
        return d

    assert len(ref) > 0
    pd.testing.assert_frame_equal(
        canon(ref), canon(got[ref.columns]), check_dtype=False
    )
