"""Structural pins for equi-depth binning (hash parity is the oracle
mirror's job): monotone in value, full id range, and the equi-depth
balance guarantee — a bin can exceed the ideal n/B population only by
the single sketch bucket straddling its upper edge.
"""

from __future__ import annotations

from bigdata_spark_realtime_spark.plans.ext_binning import N_BINS, ext_equidepth_bins


def test_bins_are_monotone_and_balanced(spark, sf_dir):
    pdf = ext_equidepth_bins(spark, sf_dir).toPandas()
    assert pdf["bin"].between(0, N_BINS - 1).all()
    for etype, g in pdf.groupby("event_type"):
        g = g.sort_values(["v100", "event_id"])
        # monotone: bin never decreases as the value grows
        assert g["bin"].is_monotonic_increasing
        # populated ends: the lowest and highest ids are in use
        assert g["bin"].min() == 0 and g["bin"].max() >= N_BINS // 2
        # balance: overshoot beyond ideal n/B is bounded by one sketch
        # bucket's population (bins never split a bucket)
        n = len(g)
        bkt = g["v100"].map(
            lambda v: v
            if v < 8
            else (v.bit_length() << 3) | (v >> (v.bit_length() - 3))
        )
        max_bucket = g.groupby(bkt).size().max()
        assert g.groupby("bin").size().max() <= n / N_BINS + max_bucket
