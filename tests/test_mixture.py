"""Temperature-mixture semantics beyond the oracle hash check."""

from __future__ import annotations

from bigdata_spark_realtime_spark.plans.ext_mixture import (
    BETA,
    MIX_MOD,
    ext_mixture_resample,
    ext_mixture_weights,
)


def test_smoothing_flattens_toward_uniform(spark, sf_dir):
    rows = {r.lang: r for r in ext_mixture_weights(spark, sf_dir).collect()}
    dominant = max(rows.values(), key=lambda r: r.token_share)
    tail = min(rows.values(), key=lambda r: r.token_share)
    # sqrt smoothing: the dominant language's mixture weight drops below
    # its natural share, the rarest rises above it — and the ordering of
    # languages is preserved (monotone transform)
    assert dominant.mix_weight < dominant.token_share
    assert tail.mix_weight > tail.token_share
    assert abs(sum(r.mix_weight for r in rows.values()) - 1.0) < 1e-4
    # realized rates: dominant strictly downsampled, all capped at MOD
    assert dominant.rate_bucket < BETA * MIX_MOD + 1
    assert all(0 < r.rate_bucket <= MIX_MOD for r in rows.values())


def test_resample_hits_expected_rates(spark, sf_dir):
    rates = {
        r.lang: r.rate_bucket for r in ext_mixture_weights(spark, sf_dir).collect()
    }
    naturals = {
        r.lang: r.n_docs for r in ext_mixture_weights(spark, sf_dir).collect()
    }
    kept = {
        r.lang: r.n
        for r in ext_mixture_resample(spark, sf_dir)
        .groupBy("lang")
        .count()
        .withColumnRenamed("count", "n")
        .collect()
    }
    for lang, n_nat in naturals.items():
        expect = n_nat * rates[lang] / MIX_MOD
        # md5 buckets are uniform: binomial concentration, wide tolerance
        assert abs(kept.get(lang, 0) - expect) <= 4 * (expect**0.5) + 3, lang
