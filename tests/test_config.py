import math

import pytest

from lsh_hdc_spark.config import (
    DedupConfig,
    candidate_probability,
    get_bandwidth,
    get_threshold,
)


def test_get_threshold_known_values():
    # 4 bands x 3 rows: t = (1/4)^(1/3)
    assert math.isclose(get_threshold(3, 4), 0.25 ** (1 / 3))
    assert math.isclose(get_threshold(1, 1), 1.0)


def test_get_bandwidth_recovers_r():
    # for each divisor r of 12, the implied threshold maps back to r
    for r in (1, 2, 3, 4, 6, 12):
        t = get_threshold(r, 12 // r)
        assert get_bandwidth(12, t) == r


def test_get_bandwidth_monotone_with_threshold():
    # higher thresholds need more rows per band
    rs = [get_bandwidth(24, t) for t in (0.2, 0.5, 0.8, 0.95)]
    assert rs == sorted(rs)


def test_candidate_probability_scurve():
    r, b = 3, 4
    t = get_threshold(r, b)
    assert candidate_probability(t, r, b) == pytest.approx(1 - (1 - 0.25) ** 4)
    assert candidate_probability(0.1, r, b) < 0.01
    assert candidate_probability(0.95, r, b) > 0.99


def test_config_validation():
    with pytest.raises(ValueError):
        DedupConfig(width=12, bandwidth=5)  # not a divisor
    with pytest.raises(ValueError):
        DedupConfig(shingle_mode="sentence")
    with pytest.raises(ValueError):
        DedupConfig(scheme="b5")  # ramp exceeds the 4-band layout
    with pytest.raises(ValueError):
        DedupConfig(signer="simhash", width=128)


def test_resolved_threshold_default():
    cfg = DedupConfig(width=12, bandwidth=3)
    assert cfg.bands == 4
    assert math.isclose(cfg.resolved_jaccard_threshold, 0.25 ** (1 / 3))
    assert DedupConfig(jaccard_threshold=0.8).resolved_jaccard_threshold == 0.8
