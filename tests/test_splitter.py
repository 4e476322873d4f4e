"""Splitter semantics (R/utils.R:78-117)."""

import numpy as np
import pytest

from insider_tpu.data.splitter import ratio_splitter


def test_partition_properties():
    rng = np.random.default_rng(0)
    data = rng.standard_normal((50, 40))
    data[rng.random((50, 40)) < 0.1] = np.nan
    s = ratio_splitter(data, ratio=0.1, rm_na_col=False, seed=123)

    tr, te, na = s.train_indicator, s.test_indicator, s.na_indicator
    # disjoint cover
    assert np.all(tr + te + na == 1)
    # test size = floor(10% of observed)
    n_obs = (~np.isnan(data)).sum()
    assert te.sum() == int(np.floor(n_obs * 0.1))
    # NaNs never sampled
    assert np.all(te[np.isnan(data)] == 0)
    # values preserved
    obs = ~np.isnan(data)
    np.testing.assert_allclose((s.trainset + s.testset)[obs], data[obs])
    assert np.all(s.trainset[te == 1] == 0)


def test_deterministic_under_seed():
    rng = np.random.default_rng(1)
    data = rng.standard_normal((20, 30))
    a = ratio_splitter(data, seed=123)
    b = ratio_splitter(data, seed=123)
    c = ratio_splitter(data, seed=7)
    assert np.array_equal(a.test_indicator, b.test_indicator)
    assert not np.array_equal(a.test_indicator, c.test_indicator)


def test_rm_na_col_drops_allzero_train_columns():
    rng = np.random.default_rng(2)
    data = rng.standard_normal((10, 5))
    data[:, 2] = np.nan  # entire column NaN -> zero train entries
    s = ratio_splitter(data, ratio=0.0, rm_na_col=True)
    assert 2 not in s.kept_cols
    assert s.trainset.shape[1] == 4


def test_data_property_consistent_shapes():
    rng = np.random.default_rng(3)
    data = rng.standard_normal((10, 8))
    data[:, 1] = np.nan
    s = ratio_splitter(data, ratio=0.2, rm_na_col=True)
    # unlike the reference's unfiltered-data quirk (R/insider.R:25 vs
    # R/utils.R:104-109), everything is filtered consistently
    assert s.data.shape == s.train_indicator.shape == s.test_indicator.shape
