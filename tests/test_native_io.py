"""Native C++ IO library vs numpy references."""

import numpy as np
import pytest

from insider_tpu.data import native


pytestmark = pytest.mark.skipif(not native.native_available(),
                                reason="native toolchain unavailable")


def test_csv_parse_matches_numpy(tmp_path):
    rng = np.random.default_rng(0)
    arr = rng.standard_normal((50, 12)).astype(np.float32)
    arr[3, 4] = np.nan
    p = tmp_path / "t.csv"
    with open(p, "w") as fh:
        fh.write(",".join(f"c{i}" for i in range(12)) + "\n")
        for row in arr:
            fh.write(",".join("NA" if np.isnan(v) else f"{v:.6f}"
                              for v in row) + "\n")
    got = native.load_csv(str(p), ",", skip_header=True)
    assert got.shape == (50, 12)
    np.testing.assert_allclose(np.nan_to_num(got), np.nan_to_num(arr),
                               atol=1e-5)
    assert np.isnan(got[3, 4])


def test_tsv_parse(tmp_path):
    p = tmp_path / "t.tsv"
    with open(p, "w") as fh:
        fh.write("1.5\t2.5\t3\n4\t\t6\n")
    got = native.load_csv(str(p), "\t", skip_header=False)
    assert got.shape == (2, 3)
    assert got[0, 0] == pytest.approx(1.5)
    assert np.isnan(got[1, 1])
    assert got[1, 2] == pytest.approx(6.0)


def test_strict_na_tokens_and_quotes(tmp_path):
    """NA/NaN/N/A (any case) and quoted fields parse; junk raises (VERDICT
    r2 weak #7: any field starting with N used to silently become NaN)."""
    p = tmp_path / "ok.csv"
    with open(p, "w") as fh:
        fh.write('1.5,NA,nan,"2.5",N/A\n"3",NaN,-1e3, 4 ,5\n')
    got = native.load_csv(str(p), ",", skip_header=False)
    assert got.shape == (2, 5)
    assert got[0, 0] == pytest.approx(1.5)
    assert np.isnan(got[0, 1]) and np.isnan(got[0, 2]) and np.isnan(got[0, 4])
    assert got[0, 3] == pytest.approx(2.5)
    assert got[1, 0] == pytest.approx(3.0)
    assert np.isnan(got[1, 1])
    assert got[1, 2] == pytest.approx(-1e3)
    assert got[1, 3] == pytest.approx(4.0)

    bad = tmp_path / "bad.csv"
    with open(bad, "w") as fh:
        fh.write("1.0,N5,3.0\n4.0,null,6.0\n")
    with pytest.raises(ValueError, match="2 field"):
        native.load_csv(str(bad), ",", skip_header=False)
    lax = native.load_csv(str(bad), ",", skip_header=False, strict=False)
    assert np.isnan(lax[0, 1]) and np.isnan(lax[1, 1])
    assert lax[1, 2] == pytest.approx(6.0)


def test_log2p1():
    rng = np.random.default_rng(1)
    x = (rng.random((100, 7)) * 50).astype(np.float32)
    want = np.log2(x + 1.0)
    got = native.log2p1(x.copy())
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_split_mask_properties():
    rng = np.random.default_rng(2)
    data = rng.standard_normal((200, 100)).astype(np.float32)
    data[rng.random(data.shape) < 0.05] = np.nan
    train, test, na, k = native.split_mask(data, 0.1, seed=123)
    nan = np.isnan(data)
    n_obs = (~nan).sum()
    assert k == int(n_obs * 0.1)
    assert test.sum() == k
    assert np.array_equal(na.astype(bool), nan)
    assert np.all(train + test + na == 1)
    # deterministic
    train2, test2, _, _ = native.split_mask(data, 0.1, seed=123)
    assert np.array_equal(test, test2)
    # different seed differs
    _, test3, _, _ = native.split_mask(data, 0.1, seed=7)
    assert not np.array_equal(test, test3)


def test_split_mask_uniformity():
    """Test sample should be spread roughly uniformly across the matrix."""
    data = np.ones((100, 1000), np.float32)
    _, test, _, k = native.split_mask(data, 0.1, seed=0)
    per_row = test.sum(axis=1)
    assert per_row.mean() == pytest.approx(100, rel=0.05)
    assert per_row.std() < 30
