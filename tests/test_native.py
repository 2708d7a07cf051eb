"""Native (C++) fast-CSV component vs the pandas path."""

import numpy as np
import pandas as pd
import pytest

from causalgpslc_tpu import native
from causalgpslc_tpu.utils.structure import generate_sigma_u


@pytest.fixture(scope="module")
def lib():
    lib = native.get_lib()
    if lib is None:
        pytest.skip("native toolchain unavailable")
    return lib


def test_read_numeric_csv(lib, data_dir):
    nc = native.read_csv(str(data_dir / "no_objects.csv"))
    df = pd.read_csv(data_dir / "no_objects.csv")
    assert nc.columns == list(df.columns)
    np.testing.assert_allclose(nc.data, df.to_numpy(dtype=np.float64), rtol=1e-15)
    assert not nc.categorical


def test_read_categorical_obj(lib, data_dir):
    nc = native.read_csv(str(data_dir / "NEEC_sampled.csv"))
    df = pd.read_csv(data_dir / "NEEC_sampled.csv")
    assert "obj" in nc.categorical
    np.testing.assert_array_equal(nc.decode("obj"), df["obj"].to_numpy(dtype=object))
    np.testing.assert_allclose(nc.column("T"), df["T"].to_numpy(), rtol=1e-15)


def test_read_boolean_treatment(lib, data_dir):
    nc = native.read_csv(str(data_dir / "IHDP_sampled.csv"))
    df = pd.read_csv(data_dir / "IHDP_sampled.csv")
    assert "T" in nc.boolean
    np.testing.assert_allclose(nc.column("T"), df["T"].to_numpy(dtype=np.float64))


def test_sigma_u_native_matches_python(lib):
    for counts in ([2, 3], [1], [4, 4, 4]):
        got = native.sigma_u_native(counts, 1e-13, 1.0)
        np.testing.assert_array_equal(got, generate_sigma_u(counts, 1e-13, 1.0))


def test_parse_error_on_ragged(lib, tmp_path):
    p = tmp_path / "bad.csv"
    p.write_text("a,b\n1,2\n3\n")
    with pytest.raises(ValueError, match="fewer fields"):
        native.read_csv(str(p))


def test_prepare_data_engines_agree(lib, data_dir):
    import glob

    from causalgpslc_tpu.data import prepare_data

    for f in sorted(glob.glob(str(data_dir / "*.csv"))):
        a = prepare_data(f, engine="pandas")
        b = prepare_data(f, engine="native")
        assert a.binary_t == b.binary_t, f
        np.testing.assert_allclose(a.t, b.t, err_msg=f)
        np.testing.assert_allclose(a.y, b.y, err_msg=f)
        assert (a.x is None) == (b.x is None)
        if a.x is not None:
            np.testing.assert_allclose(a.x, b.x, err_msg=f)
        assert (a.sigma_u is None) == (b.sigma_u is None)
        if a.sigma_u is not None:
            np.testing.assert_array_equal(a.sigma_u, b.sigma_u)
