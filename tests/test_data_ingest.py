"""Data-ingest tests across the 4 data shapes (mirrors `test/data.jl:3-39`)."""

import numpy as np
import pandas as pd

from causalgpslc_tpu.data import prepare_data


def test_minimal_full_shape(data_dir):
    d = prepare_data(str(data_dir / "minimal.csv"))
    assert d.sigma_u is not None and d.sigma_u.shape == (d.n, d.n)
    assert d.x is not None and d.x.shape == (d.n, 2)
    assert d.t.shape == (d.n,) and d.y.shape == (d.n,)
    assert not d.binary_t


def test_no_cov(data_dir):
    d = prepare_data(str(data_dir / "no_cov.csv"))
    assert d.sigma_u is not None
    assert d.x is None


def test_no_objects(data_dir):
    d = prepare_data(str(data_dir / "no_objects.csv"))
    assert d.sigma_u is None and d.obj is None
    assert d.x is not None


def test_no_objects_no_cov(data_dir):
    d = prepare_data(str(data_dir / "no_objects_no_cov.csv"))
    assert d.sigma_u is None and d.x is None


def test_binary_treatment_detection(data_dir):
    d = prepare_data(str(data_dir / "IHDP_sampled.csv"))
    assert d.binary_t
    assert set(np.unique(d.t)) <= {0.0, 1.0}
    assert d.x.shape[1] == 6


def test_obj_sorting_builds_block_structure():
    df = pd.DataFrame(
        {
            "T": [1.0, 2.0, 3.0, 4.0],
            "Y": [0.1, 0.2, 0.3, 0.4],
            "obj": ["b", "a", "b", "a"],
        }
    )
    d = prepare_data(df)
    # sorted by obj: a,a,b,b -> two 2x2 blocks
    assert d.sigma_u[0, 1] == 1.0 and d.sigma_u[2, 3] == 1.0
    assert d.sigma_u[0, 2] == 0.0
    np.testing.assert_array_equal(d.obj, ["a", "a", "b", "b"])
    np.testing.assert_allclose(d.t, [2.0, 4.0, 1.0, 3.0])


def test_neec_shape(data_dir):
    d = prepare_data(str(data_dir / "NEEC_sampled.csv"))
    assert d.n == 150
    assert d.x is None  # only T, Y, obj columns
    assert d.sigma_u is not None
    assert not d.binary_t
