"""Structure utilities: SigmaU block matrix and label helpers.

Mirrors the reference's `test/utils.jl`: exact 5x5 block matrix for
generateSigmaU (`test/utils.jl:2-16`), removeAdjacent (`:18-48`) and the
retained-sample-count arithmetic (`:50-55`).
"""

import numpy as np

from causalgpslc_tpu.hyperparameters import default_hyperparameters
from causalgpslc_tpu.utils import generate_sigma_u, object_counts, remove_adjacent


def test_generate_sigma_u_exact_blocks():
    eps, cov = 1e-13, 1.0
    got = generate_sigma_u([2, 3], eps, cov)
    expected = np.array(
        [
            [1 + eps, 1, 0, 0, 0],
            [1, 1 + eps, 0, 0, 0],
            [0, 0, 1 + eps, 1, 1],
            [0, 0, 1, 1 + eps, 1],
            [0, 0, 1, 1, 1 + eps],
        ]
    )
    np.testing.assert_array_equal(got, expected)


def test_generate_sigma_u_cov_scaling():
    got = generate_sigma_u([2], 0.5, 2.0)
    np.testing.assert_array_equal(got, np.array([[1.5, 2.0], [2.0, 1.5]]))


def test_remove_adjacent():
    assert remove_adjacent([1, 1, 2, 2, 1, 3, 3]) == [1, 2, 1, 3]
    assert remove_adjacent([]) == []
    assert remove_adjacent(["a", "a", "b"]) == ["a", "b"]


def test_object_counts():
    assert object_counts(["a", "a", "a", "b", "c", "c"]) == [3, 1, 2]
    assert object_counts([]) == []


def test_num_posterior_samples():
    # length(nBurnIn:stepSize:nOuter) with defaults 10:1:24 -> 15
    hp = default_hyperparameters()
    assert hp.n_posterior_samples == 15
    assert hp.retained_indices()[0] == 9
    assert hp.retained_indices()[-1] == 23
    hp2 = hp.replace(n_burn_in=5, step_size=2, n_outer=25)
    assert hp2.n_posterior_samples == len(range(5, 26, 2))


def test_hyperparameter_validation():
    import pytest

    with pytest.raises(ValueError, match="no posterior samples"):
        default_hyperparameters(n_outer=3, n_burn_in=10)
    with pytest.raises(ValueError, match="step_size"):
        default_hyperparameters(step_size=0)
    with pytest.raises(ValueError, match="n_chains"):
        default_hyperparameters(n_chains=0)


def test_frozen_prior_items_coerces_numpy_scalars():
    """numpy-scalar prior values coerce instead of being silently dropped;
    genuinely array-valued priors raise (ADVICE r4)."""
    import numpy as np
    import pytest

    from causalgpslc_tpu.hyperparameters import frozen_prior_items

    items = frozen_prior_items({"a": np.float64(2.5), "b": 1, "c": np.array(3.0)})
    assert items == (("a", 2.5), ("b", 1.0), ("c", 3.0))
    with pytest.raises(ValueError, match="array-valued"):
        frozen_prior_items({"SigmaU": np.eye(3)})
