"""Dataset layer tests: hdf5 loading, normalisation variants, retry."""

import numpy as np
import pytest

from nlsh_tpu.data import Dataset, Glove, SIFT, SyntheticDataset, get_data_by_id
from nlsh_tpu.data.datasets import norm_to_unit_sphere


@pytest.fixture
def h5file(tmp_path):
    import h5py

    rng = np.random.default_rng(0)
    path = str(tmp_path / "toy.hdf5")
    with h5py.File(path, "w") as f:
        f.create_dataset("train", data=rng.normal(size=(100, 8)).astype(np.float32))
        f.create_dataset("test", data=rng.normal(size=(20, 8)).astype(np.float32))
        f.create_dataset("neighbors", data=rng.integers(0, 100, (20, 10)))
        f.create_dataset("train_knn", data=rng.integers(0, 100, (100, 5)))
    return path


def test_dataset_load(h5file):
    d = Glove(h5file)
    assert not d.prepared
    with pytest.raises(ValueError):
        _ = d.training  # must load first (reference data.py:52-55)
    d.load()
    assert d.prepared
    assert d.dim == 8
    assert d.training.shape == (100, 8)
    assert d.training_self_knn.shape == (100, 5)
    assert d.metric == "cosine"
    assert SIFT(h5file).metric == "euclidean"


def test_unit_ball_normalisation(h5file):
    d = Glove(h5file, unit_ball=True).load()
    np.testing.assert_allclose(
        np.linalg.norm(d.training, axis=1), 1.0, rtol=1e-5
    )


def test_unit_norm_standardisation(h5file):
    d = Glove(h5file, unit_norm=True).load()
    np.testing.assert_allclose(d.training.mean(0), 0.0, atol=1e-5)
    np.testing.assert_allclose(d.training.std(0), 1.0, atol=1e-4)


def test_missing_train_knn_raises(tmp_path):
    import h5py

    path = str(tmp_path / "no_knn.hdf5")
    with h5py.File(path, "w") as f:
        f.create_dataset("train", data=np.zeros((4, 2), np.float32))
        f.create_dataset("test", data=np.zeros((2, 2), np.float32))
        f.create_dataset("neighbors", data=np.zeros((2, 2), np.int64))
    d = Glove(path).load()
    with pytest.raises(ValueError, match="train_knn"):
        _ = d.training_self_knn


def test_load_retries_on_transient_error(h5file, monkeypatch):
    import h5py

    d = Glove(h5file)
    monkeypatch.setattr(type(d), "_RETRY_WAIT_S", 0.0)
    calls = {"n": 0}
    real_file = h5py.File

    def flaky(path, mode):
        calls["n"] += 1
        if calls["n"] < 3:
            raise OSError("transient")
        return real_file(path, mode)

    monkeypatch.setattr(h5py, "File", flaky)
    d.load()
    assert calls["n"] == 3
    assert d.prepared


def test_load_gives_up_after_retries(tmp_path, monkeypatch):
    d = Dataset(str(tmp_path / "missing.hdf5"))
    monkeypatch.setattr(type(d), "_RETRY_WAIT_S", 0.0)
    with pytest.raises(OSError, match="after 3 attempts"):
        d.load()


def test_get_data_by_id_synthetic():
    d = get_data_by_id("synthetic_euclidean")
    assert isinstance(d, SyntheticDataset)
    assert d.metric == "euclidean"
    with pytest.raises(ValueError):
        get_data_by_id("imagenet")


def test_norm_to_unit_sphere():
    x = np.array([[3.0, 4.0], [0.0, 2.0]])
    out = norm_to_unit_sphere(x)
    np.testing.assert_allclose(np.linalg.norm(out, axis=1), 1.0)
