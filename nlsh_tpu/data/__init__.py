"""Datasets: ann-benchmarks hdf5 readers, synthetic data, GT precompute."""

from nlsh_tpu.data.datasets import (  # noqa: F401
    Dataset,
    Glove,
    SIFT,
    SyntheticDataset,
    get_data_by_id,
)
