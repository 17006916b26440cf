"""HDF5 read/write helpers (reference: parakeet/utils/h5_utils.py:24-105)."""
from __future__ import annotations

import os
from typing import Any

import numpy as np

__all__ = ["read_hdf5", "write_hdf5"]


def read_hdf5(filename: str, dataset_name: str) -> Any:
    import h5py
    with h5py.File(filename, "r") as f:
        if dataset_name not in f:
            raise KeyError(f"{dataset_name} not in {filename}")
        data = f[dataset_name][()]
    return data


def write_hdf5(filename: str, dataset_name: str, write_data,
               is_overwrite: bool = True) -> None:
    import h5py
    write_data = np.asarray(write_data)
    os.makedirs(os.path.dirname(os.path.abspath(filename)), exist_ok=True)
    mode = "a" if os.path.exists(filename) else "w"
    with h5py.File(filename, mode) as f:
        if dataset_name in f:
            if not is_overwrite:
                raise RuntimeError(
                    f"{dataset_name} already exists in {filename}")
            del f[dataset_name]
        f.create_dataset(dataset_name, data=write_data)
