"""MATLAB v7.3 (HDF5) file reader for the Monti et al. rating datasets.

Capability parity with the reference reader (/root/reference/preprocessing.py:32-55):
a named field is either a MATLAB sparse matrix (groups `data`/`ir`/`jc`,
CSC layout) or a dense matrix stored column-major (so it must be transposed
to match NumPy row-major semantics).
"""

from __future__ import annotations

import numpy as np
import scipy.sparse as sp


def load_matlab_file(path_file: str, name_field: str):
    """Read one field of a MATLAB v7.3 .mat file.

    Returns a scipy CSC matrix (float32) for sparse fields, or a dense
    float32 ndarray for dense fields.
    """
    import h5py

    with h5py.File(path_file, "r") as db:
        ds = db[name_field]
        if hasattr(ds, "keys") and "ir" in ds.keys():
            data = np.asarray(ds["data"])
            ir = np.asarray(ds["ir"])
            jc = np.asarray(ds["jc"])
            return sp.csc_matrix((data, ir, jc)).astype(np.float32)
        # Dense: MATLAB stores column-major; transpose to row-major.
        return np.asarray(ds).astype(np.float32).T
