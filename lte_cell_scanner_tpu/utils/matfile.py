"""Minimal MATLAB v7.3 (HDF5) reader for the shipped reference vectors.

The reference strips two large golden .it files but ships their MATLAB
source .mat files (SURVEY.md section 4.1); this loader reads the fields the
tests need (numeric arrays, complex compound dtypes, char arrays, scalar
struct groups).
"""

from __future__ import annotations

from typing import Any, Dict

import numpy as np


def _convert(ds) -> Any:
    import h5py
    if isinstance(ds, h5py.Group):
        return {k: _convert(ds[k]) for k in ds.keys()}
    arr = ds[()]
    if arr.dtype.names and "real" in arr.dtype.names:
        arr = arr["real"] + 1j * arr["imag"]
    if ds.attrs.get("MATLAB_class", b"") == b"char":
        return "".join(chr(int(c)) for c in np.asarray(arr).ravel())
    arr = np.asarray(arr)
    # matlab stores column-major; h5py yields the transposed view
    if arr.ndim == 2:
        arr = arr.T
    if arr.size == 1:
        return arr.ravel()[0]
    return arr.squeeze()


def read_mat(path: str) -> Dict[str, Any]:
    import h5py
    out: Dict[str, Any] = {}
    with h5py.File(path, "r") as h:
        for k in h.keys():
            if k.startswith("#"):
                continue
            out[k] = _convert(h[k])
    return out
