"""Postprocessing helpers — a lightweight udbase analogue.

The reference ships tools/python/udbase.py (xarray-based) for reading its
NetCDF output; the files this framework writes use the same variable naming,
so udbase works on them directly.  This module provides dependency-free
loaders (scipy NetCDF) for environments without xarray.
"""
from __future__ import annotations

from pathlib import Path

import numpy as np
from scipy.io import netcdf_file


class NCData:
    """Dict-like view of one output file; arrays are returned in solver
    (x, y, z) order with a leading time axis."""

    def __init__(self, path: str | Path):
        self.path = str(path)
        self.f = netcdf_file(self.path, "r", mmap=False)
        self.time = np.array(self.f.variables["time"][:])
        self.dims = {k: v for k, v in self.f.dimensions.items()}

    def coords(self, name):
        return np.array(self.f.variables[name][:])

    def var(self, name):
        v = self.f.variables[name]
        a = np.array(v[:])
        if a.ndim == 4:              # (t, z, y, x) -> (t, x, y, z)
            a = a.transpose(0, 3, 2, 1)
        elif a.ndim == 3 and v.dimensions[1][0] in "zyx":
            a = a.transpose(0, 2, 1)
        return a

    def __getitem__(self, name):
        return self.var(name)

    def variables(self):
        return [k for k in self.f.variables if k not in
                ("time", "xt", "xm", "yt", "ym", "zt", "zm", "facet",
                 "layer")]

    def close(self):
        self.f.close()


def load_case_outputs(outdir: str | Path, expnr: str):
    """Open every output family present in a run directory."""
    outdir = Path(outdir)
    out = {}
    for fam in ("fielddump", "xytdump", "tdump", "ytdump", "tkedump",
                "kslicedump", "islicedump", "jslicedump", "facT", "facEB"):
        p = outdir / f"{fam}.{expnr}.nc"
        if p.exists():
            out[fam] = NCData(p)
    return out
