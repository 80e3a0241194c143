"""Persistence for expensive reusable artifacts (CRS/SRS, proofs).

The reference rebuilds its CRS in memory for every test (SURVEY.md §5:
'Checkpoint / resume: none', crs.rs:46-159); at 2^16 constraints CRS
generation dominates setup, so the device CRS (flat limb arrays) round-trips
through a single .npz file.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


def _flatten_crs(crs) -> dict:
    import dataclasses

    out = {}
    for f in dataclasses.fields(crs):
        v = getattr(crs, f.name)
        if isinstance(v, tuple) and all(hasattr(a, "shape") for a in v):
            for i, a in enumerate(v):
                out[f"{f.name}.{i}"] = np.asarray(jax.device_get(a))
        elif hasattr(v, "shape"):
            out[f.name] = np.asarray(jax.device_get(v))
    return out


def save_crs(path: str, crs) -> None:
    """Write a protocols.groth16_device.DeviceCRS to an .npz file (the
    circuit matrices are not stored — they derive from the circuit)."""
    np.savez_compressed(path, **_flatten_crs(crs))


def load_crs(path: str, mat):
    """Read a DeviceCRS previously saved with save_crs; `mat` must be the
    same CircuitMatrices the CRS was generated for."""
    import dataclasses

    from zk_toolkit_tpu.protocols.groth16_device import DeviceCRS

    data = np.load(path)
    kwargs = {"mat": mat}
    names = {}
    for key in data.files:
        if "." in key:
            base, idx = key.rsplit(".", 1)
            names.setdefault(base, {})[int(idx)] = jnp.asarray(data[key])
        else:
            kwargs[key] = jnp.asarray(data[key])
    for base, parts in names.items():
        kwargs[base] = tuple(parts[i] for i in sorted(parts))
    field_names = {f.name for f in dataclasses.fields(DeviceCRS)}
    kwargs = {k: v for k, v in kwargs.items() if k in field_names}
    return DeviceCRS(**kwargs)
