"""Default device-mesh resolution for the public pipeline (SURVEY.md §2c).

The reference exposes its parallelism through plain pipeline options
(`num_threads` ref pipeline/sfm.h:294, multi-GPU `gpu_index`
ref pipeline/match_features.h:76-81).  The TPU-native analog is a
`jax.sharding.Mesh`: every BA solve shards its point/observation buckets
over the mesh and assembles camera blocks with XLA-inserted psums over ICI.

This module turns a pickle-friendly option value (``"auto"``, ``"none"``,
an int device count, or an actual Mesh) into the mesh the solver uses, so
`incremental_mapping` / `bundle_adjustment` run distributed by default on
multi-chip hardware without the caller constructing jax objects.

Resolution rules for ``"auto"`` (the default everywhere):
- a process-global default mesh set via :func:`set_default_mesh` wins;
- on TPU/GPU backends with >1 local device: a 1-D mesh over all devices;
- on CPU: single-device (no mesh).  Virtual CPU devices exist for tests,
  which opt in explicitly with an int count or a Mesh.
"""

from __future__ import annotations

from typing import Optional, Union

_default_mesh = None


def set_default_mesh(mesh) -> None:
    """Install a process-global default mesh (None clears it).

    Anything the pipeline solves after this call uses `mesh` wherever an
    options object says ``devices="auto"``.
    """
    global _default_mesh
    _default_mesh = mesh


def get_default_mesh():
    return _default_mesh


def _local_mesh(n: Optional[int] = None):
    import jax
    import numpy as np
    from jax.sharding import Mesh

    devices = jax.devices()
    if n is not None:
        if n > len(devices):
            raise ValueError(
                f"devices={n} requested but only {len(devices)} available"
            )
        devices = devices[:n]
    if len(devices) <= 1:
        return None
    return Mesh(np.asarray(devices), ("obs",))


def resolve_mesh(spec: Union[str, int, None, object] = "auto"):
    """Resolve a `devices` option value to a Mesh or None (single device).

    spec:
      - Mesh            -> itself
      - "none"/0/1/None -> None (single-device)
      - int n > 1       -> 1-D mesh over the first n local devices
      - "auto"/-1       -> default mesh if set; else all local devices on
                           accelerator backends, single-device on CPU
    """
    from jax.sharding import Mesh

    if isinstance(spec, Mesh):
        return spec
    if spec is None:
        return None
    if isinstance(spec, str):
        s = spec.lower()
        if s in ("none", "off", "single", "0", "1"):
            return None
        if s == "auto":
            spec = -1
        else:
            spec = int(s)
    if spec == -1:
        if _default_mesh is not None:
            return _default_mesh
        import jax

        if jax.default_backend() == "cpu":
            return None
        return _local_mesh()
    if spec in (0, 1):
        return None
    return _local_mesh(int(spec))
