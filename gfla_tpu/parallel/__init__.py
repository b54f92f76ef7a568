"""Device-mesh data parallelism (the framework's distributed layer).

The reference's only multi-device construct is in-process
torch.nn.DataParallel (SURVEY.md §2.3). The TPU-native replacement is SPMD
over a 1-axis `jax.sharding.Mesh`:

* the batch is sharded over the 'data' axis,
* parameters/optimizer state are replicated,
* the jitted train step is partitioned by XLA, which inserts the gradient
  all-reduce over ICI automatically (the loss is a global-batch mean).

Instance norm is per-example and spectral-norm power iteration acts on
replicated weights, so every live config is shard-safe by construction.
Multi-host pods: `train.py --distributed` calls
`gfla_tpu.runtime.init_distributed()` (jax.distributed.initialize), after
which `make_mesh` spans every host's chips and `shard_batch` assembles
each host's local batch portion into the global array — the jitted step
itself is SPMD and unchanged.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int = 0, devices=None) -> Mesh:
    """1-axis data-parallel mesh over the first n (or all) devices."""
    devs = list(devices if devices is not None else jax.devices())
    if n_devices:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), ("data",))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Dict[str, Any], mesh: Mesh) -> Dict[str, Any]:
    """Move array fields to device, sharded batch-first; pass strings
    through. Under multi-host (`--distributed`) each process passes its
    *local* portion of the batch and the shards are assembled into one
    global array."""
    sh = batch_sharding(mesh)
    multihost = jax.process_count() > 1
    out = {}
    for k, v in batch.items():
        if isinstance(v, (np.ndarray, jax.Array)):
            if multihost and isinstance(v, np.ndarray):
                out[k] = jax.make_array_from_process_local_data(sh, v)
            else:
                out[k] = jax.device_put(v, sh)
        else:
            out[k] = v
    return out


def replicate_state(state, mesh: Mesh):
    return jax.device_put(state, replicated(mesh))


# ---------------------------------------------------------------------------
# Spatial partitioning (data × spatial 2-axis mesh)
#
# Beyond the reference's DataParallel ceiling: shard image ROWS (the H axis
# of NHWC tensors) over a second mesh axis. XLA GSPMD partitions the
# convolutions with automatic halo exchange over ICI; the dynamic-index
# gathers (block extraction / Gaussian resampling at the coarse attention
# levels) fall back to gathering a replicated operand — cheap, since those
# run at 1/16th resolution. This scales a single (large-image) example
# across chips when batch-only sharding runs out (e.g. batch < n_devices,
# or HBM-bound high-resolution training/serving).


# --- halo-sharded attention gathers -----------------------------------
#
# By default the dynamic-index attention gathers (block extraction) run on
# a replicated operand under the 2-axis mesh — fine at the coarse level,
# but an all-gather of the source feature map at every attention site.
# `spatial_halo_attention` registers the mesh + axis so `block_extract`
# switches to an explicit shard_map: each H-shard exchanges ±halo boundary
# rows with its neighbours over ICI (lax.ppermute) and gathers locally.
# Flow row-displacement is clamped to the halo window (flow magnitudes at
# the attention levels are far smaller than a shard in practice; pick
# `halo` ≥ max expected |flow_y| + k). Exact-equality with the replicated
# path is asserted in tests for in-window flows.

_SPATIAL_HALO: Dict[str, Any] = {"mesh": None, "axis": None, "halo": 0}


def spatial_halo_attention(mesh: Optional[Mesh], axis: str = "spatial",
                           halo: int = 8):
    """Enable (mesh) or disable (None) halo-sharded attention gathers.
    Returns a context manager."""
    import contextlib

    @contextlib.contextmanager
    def _ctx():
        prev = dict(_SPATIAL_HALO)
        _SPATIAL_HALO.update(
            mesh=mesh, axis=axis if mesh is not None else None,
            halo=halo if mesh is not None else 0,
        )
        try:
            yield
        finally:
            _SPATIAL_HALO.update(prev)

    return _ctx()


def enable_spatial_halo(mesh: Optional[Mesh], axis: str = "spatial",
                        halo: int = 8):
    """Process-lifetime version of `spatial_halo_attention` for CLI entry
    points (train.py --spatial N): every subsequent `block_extract` trace
    uses the halo-sharded gather on this mesh. Pass None to disable."""
    if mesh is None:
        _SPATIAL_HALO.update(mesh=None, axis=None, halo=0)
    else:
        _SPATIAL_HALO.update(mesh=mesh, axis=axis, halo=halo)


def get_spatial_halo():
    """(mesh, axis, halo) if halo-sharded gathers are enabled, else
    (None, None, 0)."""
    m = _SPATIAL_HALO["mesh"]
    if m is None or _SPATIAL_HALO["axis"] not in m.shape:
        return None, None, 0
    if m.shape[_SPATIAL_HALO["axis"]] <= 1:
        return None, None, 0
    return m, _SPATIAL_HALO["axis"], int(_SPATIAL_HALO["halo"])


def make_mesh_2d(dp: int, sp: int, devices=None) -> Mesh:
    """2-axis mesh: ('data', 'spatial') over dp×sp devices."""
    devs = list(devices if devices is not None else jax.devices())
    need = dp * sp
    assert len(devs) >= need, f"need {need} devices, have {len(devs)}"
    return Mesh(np.array(devs[:need]).reshape(dp, sp), ("data", "spatial"))


def spatial_batch_sharding(mesh: Mesh, ndim: int) -> NamedSharding:
    """Batch over 'data'; for rank-4 NHWC image tensors also shard H over
    'spatial' (rank-5 (B,T,H,W,C) video tensors shard axis 2)."""
    if ndim == 4:
        return NamedSharding(mesh, P("data", "spatial"))
    if ndim == 5:
        return NamedSharding(mesh, P("data", None, "spatial"))
    return NamedSharding(mesh, P("data"))


def shard_batch_spatial(batch: Dict[str, Any], mesh: Mesh) -> Dict[str, Any]:
    """Like shard_batch, but image-like tensors are additionally row-sharded
    over the 'spatial' mesh axis. H must divide by the axis size."""
    sp = mesh.shape["spatial"]
    out = {}
    for k, v in batch.items():
        if isinstance(v, (np.ndarray, jax.Array)) and v.ndim >= 4:
            h = v.shape[1 if v.ndim == 4 else 2]
            assert h % sp == 0, f"{k}: H={h} not divisible by spatial={sp}"
            out[k] = jax.device_put(v, spatial_batch_sharding(mesh, v.ndim))
        elif isinstance(v, (np.ndarray, jax.Array)):
            out[k] = jax.device_put(v, NamedSharding(mesh, P("data")))
        else:
            out[k] = v
    return out
