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
Multi-host pods extend this mesh over jax.distributed-initialized devices;
no code change needed in the step.
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
    """Move array fields to device, sharded batch-first; pass strings through."""
    sh = batch_sharding(mesh)
    out = {}
    for k, v in batch.items():
        if isinstance(v, (np.ndarray, jax.Array)):
            out[k] = jax.device_put(v, sh)
        else:
            out[k] = v
    return out


def replicate_state(state, mesh: Mesh):
    return jax.device_put(state, replicated(mesh))
