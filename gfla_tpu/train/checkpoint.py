"""Checkpointing — orbax-backed, reference-compatible layout semantics.

Mirrors the reference contract (model/base_model.py:142-197, SURVEY.md §5):
* per-experiment directory {checkpoints_dir}/{name}/
* numbered iteration saves + a 'latest' alias
* resume iteration recovered from saved checkpoint names
* tolerant partial loading (the two-stage flow-pretrain → full-model
  protocol loads a PoseFlowNetGenerator checkpoint into
  PoseGenerator.flow_net, matching only the overlapping subtree and
  reporting the rest as uninitialized — base_model.py:167-192).

Orbax handles the actual array IO (async-safe, multi-host aware).
"""

from __future__ import annotations

import os
import re
from typing import Any, List, Optional, Tuple

import jax
import numpy as np
import orbax.checkpoint as ocp


def _ckpt_dir(checkpoints_dir: str, name: str) -> str:
    return os.path.abspath(os.path.join(checkpoints_dir, name))


def save_checkpoint(checkpoints_dir: str, name: str, step: int, state,
                    keep_every: Optional[int] = None) -> str:
    """Save `state` (any pytree) under {dir}/{name}/ckpt_{step} and refresh
    the 'latest' alias.

    keep_every: if set, prune older checkpoints whose step is not a
    multiple of it (mirrors the reference's latest_net_* overwrite +
    save_iters_freq permanent saves, base_model.py:142-151).
    """
    import shutil

    base = _ckpt_dir(checkpoints_dir, name)
    os.makedirs(base, exist_ok=True)
    path = os.path.join(base, f"ckpt_{step}")
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, state, force=True)
    ckptr.wait_until_finished()
    with open(os.path.join(base, "latest"), "w") as f:
        f.write(str(step))
    if keep_every:
        for d in os.listdir(base):
            m = re.fullmatch(r"ckpt_(\d+)", d)
            if not m:
                continue
            s = int(m.group(1))
            if s != step and s % keep_every != 0:
                shutil.rmtree(os.path.join(base, d), ignore_errors=True)
    return path


def get_iteration(checkpoints_dir: str, name: str,
                  which_iter: str = "latest") -> Optional[int]:
    """Resolve 'latest' or a numeric iteration to a saved step
    (util/util.py:285-297 equivalent)."""
    base = _ckpt_dir(checkpoints_dir, name)
    if not os.path.isdir(base):
        return None
    if which_iter == "latest":
        latest = os.path.join(base, "latest")
        if os.path.exists(latest):
            return int(open(latest).read().strip())
        steps = [
            int(m.group(1))
            for d in os.listdir(base)
            if (m := re.fullmatch(r"ckpt_(\d+)", d))
        ]
        return max(steps) if steps else None
    return int(which_iter)


def load_checkpoint(checkpoints_dir: str, name: str, state_template,
                    which_iter: str = "latest") -> Tuple[Any, Optional[int]]:
    """Restore into the template's structure. Returns (state, step) or
    (template, None) when nothing is saved (tolerated, like
    base_model.py:163-166)."""
    step = get_iteration(checkpoints_dir, name, which_iter)
    if step is None:
        return state_template, None
    path = os.path.join(_ckpt_dir(checkpoints_dir, name), f"ckpt_{step}")
    if not os.path.exists(path):
        return state_template, None
    ckptr = ocp.StandardCheckpointer()
    try:
        restored = ckptr.restore(path, target=state_template)
        return restored, step
    except Exception:
        # structure mismatch (e.g. eval-mode template has no optimizer
        # state) → raw restore + tolerant merge of the network subtrees,
        # mirroring the reference's partial .pth loading
        # (base_model.py:167-192)
        raw = ckptr.restore(path)
        new = state_template
        for field in ("params_g", "params_d", "stats_g", "stats_d"):
            if field in raw:
                merged, _, _ = partial_load(getattr(new, field), raw[field])
                new = new.replace(**{field: merged})
        if "step" in raw:
            import jax.numpy as jnp

            new = new.replace(step=jnp.asarray(raw["step"], jnp.int32))
        return new, step


def partial_load(target_params, source_params, prefix: str = "") -> Tuple[Any, List[str], List[str]]:
    """Copy every leaf of `source_params` whose path+shape matches into
    `target_params` (tolerant merge, base_model.py:167-192).

    Returns (merged, loaded_paths, skipped_paths).
    """
    loaded: List[str] = []
    skipped: List[str] = []

    def merge(tgt, src, path):
        if isinstance(tgt, dict) and isinstance(src, dict):
            out = dict(tgt)
            for k in src:
                if k in tgt:
                    out[k] = merge(tgt[k], src[k], f"{path}/{k}")
                else:
                    skipped.append(f"{path}/{k}")
            return out
        t_shape = getattr(tgt, "shape", None)
        s_shape = getattr(src, "shape", None)
        if t_shape == s_shape:
            loaded.append(path)
            return src
        skipped.append(f"{path} (shape {s_shape} vs {t_shape})")
        return tgt

    merged = merge(target_params, source_params, prefix)
    return merged, loaded, skipped
