"""Multi-host entry path smoke: `--distributed` / runtime.init_distributed.

The reference has no distributed runtime at all (SURVEY.md §2.3); the TPU
build's pod story is jax.distributed.initialize + a global mesh. A real
pod can't run here, so this validates the process-count=1 degenerate case
end-to-end in a subprocess (initialize mutates process-global JAX state,
so it must not run in the test process itself).
"""

import os
import socket
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_single_process_initialize_and_step():
    code = f"""
import numpy as np
from gfla_tpu.runtime import setup_runtime, init_distributed

setup_runtime(platform="cpu")
init_distributed(coordinator_address="localhost:{_free_port()}",
                 num_processes=1, process_id=0)
import jax
import jax.numpy as jnp

assert jax.process_count() == 1, jax.process_count()
from gfla_tpu.parallel import make_mesh, shard_batch

mesh = make_mesh()
batch = shard_batch({{"x": np.ones((8, 4), np.float32)}}, mesh)
out = jax.jit(lambda b: jnp.sum(b["x"] * 2.0))(batch)
assert float(out) == 64.0, float(out)
print("DIST_OK", mesh.shape)
"""
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
    r = subprocess.run([sys.executable, "-c", code], capture_output=True,
                       text=True, env=env, cwd=REPO, timeout=300)
    assert r.returncode == 0 and "DIST_OK" in r.stdout, (
        f"stdout:\n{r.stdout}\nstderr:\n{r.stderr}"
    )


def test_train_cli_accepts_distributed_flag():
    """`train.py --distributed --help` must expose the flag (full pod run
    is out of scope here; the initialize path is covered above)."""
    r = subprocess.run(
        [sys.executable, "train.py", "--help"], capture_output=True,
        text=True, cwd=REPO, timeout=300,
        env=dict(os.environ, JAX_PLATFORMS="cpu"),
    )
    assert "--distributed" in r.stdout, r.stdout[-2000:]


import pytest  # noqa: E402


@pytest.mark.slow
def test_8dev_step_full_optimizations():
    """ONE multi-device case compiled WITHOUT jax_disable_most_optimizations
    (the whole in-process suite runs de-optimized for gate speed —
    tests/conftest.py): the OPTIMIZED pipeline's SPMD correctness is
    otherwise never checked off-hardware. Runs in a subprocess so the
    session-wide config stays untouched."""
    code = """
import os
import sys

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")  # axon plugin ignores the env var
assert not jax.config.read("jax_disable_most_optimizations")
assert jax.default_backend() == "cpu" and len(jax.devices()) == 8

sys.path.insert(0, os.path.join(os.getcwd(), "tests"))
from test_train import make_batch, make_opt
from gfla_tpu.parallel import make_mesh, replicate_state, shard_batch
from gfla_tpu.tasks import create_task

task = create_task(make_opt(batch=8))
batch_np = {k: np.asarray(v) for k, v in make_batch(batch=8).items()}

# 1-dev reference
state1 = task.init_state(jax.random.PRNGKey(0), batch_np)
_, logs1 = task.train_step(state1, batch_np)

mesh = make_mesh(8)
sharded = shard_batch(batch_np, mesh)
state8 = task.init_state(jax.random.PRNGKey(0), sharded)
state8 = replicate_state(state8, mesh)
_, logs8 = task.train_step(state8, sharded)
for k in logs1:
    a, b = float(logs1[k]), float(logs8[k])
    assert np.isfinite(b), (k, b)
    assert abs(a - b) <= 2e-3 * max(1.0, abs(a)), (k, a, b)
print("FULL-OPT 8DEV OK", {k: round(float(v), 4) for k, v in logs8.items()})
"""
    env = dict(os.environ)
    env.update(
        JAX_PLATFORMS="cpu",
        XLA_FLAGS="--xla_force_host_platform_device_count=8",
        GFLA_TEST_FULL_OPT="1",
    )
    res = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True,
        cwd=REPO, env=env, timeout=1500,
    )
    assert res.returncode == 0, f"{res.stdout[-2000:]}\n{res.stderr[-2000:]}"
    assert "FULL-OPT 8DEV OK" in res.stdout
