"""Runtime configuration: persistent compilation cache + platform setup.

Every entry point calls `setup_runtime()` once before building models.
The persistent XLA compilation cache makes repeat CLI invocations (train →
test → bench) skip the 20-40s first-compile cost (SURVEY environment
notes); it is keyed on HLO so shape changes recompile safely.
"""

from __future__ import annotations

import os


def setup_runtime(cache_dir: str | None = None, platform: str | None = None):
    import jax

    # The axon TPU plugin ignores the JAX_PLATFORMS *env var*; the config
    # update below is the only reliable platform override, so honor both
    # GFLA_PLATFORM and JAX_PLATFORMS here for CLI runs.
    platform = platform or os.environ.get("GFLA_PLATFORM") or \
        os.environ.get("JAX_PLATFORMS")
    if platform:
        jax.config.update("jax_platforms", platform)
    cache = cache_dir or os.environ.get(
        "GFLA_COMPILATION_CACHE", os.path.expanduser("~/.cache/gfla_xla")
    )
    # Bucket the cache per platform: CPU AOT executables are machine-coded
    # for the compiling host, and the axon remote-compile helper runs on a
    # different CPU than this VM — sharing one directory makes CPU runs
    # load foreign-ISA entries (SIGILL risk + loud cpu_aot_loader errors).
    # With no explicit platform, resolve the backend JAX actually selects
    # so env-less runs land in the same bucket as their JAX_PLATFORMS
    # twins instead of a shared "device" catch-all.
    if not platform:
        try:
            platform = jax.default_backend()
        except Exception:
            platform = None
    bucket = platform or "device"
    if platform and "cpu" in platform:
        # CPU AOT executables are machine-coded for the *exact* host ISA,
        # and this VM can land on different physical hosts across sessions
        # — same platform name, different feature set. Fingerprint the CPU
        # so each microarchitecture gets its own bucket.
        import hashlib

        try:
            with open("/proc/cpuinfo") as f:
                sig = next((ln for ln in f if ln.startswith("flags")), "")
        except OSError:
            sig = ""
        # XLA_FLAGS too: virtual-multi-device runs (the 8-device test
        # mesh) AOT-compile with different target preferences
        # (prefer-no-gather/scatter) than plain 1-device CLI runs, and
        # loading across the two is a loud cpu_aot_loader mismatch.
        sig += os.environ.get("XLA_FLAGS", "")
        bucket = f"cpu-{hashlib.sha1(sig.encode()).hexdigest()[:8]}"
    cache = os.path.join(cache, bucket)
    try:
        os.makedirs(cache, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass  # older jax or read-only fs — cache is best-effort
    return jax


def probe_devices(timeout: float = 90.0) -> bool:
    """Fail-fast device-backend probe for non-interactive entry points.

    The axon TPU relay this VM tunnels through can die (external restart
    only); when it is down, the first `jax.devices()` call blocks
    indefinitely — a driver running `bench.py` under a long timeout then
    records a silent hang instead of a diagnosable failure. Probe device
    init in a subprocess with a bounded wait so callers can exit quickly
    with a clear message. Returns True when the backend initializes.
    CPU runs (JAX_PLATFORMS/GFLA_PLATFORM=cpu) skip the probe — local CPU
    init cannot hang this way.
    """
    import subprocess
    import sys

    plat = os.environ.get("GFLA_PLATFORM") or os.environ.get("JAX_PLATFORMS")
    if plat and "cpu" in plat:
        return True
    code = ("import jax\n"
            "from gfla_tpu.runtime import setup_runtime\n"
            "setup_runtime()\n"
            "print(len(jax.devices()))\n")
    try:
        subprocess.run([sys.executable, "-c", code], timeout=timeout,
                       check=True, capture_output=True)
        return True
    except subprocess.TimeoutExpired:
        print(f"device backend failed to initialize within {timeout:.0f}s "
              "— the axon TPU relay is likely down (requires an external "
              "restart). Re-run when the tunnel is back, or set "
              "JAX_PLATFORMS=cpu for a CPU run.", file=sys.stderr,
              flush=True)
        return False
    except subprocess.CalledProcessError as e:
        print("device backend probe failed:\n"
              + (e.stderr or b"").decode(errors="replace")[-2000:],
              file=sys.stderr, flush=True)
        return False


def init_distributed(coordinator_address: str | None = None,
                     num_processes: int | None = None,
                     process_id: int | None = None):
    """Multi-host entry: initialize the jax.distributed runtime so
    `jax.devices()` spans every host's chips and `make_mesh` builds a
    pod-wide mesh (the step itself is SPMD and unchanged — XLA routes the
    gradient all-reduce over ICI/DCN).

    On TPU pods all arguments auto-discover from the TPU metadata; on other
    platforms pass them (or set JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES
    / JAX_PROCESS_ID, which jax.distributed reads natively). Must run
    before any other JAX device use.
    """
    import jax

    kwargs = {}
    if coordinator_address is not None:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    jax.distributed.initialize(**kwargs)
    print(f"jax.distributed: process {jax.process_index()}/"
          f"{jax.process_count()}, {jax.local_device_count()} local of "
          f"{jax.device_count()} global devices")
    return jax
