"""Backend selection helpers.

The deployment container eagerly registers and initializes the TPU PJRT
backend in sitecustomize for every interpreter, so JAX_PLATFORMS set at
runtime is ignored.  force_cpu() switches an already-initialized process to
the (optionally multi-device) CPU backend — used by tests and host-side
tools.  Note: op-by-op eager dispatch over the tunneled TPU is extremely
slow (each op may remote-compile); all device work must go through jit.
"""

from __future__ import annotations

import os
from pathlib import Path

import jax
import jax.extend.backend as _jeb


def _machine_key() -> str:
    """Stable key for the host's ISA feature set.

    XLA:CPU AOT executables bake in the *compile* machine's vector ISA;
    deserializing one on a host with different features can execute
    illegal instructions (observed as a "could lead to execution errors
    such as SIGILL" loader warning when a home-dir cache was shared
    across machine types).  Keying the cache dir by the CPU flag set
    makes a cross-machine hit impossible.  TPU executables are keyed by
    XLA itself (device kind is part of the cache key), but the per-flags
    dir is harmless there.
    """
    import hashlib
    import platform as _pf

    feats = ""
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith(("flags", "Features")):
                    feats = " ".join(sorted(line.split(":", 1)[1].split()))
                    break
    except OSError:
        pass
    h = hashlib.sha256(f"{_pf.machine()}|{feats}".encode()).hexdigest()[:12]
    return f"{_pf.machine()}-{h}"


def enable_compilation_cache() -> str | None:
    """Point JAX's persistent compilation cache at a per-user, per-machine dir.

    The full-resolution batch program costs ~80 s to compile on the TPU
    (BENCH_r03 tail) and ~40 s on CPU; with the persistent cache every
    process after the first deserializes the executable instead — the
    single-bone user (the reference's whole use case) no longer pays a
    cold compile per script run.  Controlled by SHOULDER_TPU_CACHE:
    unset → ~/.cache/shoulder_tpu/xla/<machine-key>, "0"/"off" → disabled,
    any other value → that directory (still machine-key suffixed).
    Returns the directory in use (None when disabled).  Safe to call any
    time before the first compile; the cache itself initializes lazily
    inside JAX.  JAX's default persistence gates (min compile time /
    entry size) are left untouched — only programs worth persisting are.
    """
    env = os.environ.get("SHOULDER_TPU_CACHE", "")
    if env.lower() in ("0", "off", "none", "disable"):
        return None
    base = Path(env) if env else Path.home() / ".cache" / "shoulder_tpu" / "xla"
    cache_dir = str(base / _machine_key())
    try:
        Path(cache_dir).mkdir(parents=True, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
    except Exception:  # cache dir not writable → run uncached
        return None
    return cache_dir


def force_cpu(num_devices: int = 1) -> None:
    # Set the platform BEFORE any backend query: jax.default_backend()
    # would initialize the TPU plugin first, which both wastes the TPU
    # handshake and can hang the process outright when the tunnel is in
    # its stale-client wedged state (the wedge blocks at client init).
    jax.config.update("jax_platforms", "cpu")
    if (
        jax.default_backend() == "cpu"
        and len(jax.devices()) >= num_devices
    ):
        return
    _jeb.clear_backends()
    if num_devices > 1:
        jax.config.update("jax_num_cpu_devices", num_devices)
        _jeb.clear_backends()
