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


def enable_compilation_cache() -> str | None:
    """Point JAX's persistent compilation cache at a per-user dir.

    The full-resolution batch program costs ~80 s to compile on the TPU
    (BENCH_r03 tail) and ~40 s on CPU; with the persistent cache every
    process after the first deserializes the executable instead — the
    single-bone user (the reference's whole use case) no longer pays a
    cold compile per script run.  Controlled by SHOULDER_TPU_CACHE:
    unset → ~/.cache/shoulder_tpu/xla, "0"/"off" → disabled, any other
    value → that directory.  Returns the directory in use (None when
    disabled).  Safe to call any time before the first compile; the cache
    itself initializes lazily inside JAX.
    """
    env = os.environ.get("SHOULDER_TPU_CACHE", "")
    if env.lower() in ("0", "off", "none", "disable"):
        return None
    cache_dir = env or str(Path.home() / ".cache" / "shoulder_tpu" / "xla")
    try:
        Path(cache_dir).mkdir(parents=True, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        # the default gates (>= 1 s compile, >= 4 KiB entry) would skip
        # nothing we care about, but the tiny helper jits around the
        # pipeline (sums, packers) may as well persist too — they're free
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
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
