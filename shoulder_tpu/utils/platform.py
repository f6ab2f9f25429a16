"""Backend selection helpers.

The deployment container eagerly registers and initializes the TPU PJRT
backend in sitecustomize for every interpreter, so JAX_PLATFORMS set at
runtime is ignored.  force_cpu() switches an already-initialized process to
the (optionally multi-device) CPU backend — used by tests and host-side
tools.  Note: op-by-op eager dispatch over the tunneled TPU is extremely
slow (each op may remote-compile); all device work must go through jit.
"""

from __future__ import annotations

import jax
import jax.extend.backend as _jeb


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
