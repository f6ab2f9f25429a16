"""3D UNet for CT bone segmentation (the config-5 volume path).

Small NDHWC 3D UNet (bf16 activations on the MXU) that maps a normalized
CT volume to per-voxel bone logits; marching tetrahedra extracts the
surface from the logits at iso 0 (pipeline/ct.py).  Trained on synthetic
CT volumes rendered from the procedural humerus (pipeline.ct.synth_ct_volume)
— the classical HU threshold remains the robust default.
"""

from __future__ import annotations

from pathlib import Path
from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import optax

CKPT_DIR = Path(__file__).parent / "params" / "ct_unet"

HU_SCALE = 1000.0


class ConvBlock3D(nn.Module):
    features: int
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        for _ in range(2):
            x = nn.Conv(self.features, (3, 3, 3), padding="SAME",
                        dtype=self.dtype)(x)
            x = nn.GroupNorm(num_groups=min(4, self.features),
                             dtype=jnp.float32)(x)
            x = nn.gelu(x)
        return x


class CTUNet(nn.Module):
    features: Sequence[int] = (8, 16, 32)
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        x = x.astype(self.dtype)
        skips = []
        for f in self.features[:-1]:
            x = ConvBlock3D(f, self.dtype)(x)
            skips.append(x)
            x = nn.avg_pool(x, (2, 2, 2), strides=(2, 2, 2))
        x = ConvBlock3D(self.features[-1], self.dtype)(x)
        for f, skip in zip(reversed(self.features[:-1]), reversed(skips)):
            x = jnp.repeat(jnp.repeat(jnp.repeat(x, 2, 1), 2, 2), 2, 3)
            x = nn.Conv(f, (2, 2, 2), padding="SAME", dtype=self.dtype)(x)
            x = jnp.concatenate([x, skip.astype(x.dtype)], axis=-1)
            x = ConvBlock3D(f, self.dtype)(x)
        return nn.Conv(1, (1, 1, 1), dtype=jnp.float32)(x)


def apply_volume(params, volume):
    """(D,H,W) HU volume -> (D,H,W) bone logits (pad to /4 internally)."""
    v = jnp.asarray(volume, jnp.float32) / HU_SCALE
    d, h, w = v.shape
    pad = [(0, (-s) % 4) for s in (d, h, w)]
    vp = jnp.pad(v, pad)
    logits = CTUNet().apply(params, vp[None, ..., None])[0, ..., 0]
    return logits[:d, :h, :w]


def train(steps: int = 200, size=(64, 48, 48), lr: float = 1e-3,
          seed: int = 0, log_every: int = 25):
    """Train on synthetic CT volumes (fresh volume per step)."""
    from shoulder_tpu.pipeline.ct import synth_ct_volume

    model = CTUNet()
    key = jax.random.PRNGKey(seed)
    params = model.init(key, jnp.zeros((1, *size, 1)))
    tx = optax.adamw(lr)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, vol, label):
        def loss_fn(p):
            logits = model.apply(p, vol)
            return jnp.mean(
                optax.sigmoid_binary_cross_entropy(logits, label)
            )

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    rng = np.random.default_rng(seed)
    losses = []
    for i in range(steps):
        vol, _, _ = synth_ct_volume(
            shape=size, spacing=(300.0 / size[0], 1.8, 1.8),
            seed=int(rng.integers(1 << 31)),
            retroversion_deg=float(rng.uniform(10, 40)),
            neck_shaft_deg=float(rng.uniform(125, 145)),
            head_radius=float(rng.uniform(19, 27)),
            side="left" if rng.random() < 0.5 else "right",
        )
        label = (vol > 350.0).astype(np.float32)
        v = jnp.asarray(vol)[None, ..., None] / HU_SCALE
        l = jnp.asarray(label)[None, ..., None]
        params, opt_state, loss = step(params, opt_state, v, l)
        if i % log_every == 0:
            losses.append(float(loss))
            print(f"[ct_unet] step {i} loss {float(loss):.4f}", flush=True)
    return params, losses


def save_params(params, path=CKPT_DIR) -> None:
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    ckptr.save(Path(path).resolve(), params, force=True)
    ckptr.wait_until_finished()


def load_params(path=CKPT_DIR):
    import orbax.checkpoint as ocp

    path = Path(path).resolve()
    if not path.exists():
        return None
    template = jax.eval_shape(
        lambda k: CTUNet().init(k, jnp.zeros((1, 16, 16, 16, 1))),
        jax.random.PRNGKey(0),
    )
    return ocp.StandardCheckpointer().restore(path, template)
