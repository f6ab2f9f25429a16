"""Device-mesh sharding for bone batches.

The framework's scaling story (SURVEY.md §2.4): the bone batch is the data-
parallel axis.  Per-bone work is fully independent, so the batched pipeline
shards the leading dimension of every BoneTensors leaf over a 1D 'bone'
mesh; XLA inserts no cross-device collectives on the hot path, and results
gather to the host on readback — collectives ride ICI only for optional
cohort statistics (psum/all_gather in cohort_stats).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from shoulder_tpu.config import DEFAULT_CONFIG, PipelineConfig
from shoulder_tpu.models import forest
from shoulder_tpu.pipeline.landmarks import BoneTensors, compute_landmarks


def bone_mesh(devices=None, axis: str = "bone") -> Mesh:
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (axis,))


def shard_bones(bones: BoneTensors, mesh: Mesh, axis: str = "bone"):
    """Place a stacked BoneTensors batch with the bone dim sharded."""
    sharding = NamedSharding(mesh, P(axis))
    return jax.tree.map(lambda x: jax.device_put(x, sharding), bones)


def sharded_landmark_fn(
    mesh: Mesh,
    proximal: bool = False,
    cfg: PipelineConfig = DEFAULT_CONFIG,
    chunk: int = 50,
    axis: str = "bone",
):
    """jit-compiled batched pipeline with bone-sharded in/out specs."""
    sharding = NamedSharding(mesh, P(axis))
    replicated = NamedSharding(mesh, P())

    def batched(bones, rf):
        return jax.vmap(
            lambda b, r: compute_landmarks(b, r, proximal=proximal, cfg=cfg,
                                           chunk=chunk),
            in_axes=(0, None),
        )(bones, rf)

    # a single sharding broadcasts across each argument's whole pytree
    return jax.jit(
        batched,
        in_shardings=(sharding, replicated),
        out_shardings=sharding,
    )


def cohort_stats(landmarks, mesh: Mesh, axis: str = "bone"):
    """Example cross-bone collective: cohort means of the clinical metrics
    (all_gather/psum over ICI; the only cross-device comm in the system)."""

    @jax.jit
    def stats(lm):
        return {
            "mean_retroversion": jnp.nanmean(lm.retroversion),
            "mean_neckshaft": jnp.nanmean(lm.neckshaft),
            "mean_radius": jnp.nanmean(lm.radius_curvature),
            "left_fraction": jnp.mean(lm.side_is_left.astype(jnp.float32)),
        }

    return stats(landmarks)
