"""Bone batching and device placement.

Builds BoneTensors from ingested BoneSpecs, stacks them into batches, and
runs the landmark pipeline vmapped over bones — the framework's data-parallel
axis (SURVEY.md §2.4: per-bone work is independent; the batch shards over
the TPU mesh via shoulder_tpu.parallel).
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from shoulder_tpu.config import DEFAULT_CONFIG, PipelineConfig
from shoulder_tpu.io.ingest import BoneSpec
from shoulder_tpu.models import forest
from shoulder_tpu.pipeline.landmarks import (
    BoneTensors,
    Landmarks,
    compute_landmarks,
)


def bone_tensors(spec: BoneSpec) -> BoneTensors:
    return BoneTensors(
        verts=jnp.asarray(spec.vertices, jnp.float32),
        faces=jnp.asarray(spec.faces, jnp.int32),
        neighbors=jnp.asarray(spec.neighbors, jnp.int32),
        obb_transform=jnp.asarray(spec.obb_transform, jnp.float32),
        z_min=jnp.float32(spec.z_bounds[0]),
        z_max=jnp.float32(spec.z_bounds[1]),
        z_length=jnp.float32(spec.z_length),
        cutoff_lo=jnp.float32(spec.cutoff_pcts[0]),
        cutoff_hi=jnp.float32(spec.cutoff_pcts[1]),
        face_orig=(
            None if spec.face_orig is None
            else jnp.asarray(spec.face_orig, jnp.int32)
        ),
    )


def stack_bones(specs: Sequence[BoneSpec]) -> BoneTensors:
    """Stack N BoneSpecs into a leading batch dimension."""
    singles = [bone_tensors(s) for s in specs]
    return jax.tree.map(lambda *xs: jnp.stack(xs), *singles)


_batched_cache = {}


def compute_landmarks_batch(
    bones: BoneTensors,
    rf: forest.ForestParams | None = None,
    proximal: bool = False,
    cfg: PipelineConfig = DEFAULT_CONFIG,
    chunk: int = 150,
) -> Landmarks:
    """vmapped landmark pipeline over a bone batch (leading dim)."""
    if rf is None:
        rf = forest.load_params()
    key = (proximal, cfg, chunk)
    fn = _batched_cache.get(key)
    if fn is None:
        fn = jax.jit(
            jax.vmap(
                lambda b, r: compute_landmarks(
                    b, r, proximal=proximal, cfg=cfg, chunk=chunk
                ),
                in_axes=(0, None),
            )
        )
        _batched_cache[key] = fn
    return fn(bones, rf)


def landmarks_to_numpy(lm: Landmarks) -> Landmarks:
    """Fetch results to host in ONE transfer (the TPU tunnel pays ~1 s per
    buffer readback; see pipeline.packing)."""
    from shoulder_tpu.pipeline import packing

    if isinstance(jax.tree.leaves(lm)[0], jax.Array):
        return packing.fetch(lm)
    return jax.tree.map(np.asarray, lm)
