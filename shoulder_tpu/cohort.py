"""Cohort processing: many bones, one program.

The high-level batched interface the reference's validation scripts loop
one-at-a-time over (reference tests/validate_health.py:5-14,
validate_arthritic.py:5-19): ingest on the host, one vmapped (optionally
mesh-sharded) pipeline execution on device, one packed readback, results as
plain dicts per bone.
"""

from __future__ import annotations

from pathlib import Path
from typing import Sequence

import numpy as np

from shoulder_tpu.config import DEFAULT_CONFIG, PipelineConfig


def process_cohort(
    stl_paths: Sequence,
    proximal: bool = False,
    config: PipelineConfig = DEFAULT_CONFIG,
    device_mesh=None,
    chunk: int = 50,
) -> list[dict]:
    """Run the full landmark pipeline over a cohort of STL files.

    Returns one dict per bone: name, side, retroversion, neckshaft,
    radius_curvature, canal/TE/groove axes (CT frame), neck_z, and QC.
    With `device_mesh` (jax.sharding.Mesh) the batch shards over devices.
    """
    import jax

    from shoulder_tpu.io import ingest
    from shoulder_tpu.models import forest
    from shoulder_tpu.pipeline import batch as B

    specs = [
        ingest.load_bone(p, proximal=proximal, config=config)
        for p in stl_paths
    ]
    bones = B.stack_bones(specs)
    rf = forest.load_params()

    if device_mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        from shoulder_tpu.parallel import mesh as pmesh

        n_dev = device_mesh.devices.size
        pad = (-len(specs)) % n_dev
        if pad:
            bones = jax.tree.map(
                lambda x: np.concatenate(
                    [np.asarray(x)] + [np.asarray(x)[-1:]] * pad
                ),
                bones,
            )
        bones = pmesh.shard_bones(bones, device_mesh)
        rf_d = jax.device_put(rf, NamedSharding(device_mesh, P()))
        fn = pmesh.sharded_landmark_fn(
            device_mesh, proximal=proximal, cfg=config, chunk=chunk
        )
        lm = fn(bones, rf_d)
    else:
        lm = B.compute_landmarks_batch(
            bones, rf, proximal=proximal, cfg=config, chunk=chunk
        )

    lm = B.landmarks_to_numpy(lm)
    out = []
    for i, spec in enumerate(specs):
        out.append(
            {
                "name": spec.name,
                "side": "left" if bool(lm.side_is_left[i]) else "right",
                "retroversion_deg": float(lm.retroversion[i]),
                "neckshaft_deg": float(lm.neckshaft[i]),
                "radius_curvature_mm": float(lm.radius_curvature[i]),
                "neck_z": float(lm.neck_z[i]),
                "canal_axis_ct": np.asarray(lm.canal_axis[i]),
                "te_axis_ct": np.asarray(lm.te_axis[i]),
                "bg_axis_ct": np.asarray(lm.bg_axis[i]),
                "anp_plane_point_ct": np.asarray(lm.anp_plane_point[i]),
                "anp_plane_normal_ct": np.asarray(lm.anp_plane_normal[i]),
                "qc": {
                    "rf_pos_frac": float(lm.qc_rf_pos_frac[i]),
                    "mask_area_frac": float(lm.qc_mask_area_frac[i]),
                    "sphere_resid_mm": float(lm.qc_sphere_resid[i]),
                    "canal_fit_rms_mm": float(lm.qc_canal_fit_rms[i]),
                    "slice_band_overflow": bool(lm.qc_slice_overflow[i]),
                    "open_edges": bool(lm.qc_open_edges[i]),
                },
            }
        )
    return out


def cohort_summary(results: list[dict]) -> dict:
    """Aggregate stats over a processed cohort."""
    retro = np.array([r["retroversion_deg"] for r in results])
    ns = np.array([r["neckshaft_deg"] for r in results])
    rad = np.array([r["radius_curvature_mm"] for r in results])
    return {
        "n": len(results),
        "retroversion_mean": float(np.nanmean(retro)),
        "retroversion_std": float(np.nanstd(retro)),
        "neckshaft_mean": float(np.nanmean(ns)),
        "neckshaft_std": float(np.nanstd(ns)),
        "radius_mean": float(np.nanmean(rad)),
        "left_fraction": float(
            np.mean([r["side"] == "left" for r in results])
        ),
        "qc_flags": int(
            sum(r["qc"]["slice_band_overflow"] or r["qc"]["open_edges"]
                for r in results)
        ),
    }
