"""Export (polar image, sphere-consensus mask) training pairs from STLs.

Self-distillation data for the UNet articular segmenter: the robust-sphere
segmenter labels real bones, the UNet learns to reproduce (and later
generalize beyond) it.  Output: an .npz of float32 images and masks at the
pipeline's native 512x512 resolution.

Run:  python tools/export_polar_data.py out.npz bone1.stl [bone2.stl ...]
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np


def polar_pairs(stl_paths, cfg=None):
    import jax
    import jax.numpy as jnp

    from shoulder_tpu.config import DEFAULT_CONFIG
    from shoulder_tpu.io import ingest
    from shoulder_tpu.models import forest, segment
    from shoulder_tpu.pipeline import batch as B
    from shoulder_tpu.pipeline import landmarks as L
    from shoulder_tpu.ops import slicing
    from shoulder_tpu.utils import geometry as geom

    cfg = cfg or DEFAULT_CONFIG
    rf = forest.load_params()

    @jax.jit
    def extract(bt):
        verts_obb = geom.transform_pts(bt.verts, bt.obb_transform)
        zs_full = jnp.linspace(
            cfg.z_inset * bt.z_max, cfg.z_inset * bt.z_min,
            cfg.full.zslice_num,
        )
        full = slicing.slice_stack(
            verts_obb, bt.faces, bt.neighbors, zs_full,
            cfg.full.interp_num, cfg.max_chain, 50, cfg.full.band,
        )
        neck_z, _, _, _ = L._surgical_neck(full, bt, False, cfg, cfg.max_chain)
        zs_prox = jnp.linspace(
            cfg.z_inset * bt.z_max, neck_z, cfg.proximal.zslice_num
        )
        prox = slicing.slice_stack(
            verts_obb, bt.faces, bt.neighbors, zs_prox,
            cfg.proximal.interp_num, cfg.max_chain, 50, cfg.proximal.band,
        )
        _, _, canal_axis, _, _ = L._canal(full, bt, False, cfg)
        _, _, bg_theta, _, _ = L._groove(prox, bt, canal_axis, rf, cfg,
                                         chunk=16)

        # the pipeline's exact anatomic-neck polar image build
        image, pts = L._anp_image_points(prox, bg_theta, cfg)
        mask, _, _, _ = segment.sphere_segment(
            pts, cfg.sphere_seg_iters, cfg.sphere_seg_tol_mm,
            cfg.sphere_seg_init_top_rows,
        )
        return image, mask

    from shoulder_tpu.pipeline import packing

    # warm the D2H channel before the first big program (see bench.py:
    # the first post-program fetch otherwise pays a multi-minute
    # handshake), then read each bone back in ONE packed transfer
    import jax.numpy as jnp

    _ = float(np.asarray(jax.jit(jnp.sum)(jnp.ones(8))))
    images, masks = [], []
    for p in stl_paths:
        spec = ingest.load_bone(p)
        bt = B.bone_tensors(spec)
        img, msk = packing.fetch(extract(bt))
        images.append(np.asarray(img, np.float32))
        masks.append(np.asarray(msk, np.float32))
        print(f"{Path(p).stem}: mask frac {float(np.mean(msk)):.2f}",
              flush=True)
    return np.stack(images), np.stack(masks)


def main():
    out = sys.argv[1]
    paths = sys.argv[2:]
    images, masks = polar_pairs(paths)
    np.savez_compressed(out, images=images, masks=masks)
    print(f"wrote {out}: {images.shape}")


if __name__ == "__main__":
    main()
