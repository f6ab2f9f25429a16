"""Generate an in-domain training corpus for the articular UNet.

Round-1's segmenter was trained on images synthesized directly in polar
space, which left a domain gap vs the images the pipeline actually builds
(groove-anchored roll, real OBB orientation, surgical-neck-windowed z range,
interp/normalization quirks).  This tool closes the gap by generating
randomized synthetic humeri (shoulder_tpu.io.testdata, including arthritic
deformations) and running each through the REAL pipeline stages to produce
its polar-radius image, with exact generative supervision: each pixel's 3D
point is labelled by the articular flag of its nearest mesh vertex
(synthetic_humerus(return_head_label=True)).

Output .npz: images (N,512,512) float16, masks (N,512,512) uint8.

Run:  python tools/make_unet_corpus.py out.npz [n_bones] [seed]
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np


def _random_params(rng):
    p = dict(
        length=rng.uniform(240.0, 320.0),
        shaft_radius=rng.uniform(9.0, 13.0),
        head_radius=rng.uniform(19.0, 28.0),
        neck_shaft_deg=rng.uniform(120.0, 150.0),
        retroversion_deg=rng.uniform(8.0, 45.0),
        groove_theta_deg=rng.uniform(-180.0, 180.0),
        groove_depth=rng.uniform(1.5, 3.5),
        groove_width_deg=rng.uniform(10.0, 18.0),
        epicondyle_half_width=rng.uniform(24.0, 34.0),
        side=("left" if rng.random() < 0.5 else "right"),
    )
    # half the corpus carries arthritic deformations (BASELINE config 4)
    if rng.random() < 0.5:
        p.update(
            head_flattening=rng.uniform(0.0, 0.28),
            osteophyte_amp=rng.uniform(0.0, 2.5),
            surface_noise=rng.uniform(0.0, 0.5),
        )
    return p


def build_corpus(n_bones: int, seed: int = 0):
    import jax
    import jax.numpy as jnp
    from scipy.spatial import cKDTree

    from shoulder_tpu.config import DEFAULT_CONFIG as cfg
    from shoulder_tpu.io import ingest, stl
    from shoulder_tpu.io.testdata import synthetic_humerus
    from shoulder_tpu.models import forest
    from shoulder_tpu.ops import slicing
    from shoulder_tpu.pipeline import batch as B
    from shoulder_tpu.pipeline import landmarks as L
    from shoulder_tpu.utils import geometry as geom

    rf = forest.load_params()

    @jax.jit
    def extract(bt):
        """The pipeline's exact polar-image build (landmarks._anatomic_neck
        input path), returning the image and each pixel's OBB-frame point."""
        verts_obb = geom.transform_pts(bt.verts, bt.obb_transform)
        zs_full = jnp.linspace(
            cfg.z_inset * bt.z_max, cfg.z_inset * bt.z_min,
            cfg.full.zslice_num,
        )
        full = slicing.slice_stack(
            verts_obb, bt.faces, bt.neighbors, zs_full,
            cfg.full.interp_num, cfg.max_chain, 50, cfg.full.band,
        )
        neck_z, _, _ = L._surgical_neck(full, bt, False, cfg, cfg.max_chain)
        zs_prox = jnp.linspace(
            cfg.z_inset * bt.z_max, neck_z, cfg.proximal.zslice_num
        )
        prox = slicing.slice_stack(
            verts_obb, bt.faces, bt.neighbors, zs_prox,
            cfg.proximal.interp_num, cfg.max_chain, 50, cfg.proximal.band,
        )
        _, _, canal_axis, _, _ = L._canal(full, bt, False, cfg)
        _, _, bg_theta, _ = L._groove(prox, bt, canal_axis, rf, cfg, chunk=16)

        n = prox.zs.shape[0]
        interp = cfg.proximal.interp_num
        s, e = L._cutoff_bounds(n, cfg.anp_cutoff)
        contours = prox.contours[s:e]
        zs = prox.zs[s:e]
        R = e - s
        zero = jnp.zeros(2, contours.dtype)

        def polar_row(contour):
            th, r = L._to_polar_start(contour, zero)
            t_samp = jnp.linspace(th[0], th[-2], interp)
            r_i = jnp.interp(t_samp, th[:-1], r[:-1])
            shift = jnp.argmin(jnp.abs(t_samp - bg_theta))
            return jnp.roll(t_samp, -shift), jnp.roll(r_i, -shift)

        t_im, r_im = jax.vmap(polar_row)(contours)
        image = (r_im - jnp.min(r_im)) / (jnp.max(r_im) - jnp.min(r_im))
        x = r_im * jnp.cos(t_im)
        y = r_im * jnp.sin(t_im)
        z = jnp.broadcast_to(zs[:, None], (R, interp))
        pts = jnp.stack([x, y, z], axis=-1)
        return image, pts

    rng = np.random.default_rng(seed)
    images, masks = [], []
    i = 0
    while len(images) < n_bones:
        i += 1
        params = _random_params(rng)
        v, f, label = synthetic_humerus(
            rng_transform=rng, return_head_label=True, **params
        )
        nbr, watertight = stl.edge_face_adjacency(f)
        try:
            spec = ingest.spec_from_arrays(
                f"synth{i}", v.astype(np.float32), f.astype(np.int32),
                nbr, watertight,
            )
        except ValueError:
            continue  # exceeds padding; resample
        bt = B.bone_tensors(spec)
        image, pts = jax.block_until_ready(extract(bt))
        image = np.asarray(image, np.float32)
        pts = np.asarray(pts, np.float32)

        # label each pixel by its nearest mesh vertex (CT frame)
        to_obb = np.asarray(spec.obb_transform)
        pts_ct = (pts.reshape(-1, 3) - to_obb[:3, 3]) @ to_obb[:3, :3]
        _, nn = cKDTree(v).query(pts_ct, workers=-1)
        mask = label[nn].reshape(image.shape)

        if not np.isfinite(image).all():
            continue
        frac = float(mask.mean())
        if not (0.02 < frac < 0.6):  # degenerate extraction; resample
            continue
        images.append(image.astype(np.float16))
        masks.append(mask.astype(np.uint8))
        if len(images) % 16 == 0:
            print(f"[corpus] {len(images)}/{n_bones} (mask frac {frac:.2f})",
                  flush=True)
    return np.stack(images), np.stack(masks)


def main():
    out = sys.argv[1]
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 192
    seed = int(sys.argv[3]) if len(sys.argv) > 3 else 0
    images, masks = build_corpus(n, seed)
    np.savez_compressed(out, images=images, masks=masks)
    print(f"wrote {out}: {images.shape}")


if __name__ == "__main__":
    main()
