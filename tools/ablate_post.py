"""Ablate the slice kernel's post-walk stage: stats vs roll vs resample.

Times _post_walk component cuts over the 600x512 proximal stack's walk
output (single bone), on the current device.

Run:  python tools/ablate_post.py [stl_path]
"""

import functools
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from shoulder_tpu.config import DEFAULT_CONFIG as cfg
    from shoulder_tpu.io import ingest
    from shoulder_tpu.ops import pallas_chain, slicing
    from shoulder_tpu.pipeline import batch as B
    from shoulder_tpu.utils import geometry as geom

    stl_path = (
        sys.argv[1]
        if len(sys.argv) > 1
        else "/root/reference/tests/test_bones/humerus_left.stl"
    )
    chunk = 50
    band = cfg.proximal.band
    k = min(512, band)
    interp_num = cfg.proximal.interp_num

    spec = ingest.load_bone(stl_path)
    bt = jax.block_until_ready(jax.device_put(B.bone_tensors(spec)))
    _ = float(np.asarray(jax.jit(lambda b: jnp.sum(b.z_length))(bt)))
    verts_obb = jax.block_until_ready(
        jax.jit(lambda b: geom.transform_pts(b.verts, b.obb_transform))(bt)
    )
    zs = jnp.linspace(
        cfg.z_inset * bt.z_max, 0.2 * bt.z_max, cfg.proximal.zslice_num
    )
    interpret = jax.default_backend() != "tpu"

    def timeit(name, fn, *args):
        f = jax.jit(fn)
        out = jax.block_until_ready(f(*args))
        times = []
        for _ in range(3):
            t0 = time.time()
            out = jax.block_until_ready(f(*args))
            times.append(time.time() - t0)
        print(f"{name:28s} {min(times) * 1e3:8.1f} ms")
        return out

    sg = jax.block_until_ready(
        jax.jit(slicing.sorted_geom)(verts_obb, bt.faces, bt.neighbors)
    )

    def prep_all(zs):
        los, starts, win_over = slicing._window_starts(sg, zs, band)

        def prep(zlw):
            z, lo, start_w, overflow = zlw
            zmax_w = jax.lax.dynamic_slice_in_dim(sg.z_mm, lo, band, axis=0)
            crossed, start, end, succ, orig_c, over, open_e = (
                slicing._compact_slice(sg, zmax_w, lo, start_w, z, k)
            )
            return (succ.astype(jnp.int32), crossed.astype(jnp.int32),
                    start, end, orig_c.astype(jnp.int32),
                    overflow | over, open_e)

        return jax.lax.map(prep, (zs, los, starts, win_over),
                           batch_size=chunk)

    prep_out = timeit("prep (hoisted searchsorted)", prep_all, zs)
    succ, crossed, start, end, orig, overflow, open_e = prep_out
    order, nvis, run_starts = jax.block_until_ready(
        jax.jit(functools.partial(pallas_chain.chain_walk_marked,
                                  interpret=interpret))(succ, crossed)
    )
    loop_id = jax.block_until_ready(
        jax.jit(pallas_chain.loop_ids_from_order)(order, succ)
    )
    n_s = nvis[:, 0]

    K = order.shape[1]

    def stats_one(order_s, loop_s, n_sv, start_s, end_s, orig_s):
        posn = jnp.arange(K)
        valid = posn < n_sv
        lid = jnp.where(valid, loop_s, K)
        f = jnp.where(valid, order_s, 0)
        se = jnp.concatenate(
            [start_s, end_s, orig_s[:, None].astype(start_s.dtype)], axis=1
        )[f]
        sx, sy, ex, ey = se[:, 0], se[:, 1], se[:, 2], se[:, 3]
        cr2 = jnp.where(valid, sx * ey - ex * sy, 0.0)
        is_start = valid & (posn == 0) | (lid != jnp.roll(lid, 1)) & valid
        contrib = jnp.stack(
            [cr2, (sx + ex) * cr2, (sy + ey) * cr2,
             valid.astype(cr2.dtype),
             jnp.where(is_start, posn, 0).astype(cr2.dtype)],
            axis=1,
        )
        acc = jnp.zeros((K + 1, 5), cr2.dtype).at[lid].add(contrib)
        area = 0.5 * acc[:, 0]
        best = jnp.argmax(area[:K])
        return se, area[best], acc[:, 3][best], acc[:, 4][best]

    def stats_only(order, loop_id, n_s, start, end, orig):
        return jax.vmap(stats_one)(order, loop_id, n_s, start, end, orig)

    timeit("post: stats only", stats_only, order, loop_id, n_s, start, end,
           orig)

    def roll_one(order_s, loop_s, n_sv, start_s, end_s, orig_s):
        se, a, nb_f, p0_f = stats_one(order_s, loop_s, n_sv, start_s,
                                      end_s, orig_s)
        posn = jnp.arange(K)
        n_best = nb_f.astype(jnp.int32)
        p0 = p0_f.astype(jnp.int32)
        nb = jnp.maximum(n_best, 1)
        big = jnp.iinfo(jnp.int32).max
        in_span = (posn >= p0) & (posn < p0 + n_best)
        og = jnp.where(in_span, se[:, 4].astype(jnp.int32), big)
        off = jnp.argmin(og) - p0
        m_off = off % nb
        s0 = p0 + m_off
        cut = nb - m_off
        zpad = jnp.zeros((K, 2), se.dtype)
        se3 = jnp.concatenate([zpad, se[:, 0:2], zpad], axis=0)
        piece_a = jax.lax.dynamic_slice(se3, (K + s0, 0), (K, 2))
        piece_b = jax.lax.dynamic_slice(se3, (K + p0 - cut, 0), (K, 2))
        pts = jnp.where((posn < cut)[:, None], piece_a, piece_b)
        pts = jnp.where((posn < n_best)[:, None], pts, 0.0)
        return pts, n_best

    def stats_roll(order, loop_id, n_s, start, end, orig):
        return jax.vmap(roll_one)(order, loop_id, n_s, start, end, orig)

    pts_all, nb_all = timeit("post: stats+roll", stats_roll, order, loop_id,
                             n_s, start, end, orig)

    def resample_only(pts_all, nb_all):
        return jax.vmap(
            functools.partial(slicing._resample, interp_num=interp_num,
                              max_chain=K)
        )(pts_all, nb_all)

    timeit("resample only", resample_only, pts_all, nb_all)

    def post_all(order, run_starts, n_s, start, end, orig):
        return jax.vmap(
            functools.partial(slicing._post_walk, interp_num=interp_num)
        )(order, run_starts, n_s, start, end, orig)

    timeit("post FULL", post_all, order, run_starts, n_s, start, end, orig)


if __name__ == "__main__":
    main()
