"""Ablate the walk-path slice kernel: prep vs walk vs post vs resample.

Times the 600x512 proximal stack stage by stage on the current device.

Run:  python tools/ablate_slice.py [stl_path]
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
    chunk = int(sys.argv[2]) if len(sys.argv) > 2 else 50
    band = int(sys.argv[3]) if len(sys.argv) > 3 else cfg.proximal.band

    spec = ingest.load_bone(stl_path)
    bt = jax.block_until_ready(jax.device_put(B.bone_tensors(spec)))
    _ = float(np.asarray(jax.jit(lambda b: jnp.sum(b.z_length))(bt)))

    verts_obb = jax.block_until_ready(
        jax.jit(lambda b: geom.transform_pts(b.verts, b.obb_transform))(bt)
    )
    zs = jnp.linspace(
        cfg.z_inset * bt.z_max, 0.2 * bt.z_max, cfg.proximal.zslice_num
    )
    interp_num = cfg.proximal.interp_num
    interpret = jax.default_backend() != "tpu"

    def timeit(name, fn, *args):
        f = jax.jit(fn)
        out = jax.block_until_ready(f(*args))
        times = []
        for _ in range(3):
            t0 = time.time()
            out = jax.block_until_ready(f(*args))
            times.append(time.time() - t0)
        print(f"{name:22s} {min(times) * 1e3:8.1f} ms")
        return out

    def sort_geom(v):
        return slicing.sorted_geom(v, bt.faces, bt.neighbors)

    sg = timeit("sorted_geom", sort_geom, verts_obb)

    k = min(512, band)

    def prep_all(sg, zs):
        def prep(z):
            zmm_w, lo, start_w, overflow = slicing._window_zmax(sg, z, band)
            crossed, start, end, succ, orig_c, over, open_e = (
                slicing._compact_slice(sg, zmm_w, lo, start_w, z, k)
            )
            return (succ.astype(jnp.int32), crossed.astype(jnp.int32),
                    start, end, orig_c.astype(jnp.int32),
                    overflow | over, open_e)

        return jax.lax.map(prep, zs, batch_size=chunk)

    def window_only(sg, zs):
        def w(z):
            zmm_w, lo, start_w, overflow = slicing._window_zmax(sg, z, band)
            return zmm_w.sum(), lo, overflow

        return jax.lax.map(w, zs, batch_size=chunk)

    def cross_only(sg, zs):
        def c(z):
            zmm_w, lo, start_w, overflow = slicing._window_zmax(sg, z, band)
            crossed = (zmm_w[:, 1] >= z) & (zmm_w[:, 0] < z)
            return crossed.sum(), lo, overflow

        return jax.lax.map(c, zs, batch_size=chunk)

    timeit("  window only", window_only, sg, zs)
    timeit("  window+crossing", cross_only, sg, zs)
    prep_out = timeit("prep (win+cross+comp)", prep_all, sg, zs)

    succ, crossed, start, end, orig, overflow, open_e = prep_out

    def walk_only(succ, crossed):
        return pallas_chain.chain_walk_marked(succ, crossed,
                                              interpret=interpret)

    order, nvis, run_starts = timeit("walk", walk_only, succ, crossed)

    def post_all(order, run_starts, nvis, start, end, orig):
        return jax.vmap(
            functools.partial(slicing._post_walk, interp_num=interp_num)
        )(order, run_starts, nvis[:, 0], start, end, orig)

    timeit("post (stats+resample)", post_all, order, run_starts, nvis, start,
           end, orig)

    def full(v, zs):
        return slicing.slice_stack(
            v, bt.faces, bt.neighbors, zs, interp_num, cfg.max_chain,
            chunk, band,
        )

    timeit("FULL slice_stack", full, verts_obb, zs)


if __name__ == "__main__":
    main()
