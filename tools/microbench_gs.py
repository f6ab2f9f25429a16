"""Micro-benchmark vmapped gather/scatter primitives at slice-kernel shapes.

Calibrates the roofline's effective issue rates on the current device:
per-slice (S=600) gathers, scatters, scatter-adds, cumsums, dynamic
slices at band=1024 / k=512 shapes.

Run:  python tools/microbench_gs.py
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    S, band, k, F = 600, 1024, 512, 40960
    key = jax.random.PRNGKey(0)
    idx = jax.random.randint(key, (S, k), 0, F)
    idxb = jax.random.randint(key, (S, band), 0, F)
    src_rows = jax.random.normal(key, (F, 13))
    src_flat = jax.random.normal(key, (F,))
    vals5 = jax.random.normal(key, (S, k, 5))
    valsb = jax.random.normal(key, (S, band))
    los = jax.random.randint(key, (S,), 0, F - band)

    _ = float(np.asarray(jnp.sum(src_flat)))  # channel warm-up

    def timeit(name, fn, *args):
        f = jax.jit(fn)
        out = jax.block_until_ready(f(*args))
        times = []
        for _ in range(5):
            t0 = time.time()
            out = jax.block_until_ready(f(*args))
            times.append(time.time() - t0)
        print(f"{name:44s} {min(times) * 1e3:8.2f} ms")
        return out

    timeit("gather (S,k) rows from (F,13)",
           lambda i: src_rows[i].sum(axis=-1), idx)
    timeit("gather (S,k) scalars from (F,)",
           lambda i: src_flat[i], idx)
    timeit("gather (S,band) scalars from (F,)",
           lambda i: src_flat[i], idxb)
    timeit("scatter-set (S,k)->(S,k) rows of 5",
           lambda i, v: jax.vmap(
               lambda ii, vv: jnp.zeros((k + 1, 5)).at[ii % (k + 1)].set(vv)
           )(i, v), idx, vals5)
    timeit("scatter-add (S,k)->(S,k) rows of 5",
           lambda i, v: jax.vmap(
               lambda ii, vv: jnp.zeros((k + 1, 5)).at[ii % (k + 1)].add(vv)
           )(i, v), idx, vals5)
    timeit("scatter-set (S,band)->(S,k) scalars",
           lambda i, v: jax.vmap(
               lambda ii, vv: jnp.zeros(k).at[ii % k].set(vv, mode="drop")
           )(i, v), idxb, valsb)
    timeit("cumsum (S,band)",
           lambda v: jnp.cumsum(v, axis=-1), valsb)
    timeit("vmapped dynamic-slice (band,) from (F,)",
           lambda l: jax.vmap(
               lambda lo: jax.lax.dynamic_slice_in_dim(src_flat, lo, band)
           )(l), los)
    timeit("vmapped dynamic-slice (3,band) from (9,F)",
           lambda l: jax.vmap(
               lambda lo: jax.lax.dynamic_slice_in_dim(
                   jnp.broadcast_to(src_flat, (9, F))[6:9], lo, band, axis=1)
           )(l), los)
    timeit("argmax (S,k)", lambda v: jnp.argmax(v, axis=-1), vals5[..., 0])
    timeit("elementwise 10 ops (S,band)",
           lambda v: jnp.sin(v * 2 + 1) * jnp.cos(v) + v * v - jnp.sqrt(
               jnp.abs(v) + 1), valsb)

    # the same gathers inside a lax.map(chunk=50) — the pipeline's actual
    # execution shape; measures per-step overhead vs one big fused op
    def mapped_gather(i):
        return jax.lax.map(lambda ii: src_rows[ii].sum(axis=-1), i,
                           batch_size=50)

    timeit("gather (S,k) rows via lax.map(50)", mapped_gather, idx)


if __name__ == "__main__":
    main()
