"""Pallas TPU kernel: sequential contour-chain walk.

The slice kernel's loop labelling + ordering is pointer-chasing; as dense
XLA it costs O(log N) full-width gather rounds, and TPU gathers are slow
(~100 M elem/s effective).  VMEM/SMEM latency, however, is tiny — so a
*sequential* walk of the successor map in an SMEM-resident kernel beats the
parallel doubling: ~170 ns per dependent step, ~2 x n_crossed steps per
slice (measured 53 ms for 600 x 512 steps on v5e).

Contract (after crossed-face compaction, ops/slicing._slice_one):
  inputs  succ (S, K) int32   successor (self-loop where uncrossed)
          crossed (S, K) int32 {0,1}, all crossed faces packed at the FRONT
  outputs order (S, K) int32  face at walk position p (garbage past n)
          loop_id (S, K) int32 loop ordinal at position p
          n (S, 1) int32      number of visited faces
          succ is destroyed (aliased; visited marks are written into it)

The walk visits loops in order of their smallest compact index, each loop
traversed in successor direction from that face — the exact ordering the
pointer-doubling path and the numpy oracle produce.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_ROWS = 8  # slices per kernel invocation (SMEM block second-minor dim)


def _walk_kernel(succ_ref, crossed_ref, succ_out_ref, order_ref, loop_ref,
                 n_ref):
    def row(r, _):
        k = succ_ref.shape[1]

        def cond(state):
            head, pos, loop, cur = state
            # seek terminates at the first uncrossed slot (front-packed);
            # clamp the probe index (both operands of | are evaluated)
            probe = jnp.minimum(head, k - 1)
            seeking_done = (cur < 0) & (
                (head >= k) | (crossed_ref[r, probe] == 0)
            )
            return ~seeking_done

        def body(state):
            head, pos, loop, cur = state

            def walk(_):
                nxt = succ_out_ref[r, cur]
                succ_out_ref[r, cur] = -1  # visited mark
                order_ref[r, pos] = cur
                loop_ref[r, pos] = loop
                # loop closes when the successor is already visited
                new_cur = jax.lax.select(
                    succ_out_ref[r, nxt] < 0, -1, nxt
                )
                # careful: if nxt == cur (dead end) it is now marked visited
                return head, pos + 1, loop, new_cur

            def seek(_):
                visited = succ_out_ref[r, head] < 0
                new_cur = jax.lax.select(visited, -1, head)
                new_loop = jax.lax.select(visited, loop, loop + 1)
                return head + 1, pos, new_loop, new_cur

            return jax.lax.cond(cur >= 0, walk, seek, None)

        head0 = jnp.int32(0)
        final = jax.lax.while_loop(
            cond, body, (head0, jnp.int32(0), jnp.int32(-1), jnp.int32(-1))
        )
        n_ref[r, 0] = final[1]
        return _

    jax.lax.fori_loop(0, _ROWS, row, 0)


@functools.partial(jax.jit, static_argnames=("interpret",))
def chain_walk(succ, crossed, interpret: bool = False):
    """Walk all loops of every slice.  succ/crossed: (S, K) int32.

    Returns (order (S,K), loop_id (S,K), n (S,1)); entries at positions
    >= n are garbage and must be masked by the caller.
    """
    s, k = succ.shape
    pad = (-s) % _ROWS
    if pad:
        succ = jnp.pad(succ, ((0, pad), (0, 0)))
        crossed = jnp.pad(crossed, ((0, pad), (0, 0)))
    sp = succ.shape[0]

    grid = (sp // _ROWS,)
    blk = lambda: pl.BlockSpec((_ROWS, k), lambda i: (i, 0),
                               memory_space=pltpu.SMEM)
    blk1 = lambda: pl.BlockSpec((_ROWS, 1), lambda i: (i, 0),
                                memory_space=pltpu.SMEM)
    succ_out, order, loop_id, n = pl.pallas_call(
        _walk_kernel,
        grid=grid,
        in_specs=[blk(), blk()],
        out_specs=(blk(), blk(), blk(), blk1()),
        out_shape=(
            jax.ShapeDtypeStruct((sp, k), jnp.int32),
            jax.ShapeDtypeStruct((sp, k), jnp.int32),
            jax.ShapeDtypeStruct((sp, k), jnp.int32),
            jax.ShapeDtypeStruct((sp, 1), jnp.int32),
        ),
        input_output_aliases={0: 0},
        interpret=interpret,
    )(succ, crossed)
    return order[:s], loop_id[:s], n[:s]
