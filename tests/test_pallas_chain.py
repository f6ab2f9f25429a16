"""Pallas chain-walk kernel vs a python reference walk (interpret mode)."""

import jax.numpy as jnp
import numpy as np
import pytest

from shoulder_tpu.ops import pallas_chain


def _py_walk(succ, crossed):
    k = len(succ)
    visited = np.zeros(k, bool)
    order, loop_id = [], []
    loop = -1
    for head in range(k):
        if not crossed[head]:
            break  # front-packed
        if visited[head]:
            continue
        loop += 1
        cur = head
        while not visited[cur]:
            visited[cur] = True
            order.append(cur)
            loop_id.append(loop)
            cur = succ[cur]
    return np.array(order), np.array(loop_id)


def _random_case(rng, k, n_loops, sizes):
    succ = np.arange(k, dtype=np.int32)
    crossed = np.zeros(k, np.int32)
    total = sum(sizes)
    perm = rng.permutation(total)  # faces 0..total-1 are crossed (packed)
    idx = 0
    for sz in sizes:
        loop = perm[idx:idx + sz]
        for a, b in zip(loop, np.roll(loop, -1)):
            succ[a] = b
        idx += sz
    crossed[:total] = 1
    return succ, crossed


@pytest.mark.parametrize("seed", range(4))
def test_chain_walk_matches_python(seed):
    rng = np.random.default_rng(seed)
    k = 128
    cases = []
    for _ in range(6):
        n = rng.integers(1, 4)
        sizes = rng.integers(3, 30, size=n).tolist()
        while sum(sizes) > k - 4:
            sizes = sizes[:-1]
        cases.append(_random_case(rng, k, len(sizes), sizes))
    succ = np.stack([c[0] for c in cases])
    crossed = np.stack([c[1] for c in cases])

    order, nvis = pallas_chain.chain_walk(succ, crossed, interpret=True)
    loop_id = pallas_chain.loop_ids_from_order(order, jnp.asarray(succ))
    order, loop_id, nvis = map(np.asarray, (order, loop_id, nvis))

    for i, (s, c) in enumerate(cases):
        ref_order, ref_loop = _py_walk(s, c)
        n = int(nvis[i, 0])
        assert n == len(ref_order), f"case {i}"
        assert order[i, :n].tolist() == ref_order.tolist(), f"case {i}"
        assert loop_id[i, :n].tolist() == ref_loop.tolist(), f"case {i}"


def test_chain_walk_empty_slice():
    succ = np.arange(64, dtype=np.int32)[None].repeat(8, 0)
    crossed = np.zeros((8, 64), np.int32)
    order, nvis = pallas_chain.chain_walk(succ, crossed, interpret=True)
    assert (np.asarray(nvis) == 0).all()


@pytest.mark.skipif(
    __import__("os").environ.get("RUN_TPU") != "1",
    reason="real-TPU hardware test: set RUN_TPU=1 (one TPU client at a time)",
)
def test_chain_walk_on_tpu_hardware():
    """Compiled (non-interpret) kernel on the real chip.

    Interpret mode hides every Mosaic miscompile this kernel has hit
    (see module docstring); this is the guard against regressions in the
    SMEM output layout / while-loop structure.
    """
    import subprocess
    import sys

    # the suite pins jax to CPU (conftest); the TPU client must be a fresh
    # process with the default backend
    code = """
import sys; sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
from shoulder_tpu.ops import pallas_chain
assert jax.default_backend() == "tpu", jax.default_backend()
_ = float(np.asarray(jax.jit(jnp.sum)(jnp.arange(8.0))))  # warm D2H
succ = np.arange(64, dtype=np.int32)[None].repeat(8, 0).copy()
crossed = np.zeros((8, 64), np.int32)
succ[0,0],succ[0,1],succ[0,2]=1,2,0; crossed[0,:3]=1
succ[1,0],succ[1,1]=1,0; succ[1,2],succ[1,3],succ[1,4]=3,4,2; crossed[1,:5]=1
sj = jnp.asarray(succ)
order, n = pallas_chain.chain_walk(sj, jnp.asarray(crossed), interpret=False)
loop = pallas_chain.loop_ids_from_order(order, sj)
o, l, nn = map(np.asarray, jax.jit(
    lambda a, b, c: (a[:2, :5], b[:2, :5], c[:2, 0]))(order, loop, n))
assert nn.tolist() == [3, 5], nn
assert o[0, :3].tolist() == [0, 1, 2] and o[1, :5].tolist() == [0, 1, 2, 3, 4], o
assert l[0, :3].tolist() == [0, 0, 0] and l[1, :5].tolist() == [0, 0, 1, 1, 1], l
print("TPU_WALK_OK")
"""
    # inherit the env: the TPU tunnel config lives there (the suite's CPU
    # pin is in-process via force_cpu(), not env)
    # generous bound: the tunnel's first-fetch handshake varies 6 s - 2 min
    # and the single host core is shared with the pytest parent
    r = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True,
        timeout=900,
    )
    assert "TPU_WALK_OK" in r.stdout, (r.stdout, r.stderr[-2000:])


def test_chain_walk_vmap_batches_via_reshape():
    """vmap over a bone batch must fold into one (B*S, K) kernel call and
    match the unbatched result."""
    rng = np.random.default_rng(7)
    k = 64
    cases = [_random_case(rng, k, 2, [5, 9]) for _ in range(6)]
    succ = np.stack([c[0] for c in cases]).reshape(2, 3, k)
    crossed = np.stack([c[1] for c in cases]).reshape(2, 3, k)

    import jax

    f = lambda s, c: pallas_chain.chain_walk(s, c, interpret=True)
    order_b, n_b = jax.vmap(f)(succ, crossed)
    order_f, n_f = f(succ.reshape(6, k), crossed.reshape(6, k))
    assert np.array_equal(np.asarray(order_b).reshape(6, k),
                          np.asarray(order_f))
    assert np.array_equal(np.asarray(n_b).reshape(6, 1), np.asarray(n_f))
