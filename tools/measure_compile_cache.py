"""Measure the persistent compile cache: cold vs warm time-to-first-landmark.

VERDICT r3 item 2 / r4 item 4: the cache's benefit was wired but never
measured.  This tool runs the single-bone landmark pipeline (the
reference's whole use case, README.md:22-41) in THREE fresh subprocesses:

  1. cold   — cache dir emptied first: full compile + run
  2. warm   — same machine, second process: deserializes the executable
  3. warm2  — third process: confirms steady state

and reports wall-clock time-to-first-landmark (process start -> metrics on
host) for each.  Writes tools/compile_cache_results.json.

Run:  python tools/measure_compile_cache.py [stl] [--backend tpu|cpu]
"""

import json
import shutil
import subprocess
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

CHILD = r"""
import sys, time
t0 = time.perf_counter()
sys.path.insert(0, "/root/repo")
if "{backend}" == "cpu":
    from shoulder_tpu.utils.platform import force_cpu
    force_cpu()
import numpy as np, jax, jax.numpy as jnp
from shoulder_tpu.io import ingest
from shoulder_tpu.pipeline import batch as B
spec = ingest.load_bone("{stl}")
bones = jax.block_until_ready(jax.device_put(B.stack_bones([spec])))
_ = float(np.asarray(jax.jit(jnp.sum)(bones.z_length)))  # warm D2H channel
t1 = time.perf_counter()
lm = B.landmarks_to_numpy(B.compute_landmarks_batch(bones, chunk=50))
ns = float(lm.neckshaft[0])
t2 = time.perf_counter()
print(f"CHILD_RESULT {{t_import_ingest:.2f}} {{t_pipeline:.2f}} {{ns:.3f}}"
      .format(t_import_ingest=t1 - t0, t_pipeline=t2 - t1, ns=ns))
"""


def run_child(stl: str, backend: str) -> dict:
    code = CHILD.replace("{stl}", stl).replace("{backend}", backend)
    t0 = time.perf_counter()
    r = subprocess.run([sys.executable, "-c", code], capture_output=True,
                       text=True, timeout=1800)
    wall = time.perf_counter() - t0
    line = [ln for ln in r.stdout.splitlines()
            if ln.startswith("CHILD_RESULT")]
    if not line:
        raise RuntimeError(f"child failed:\n{r.stderr[-2000:]}")
    _, t_setup, t_pipe, ns = line[0].split()
    return dict(wall_s=round(wall, 2), setup_s=float(t_setup),
                pipeline_s=float(t_pipe), neckshaft=float(ns))


def main():
    stl = sys.argv[1] if len(sys.argv) > 1 and sys.argv[1].endswith(".stl") \
        else "/root/reference/tests/test_bones/humerus_left.stl"
    backend = "cpu" if "--backend" in sys.argv and "cpu" in sys.argv else "tpu"

    from shoulder_tpu.utils.platform import _machine_key

    cache = Path.home() / ".cache" / "shoulder_tpu" / "xla" / _machine_key()
    if cache.exists():
        shutil.rmtree(cache)
    print(f"[cache] emptied {cache}")

    out = {"backend": backend, "stl": stl}
    for name in ("cold", "warm", "warm2"):
        res = run_child(stl, backend)
        out[name] = res
        print(f"[{name:5s}] wall {res['wall_s']:7.1f} s  "
              f"(setup {res['setup_s']:.1f}, pipeline {res['pipeline_s']:.1f})"
              f"  ns={res['neckshaft']}")
    path = Path(__file__).parent / "compile_cache_results.json"
    path.write_text(json.dumps(out, indent=1))
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
