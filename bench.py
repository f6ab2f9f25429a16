"""Headline benchmark: bones/sec through the full landmark pipeline.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "bones/sec", "vs_baseline": N}

Protocol: ingest the reference fixture (or a synthetic bone if absent),
replicate to a batch, run the full-resolution pipeline (600x512 proximal +
200x100 full + 200x500 distal stacks, RF groove classifier, sphere
articular segmentation, transepicondylar MRR, all metrics) and time
repeated executions with block_until_ready.  Results are fetched once
through the packed single-transfer path (pipeline/packing.py) for a sanity
check — the TPU tunnel in this environment has seconds-to-minutes bulk D2H
latency that is not part of the compute being measured.

Baseline: the reference publishes no numbers (BASELINE.md).  The
denominator is the measured wall time of this same full-resolution
pipeline on one CPU core (14.7 s/bone, see BASELINE.md "proxy denominator"),
which is a conservative stand-in for the reference's pure-Python +
trimesh/onnxruntime single-bone time on the same machine.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

BASELINE_CPU_SEC_PER_BONE = 14.7  # see BASELINE.md (measured proxy)
BATCH = int(os.environ.get("BENCH_BATCH", "8"))
REPS = int(os.environ.get("BENCH_REPS", "5"))
FIXTURE = "/root/reference/tests/test_bones/humerus_left.stl"


def main():
    import jax

    from shoulder_tpu.io import ingest
    from shoulder_tpu.pipeline import batch as B

    if os.path.exists(FIXTURE):
        spec = ingest.load_bone(FIXTURE)
    else:  # synthetic fallback
        import tempfile

        from shoulder_tpu.io import stl
        from shoulder_tpu.io.testdata import synthetic_humerus

        v, f = synthetic_humerus(rng_transform=np.random.default_rng(0))
        with tempfile.TemporaryDirectory() as td:
            p = os.path.join(td, "bone.stl")
            stl.write_stl(p, v, f)
            spec = ingest.load_bone(p)

    bones = B.stack_bones([spec] * BATCH)
    bones = jax.block_until_ready(jax.device_put(bones))

    # compile + warmup
    lm = B.compute_landmarks_batch(bones, chunk=50)
    jax.block_until_ready(lm)

    t0 = time.perf_counter()
    for _ in range(REPS):
        lm = B.compute_landmarks_batch(bones, chunk=50)
        jax.block_until_ready(lm)
    dt = (time.perf_counter() - t0) / REPS
    bones_per_sec = BATCH / dt

    # single packed fetch: sanity-check outputs are anatomically sane
    out = B.landmarks_to_numpy(lm)
    ns = float(np.nanmean(out.neckshaft))
    rad = float(np.nanmean(out.radius_curvature))
    sane = 110.0 < ns < 160.0 and 15.0 < rad < 35.0
    if not sane:
        print(
            json.dumps(
                {
                    "metric": "full landmark pipeline throughput (INSANE OUTPUT)",
                    "value": 0.0,
                    "unit": "bones/sec",
                    "vs_baseline": 0.0,
                }
            )
        )
        return

    vs_baseline = bones_per_sec * BASELINE_CPU_SEC_PER_BONE
    print(
        json.dumps(
            {
                "metric": (
                    "full landmark pipeline throughput, batch="
                    f"{BATCH}, p50 latency {dt * 1e3:.1f} ms/batch"
                ),
                "value": round(bones_per_sec, 2),
                "unit": "bones/sec",
                "vs_baseline": round(vs_baseline, 1),
            }
        )
    )


if __name__ == "__main__":
    main()
