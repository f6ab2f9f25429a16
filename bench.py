"""Headline benchmark: bones/sec through the full landmark pipeline.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "bones/sec", "vs_baseline": N}

Protocol: ingest the reference fixture (or a synthetic bone if absent),
replicate to a batch, run the full-resolution pipeline (600x512 proximal +
200x100 full + 200x500 distal stacks, RF groove classifier, the default
UNet-seeded articular segmentation, transepicondylar MRR, all metrics) and time
repeated executions with block_until_ready.  Results are fetched once
through the packed single-transfer path (pipeline/packing.py) for a sanity
check — the TPU tunnel in this environment has seconds-to-minutes bulk D2H
latency that is not part of the compute being measured.

Baseline: the reference publishes no numbers (BASELINE.md).  The
denominator is the measured wall time of this same full-resolution
pipeline on one CPU core (2.1 s/bone with the optimized kernel — see
BASELINE.md), a deliberately conservative stand-in: the actual reference
(pure-Python trimesh/shapely loops + onnxruntime re-sessioned per call) is
expected to be 5-20x slower than our XLA-CPU build of the same algorithms.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

# conservative denominator: our own fastest 1-core CPU implementation
# (see BASELINE.md — the actual reference is expected to be 5-20x slower)
BASELINE_CPU_SEC_PER_BONE = 2.1
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

    def log(msg):
        print(f"[bench] {msg}", file=sys.stderr, flush=True)

    import jax.numpy as jnp

    bones = B.stack_bones([spec] * BATCH)
    t0 = time.perf_counter()
    bones = jax.block_until_ready(jax.device_put(bones))
    log(f"H2D upload {time.perf_counter() - t0:.1f}s")

    # warm the D2H data channel BEFORE the big program: in the tunneled
    # deployment the first fetch after a large program pays a multi-minute
    # handshake (or times out UNAVAILABLE and needs a retry); a trivial
    # fetch right after upload establishes the channel cheaply.
    t0 = time.perf_counter()
    _ = float(np.asarray(jax.jit(jnp.sum)(bones.z_length)))
    log(f"D2H channel warm-up {time.perf_counter() - t0:.1f}s")

    # compile + warmup
    t0 = time.perf_counter()
    lm = B.compute_landmarks_batch(bones, chunk=150)
    jax.block_until_ready(lm)
    log(f"compile+first run {time.perf_counter() - t0:.1f}s")

    # first post-program fetch, with retries (tunnel may time out once)
    for attempt in range(3):
        try:
            t0 = time.perf_counter()
            _ = np.asarray(jax.jit(lambda l: jnp.nanmean(l.neckshaft))(lm))
            log(f"post-program fetch {time.perf_counter() - t0:.1f}s")
            break
        except Exception as e:  # noqa: BLE001
            log(f"fetch attempt {attempt} failed: {type(e).__name__}; rerun")
            lm = B.compute_landmarks_batch(bones, chunk=150)
            jax.block_until_ready(lm)

    # one more untimed warm pass: the first execution after the
    # post-program fetch is routinely ~2x slow on the tunneled TPU
    # (runtime re-pins buffers after a D2H); don't let it pollute timing.
    lm = B.compute_landmarks_batch(bones, chunk=150)
    jax.block_until_ready(lm)

    lat = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        lm = B.compute_landmarks_batch(bones, chunk=150)
        jax.block_until_ready(lm)
        lat.append(time.perf_counter() - t0)
    dt = float(np.median(lat))
    bones_per_sec = BATCH / dt
    log(
        "exec per-rep ms: "
        + ", ".join(f"{t * 1e3:.0f}" for t in lat)
        + f"; p50 {dt * 1e3:.1f} ms/batch of {BATCH}"
    )

    # sanity check via a tiny on-device reduction (channel already warm)
    summary = np.asarray(
        jax.jit(
            lambda l: jnp.stack(
                [
                    jnp.nanmean(l.neckshaft),
                    jnp.nanmean(l.radius_curvature),
                    jnp.nanmean(l.retroversion),
                ]
            )
        )(lm)
    )
    ns = float(summary[0])
    rad = float(summary[1])
    retro = float(summary[2])
    if os.path.exists(FIXTURE):
        # gate against the committed golden for the benched fixture, at
        # slightly above test tolerance (goldens were frozen on the CPU
        # backend; TPU fp differs at the margin).  A biased-but-stable
        # build cannot post a number.
        gold = json.load(
            open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                              "tests", "goldens_fixtures.json"))
        )["humerus_left.stl"]
        sane = (
            abs(ns - gold["neckshaft"]) < 0.75
            and abs(rad - gold["radius_curvature"]) < 0.75
            and abs(retro - gold["retroversion"]) < 0.75
        )
    else:  # synthetic fallback bone: anatomy-range gate only
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
