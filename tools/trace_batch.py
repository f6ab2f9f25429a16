"""Capture a jax.profiler device trace of the full batch pipeline and
print the top HLO ops by self time.

Run:  python tools/trace_batch.py [batch] [outdir]
"""

import glob
import gzip
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from shoulder_tpu.io import ingest
    from shoulder_tpu.models import forest
    from shoulder_tpu.pipeline import batch as B

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    outdir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/jaxtrace"

    spec = ingest.load_bone(
        "/root/reference/tests/test_bones/humerus_left.stl"
    )
    bones = jax.block_until_ready(
        jax.device_put(B.stack_bones([spec] * batch))
    )
    rf = jax.block_until_ready(jax.device_put(forest.load_params()))
    _ = float(np.asarray(jax.jit(lambda b: jnp.sum(b.z_length))(bones)))

    fn = jax.jit(lambda b, r: B.compute_landmarks_batch(b, r))
    out = jax.block_until_ready(fn(bones, rf))  # compile
    t0 = time.time()
    out = jax.block_until_ready(fn(bones, rf))
    print(f"exec {time.time() - t0:.3f}s (pre-trace)", flush=True)

    with jax.profiler.trace(outdir):
        out = jax.block_until_ready(fn(bones, rf))
    print("traced", flush=True)

    # parse: trace_events json (trace_viewer) is the most portable
    files = sorted(glob.glob(outdir + "/**/*.xplane.pb", recursive=True))
    print("xplane files:", files, flush=True)
    if not files:
        return
    from tensorboard_plugin_profile.convert import raw_to_tool_data as rtd

    data, _ = rtd.xspace_to_tool_data([files[-1]], "trace_viewer", {})
    if isinstance(data, bytes):
        try:
            data = gzip.decompress(data)
        except OSError:
            pass
    tr = json.loads(data)
    events = [
        e for e in tr.get("traceEvents", [])
        if e.get("ph") == "X" and e.get("dur", 0) > 0
    ]
    # keep device-side events (TensorCore pids)
    pid_names = {
        e["pid"]: e["args"].get("name", "")
        for e in tr["traceEvents"]
        if e.get("ph") == "M" and e.get("name") == "process_name"
        and "args" in e
    }
    dev_pids = {p for p, n in pid_names.items()
                if "TPU" in n or "/device" in n.lower()}
    print("processes:", pid_names, flush=True)
    agg = {}
    for e in events:
        if dev_pids and e.get("pid") not in dev_pids:
            continue
        name = e.get("name", "?")
        agg[name] = agg.get(name, 0.0) + e["dur"]
    top = sorted(agg.items(), key=lambda kv: -kv[1])[:60]
    total = sum(agg.values())
    print(f"total device event time {total / 1e3:.1f} ms")
    for name, dur in top:
        print(f"{dur / 1e3:9.2f} ms  {name[:110]}")


if __name__ == "__main__":
    main()
