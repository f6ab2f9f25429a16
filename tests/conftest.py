import os
import sys
from pathlib import Path

# multi-device sharding tests run on a virtual 8-device CPU mesh
# (force: the environment presets JAX_PLATFORMS=axon for the real chip)
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault(
    "XLA_FLAGS",
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8",
)

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np
import pytest

REFERENCE_BONES = Path("/root/reference/tests/test_bones")


def reference_stl(name: str) -> Path:
    p = REFERENCE_BONES / name
    if not p.exists():
        pytest.skip(f"reference fixture {name} not available")
    return p


@pytest.fixture(scope="session")
def synthetic_bone():
    from shoulder_tpu.io.testdata import synthetic_humerus

    rng = np.random.default_rng(0)
    return synthetic_humerus(rng_transform=rng)
