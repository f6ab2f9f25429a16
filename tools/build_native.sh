#!/bin/bash
# Build the native ingest + OBB library (ctypes, no pybind11 needed).
set -euo pipefail
cd "$(dirname "$0")/.."
mkdir -p shoulder_tpu/io/_native
# -march=native + omp-simd vectorize the OBB caliper/classification loops
# (min/max reductions: value-exact under reorder); -ffp-contract=off keeps
# every scalar expression bit-identical to the unvectorized build (no FMA
# contraction) so the numpy-oracle and goldens comparisons cannot drift.
g++ -O3 -march=native -fopenmp-simd -ffp-contract=off -shared -fPIC \
    -std=c++17 \
    csrc/ingest.cpp csrc/obb.cpp \
    -o shoulder_tpu/io/_native/libshoulder_ingest.so
echo "built shoulder_tpu/io/_native/libshoulder_ingest.so"
