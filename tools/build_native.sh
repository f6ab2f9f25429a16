#!/bin/bash
# Build the native ingest + OBB library (ctypes, no pybind11 needed).
set -euo pipefail
cd "$(dirname "$0")/.."
mkdir -p shoulder_tpu/io/_native
g++ -O3 -shared -fPIC -std=c++17 \
    csrc/ingest.cpp csrc/obb.cpp \
    -o shoulder_tpu/io/_native/libshoulder_ingest.so
echo "built shoulder_tpu/io/_native/libshoulder_ingest.so"
