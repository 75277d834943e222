#!/usr/bin/env bash
# Build the native C++ helpers into libgedepth_native.so (loaded via ctypes
# by gedepth_tpu.utils.native).
set -euo pipefail
cd "$(dirname "$0")"
g++ -O3 -march=native -fPIC -shared -std=c++17 \
    hough_ref.cpp depth_png.cpp \
    -lz \
    -o libgedepth_native.so
echo "built $(pwd)/libgedepth_native.so"
