#!/bin/sh
# Build the native host-side data-loader core.
# Optional $1: output path (used by utils/native.py for atomic rebuilds);
# defaults to libdahpe_native.so next to the source.
set -e
cd "$(dirname "$0")"
out="${1:-libdahpe_native.so}"
g++ -O3 -march=native -ffast-math -shared -fPIC -o "$out" dahpe_native.cpp
echo "built $out"
