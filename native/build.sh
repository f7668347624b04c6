#!/bin/sh
# Build the native host-side data-loader core.
set -e
cd "$(dirname "$0")"
g++ -O3 -march=native -ffast-math -shared -fPIC -o libdahpe_native.so dahpe_native.cpp
echo "built $(pwd)/libdahpe_native.so"
