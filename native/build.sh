#!/bin/sh
# Build the native BVH builder shared library.
set -e
cd "$(dirname "$0")"
g++ -O2 -march=native -fPIC -shared -o libbvh.so bvh_builder.cpp
echo "built $(pwd)/libbvh.so"
