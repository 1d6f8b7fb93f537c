#!/bin/sh
# Build the native host libraries (C++): libvdxflow.so (Farnebäck flow).
set -e
cd "$(dirname "$0")"
mkdir -p build
g++ -O3 -march=native -ffast-math -fno-finite-math-only -fopenmp -shared -fPIC \
    -o build/libvdxflow.so farneback.cpp
echo "built: $(pwd)/build/libvdxflow.so"
