#!/bin/sh
# Build the native graphcore shared library.
set -e
cd "$(dirname "$0")"
mkdir -p build
g++ -O3 -march=native -fPIC -shared -std=c++17 \
    graphcore.cpp -o build/libgraphcore.so
echo "built native/build/libgraphcore.so"
