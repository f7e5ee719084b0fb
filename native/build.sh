#!/bin/sh
# Build the native runtime library (C++17, no external deps).
set -e
cd "$(dirname "$0")"
g++ -O3 -std=c++17 -shared -fPIC -o libppsfm_native.so graph.cpp
echo "built $(pwd)/libppsfm_native.so"
