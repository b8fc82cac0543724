#!/usr/bin/env bash
# Build the native components into build/ (ctypes-loaded shared libraries).
set -euo pipefail
cd "$(dirname "$0")/.."
mkdir -p build
g++ -O3 -march=native -shared -fPIC -std=c++17 \
    native/npz_loader.cpp -o build/libnpz_loader.so -lz -lpthread
echo "built build/libnpz_loader.so"
