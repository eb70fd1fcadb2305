#!/bin/bash
# Build the native runtime components (C++ -> shared libs used via ctypes).
set -e
cd "$(dirname "$0")/.."
mkdir -p audiodec_tpu/data/_native
g++ -O3 -march=native -shared -fPIC -o audiodec_tpu/data/_native/libwavio.so \
    csrc/wavio.cpp
echo "built audiodec_tpu/data/_native/libwavio.so"
