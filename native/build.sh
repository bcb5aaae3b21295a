#!/bin/bash
# Build the native host-side graph kit.
set -e
cd "$(dirname "$0")"
g++ -O3 -march=native -shared -fPIC -o ../bathymetric_gnn_tpu/native/libgraphkit.so graphkit.cpp -lpthread
echo "built bathymetric_gnn_tpu/native/libgraphkit.so"
