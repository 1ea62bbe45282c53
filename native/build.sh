#!/bin/sh
# Build the native data-loader core (libxv2native.so).
set -e
cd "$(dirname "$0")"
g++ -O3 -march=native -shared -fPIC -o libxv2native.so decoder.cpp -lpng -ljpeg -lpthread
echo "built $(pwd)/libxv2native.so"
