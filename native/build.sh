#!/bin/sh
# Build the native BAM decoder shared library.
set -e
cd "$(dirname "$0")"
g++ -O3 -march=native -shared -fPIC -std=c++17 \
    bam_decoder.cpp -ldeflate -o liblancet2_bam.so
echo "built $(pwd)/liblancet2_bam.so"
