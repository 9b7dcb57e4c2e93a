#!/bin/sh
# Build the native mesh-compiler shared library.
set -e
cd "$(dirname "$0")"
CXX=${CXX:-g++}
$CXX -O3 -march=native -shared -fPIC -o libmeshcompiler.so meshcompiler.cpp
echo "built $(pwd)/libmeshcompiler.so"
