#!/bin/sh
# Build the native SfM core (utils/sfm.py loads it via ctypes and falls back
# to the numpy implementation if absent).
set -e
cd "$(dirname "$0")"
g++ -O3 -shared -fPIC -std=c++14 -o libniw_sfm.so sfm_core.cpp
echo "built $(pwd)/libniw_sfm.so"
