#!/bin/bash
# Build the native preprocessing library (C++ -> ctypes).
set -e
cd "$(dirname "$0")/.."
g++ -O3 -fPIC -shared -std=c++17 -o shud_tpu/native/libshudc.so native/shudc.cpp
echo "built shud_tpu/native/libshudc.so"
