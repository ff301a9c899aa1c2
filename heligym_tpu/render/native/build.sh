#!/bin/sh
# Build the native software renderer into heligym_tpu/render/lib/.
# Prefers cmake+ninja; falls back to a direct g++ invocation.
set -e
cd "$(dirname "$0")"
mkdir -p ../lib
if command -v cmake >/dev/null 2>&1 && command -v ninja >/dev/null 2>&1; then
  cmake -S . -B build -G Ninja -DCMAKE_BUILD_TYPE=Release >/dev/null
  cmake --build build >/dev/null
else
  g++ -O2 -std=c++17 -shared -fPIC softrender.cpp api.cpp \
      -o ../lib/libheligym_tpu_render.so
fi
echo "built: $(ls ../lib)"
