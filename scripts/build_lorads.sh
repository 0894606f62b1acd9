#!/usr/bin/env bash
# Rebuild the LoRADS v2.0.1-alpha CPU baseline binary (optional; used by
# benchmark.py --lorads-binary for cross-checks). The build tree is NOT
# tracked in git (see .gitignore).
set -euo pipefail
REPO="$(cd "$(dirname "$0")/.." && pwd)"
SRC=/root/reference/lorads/src
BUILD="$REPO/build_lorads"
# this image ships only the versioned runtime libs (liblapack.so.3,
# libarpack.so.2), not the -dev symlinks find_library/-larpack need —
# pre-seed the cache variables and provide unversioned symlinks
mkdir -p "$BUILD/libs"
ln -sf /usr/lib/x86_64-linux-gnu/libarpack.so.2 "$BUILD/libs/libarpack.so"
cmake -S "$SRC" -B "$BUILD" -G Ninja -DCMAKE_BUILD_TYPE=Release \
  -DLAPACK_LIBRARIES=/usr/lib/x86_64-linux-gnu/lapack/liblapack.so.3 \
  -DBLAS_LIBRARIES=/usr/lib/x86_64-linux-gnu/blas/libblas.so.3 \
  -DCMAKE_EXE_LINKER_FLAGS="-L$BUILD/libs"
cmake --build "$BUILD"
echo "binary: $BUILD/LoRADS_v_2_0_1-alpha"
