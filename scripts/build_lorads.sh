#!/usr/bin/env bash
# Rebuild the LoRADS v2.0.1-alpha CPU baseline binary (optional; used by
# benchmark.py --lorads-binary for cross-checks). The build tree is NOT
# tracked in git (see .gitignore).
set -euo pipefail
REPO="$(cd "$(dirname "$0")/.." && pwd)"
SRC=/root/reference/lorads/src
BUILD="$REPO/build_lorads"
cmake -S "$SRC" -B "$BUILD" -G Ninja -DCMAKE_BUILD_TYPE=Release
cmake --build "$BUILD"
echo "binary: $BUILD/LoRADS_v_2_0_1-alpha"
