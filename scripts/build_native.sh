#!/usr/bin/env bash
# Build the native host-side audio library (csrc/audio_io.cpp) into
# taste_spokenlm_tpu/data/_native/libtaste_audio.so
set -euo pipefail
ROOT="$(cd "$(dirname "$0")/.." && pwd)"
OUT_DIR="$ROOT/taste_spokenlm_tpu/data/_native"
mkdir -p "$OUT_DIR"
g++ -O3 -march=native -fPIC -shared -std=c++17 -pthread \
    "$ROOT/csrc/audio_io.cpp" -o "$OUT_DIR/libtaste_audio.so"
echo "built $OUT_DIR/libtaste_audio.so"
