#!/bin/bash
# Build the reference iS3D binary as a test oracle (out-of-tree; the
# reference is read-only).  Uses the minimal GSL shim in gslshim/.
set -e
HERE=$(cd "$(dirname "$0")" && pwd)
REF=${REF:-/root/reference}
OUT=${OUT:-/tmp/is3d_oracle}
mkdir -p "$OUT"

if [ -x "$OUT/iS3D.e" ] && [ "$OUT/iS3D.e" -nt "$HERE/gslshim/gslshim.cpp" ]; then
    echo "$OUT/iS3D.e up to date"
    exit 0
fi

SRCS=$(ls "$REF"/src/cpp/*.cpp)
g++ -O2 -std=c++11 -fopenmp -w -I"$HERE/gslshim" \
    $SRCS "$HERE/gslshim/gslshim.cpp" \
    -o "$OUT/iS3D.e"
echo "built $OUT/iS3D.e"
