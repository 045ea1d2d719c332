#!/bin/bash
# Build the reference iS3D binary as a test oracle (out-of-tree; the
# reference is read-only).  Uses the minimal GSL shim in gslshim/.
set -e
HERE=$(cd "$(dirname "$0")" && pwd)
REF=${REF:-/root/reference}
OUT=${OUT:-/tmp/is3d_oracle}
mkdir -p "$OUT"

if [ -x "$OUT/iS3D.e" ] && [ -x "$OUT/iS3D_fixedbilinear.e" ] \
   && [ "$OUT/iS3D.e" -nt "$HERE/gslshim/gslshim.cpp" ]; then
    echo "$OUT oracles up to date"
    exit 0
fi

SRCS=$(ls "$REF"/src/cpp/*.cpp)
g++ -O2 -std=c++11 -fopenmp -w -I"$HERE/gslshim" \
    $SRCS "$HERE/gslshim/gslshim.cpp" \
    -o "$OUT/iS3D.e"
echo "built $OUT/iS3D.e"

# Second oracle variant with the reference's transposed-bilinear indexing
# corrected (deltafReader.cpp:404-407 reads f_data[iT][imuB] from an array
# stored [imuB][iT] -- out of bounds for iT >= points_muB).  The patched
# copy lives only in the build dir; it is used to validate the nonzero-muB
# coefficient path, which the unpatched reference cannot compute.
mkdir -p "$OUT/patched"
sed -e 's/f_data\[iTL\]\[imuBL\]/f_data[imuBL][iTL]/' \
    -e 's/f_data\[iTL\]\[imuBR\]/f_data[imuBR][iTL]/' \
    -e 's/f_data\[iTR\]\[imuBL\]/f_data[imuBL][iTR]/' \
    -e 's/f_data\[iTR\]\[imuBR\]/f_data[imuBR][iTR]/' \
    "$REF/src/cpp/deltafReader.cpp" > "$OUT/patched/deltafReader.cpp"
SRCS_P=$(ls "$REF"/src/cpp/*.cpp | grep -v deltafReader.cpp)
g++ -O2 -std=c++11 -fopenmp -w -I"$HERE/gslshim" -I"$REF/src/cpp" \
    $SRCS_P "$OUT/patched/deltafReader.cpp" "$HERE/gslshim/gslshim.cpp" \
    -o "$OUT/iS3D_fixedbilinear.e"
echo "built $OUT/iS3D_fixedbilinear.e"
