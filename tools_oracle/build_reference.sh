#!/bin/bash
# Build the reference iS3D binary as a test oracle (out-of-tree; the
# reference is read-only).  Uses the minimal GSL shim in gslshim/.
set -e
HERE=$(cd "$(dirname "$0")" && pwd)
REF=${REF:-/root/reference}
OUT=${OUT:-/tmp/is3d_oracle}
mkdir -p "$OUT"

if [ -x "$OUT/iS3D.e" ] && [ -x "$OUT/iS3D_fixedbilinear.e" ] \
   && [ -x "$OUT/iS3D_polzn.e" ] \
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

# Third oracle variant making the spin-polarization kernel reachable: the
# stock reference swallows MODE 5 into its viscous-hydro branch
# (emissionfunction.cpp:1503), so the `else if (MODE == 5)
# calculate_spin_polzn(...)` at :1675 is dead code and the S^mu writers
# emit zero-initialized arrays.  Dropping MODE 5 from that ONE condition
# routes mode-5 runs to the polarization kernel, giving us a golden
# oracle for it.  The sed is anchored to :1503's unique "// viscous
# hydro" suffix so the other three sites guarded by the same expression
# (the E/T/P calloc at :1328, the fill loop at :1425, and the free at
# :1709) stay intact -- those arrays remain allocated/filled/freed on
# the mode-5 path (the polzn kernel just never reads them).  (The polzn
# kernel's vorticity chunk-indexing bug -- wtx_fo[icell] instead of
# [icell_glb], polzn_kernels.cpp:133 -- is dormant for surfaces <=
# FO_chunk = 10000 cells, which parity runs are.)
sed -e 's@MODE == 4 || MODE == 5 || MODE == 6 || MODE == 7) // viscous hydro@MODE == 4 || MODE == 6 || MODE == 7) // viscous hydro@' \
    "$REF/src/cpp/emissionfunction.cpp" > "$OUT/patched/emissionfunction.cpp"
if cmp -s "$REF/src/cpp/emissionfunction.cpp" "$OUT/patched/emissionfunction.cpp"; then
    echo "ERROR: polzn patch did not apply (anchor text changed?)" >&2
    exit 1
fi
SRCS_P2=$(ls "$REF"/src/cpp/*.cpp | grep -v 'emissionfunction\.cpp')
g++ -O2 -std=c++11 -fopenmp -w -I"$HERE/gslshim" -I"$REF/src/cpp" \
    $SRCS_P2 "$OUT/patched/emissionfunction.cpp" "$HERE/gslshim/gslshim.cpp" \
    -o "$OUT/iS3D_polzn.e"
echo "built $OUT/iS3D_polzn.e"
