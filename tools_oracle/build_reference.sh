#!/bin/bash
# Build the reference iS3D binary as a test oracle (out-of-tree; the
# reference is read-only).  Uses the minimal GSL shim in gslshim/.
set -e
HERE=$(cd "$(dirname "$0")" && pwd)
REF=${REF:-/root/reference}
OUT=${OUT:-/tmp/is3d_oracle}
mkdir -p "$OUT"

if [ -x "$OUT/iS3D.e" ] && [ -x "$OUT/iS3D_fixedbilinear.e" ] \
   && [ -x "$OUT/iS3D_polzn.e" ] && [ -x "$OUT/iS3D_vah.e" ] \
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

# Fourth oracle variant making the VAH smooth kernel reachable: the
# reference's only call site for calculate_dN_pTdpTdphidy_VAH_PL is
# commented out (emissionfunction.cpp:1650-1654), so MODE-2 smooth runs
# write zero spectra.  Uncommenting those five lines (anchored by exact
# indentation: the smooth call's continuation lines carry 5 spaces after
# "//", the sampler stub's carry 7, so only the smooth call is revived)
# gives a golden oracle for the anisotropic-hydro kernel.  The per-cell
# residual df coefficients c0..c4 are ALSO patched to fixed constants:
# the stock fill copies surf->c0.. (emissionfunction.cpp:1492-1496), but
# no reference reader ever writes those FO_surf fields, so under
# df_mode=4 they are indeterminate (new FO_surf[] default-initializes) --
# the constants make the residual-df path deterministic and therefore
# testable.  The call site ALSO never compiled as written: the kernel
# takes the full 10-component pi_perp^munu, but calculate_spectra only
# ever allocates/fills the 5-component VH set (emissionfunction.cpp:
# 1340,1357-1363,1447-1453) -- pitt/pitx/pity/pitn/pinn SoA arrays are
# supplied here following the surrounding alloc/fill pattern (the VAH
# smooth port was abandoned upstream mid-plumbing; freed at process
# exit).  Parity caveat handled on the test side: the VAH kernel
# multiplies the eta table's weight column by delta_eta a second time
# (smooth_kernels.cpp:2237-2245; the column already contains delta_eta,
# cf. the VH kernel :79-80), a uniform global factor in 2+1D.
sed -e 's@// calculate_dN_pTdpTdphidy_VAH_PL(Mass, Sign, Degeneracy,@calculate_dN_pTdpTdphidy_VAH_PL(Mass, Sign, Degeneracy,@' \
    -e 's@double \*c0, \*c1, \*c2, \*c3, \*c4; //delta-f coeffs for vah@double *c0, *c1, *c2, *c3, *c4; //delta-f coeffs for vah\n    double *pitt, *pitx, *pity, *pitn, *pinn; // full piperp for VAH@' \
    -e 's@PL = (double\*)calloc(FO_length, sizeof(double));@PL = (double*)calloc(FO_length, sizeof(double));\n      pitt = (double*)calloc(FO_length, sizeof(double));\n      pitx = (double*)calloc(FO_length, sizeof(double));\n      pity = (double*)calloc(FO_length, sizeof(double));\n      pitn = (double*)calloc(FO_length, sizeof(double));\n      pinn = (double*)calloc(FO_length, sizeof(double));@' \
    -e 's@PL\[icell\] = surf->PL;@PL[icell] = surf->PL;\n        pitt[icell] = surf->pitt;\n        pitx[icell] = surf->pitx;\n        pity[icell] = surf->pity;\n        pitn[icell] = surf->pitn;\n        pinn[icell] = surf->pinn;@' \
    -e 's@//     tau, eta, ux, uy, un,@tau, eta, ux, uy, un,@' \
    -e 's@//     dat, dax, day, dan, T,@dat, dax, day, dan, T,@' \
    -e 's@//     pitt, pitx, pity, pitn, pixx, pixy, pixn, piyy, piyn, pinn, bulkPi,@pitt, pitx, pity, pitn, pixx, pixy, pixn, piyy, piyn, pinn, bulkPi,@' \
    -e 's@//     Wx, Wy, Lambda, aL, c0, c1, c2, c3, c4);@Wx, Wy, Lambda, aL, c0, c1, c2, c3, c4);@' \
    -e 's@c0\[icell\] = surf->c0;@c0[icell] = 0.12;@' \
    -e 's@c1\[icell\] = surf->c1;@c1[icell] = -0.08;@' \
    -e 's@c2\[icell\] = surf->c2;@c2[icell] = 0.05;@' \
    -e 's@c3\[icell\] = surf->c3;@c3[icell] = 0.40;@' \
    -e 's@c4\[icell\] = surf->c4;@c4[icell] = -0.25;@' \
    "$REF/src/cpp/emissionfunction.cpp" > "$OUT/patched/emissionfunction_vah.cpp"
if ! grep -qE '^ *calculate_dN_pTdpTdphidy_VAH_PL\(Mass' "$OUT/patched/emissionfunction_vah.cpp" \
   || ! grep -q 'c4\[icell\] = -0.25;' "$OUT/patched/emissionfunction_vah.cpp"; then
    echo "ERROR: VAH patch did not apply (anchor text changed?)" >&2
    exit 1
fi
SRCS_P3=$(ls "$REF"/src/cpp/*.cpp | grep -v 'emissionfunction\.cpp')
g++ -O2 -std=c++11 -fopenmp -w -I"$HERE/gslshim" -I"$REF/src/cpp" \
    $SRCS_P3 "$OUT/patched/emissionfunction_vah.cpp" "$HERE/gslshim/gslshim.cpp" \
    -o "$OUT/iS3D_vah.e"
echo "built $OUT/iS3D_vah.e"
