#!/bin/bash
# Build + run the reference's offline delta-f coefficient generator
# (generate_delta_f_coefficients/urqmd/df_vh_dimensionless) as a test
# oracle.  The only build obstacle is an unused #include <libconfig.h>;
# a stub header suffices.  The binary regenerates the 10 coefficient
# tables on this machine and verifies they are byte-identical to the
# tables shipped in deltaf_coefficients/vh/urqmd/ -- proving the shipped
# tables ARE the generator's output (quantized to its fixed-6-decimals
# writer format, deltaf_table.cpp:240-244,387-391) and giving
# is3d_tpu/tools/deltaf_generator.py a ground truth to close against
# (tests/test_tools_native.py::test_deltaf_generator_closes_reference).
set -e
REF=${REF:-/root/reference}
OUT=${OUT:-/tmp/is3d_oracle}
GEN="$REF/generate_delta_f_coefficients/urqmd/df_vh_dimensionless"
WORK="$OUT/deltafgen"
mkdir -p "$WORK/urqmd"

if [ -f "$WORK/urqmd/c0.dat" ] && [ -f "$WORK/urqmd/betapi.dat" ]; then
    echo "$WORK oracle tables up to date"
    exit 0
fi

cat > "$WORK/libconfig.h" <<'STUB'
/* stub: the reference generator includes <libconfig.h> but uses nothing
   from it */
STUB

g++ -O2 -std=c++11 -w -I"$WORK" -I"$GEN/include" "$GEN"/src/*.cpp \
    -o "$OUT/deltaf_table.e"
echo "built $OUT/deltaf_table.e"

cd "$WORK"
ln -sf "$GEN/gauss_laguerre" .
ln -sf "$GEN/pdg.dat" .
"$OUT/deltaf_table.e"

for f in c0 c1 c2 c3 c4 G F betabulk betaV betapi; do
    if ! cmp -s "urqmd/$f.dat" "$REF/deltaf_coefficients/vh/urqmd/$f.dat"; then
        echo "ERROR: regenerated $f.dat differs from the shipped table" >&2
        exit 1
    fi
done
echo "all 10 regenerated tables byte-identical to deltaf_coefficients/vh/urqmd/"
