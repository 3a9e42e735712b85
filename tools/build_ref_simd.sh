#!/bin/bash
# Build a SIMD (AVX2-intrinsics) reference SvtAv1EncApp for the speed
# baseline on hosts with no yasm/nasm.  The 13 .asm files are
# "assembled" to empty objects by a fake yasm; their functions come
# from tools/refsimd_shim.c (trivial kernels) plus link-time aliases
# to the reference's own C fallbacks.  Output: /tmp/refsimd-bin.
# Conformance keeps using the pristine COMPILE_C_ONLY oracle build.
set -e
REF=${1:-/root/reference}
OUT=${2:-/tmp/refsimd-bin}
BLD=/tmp/refsimd
mkdir -p /tmp/faketools
cat > /tmp/faketools/yasm <<'EOF'
#!/bin/bash
out=""
prev=""
for a in "$@"; do
  if [ "$prev" = "-o" ]; then out="$a"; fi
  prev="$a"
done
if [ -z "$out" ]; then echo "yasm 1.3.0"; exit 0; fi
exec gcc -c -x c /dev/null -o "$out"
EOF
chmod +x /tmp/faketools/yasm

gcc -O2 -c "$(dirname "$0")/refsimd_shim.c" -o /tmp/refsimd_shim.o

ALIASES=""
for p in dc dc_128 dc_left dc_top h v; do
  for s in 4x4 8x8 16x16; do
    ALIASES="$ALIASES -Wl,--defsym,svt_aom_${p}_predictor_${s}_sse2=svt_aom_${p}_predictor_${s}_c"
  done
done
for p in dc v; do
  for s in 4x4 8x8; do
    ALIASES="$ALIASES -Wl,--defsym,svt_aom_highbd_${p}_predictor_${s}_sse2=svt_aom_highbd_${p}_predictor_${s}_c"
  done
done
ALIASES="$ALIASES -Wl,--defsym,picture_copy_kernel_sse2=picture_copy_kernel"
ALIASES="$ALIASES -Wl,--defsym,svt_aom_subtract_block_sse2=svt_aom_subtract_block_c"

rm -rf "$BLD" && mkdir -p "$BLD"
cd "$BLD"
PATH=/tmp/faketools:$PATH cmake "$REF" -GNinja -DCMAKE_BUILD_TYPE=Release \
    -DBUILD_SHARED_LIBS=OFF > /dev/null
# inject the shim + aliases into the app/lib link lines only (they
# cannot go into CMAKE_EXE_LINKER_FLAGS: cmake's compiler sanity test
# would fail on the not-yet-defined alias targets)
FLAGS_ONELINE="/tmp/refsimd_shim.o $(echo $ALIASES)"
sed -i "s#^  LINK_LIBRARIES = #  LINK_LIBRARIES = $FLAGS_ONELINE #" build.ninja
PATH=/tmp/faketools:$PATH ninja SvtAv1EncApp
mkdir -p "$OUT"
mv "$REF"/Bin/Release/* "$OUT"/
rm -rf "$REF"/Bin
echo "SIMD reference encoder at $OUT/SvtAv1EncApp"
