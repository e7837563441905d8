#!/usr/bin/env bash
# Build the reference encoder's pure-C path with gcc as a test oracle.
# The binary lands OUTSIDE the repo (nothing from /root/reference is
# copied into the repo; this script only compiles it in place).
#
# Usage: tools/build_reference_oracle.sh [OUTDIR]   (default /tmp/x264ref)
set -euo pipefail

REF=${REFERENCE_DIR:-/root/reference}
OUT=${1:-/tmp/x264ref}
HERE=$(cd "$(dirname "$0")" && pwd)

mkdir -p "$OUT/tree/cli" "$OUT/tree/libx264"
ln -sfn "$REF/common" "$OUT/tree/libx264/common"
for f in x264 input output; do
  printf '#include "%s/%s.c"\n' "$REF" "$f" > "$OUT/tree/cli/$f.c"
done

gcc -O2 -fno-strict-aliasing -w \
    -DX264_BIT_DEPTH=8 -DX264_CHROMA_FORMAT=0 \
    -include "$HERE/oracle/ti_compat.h" \
    -I"$REF" -I"$OUT/tree" -I"$OUT/tree/cli" \
    -o "$OUT/x264ref" \
    "$OUT"/tree/cli/*.c "$REF"/common/*.c "$REF"/encoder/*.c -lm

# configurable variant (our main, env-driven params) for parity tests
gcc -O2 -fno-strict-aliasing -w \
    -DX264_BIT_DEPTH=8 -DX264_CHROMA_FORMAT=0 \
    -include "$HERE/oracle/ti_compat.h" \
    -I"$REF" -I"$OUT/tree" \
    -o "$OUT/oracle_cli" \
    "$HERE/oracle/oracle_cli.c" "$REF"/common/*.c "$REF"/encoder/*.c -lm

echo "$OUT/x264ref"
