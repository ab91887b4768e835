#!/bin/bash
# Build the ASAN/UBSAN fuzz target and run it over the reference fuzz /
# crash corpora (SURVEY §4 role: the reference's -asan fuzz CI jobs).
#   tools/run_fuzz.sh [execs_per_seed]   (default 25; ~100k+ total execs)
set -e
cd "$(dirname "$0")/.."
PER=${1:-25}
CORPUS=${TMPDIR:-/tmp}/ct_fuzz_corpus
BIN=${TMPDIR:-/tmp}/fuzz_native

if [ ! -d "$CORPUS" ] || [ -z "$(ls -A "$CORPUS" 2>/dev/null)" ]; then
  mkdir -p "$CORPUS"
  python - "$CORPUS" <<'EOF'
import sys, zipfile, os, hashlib
dst = sys.argv[1]
zips = [
    "/root/reference/zstd/testdata/fuzz/decode-corpus-encoded.zip",
    "/root/reference/zstd/testdata/fuzz/decode-oss.zip",
    "/root/reference/zstd/testdata/comp-crashers.zip",
    "/root/reference/zstd/testdata/decode-regression.zip",
    "/root/reference/zstd/testdata/bad.zip",
    "/root/reference/s2/testdata/fuzz/block-corpus-enc.zip",
    "/root/reference/flate/testdata/fuzz/FuzzEncoding.zip",
]
n = 0
for zp in zips:
    if not os.path.exists(zp):
        continue
    with zipfile.ZipFile(zp) as z:
        for name in z.namelist():
            data = z.read(name)
            if not data or len(data) > (1 << 20):
                continue
            h = hashlib.sha1(data).hexdigest()[:16]
            with open(os.path.join(dst, h), "wb") as f:
                f.write(data)
            n += 1
print(f"corpus: {n} seeds")
EOF
fi

REBUILD=0
if [ ! -x "$BIN" ]; then REBUILD=1; fi
for s in tools/fuzz_native.cpp compress_tpu/_native/src/*.cpp; do
  if [ "$s" -nt "$BIN" ]; then REBUILD=1; fi
done
if [ "$REBUILD" = 1 ]; then
  g++ -O1 -g -std=c++17 -fsanitize=address,undefined \
      -fno-sanitize-recover=all \
      tools/fuzz_native.cpp \
      compress_tpu/_native/src/zstd_dec.cpp \
      compress_tpu/_native/src/flate.cpp \
      compress_tpu/_native/src/s2.cpp \
      compress_tpu/_native/src/entropy_standalone.cpp \
      compress_tpu/_native/src/checksum.cpp \
      -o "$BIN"
fi

exec "$BIN" "$CORPUS" "$PER"
