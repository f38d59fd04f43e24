#!/usr/bin/env bash
# Coverage-guided fuzz leg for the native codec.
#
# Parity target: the reference runs libFuzzer harnesses
# (/root/reference/tests/fuzzing/run_fuzzing_test.nims:21).  gcc has no
# libFuzzer, so the codec objects are built with
# -fsanitize-coverage=trace-pc (+ASan/UBSan) and driven by our own
# AFL-style corpus-growing loop (ops/native/fuzz_driver.c).
#
# Usage: tools/fuzz_coverage.sh [corpus files...]
#   FUZZ_ITERS=N  iteration budget (default 200000; CI uses a fixed
#                 budget so the job time is bounded)
set -euo pipefail
cd "$(dirname "$0")/.."

CC_BIN="${CC:-cc}"
NATIVE=snappy_tpu/ops/native
BUILD=$(mktemp -d)
trap 'rm -rf "$BUILD"' EXIT

SAN="-fsanitize=address,undefined -fno-sanitize-recover=all"

# codec objects: instrumented; driver: NOT instrumented (tracing the fuzz
# loop itself would drown the map in driver edges)
"$CC_BIN" -O1 -g $SAN -fsanitize-coverage=trace-pc -c \
  "$NATIVE/snappy_codec.c" -o "$BUILD/codec.o"
"$CC_BIN" -O1 -g $SAN -fsanitize-coverage=trace-pc -c \
  "$NATIVE/crc32c.c" -o "$BUILD/crc32c.o"
"$CC_BIN" -O1 -g $SAN -c "$NATIVE/fuzz_driver.c" -o "$BUILD/driver.o"
"$CC_BIN" $SAN "$BUILD/driver.o" "$BUILD/codec.o" "$BUILD/crc32c.o" \
  -o "$BUILD/fuzz"

FILES=("$@")
if [ "${#FILES[@]}" -eq 0 ]; then
  CORPUS="${SNAPPY_TPU_CORPUS:-/root/reference/tests}/data"
  for f in html urls.10K fireworks.jpeg alice29.txt geo.protodata \
           kppkn.gtb Mark.Twain-Tom.Sawyer.txt \
           baddata1.snappy baddata2.snappy baddata3.snappy; do
    [ -f "$CORPUS/$f" ] && FILES+=("$CORPUS/$f")
  done
fi
if [ "${#FILES[@]}" -eq 0 ]; then
  echo "corpus not found; generating synthetic corpus"
  python tools/gen_corpus.py "$BUILD/corpus"
  for f in "$BUILD"/corpus/*; do
    [ -f "$f" ] && FILES+=("$f")
  done
fi
if [ "${#FILES[@]}" -eq 0 ]; then
  echo "FATAL: no corpus files available" >&2
  exit 1
fi

ASAN_OPTIONS="abort_on_error=1" \
UBSAN_OPTIONS="print_stacktrace=1:halt_on_error=1" \
  "$BUILD/fuzz" "${FILES[@]}"
