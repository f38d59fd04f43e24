#!/usr/bin/env bash
# Profile-guided-optimization experiment for the native host codec:
# baseline -> instrumented profile run over the corpus -> PGO rebuild ->
# A/B measurement.  Prints both corpus-aggregate numbers.
set -euo pipefail
cd "$(dirname "$0")/.."

PROF_DIR="${TMPDIR:-/tmp}/snappy_tpu_pgo"
mkdir -p "$PROF_DIR"

run_bench() {
  python - <<'EOF'
import sys, time
sys.path.insert(0, '.')
import jax; jax.config.update("jax_platforms", "cpu")
from snappy_tpu.ops import host_codec
from snappy_tpu.testing import corpus
files = [(n, corpus.read_data(n)) for n in corpus.available_corpus()]
# warm
for _, d in files: host_codec.raw_compress(d)
best = None
for _ in range(7):
    t0 = time.perf_counter()
    tot = 0
    for _, d in files:
        enc = host_codec.raw_compress(d)
        tot += len(d)
    dt = time.perf_counter() - t0
    best = dt if best is None or dt < best else best
print("corpus aggregate encode: %.3f GB/s" % (tot / best / 1e9))
EOF
}

echo "== baseline =="
run_bench

echo "== profile run =="
SNAPPY_TPU_CFLAGS="-fprofile-generate=$PROF_DIR" run_bench > /dev/null

echo "== PGO build =="
SNAPPY_TPU_CFLAGS="-fprofile-use=$PROF_DIR -fprofile-correction" run_bench

echo "(export SNAPPY_TPU_CFLAGS=\"-fprofile-use=$PROF_DIR -fprofile-correction\" to keep the PGO build)"
