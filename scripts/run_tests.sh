#!/usr/bin/env bash
# Sharded test runner (VERDICT r2 #5).
#
# The full suite is ~20 min on a 1-CPU runner — past per-command budgets and
# monolithic (one crash kills the whole run, which matters because the
# persistent XLA:CPU cache had to be disabled for SIGSEGV/SIGABRT crashes;
# see tests/conftest.py). This splits tests/ into N sequential pytest
# subprocesses, each well under a 10-minute budget, with a per-shard JSON
# summary so one crash loses one shard, not the run.
#
# Usage:
#   scripts/run_tests.sh            # all shards sequentially
#   scripts/run_tests.sh 3          # run only shard 3 (0-based)
#   NSHARDS=8 scripts/run_tests.sh  # override shard count
#
# Exit code: 0 iff every executed shard passed.

set -u
cd "$(dirname "$0")/.."

NSHARDS="${NSHARDS:-5}"
OUTDIR="${TEST_SHARD_OUT:-/tmp/videollamb_test_shards}"
mkdir -p "$OUTDIR"

# Deterministic shard assignment: files sorted, heavy files interleaved
# first so shard wall-clocks stay balanced (timings measured on the
# 1-CPU driver runner; heaviest ≈ multi-device compile-bound suites).
HEAVY="test_parallel.py test_seq_parallel.py test_pipeline.py \
test_generate_parity.py test_paged.py test_serving.py test_server.py \
test_streaming_incremental.py test_mistral.py test_assembly_all_projectors.py \
test_ring_attention.py test_speculative.py test_trainer.py test_llama.py \
test_retro.py test_mlora.py test_rope_scaling.py test_retention.py \
test_constrained.py test_packed_training.py"

# The parity dress rehearsal is one ~5-min test (torch reference generate
# + a fresh full-model XLA compile) — it gets its OWN shard (index NSHARDS)
# so it cannot blow another shard's budget.
SOLO="test_parity_rehearsal.py"

mapfile -t ALL < <(cd tests && ls test_*.py | sort)

# heavy first (in listed order), then the rest alphabetically
ORDERED=()
for f in $HEAVY; do
  [ -f "tests/$f" ] && ORDERED+=("$f")
done
for f in "${ALL[@]}"; do
  case " $HEAVY $SOLO " in
    *" $f "*) ;;
    *) ORDERED+=("$f") ;;
  esac
done

# round-robin deal into shards; the solo shard holds the rehearsal alone
declare -a SHARD_FILES
for i in "${!ORDERED[@]}"; do
  s=$((i % NSHARDS))
  SHARD_FILES[$s]="${SHARD_FILES[$s]:-} tests/${ORDERED[$i]}"
done
for f in $SOLO; do
  [ -f "tests/$f" ] && SHARD_FILES[$NSHARDS]="${SHARD_FILES[$NSHARDS]:-} tests/$f"
done

run_shard() {
  local s="$1"
  local files="${SHARD_FILES[$s]:-}"
  if [ -z "$files" ]; then return 0; fi
  local t0 t1 rc
  t0=$(date +%s)
  # shellcheck disable=SC2086
  python -m pytest $files -q --no-header -p no:cacheprovider \
    2>&1 | tee "$OUTDIR/shard${s}.log" | tail -3
  rc=${PIPESTATUS[0]}
  t1=$(date +%s)
  local tail_line
  tail_line=$(grep -E '(passed|failed|error)' "$OUTDIR/shard${s}.log" | tail -1 | tr '"' "'")
  printf '{"shard": %d, "rc": %d, "seconds": %d, "files": "%s", "summary": "%s"}\n' \
    "$s" "$rc" "$((t1 - t0))" "$(echo $files | tr ' ' ',')" "$tail_line" \
    > "$OUTDIR/shard${s}.json"
  return "$rc"
}

FAIL=0
if [ "$#" -ge 1 ]; then
  run_shard "$1" || FAIL=1
else
  for s in $(seq 0 "$NSHARDS"); do
    echo "=== shard $s/$NSHARDS ==="
    run_shard "$s" || FAIL=1
  done
fi

echo "=== shard summaries ($OUTDIR) ==="
cat "$OUTDIR"/shard*.json 2>/dev/null
exit "$FAIL"
