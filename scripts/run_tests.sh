#!/usr/bin/env bash
# Sharded test runner (VERDICT r2 #5; rebalanced r5 per VERDICT r4 #8).
#
# The full suite is ~75 min of single-process pytest on a 1-CPU runner —
# past per-command budgets and monolithic (one crash kills the whole run,
# which matters because the persistent XLA:CPU cache had to be disabled
# for SIGSEGV/SIGABRT crashes; see tests/conftest.py). This splits tests/
# into N pytest subprocesses, each targeted well under a 10-minute
# budget, with a per-shard JSON summary so one crash loses one shard.
#
# Assignment is a greedy longest-processing-time bin-pack over MEASURED
# per-file wall times (the TIMES table below; measured 2026-08-20 on this
# runner, isolated single-file runs). Files not in the table (new tests)
# are assumed 60 s. At NSHARDS=9 the simulated max shard is ~505 s local
# — re-measure and refresh TIMES when a shard report exceeds ~600 s.
#
# Usage:
#   scripts/run_tests.sh            # all shards sequentially
#   scripts/run_tests.sh 3          # run only shard 3 (0-based)
#   NSHARDS=12 scripts/run_tests.sh # override shard count
#
# Exit code: 0 iff every executed shard passed.

set -u
cd "$(dirname "$0")/.."

NSHARDS="${NSHARDS:-9}"
OUTDIR="${TEST_SHARD_OUT:-/tmp/videollamb_test_shards}"
mkdir -p "$OUTDIR"

# The parity dress rehearsal (torch reference generate + a fresh
# full-model XLA compile) gets its OWN shard (index NSHARDS) so a slow
# reference run cannot blow another shard's budget.
SOLO="test_parity_rehearsal.py"

# Greedy LPT over measured seconds; emits "shard_idx file" lines.
ASSIGN=$(python3 - "$NSHARDS" <<'EOF'
import os, sys
N = int(sys.argv[1])
TIMES = {
 "test_trainer":369,"test_seq_parallel":362,"test_server":291,
 "test_parallel":248,"test_serving":230,"test_packed_training":162,
 "test_retro":149,"test_pipeline":146,"test_device_choices":140,
 "test_deformable":134,"test_niavh_hour":108,
 "test_streaming_incremental":96,"test_assembly_all_projectors":95,
 "test_auto_prefix":88,"test_batch_cli":87,"test_splice_and_assembly":86,
 "test_lora":81,"test_paged":81,"test_mixed_modality":77,
 "test_constrained":73,"test_speculative":58,"test_device_grammar":54,
 "test_anyres":49,"test_gathered_paged":48,"test_modalities":46,
 "test_eval":46,"test_mlora":46,"test_regex_grammar":45,
 "test_egovlp_text":45,"test_niavh":41,"test_sampling_controls":41,
 "test_adapter_hotload":40,"test_bridge":39,"test_rope_scaling":39,
 "test_preemption":38,"test_http_server":38,"test_vision_quant":37,
 "test_spatial_attention":36,"test_openai_api":35,"test_serving_load":35,
 "test_embeddings":35,"test_retention":34,"test_generate_parity":34,
 "test_builder":33,"test_grammar":32,"test_llama":31,"test_schema":29,
 "test_vision_tower":29,"test_attention":28,"test_tower_assembly":27,
 "test_mistral":27,"test_temporal_attention":26,
 "test_projector_variants":26,"test_mpt":22,"test_device_preprocess":21,
 "test_int4":21,"test_tools":21,"test_egovlp":20,"test_vit_family":18,
 "test_quant":12,"test_scene_tilling":11,"test_kernel_partition":9,
 "test_grammar_real_tokenizer":8,"test_ring_attention":7,
 "test_train_cli":4,"test_data_pipeline":3,"test_decord_golden":2,
 "test_preprocess":2,
}
solo = {"test_parity_rehearsal"}
files = sorted(f[:-3] for f in os.listdir("tests")
               if f.startswith("test_") and f.endswith(".py")
               and f[:-3] not in solo)
loads = [0.0] * N
for name in sorted(files, key=lambda f: -TIMES.get(f, 60)):
    i = min(range(N), key=lambda j: loads[j])
    loads[i] += TIMES.get(name, 60)
    print(i, f"tests/{name}.py")
EOF
)

declare -a SHARD_FILES
while read -r idx f; do
  SHARD_FILES[$idx]="${SHARD_FILES[$idx]:-} $f"
done <<< "$ASSIGN"
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
