#!/usr/bin/env bash
# One-command four-scale registry receipt (r9 verdict #5).
#
# Runs the full query registry against the DuckDB oracle at every listed
# scale factor (default: sf0.001, sf0.01, sf0.1, sf1) plus an
# ALTERNATE-LAYOUT re-run at sf0.01 (different shuffle-partition count and
# core count — proves every hash partitioning-independent), sharding each
# scale across N_SHARDS concurrent verify_local processes, and writes the
# receipt block for COVERAGE.md to $OUT_DIR/receipt.txt.
#
# The bespoke r9 procedure this replaces had two pitfalls, both handled:
#   * pplog scratch races: the per-partition log scratch dirs are
#     PRE-BUILT once per sf dir before sharding (the build lock makes
#     races safe but serializes shards; prebuilding is faster);
#   * sf1 fixture absence: gen_sf1.py runs if the fixture is missing
#     (idempotent, mtime-marker keyed; ~4 min, ~180 MB).
#
# Usage:
#   scripts/round_gate.sh                 # full gate, all four scales
#   SCALES="sf0.01" scripts/round_gate.sh # quick single-scale run
#   N_SHARDS=8 scripts/round_gate.sh
#
# Environment:
#   SCALES     space-separated subset of: sf0.001 sf0.01 sf0.1 sf1
#   N_SHARDS   concurrent verify_local shards per scale (default 4)
#   SF1_SHARDS shards for the sf1 stage only (default 2): the sim_*
#              heavies peak ~56 GB RSS per shard JVM at sf1, and four
#              concurrent shards OOM-killed a shard on the 125 GB box
#              (rounds 10 AND 11 both hit this and had to resume by
#              hand) — two shards fit with headroom
#   CPUS       SPARK_GRAFT_CPUS per shard (default 8)
#   OUT_DIR    log/receipt dir (default /tmp/round_gate.<timestamp>)
set -u

cd "$(dirname "$0")/.."
REPO="$PWD"
SCALES="${SCALES:-sf0.001 sf0.01 sf0.1 sf1}"
N_SHARDS="${N_SHARDS:-4}"
SF1_SHARDS="${SF1_SHARDS:-2}"
CPUS="${CPUS:-8}"
OUT_DIR="${OUT_DIR:-/tmp/round_gate.$(date +%Y%m%d_%H%M%S)}"
mkdir -p "$OUT_DIR"

sf_dir() {
  case "$1" in
    sf1) echo "$REPO/.bench_data/sf1" ;;
    *)   echo "/root/testdata/$1" ;;
  esac
}

# registry names, registry order (the shards partition this list)
python - <<'EOF' > "$OUT_DIR/names.txt"
import os, sys; sys.path.insert(0, os.getcwd())
from fluvio_duck_spark.queries import all_queries
print("\n".join(all_queries()))
EOF
N_TOTAL=$(wc -l < "$OUT_DIR/names.txt")
echo "registry: $N_TOTAL names; scales: $SCALES; $N_SHARDS shards each" | tee "$OUT_DIR/receipt.txt"

run_scale() {  # $1=label  $2=sf dir  $3=extra env ("K=V K=V")  $4=shards
  local label="$1" dir="$2" extra="${3:-}" shards="${4:-$N_SHARDS}"
  # prebuild the shared pplog scratch fixtures once (see header)
  env $extra SPARK_GRAFT_CPUS="$CPUS" python - "$dir" <<'EOF' >> "$OUT_DIR/prebuild.log" 2>&1
import os, sys; sys.path.insert(0, os.getcwd())
from fluvio_duck_spark.session import get_spark
from fluvio_duck_spark.sources.pplog import write_pp_log_dir, write_pp_array_log_dir
spark = get_spark("round-gate-prebuild", shuffle_partitions=8)
write_pp_log_dir(spark, sys.argv[1])
write_pp_array_log_dir(spark, sys.argv[1])
spark.stop()
EOF
  local pids=() shard
  for shard in $(seq 0 $((shards - 1))); do
    awk -v s="$shard" -v n="$shards" 'NR % n == s' "$OUT_DIR/names.txt" \
      > "$OUT_DIR/shard_${label}_${shard}.names"
    # shellcheck disable=SC2046
    env $extra SPARK_GRAFT_CPUS="$CPUS" python scripts/verify_local.py "$dir" \
      $(cat "$OUT_DIR/shard_${label}_${shard}.names") \
      > "$OUT_DIR/verify_${label}_${shard}.log" 2>&1 &
    pids+=($!)
  done
  local fail=0
  for p in "${pids[@]}"; do wait "$p" || fail=1; done
  # logs carry \r progress lines — normalize before counting (r9 pitfall).
  # rows-only queries print "ROWS-ONLY", not "OK" (verify_local.py:128):
  # both are green; any "FAIL" line is red even if the process exited 0.
  local ok rows_only failed
  ok=$(cat "$OUT_DIR/verify_${label}_"*.log | tr '\r' '\n' | grep -c '^OK')
  rows_only=$(cat "$OUT_DIR/verify_${label}_"*.log | tr '\r' '\n' | grep -c '^ROWS-ONLY')
  failed=$(cat "$OUT_DIR/verify_${label}_"*.log | tr '\r' '\n' | grep -c '^FAIL')
  echo "$label: $ok oracle-OK + $rows_only rows-only = $((ok + rows_only))/$N_TOTAL (FAIL lines=$failed, proc fail=$fail, dir=$dir${extra:+, $extra})" \
    | tee -a "$OUT_DIR/receipt.txt"
  [ "$((ok + rows_only))" -eq "$N_TOTAL" ] && [ "$failed" -eq 0 ] && [ "$fail" -eq 0 ]
}

overall=0
for sc in $SCALES; do
  d="$(sf_dir "$sc")"
  if [ "$sc" = "sf1" ]; then
    # idempotent: returns immediately when the mtime-keyed marker matches
    echo "ensuring sf1 fixture ..." | tee -a "$OUT_DIR/receipt.txt"
    python scripts/gen_sf1.py >> "$OUT_DIR/gen_sf1.log" 2>&1 \
      || { echo "gen_sf1 FAILED" | tee -a "$OUT_DIR/receipt.txt"; overall=1; continue; }
  fi
  if [ "$sc" = "sf1" ]; then
    run_scale "$sc" "$d" "" "$SF1_SHARDS" || overall=1
  else
    run_scale "$sc" "$d" || overall=1
  fi
done

# alternate shuffle layout at sf0.01: partitioning-independence proof
if echo "$SCALES" | grep -q "sf0.01"; then
  run_scale "alt" "$(sf_dir sf0.01)" "SPARK_GRAFT_SHUFFLE=13 SPARK_GRAFT_CPUS=5" || overall=1
fi

echo "---" | tee -a "$OUT_DIR/receipt.txt"
if [ "$overall" -eq 0 ]; then
  echo "GATE GREEN — receipt: $OUT_DIR/receipt.txt" | tee -a "$OUT_DIR/receipt.txt"
else
  echo "GATE RED — inspect $OUT_DIR/verify_*.log" | tee -a "$OUT_DIR/receipt.txt"
fi
exit "$overall"
