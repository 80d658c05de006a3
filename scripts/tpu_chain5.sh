#!/bin/bash
# Round-5 serialized TPU capture chain. ONE tpu client at a time, ever:
# every stage runs under flock /tmp/tpu.lock, polls the tunnel first,
# and sleeps between stages (the axon tunnel refuses fresh clients for a
# short window after the previous one exits; two live clients can wedge
# it for hours — CLAUDE.md). Usage: bash scripts/tpu_chain5.sh [stage...]
# (default: all stages in order). Logs: docs/tpu_capture_r5/<stage>.log
set -u
cd /root/repo
mkdir -p docs/tpu_capture_r5
LOCK=/tmp/tpu.lock

probe() {
  timeout 90 python -c "
import jax
assert jax.devices()
import jax.numpy as jnp
assert float(jnp.sum(jnp.ones(8))) == 8.0
print('tunnel OK')" >/dev/null 2>&1
}

wait_tunnel() {
  local n=0
  until probe; do
    n=$((n + 1))
    echo "$(date +%H:%M:%S) tunnel down (poll $n), sleeping 120s" >&2
    sleep 120
    if [ "$n" -ge 120 ]; then
      echo "tunnel never recovered after $n polls" >&2
      return 1
    fi
  done
  echo "$(date +%H:%M:%S) tunnel up" >&2
}

run_stage() {
  local name=$1
  shift
  echo "=== stage $name: $* ===" >&2
  wait_tunnel || return 1
  (
    flock 9
    # "env" so the VAR=... prefixes survive under timeout's exec
    eval "timeout 5400 env $*" > "docs/tpu_capture_r5/$name.log" 2>&1
    echo "rc=$?" >> "docs/tpu_capture_r5/$name.log"
  ) 9>"$LOCK"
  echo "$(date +%H:%M:%S) stage $name done: $(tail -2 docs/tpu_capture_r5/$name.log | head -1 | cut -c1-160)" >&2
  sleep 45
}

STAGES=${*:-mesh256 mesh256_bf16 mesh512_T01 mesh512_chunked bench64}

for s in $STAGES; do
  case $s in
    mesh256)
      run_stage mesh256_postfix \
        "BENCH_REQUIRE_TPU=1 BENCH_BUDGET_S=5100 BENCH_MESH_SIZE=256 BENCH_VERBOSE=1 python bench.py" ;;
    mesh256_bf16)
      run_stage mesh256_postfix_bf16 \
        "BENCH_REQUIRE_TPU=1 BENCH_BUDGET_S=5100 BENCH_MESH_SIZE=256 BENCH_BF16_PLANES=1 BENCH_VERBOSE=1 python bench.py" ;;
    mesh512_T01)
      run_stage mesh512_T01_postfix \
        "BENCH_REQUIRE_TPU=1 BENCH_BUDGET_S=5100 BENCH_MESH_SIZE=512 BENCH_T=0.1 BENCH_VERBOSE=1 python bench.py" ;;
    mesh512_chunked)
      run_stage mesh512_fullT_chunked \
        "BENCH_REQUIRE_TPU=1 BENCH_BUDGET_S=5100 BENCH_MESH_SIZE=512 BENCH_CHUNK_STEPS=100 BENCH_TRIALS=2 BENCH_VERBOSE=1 python bench.py" ;;
    bench64)
      run_stage bench64_default \
        "BENCH_REQUIRE_TPU=1 BENCH_BUDGET_S=1100 BENCH_VERBOSE=1 python bench.py" ;;
    tiled256)
      run_stage mesh256_tiled_bicg \
        "BENCH_REQUIRE_TPU=1 BENCH_BUDGET_S=5100 BENCH_MESH_SIZE=256 BENCH_TILED=1 BENCH_VERBOSE=1 python bench.py" ;;
    scaling2d)
      run_stage scaling_2d \
        "BENCH_GATHER=0 python scripts/bench_blocked_scaling.py" ;;
    probe_sharded)
      run_stage probe_sharded_onchip \
        "python scripts/probe_sharded_onchip.py" ;;
    tpu_gate)
      run_stage tpu_gate \
        "python scripts/tpu_gate.py" ;;
    probe256)
      run_stage probe_kpp_cost_256 \
        "python scripts/probe_kpp_cost.py 256" ;;
    irr640)
      run_stage scaling_irr640 \
        "BENCH_2D_ONLY_NX=640 python scripts/bench_blocked_scaling.py" ;;
    fam_blocked)
      run_stage fam_blocked "python scripts/bench_blocked.py" ;;
    fam_pk)
      run_stage fam_pk "python scripts/bench_pk.py" ;;
    fam_adv)
      run_stage fam_adv "python scripts/bench_advection.py" ;;
    fam_euler)
      run_stage fam_euler "python scripts/bench_euler.py" ;;
    fam_stokes)
      run_stage fam_stokes "python scripts/bench_stokes.py" ;;
    mesh1024)
      run_stage mesh1024_T01 \
        "BENCH_REQUIRE_TPU=1 BENCH_BUDGET_S=5100 BENCH_MESH_SIZE=1024 BENCH_T=0.1 BENCH_CHUNK_STEPS=40 BENCH_TRIALS=1 BENCH_VERBOSE=1 python bench.py" ;;
    *)
      echo "unknown stage $s" >&2 ;;
  esac
done
echo "chain complete" >&2
