#!/usr/bin/env bash
# Full local replica of the driver gate, plus the per-round artifacts:
#
#   tools/gate.sh r06
#
# 1. sbt test                      — every ScalaTest spec
# 2. Smoke (sf0.001)               — entry() + every query builds & runs
# 3. Verify (sf0.01) + DuckDB      — the t2 correctness gate (N/N OK)
# 4. PlanAudit → PLANS_<round>.txt — committed plan-shape artifact;
#                                    HARD-FAILS on any CartesianProduct
#                                    (ContractSpec holds the finer
#                                    bounded-build-side BNLJ gate)
# 5. Bench (sf0.1)                 — full sweep; >2x-baseline flags are
#                                    auto re-measured in-JVM (Bench.scala)
# 6. Top-15 isolated re-bench      — the 15 most expensive queries by
#                                    baseline cost, re-run in a FRESH JVM
#                                    after the sweep: bounds the session
#                                    GC/JIT drift the committed baseline
#                                    can ever absorb
set -u
cd "$(dirname "$0")/.."
ROUND=${1:?usage: tools/gate.sh rNN}

echo "== [1/6] sbt test"
sbt -batch test >/tmp/gate_test.log 2>&1
grep -E "Tests:|All tests passed|TESTS FAILED" /tmp/gate_test.log | tail -3
grep -q "All tests passed" /tmp/gate_test.log || { echo "FAIL: sbt test"; exit 1; }

echo "== [2/6] Smoke sf0.001"
sbt -batch "runMain graft.Smoke" 2>/dev/null | grep '\[smoke\]' >/tmp/gate_smoke.log
wc -l </tmp/gate_smoke.log

echo "== [3/6] Verify sf0.01 + DuckDB oracle"
rm -rf /tmp/graft_verify
sbt -batch "runMain graft.Verify /root/testdata/sf0.01 /tmp/graft_verify" >/dev/null 2>&1
python3 tools/check_oracle.py /root/testdata/sf0.01 /tmp/graft_verify | tail -2
python3 tools/check_oracle.py /root/testdata/sf0.01 /tmp/graft_verify 2>/dev/null \
  | tail -1 | grep -qE "^[0-9]+/[0-9]+ OK$" || { echo "FAIL: oracle"; exit 1; }

echo "== [4/6] PlanAudit -> PLANS_${ROUND}.txt"
sbt -batch "runMain graft.PlanAudit" 2>/tmp/gate_plan_err.log | grep '\[plan\]' \
  | sed 's/^\[info\] //' >"PLANS_${ROUND}.txt"
if grep -q "GATE FAIL\|ERROR" "PLANS_${ROUND}.txt" /tmp/gate_plan_err.log; then
  echo "FAIL: plan gate (CartesianProduct or build error)"; exit 1
fi
wc -l <"PLANS_${ROUND}.txt"

echo "== [5/6] Bench sf0.1 (full sweep, auto re-measured flags)"
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
  sbt -batch "runMain graft.Bench" 2>/tmp/gate_bench_err.log | grep '"metric"' | tail -1

echo "== [6/6] Top-15-by-baseline isolated re-bench (fresh JVM)"
TOP15=$(python3 -c "
import json
b = json.load(open('BENCH_BASELINE.json'))
print(','.join(sorted(b, key=b.get, reverse=True)[:15]))")
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
  SPARK_GRAFT_QUERIES="$TOP15" SPARK_GRAFT_BENCH_OUT=BENCH_TOP15_ISOLATED.json \
  sbt -batch "runMain graft.Bench" 2>/dev/null | grep '"metric"' | tail -1

echo "== gate complete for ${ROUND}"
