#!/usr/bin/env bash
# Recertification ritual as ONE command (VERDICT r16 #5): every standing
# gate on the current tree, one PASS/FAIL table at the end, exit 0 iff
# all green. Gates keep running after a failure so a single invocation
# reports the full picture (each gate is independent evidence).
#
# Gates (the .claude/skills/verify/SKILL.md checklist, codified):
#   spec_suite       sbt -batch test (full ScalaTest suite)
#   verify_sf0.001   full Verify dump under the window-census gate
#   check_sf0.001    DuckDB oracle compare (driver-gate replica)
#   verify_sf0.01    same at the driver's gating SF
#   check_sf0.01     "
#   typelint_sf0.01  oracle result-type lint (HUGEINT/DECIMAL drift class)
#   hint_lint        full broadcast/crossJoin census (OTHER = 0)
#   hint_lint_self   planted-defect selftest of that lint
#   benchcmp_self    clamp/lookup/profile selftest of the bench comparator
#   scaleaudit_self  planted-defect selftest of the measured plan audit
#
# The census query count is READ from tools/window_census.txt (the
# stamped name list) — re-stamping after an audited plan change does not
# require editing this script. Bench timing runs are deliberately NOT
# here: they are a comparator workflow (bench_compare.py), not a gate.
#
# RECERT_ONLY="gate1 gate2" runs just the named gates (iteration aid —
# e.g. RECERT_ONLY=verify_sf0.001 after a census re-stamp; also how the
# table's FAIL path is demonstrated cheaply). Default = every gate; the
# round's final-tree certification must be a no-RECERT_ONLY run.
set -u
cd "$(dirname "$0")/.."

CENSUS=$(grep -c . tools/window_census.txt)
only=${RECERT_ONLY:-}
names=()
codes=()

run() { # run <name> <cmd...>
  local name=$1; shift
  if [ -n "$only" ]; then
    case " $only " in *" $name "*) ;; *) return 0;; esac
  fi
  echo "=== [$name] $*"
  "$@" </dev/null
  local rc=$?
  names+=("$name"); codes+=("$rc")
  echo "=== [$name] exit=$rc"
}

run spec_suite sbt -batch test

rm -rf /tmp/recert_sf0.001 /tmp/recert_sf0.01
run verify_sf0.001 env SPARK_GRAFT_WINDOW_CENSUS="$CENSUS" \
  sbt -batch "runMain graft.Verify /root/testdata/sf0.001 /tmp/recert_sf0.001"
run check_sf0.001 python3 tools/check.py /root/testdata/sf0.001 /tmp/recert_sf0.001

run verify_sf0.01 env SPARK_GRAFT_WINDOW_CENSUS="$CENSUS" \
  sbt -batch "runMain graft.Verify /root/testdata/sf0.01 /tmp/recert_sf0.01"
run check_sf0.01 python3 tools/check.py /root/testdata/sf0.01 /tmp/recert_sf0.01
run typelint_sf0.01 python3 tools/check.py /root/testdata/sf0.01 /tmp/recert_sf0.01 --lint

run hint_lint python3 tools/hint_lint.py
run hint_lint_self python3 tools/hint_lint.py --selftest
run benchcmp_self python3 tools/bench_compare.py --selftest
run scaleaudit_self sbt -batch "runMain graft.tools.ScaleAudit --selftest"

echo
# a typo'd RECERT_ONLY must not produce a vacuously green table (the
# StreamScale unknown-op precedent)
if [ ${#names[@]} -eq 0 ]; then
  echo "== RECERT: no gate matched RECERT_ONLY='$only' =="
  exit 2
fi
echo "== RECERT (census=$CENSUS queries) =="
fail=0
for i in "${!names[@]}"; do
  if [ "${codes[$i]}" -eq 0 ]; then s=PASS; else s="FAIL(${codes[$i]})"; fail=1; fi
  printf '  %-16s %s\n' "${names[$i]}" "$s"
done
if [ "$fail" -eq 0 ]; then echo "== RECERT: ALL GATES PASS =="; else echo "== RECERT: FAILURES ABOVE =="; fi
exit "$fail"
