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
#   scaleaudit_full  (RECERT_FULL=1 or named in RECERT_ONLY) the full
#                    both-SF measured sweep, totals diffed against the
#                    stamped tools/scaleaudit_expected.txt baseline
#
# The census query count is READ from tools/window_census.txt (the
# stamped name list) — re-stamping after an audited plan change does not
# require editing this script. Bench timing runs are deliberately NOT
# here: they are a comparator workflow (bench_compare.py), not a gate.
#
# RECERT_ONLY="gate1 gate2" runs just the named gates (iteration aid —
# e.g. RECERT_ONLY=verify_sf0.001 after a census re-stamp; also how the
# table's FAIL path is demonstrated cheaply). EVERY token is validated
# against the gate list up front — one typo'd name among valid ones
# exits 2 instead of silently dropping the typo'd gate (ADVICE r17).
# Default = every standing gate; the round's final-tree certification
# must be a no-RECERT_ONLY run. RECERT_FULL=1 adds the full ScaleAudit
# sweep to a default run (VERDICT r17 #5) so the sweep the round notes
# cite cannot silently drift out of the certification loop.
set -u
cd "$(dirname "$0")/.."

GATES="spec_suite verify_sf0.001 check_sf0.001 verify_sf0.01 check_sf0.01 typelint_sf0.01 hint_lint hint_lint_self benchcmp_self scaleaudit_self scaleaudit_full"

# the stamped census must exist BEFORE anything launches — without this
# guard the failure is loud but misattributed to an unparseable
# SPARK_GRAFT_WINDOW_CENSUS value (VERDICT r17 #4)
if [ ! -f tools/window_census.txt ]; then
  echo "recert: stamped census tools/window_census.txt is MISSING —" >&2
  echo "recert: re-stamp it from a full Verify run (cp <outDir>/window_census.txt tools/)" >&2
  exit 2
fi
CENSUS=$(grep -c . tools/window_census.txt)
only=${RECERT_ONLY:-}
full=${RECERT_FULL:-}

# validate every RECERT_ONLY token up front (ADVICE r17: the old check
# only fired when ZERO gates matched, so a list mixing one valid and one
# misspelled name silently dropped the typo and printed a green table)
for tok in $only; do
  case " $GATES " in
    *" $tok "*) ;;
    *) echo "recert: unknown gate '$tok' in RECERT_ONLY (known: $GATES)" >&2
       exit 2;;
  esac
done

names=()
codes=()

# does gate $1 run in this invocation?
selected() {
  if [ -n "$only" ]; then
    case " $only " in *" $1 "*) return 0;; *) return 1;; esac
  fi
  # default run: scaleaudit_full is opt-in via RECERT_FULL=1
  if [ "$1" = scaleaudit_full ] && [ "$full" != 1 ]; then return 1; fi
  return 0
}

run() { # run <name> <cmd...>
  local name=$1; shift
  selected "$name" || return 0
  echo "=== [$name] $*"
  "$@" </dev/null
  local rc=$?
  names+=("$name"); codes+=("$rc")
  echo "=== [$name] exit=$rc"
}

# the full-sweep gate: run the both-SF measured audit, extract the four
# summary totals, diff against the stamped accepted baseline (windows 0,
# cross 0, the three known result-size-by-construction shuffles, the
# planner-chosen broadcast set) — any drift fails the gate
scaleaudit_full_gate() {
  local log=/tmp/recert_scaleaudit_full.log
  sbt -batch "runMain graft.tools.ScaleAudit" >"$log" 2>&1
  local rc=$?
  tail -5 "$log"
  [ $rc -ne 0 ] && return $rc
  grep -E '^\[(windows|bcast|cross|shuffle)\] +flagged:' "$log" \
    > /tmp/recert_scaleaudit_totals.txt
  diff tools/scaleaudit_expected.txt /tmp/recert_scaleaudit_totals.txt
}

run spec_suite sbt -batch test

# only clear a dump dir when its verify gate will recreate it — an
# unconditional rm deletes the dump a check-only RECERT_ONLY subset is
# about to read and fails spuriously (ADVICE r17)
selected verify_sf0.001 && rm -rf /tmp/recert_sf0.001
selected verify_sf0.01 && rm -rf /tmp/recert_sf0.01
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
run scaleaudit_full scaleaudit_full_gate

echo
# defense in depth: an empty table still must not read as vacuously
# green (the StreamScale unknown-op precedent)
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
