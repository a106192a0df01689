#!/usr/bin/env python3
"""Calibration-normalized bench comparator (VERDICT r14 #7).

Every round's total has shifted a few percent with host load, and every
round's verdict has re-litigated noise-vs-regression by hand. Since r14
the bench artifact embeds its own host calibration (a deterministic CPU
spin at suite start and end, single-thread and one-per-core); this tool
reads two COMPLETE bench artifacts (the repo-root `bench_full.json` /
`bench_r{N}.json` written by graft.Bench — NOT the driver's truncated
BENCH_r{N}.json stdout wrappers) and emits the calibration-adjusted
comparison so "is this real?" is one command:

  python3 tools/bench_compare.py OLD.json NEW.json [--base 0.8] [--top 15]
  python3 tools/bench_compare.py git:HEAD~1:bench_r14.json bench_r15.json
  python3 tools/bench_compare.py OLD NEW --isolate-cmd 1.3   # emit the
      # one SPARK_GRAFT_ONLY re-run command covering every entry whose
      # adjusted ratio exceeds the given threshold (the q127 settling
      # ritual, made mechanical — VERDICT r15 #5)

- the calibration ratio is min(new spins)/min(old spins), computed per
  spin kind (min, not mean: a load burst hitting one spin would swing
  the whole adjustment — the min is each run's least-contended floor);
  the ALL-CORES spin is the normalizer for suite totals (the suite runs
  32-way, so contention prices in the same way), the single-thread spin
  is reported for context;
- adjusted ratio = raw ratio / all-cores calibration ratio — a total
  shift that tracks the calibration is host-state, one that doesn't is a
  change signature;
- per-query: median raw + adjusted ratios over shared entries, and the
  worst adjusted ratios among entries with old-base >= --base seconds
  (sub-base entries are scheduling-floor noise by the repo's own gotcha);
- artifacts without a calibration block (pre-r14) fall back to raw with
  a visible warning.

Exit code: 0 always (a comparator, not a gate — the 2x gate stays the
driver's).
"""
import json
import statistics
import subprocess
import sys


def load(spec):
    """A complete bench artifact from a path or git:REV:path spec."""
    if spec.startswith("git:"):
        _, rev, path = spec.split(":", 2)
        raw = subprocess.run(["git", "show", f"{rev}:{path}"],
                             capture_output=True, text=True, check=True).stdout
        d = json.loads(raw)
    else:
        with open(spec) as f:
            d = json.load(f)
    if "queries" not in d or "value" not in d:
        sys.exit(f"{spec}: not a complete bench artifact (need value+queries; "
                 "the driver's BENCH_r{N}.json wrappers are truncated — use "
                 "bench_full.json / bench_r{N}.json or a git: spec of one)")
    return d


def profile_normalizer(old, new):
    """Per-query load normalizer from the r16+ in-run load profile.

    The start/end spins bracket the suite; a mid-run load burst is
    invisible to them (observed: an end spin 20% above start with every
    mid-run query slightly inflated). Full runs since r16 sample the
    all-cores spin every ~30 s and record each query's start offset, so
    each query can be normalized by the NEAREST-IN-TIME spin pair of the
    two runs rather than one global ratio. Returns f(query)->ratio or
    None when either artifact predates the profile.
    """
    po, pn = old.get("load_profile"), new.get("load_profile")
    oo, on = old.get("query_offsets"), new.get("query_offsets")
    if not (po and pn and oo and on):
        return None

    def at(profile, t):
        return min(profile, key=lambda p: abs(p[0] - t))[1]

    def norm(q):
        if q not in oo or q not in on:
            return None
        base = at(po, oo[q])
        return at(pn, on[q]) / base if base > 0 else None

    return norm


def clamped(r, n):
    """Load-explained part of ratio r removed, clamped to parity.

    n is the TRANSIENT local spin deviation (on the profile path the
    caller has already divided both r and n by the global calib ratio,
    so n here is the residual burst component, not the persistent
    host-speed difference). It may move r only TOWARD 1.0, never past
    it (a burst cannot turn a slowdown into a speedup) and never away
    from it (a faster-spin window cannot turn parity into a flag).
    Measured basis:
    a planted 120 s burst swung spins 2.8x while co-scheduled queries
    slowed ~1.5x, so unclamped division read 0.7x there and 1.8x on a
    parity query elsewhere.
    """
    return r / min(max(n, min(1.0, r)), max(1.0, r))


def profile_adjust(r, n, g):
    """Profile-path adjustment: global calibration first, clamp residual.

    g is the global all-cores calib ratio (each run's min-spin floor —
    the PERSISTENT host-speed difference); n the local spin ratio at
    this query's suite position. Dividing r by g prices the persistent
    difference exactly like the pre-profile normalizer, so a regression
    measured on a uniformly faster host is not under-flagged (ADVICE
    r16: raw 1.2x with spins uniformly at 0.8x must read 1.5x, not
    1.2x). Only the RESIDUAL local deviation n/g — the transient burst
    component the profile exists to catch — is clamped to parity.
    """
    return clamped(r / g, n / g)


def selftest():
    cases = [
        # (raw ratio, local spin ratio, expected adjusted, why)
        (1.6, 2.0, 1.0, "burst-window flag fully load-explained"),
        (1.0, 0.5, 1.0, "faster-spin window must not invent a flag"),
        (1.0, 2.0, 1.0, "slower-spin window must not invent a speedup"),
        (3.0, 1.5, 2.0, "genuine regression keeps its load-unexplained part"),
        (0.4, 0.5, 0.8, "load-driven speedup mostly absorbed"),
        (0.5, 1.0, 0.5, "clean speedup untouched"),
        (2.0, 1.0, 2.0, "clean regression untouched"),
    ]
    bad = [(r, n, e, got, why) for r, n, e, why in cases
           if abs((got := clamped(r, n)) - e) > 1e-9]
    # nearest-sample lookup: 64 s offset must read the 60 s sample
    prof = [[0, 0.2], [30, 0.4], [60, 0.2]]
    o = {"load_profile": prof, "query_offsets": {"qa": 64}}
    n2 = {"load_profile": [[0, 0.2], [30, 0.2], [60, 0.3]],
          "query_offsets": {"qa": 64}}
    pr = profile_normalizer(o, n2)("qa")
    if abs(pr - 1.5) > 1e-9:
        bad.append(("nearest-sample", 64, 1.5, pr, "60s sample pair"))
    # profile-path composition: global calib prices persistent host-speed
    # differences; only the residual local deviation is parity-clamped
    pcases = [
        # (raw ratio, local spin ratio, global calib ratio, expected, why)
        (1.2, 0.8, 0.8, 1.5, "uniformly faster host scales the flag"),
        (1.5, 1.5, 1.5, 1.0, "uniformly slower host fully explains parity"),
        (1.6, 2.0, 1.0, 1.0, "local burst on a same-speed host absorbed"),
        (2.0, 1.0, 1.0, 2.0, "clean regression untouched"),
        (3.0, 3.0, 1.5, 1.0, "persistent 1.5x + burst residual both absorbed"),
    ]
    bad += [(r, (n, g), e, got, why) for r, n, g, e, why in pcases
            if abs((got := profile_adjust(r, n, g)) - e) > 1e-9]
    for r, n, e, got, why in bad:
        print(f"SELFTEST FAIL: raw={r} spin={n} expected {e} got {got} ({why})")
    if bad:
        sys.exit(1)
    print(f"SELFTEST PASS: {len(cases) + 1 + len(pcases)} "
          "clamp/lookup/profile expectations hold")
    sys.exit(0)


def calib_ratio(old, new, kind):
    # MIN of the start/end spins, not the mean: a transient load burst
    # coinciding with one spin (observed: an end spin reading 1.79 s vs
    # 0.99 s at start in the same run) would otherwise swing the whole
    # adjustment; the min is each run's least-contended floor, which is
    # what the two runs share when host state is comparable
    co, cn = old.get("calibration"), new.get("calibration")
    if not co or not cn or kind not in co or kind not in cn:
        return None
    mo, mn = min(co[kind]), min(cn[kind])
    return mn / mo if mo > 0 else None


def main():
    # accept both --name=value and --name value (review r15: the
    # docstring showed the space form while the parser only took '=')
    if "--selftest" in sys.argv[1:]:
        selftest()
    args, opts = [], {}
    it = iter(sys.argv[1:])
    for a in it:
        if a.startswith("--"):
            if "=" in a:
                k, v = a[2:].split("=", 1)
            else:
                k, v = a[2:], next(it, None)
                if v is None:
                    sys.exit(f"--{k} needs a value")
            opts[k] = v
        else:
            args.append(a)
    if len(args) != 2:
        sys.exit("usage: bench_compare.py OLD NEW [--base 0.8] [--top 15] "
                 "(OLD/NEW: artifact path or git:REV:path)")
    base_floor = float(opts.get("base", 0.8))
    top_n = int(opts.get("top", 15))
    old, new = load(args[0]), load(args[1])

    cr_all = calib_ratio(old, new, "all_cores_s")
    cr_one = calib_ratio(old, new, "single_s")
    norm = cr_all if cr_all else 1.0
    raw_ratio = new["value"] / old["value"]

    print(f"old: {args[0]}  total {old['value']:.1f}s  "
          f"n={len(old['queries'])}  calib={old.get('calibration')}")
    print(f"new: {args[1]}  total {new['value']:.1f}s  "
          f"n={len(new['queries'])}  calib={new.get('calibration')}")
    if cr_all is None:
        print("WARNING: calibration missing in one artifact (pre-r14?) — "
              "ratios below are RAW, not host-normalized")
    else:
        print(f"calibration ratio new/old: all-cores {cr_all:.3f}  "
              f"single {cr_one:.3f}" if cr_one else
              f"calibration ratio new/old: all-cores {cr_all:.3f}")
    print(f"total ratio: raw {raw_ratio:.3f}  "
          f"adjusted {raw_ratio / norm:.3f}  (normalizer: all-cores spin)")

    shared = sorted(set(old["queries"]) & set(new["queries"]))
    only_old = set(old["queries"]) - set(new["queries"])
    only_new = set(new["queries"]) - set(old["queries"])
    if only_old or only_new:
        print(f"entries only in old: {sorted(only_old)[:8]}{'...' if len(only_old) > 8 else ''}")
        print(f"entries only in new: {sorted(only_new)[:8]}{'...' if len(only_new) > 8 else ''}")
    ratios = {q: new["queries"][q] / old["queries"][q]
              for q in shared if old["queries"][q] > 0}
    if not ratios:
        sys.exit("no comparable query entries (zero shared names with a "
                 "nonzero old timing) - are these artifacts from the same suite?")
    med = statistics.median(ratios.values())
    print(f"per-query over {len(ratios)} shared entries: "
          f"median raw {med:.3f}  median adjusted {med / norm:.3f}")

    # per-query normalizer: the in-run load profile (r16+) when both
    # artifacts carry one, else the global all-cores ratio for every query
    pnorm = profile_normalizer(old, new)

    def adj(q, r):
        # Profile path: global calib ratio FIRST (persistent host-speed
        # difference prices in exactly like the pre-profile normalizer —
        # ADVICE r16), then the residual local spin deviation CLAMPED to
        # parity: it may only move a query's ratio TOWARD parity, never
        # past it or away from it. Plain division of the local ratio both
        # over-corrects (a planted 120 s burst made spins swing 2.8x while
        # the co-scheduled queries slowed only ~1.5x, so raw/spin read
        # 0.7) and manufactures phantom flags (a parity query next to a
        # faster-spin window read "1.82x") — measured live while
        # validating the feature. Clamp semantics = "absorb exactly as
        # much of the deviation as TRANSIENT local load can explain": a
        # flag survives only its load-unexplained part, and parity is
        # never turned into a flag.
        n = pnorm(q) if pnorm else None
        return profile_adjust(r, n, norm) if n else r / norm

    if pnorm:
        pmed = statistics.median(adj(q, r) for q, r in ratios.items())
        print("per-query normalizer: IN-RUN LOAD PROFILE — global calib "
              "first, residual clamped to parity (old "
              f"{len(old['load_profile'])} / new "
              f"{len(new['load_profile'])} spin samples); "
              f"profile-adjusted median {pmed:.3f}")
    else:
        # visible fallback (review r16: bench_r16.json itself predates the
        # profile — a silent fallback would let the operator believe the
        # clamped per-query normalization was active)
        print("NOTE: load profile missing in at least one artifact "
              "(pre-r16 full run?) — per-query ratios below use the "
              "GLOBAL all-cores normalizer only")

    sig = [(q, adj(q, r), old["queries"][q], new["queries"][q])
           for q, r in ratios.items() if old["queries"][q] >= base_floor]
    sig.sort(key=lambda t: -t[1])
    n15 = sum(1 for _, r, _, _ in sig if r > 1.5)
    n20 = sum(1 for _, r, _, _ in sig if r > 2.0)
    print(f"entries with old-base >= {base_floor}s: {len(sig)}; "
          f"adjusted >1.5x: {n15}; adjusted >2.0x: {n20}")
    print(f"worst {min(top_n, len(sig))} adjusted (base >= {base_floor}s):")
    for q, r, ob, nb in sig[:top_n]:
        print(f"  {q:42s} {ob:7.2f}s -> {nb:7.2f}s  adj {r:5.2f}x")
    best = sorted(sig, key=lambda t: t[1])[:5]
    print("best 5 adjusted (same floor):")
    for q, r, ob, nb in best:
        print(f"  {q:42s} {ob:7.2f}s -> {nb:7.2f}s  adj {r:5.2f}x")

    if "isolate-cmd" in opts:
        # the settling ritual as one copy-pasteable command: an isolated
        # SPARK_GRAFT_ONLY pass over every >threshold adjusted entry
        # (base-floored — sub-base entries are scheduling noise)
        thr = float(opts["isolate-cmd"])
        names = sorted(q for q, r, _, _ in sig if r > thr)
        if not names:
            print(f"isolate: no entries with adjusted > {thr}x "
                  f"(base >= {base_floor}s) - nothing to settle")
        else:
            sf = new.get("env", {}).get("sf_dir", "/root/testdata/sf0.1")
            print(f"isolate: {len(names)} entries with adjusted > {thr}x; "
                  "settle with:")
            print(f"  SPARK_GRAFT_ONLY={','.join(names)} "
                  f"SPARK_GRAFT_SF_DIR={sf} SPARK_GRAFT_CPUS=32 "
                  "sbt -batch 'runMain graft.Bench'")


if __name__ == "__main__":
    try:
        main()
    except BrokenPipeError:  # downstream `| head` closed the pipe
        pass
