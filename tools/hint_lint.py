#!/usr/bin/env python3
"""Static broadcast-hint classifier (round 13).

The measured ScaleAudit broadcast sweep only flags build sides past a
100k-row floor, so a forced `broadcast()` on a TPC-H dim-grained frame
(supplier = 1k rows at sf0.1) sails through while still pinning an
arbitrarily large build side at the 100 TB target — exactly how the 8
round-12 hints (q309, q317, q442-q446) escaped. This lint closes that
loophole STATICALLY: every `broadcast(...)` call site in main source must
be provably bounded by construction, bucketed as one of

  ONE_ROW_AGG    global .agg(...) / .groupBy().agg(...) -> exactly 1 row
  LIMIT_K        .limit(k) / top-k anchor -> at most k rows
  FIXED_CATALOG  nation (25) / region (5) / literal range / Seq(...).toDF
  GROUPED_KEY    rollup grouped by (or distinct over) ONLY bounded-arity
                 key columns from the documented allowlist below
  ANNOTATED      `// bcast-ok: <reason>` on the call or the definition —
                 the reason must state WHY the frame cannot grow with the
                 corpus (fixed k, cap-gated, quantile cuts, API contract)
  OTHER          unclassified -> LINT FAILURE

Soundness rules used when resolving:
  - identifier args resolve through `val` chains (depth 4) in-file;
  - local `def` helper calls resolve to the def body (depth 1);
  - row-count-non-increasing tails (.select/.filter/.where/.as/.alias/
    .withColumn/.withColumnRenamed/.drop/.cache/.persistTracked) are
    stripped before classifying the head — they can only shrink a frame,
    so the head's bound transfers;
  - `.select(bounded keys).distinct()` is GROUPED_KEY.

The measured sweep (tools/ScaleAudit) keeps its runtime growth flags;
this pass catches dim-class hints below its row floor. Allowlist arity
arguments are documented in PLANS.md §Round 13.

Usage: python3 tools/hint_lint.py [--json out.json]
Exit 0 iff OTHER is empty.
"""
import json
import os
import re
import sys

SRC = os.path.join(os.path.dirname(__file__), "..", "src", "main", "scala")

ANNOT = re.compile(r"bcast-ok:\s*(.+?)(?:\*/)?\s*$")

# File-wide parameter certification: `// bcast-ok-param: <ident> — <reason>`
# anywhere in a file certifies every broadcast whose argument HEAD is that
# identifier (typically a function parameter the in-file resolver cannot
# see a definition for, e.g. a query-batch or fixed-k codebook param whose
# bound is an API contract documented at the declaration).
PARAM_ANNOT = re.compile(r"bcast-ok-param:\s*([A-Za-z_][\w]*)\s*[—-]\s*(.+?)(?:\*/)?\s*$")

# Bounded-arity key columns: grouping or distinct over ONLY these yields a
# frame whose row count is fixed by an enum / catalog / fixed config, not
# by corpus size. Arity arguments per entry live in PLANS.md §Round 13.
BOUNDED_KEYS = {
    "event_type",   # events enum (6 values, schema-fixed)
    "source",       # ingestion-source catalog (config-sized)
    "label",        # classifier/cluster label set (fixed k by construction)
    "lang",         # language-id codes (fixed model inventory)
    "model",        # embedding-model catalog (config-sized)
    "fold",         # cross-validation folds (fixed small k)
    "bucket",       # fixed histogram/LSH band arity by construction
    "band",         # LSH bands (fixed)
    "tier",         # compression/quality tiers (fixed)
    "bin",          # fixed-width histogram bins over bounded ranges
    "arm",          # ablation arms (fixed lattice)
    "rule",         # curation rule inventory (code-sized)
    "ch",           # channel index (fixed small range)
    "pos",          # subvector position (fixed PQ m)
    "r_name", "n_name",  # region/nation names (5 / 25)
    "o_orderpriority",   # orders priority enum (5 values, schema-fixed)
    "qb",           # quality bucket (fixed bucketing arity)
    "hb",           # hash bucket (fixed modulus)
    "fid",          # feature id (fixed feature inventory)
}

# Row-count-non-increasing dataframe methods: stripping them off the tail
# of an expression preserves any upper bound proved for the head.
NONGROW = (
    "select", "filter", "where", "as", "alias", "withColumn",
    "withColumnRenamed", "drop", "dropDuplicates", "distinct", "cache",
    "persist", "persistTracked", "hint", "toDF", "na", "fill", "cast",
    "orderBy", "sort", "limit", "agg", "groupBy",
)

# Unique-key columns of the testdata tables: an equality / small-range /
# isin literal filter on one of these bounds the frame by the literal,
# independent of corpus size (the id is unique per row).
UNIQUE_KEYS = (
    "vec_id", "doc_id", "query_id", "o_orderkey", "l_orderkey",
    "c_custkey", "s_suppkey", "p_partkey", "event_id", "id",
)
LITERAL_KEY = re.compile(
    r'col\("(?:' + "|".join(UNIQUE_KEYS) + r')"\)\s*'
    r"(?:===\s*(?:lit\()?\d+|<=?\s*(?:lit\()?\d{1,5}\b|\.isin\()"
)


def scala_files(root):
    for dirpath, _, names in os.walk(root):
        for n in sorted(names):
            if n.endswith(".scala"):
                yield os.path.join(dirpath, n)


def strip_comments(line):
    i = line.find("//")
    return line if i < 0 else line[:i]


def balanced_arg(text, start):
    depth = 0
    for i in range(start, len(text)):
        c = text[i]
        if c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
            if depth == 0:
                return text[start + 1 : i]
    return text[start + 1 :]


def statement_rhs(lines, i):
    """Expression text of the statement starting at lines[i] (a val/def
    line): keep appending lines while parens are unbalanced or the next
    line continues the expression (starts with '.' or an operator)."""
    buf = strip_comments(lines[i])
    k = i + 1
    while k < len(lines):
        nxt = strip_comments(lines[k])
        unbal = buf.count("(") > buf.count(")") or buf.count("{") > buf.count("}")
        dangling = re.search(r"(=|=>|\+|-|\*|/|&&|\|\||,|\()\s*$", buf)
        cont = re.match(r"\s*([.+\-*/]|\|\||&&|===|:)", nxt)
        if not unbal and not cont and not dangling:
            break
        buf += "\n" + nxt
        k += 1
    return buf


def find_sites(path, lines):
    for idx, raw in enumerate(lines):
        code = strip_comments(raw)
        if re.search(r"^\s*import ", code):
            continue
        for m in re.finditer(r"(?<![\w.])broadcast\(", code):
            blob = code[m.start():]
            k = idx + 1
            while blob.count("(") > blob.count(")") and k < min(idx + 14, len(lines)):
                blob += "\n" + strip_comments(lines[k])
                k += 1
            arg = balanced_arg(blob, blob.find("("))
            ann = None
            for j in range(max(0, idx - 2), min(len(lines), idx + 2)):
                am = ANNOT.search(lines[j])
                if am:
                    ann = am.group(1).strip()
            yield idx + 1, arg.strip(), ann


def find_def(lines, site_line, ident):
    """Nearest preceding `val ident =` or `def ident(...) =`; returns
    (rhs_text, annotation) or (None, None)."""
    vpat = re.compile(r"^\s*(?:lazy\s+)?val\s+" + re.escape(ident) + r"\s*(?::[^=]+)?=")
    dpat = re.compile(r"^\s*(?:private\s+)?def\s+" + re.escape(ident) + r"\s*(?:[\(\[:]|=)")

    def found(i):
        rhs = statement_rhs(lines, i)
        ann = None
        for j in range(max(0, i - 3), min(len(lines), i + 3)):
            am = ANNOT.search(lines[j])
            if am:
                ann = am.group(1).strip()
        return rhs, ann

    for i in range(site_line - 2, -1, -1):
        ln = strip_comments(lines[i])
        if vpat.match(ln) or dpat.match(ln):
            return found(i)
    # object-level defs may be declared below the call site
    for i in range(site_line - 1, len(lines)):
        if dpat.match(strip_comments(lines[i])):
            return found(i)
    return None, None


ONE_ROW = re.compile(r"\.agg\(")
GROUPED = re.compile(r"\.(groupBy|rollup|cube)\s*\(\s*[^)\s]")
EMPTY_GROUP = re.compile(r"\.groupBy\(\s*\)")
LIMIT_K = re.compile(r"\.limit\(|TakeOrdered")
CATALOG = re.compile(r'"(nation|region)"')
RANGE_LIT = re.compile(r"\.range\(\s*-?\d{1,6}[\s,)L]|(?<![\w.])range\(\s*-?\d{1,6}[\s,)L]")
# exploded literal sequence(lit(a), lit(b)) — arity fixed by the literals
SEQ_RANGE = re.compile(r"sequence\(\s*lit\(-?\d+L?\)\s*,\s*lit\(-?\d+L?\)")
# literal Seq only counts when it actually becomes the frame (.toDF /
# createDataFrame) — a bare Seq("k") join-key list must NOT certify
SEQ_LIT = re.compile(
    r"\bSeq\s*\((?:[^()]|\([^()]*\))*\)\s*(?:\.map\([^)]*\))?\s*\n?\s*\.toDF\("
    r"|createDataFrame|approxQuantile")
# .toDF over a LOCAL Scala collection (comprehension yield / .toSeq) — a
# driver-side literal table; bare df.toDF("a","b") renames do NOT match
LOCAL_TODF = re.compile(r"yield[\s\S]{0,200}\.toDF\(|\.toSeq\s*\n?\s*\.toDF\(")
GROUP_HEAD = re.compile(r"\.(?:groupBy|rollup|cube)\(")
SELECT_HEAD = re.compile(r"\.select\(")


def bounded_group_args(argtext):
    """True when EVERY element of a groupBy/select arg list is provably
    bounded-arity: "x" / col("x") / col("x").as("y") with x in
    BOUNDED_KEYS, or a pmod(..., lit(K)) bucket (arity = the literal
    modulus)."""
    # output aliases don't govern arity — the SOURCE column does
    argtext = re.sub(r'\.as\("[\w]*"\)', "", argtext)
    # pmod-bucket expressions: arity bounded by the literal modulus
    stripped = re.sub(r"pmod\([^()]*(?:\([^()]*\)[^()]*)*lit\((\d+)L?\)\)",
                      "", argtext)
    names = re.findall(r'col\("([A-Za-z_][\w]*)"\)|"([A-Za-z_][\w]*)"', stripped)
    flat = [a or b for a, b in names]
    residue = re.sub(r'col\("[\w]*"\)(\.as\("[\w]*"\))?|"[\w]*"|[\s,]', "", stripped)
    had_pmod = stripped != argtext
    if residue != "":
        return False
    if not flat and not had_pmod:
        return False
    return all(n in BOUNDED_KEYS for n in flat)


def grouped_by_bounded(text):
    for m in GROUP_HEAD.finditer(text):
        if bounded_group_args(balanced_arg(text, m.end() - 1)):
            return True
    # .select(<bounded keys>).distinct()
    for m in SELECT_HEAD.finditer(text):
        start = m.end() - 1
        arg = balanced_arg(text, start)
        after = text[start + len(arg) + 2:]
        if re.match(r"\s*\.distinct\(\)", after) and bounded_group_args(arg):
            return True
    return False


def classify_text(text):
    if text is None:
        return None
    if LIMIT_K.search(text):
        return "LIMIT_K"
    if EMPTY_GROUP.search(text):
        return "ONE_ROW_AGG"
    if ONE_ROW.search(text) and not GROUPED.search(text):
        return "ONE_ROW_AGG"
    # two-stage rollup ending in a GLOBAL agg: in a linear chain every
    # grouped head consumes exactly one .agg(...), so more aggs than
    # grouped heads means the final stage is global -> 1 row out.
    # Restricted to join-free text: a join could embed ANOTHER frame's
    # agg and break the 1:1 pairing argument.
    if (len(re.findall(r"\.agg\(", text)) > len(GROUP_HEAD.findall(text))
            and not re.search(r"\.(join|crossJoin|union\w*)\(", text)):
        return "ONE_ROW_AGG"
    if grouped_by_bounded(text):
        return "GROUPED_KEY"
    if CATALOG.search(text):
        return "FIXED_CATALOG"
    if RANGE_LIT.search(text) or SEQ_LIT.search(text) or LOCAL_TODF.search(text) \
            or SEQ_RANGE.search(text):
        return "FIXED_CATALOG"
    if LITERAL_KEY.search(text):
        return "LITERAL_KEY"
    return None


HEAD_ID = re.compile(r"^([A-Za-z_][\w]*)\s*(?:\.|$|\()")


def classify(lines, lineno, arg, depth=4):
    """Classify an argument expression, resolving identifiers and
    stripping non-growing tails."""
    bucket = classify_text(arg)
    if bucket:
        return bucket, None
    if depth <= 0:
        return None, None
    m = HEAD_ID.match(arg)
    if not m:
        return None, None
    head = m.group(1)
    rest = arg[m.end(1):]
    # tail must be only non-growing method calls (or a bare identifier /
    # zero-arg local def call) for the head's bound to transfer
    tail_ok = all(
        meth in NONGROW
        for meth in re.findall(r"\.([A-Za-z_][\w]*)\s*\(", rest)
    )
    if rest.strip() not in ("", "()") and not tail_ok:
        return None, None
    rhs, def_ann = find_def(lines, lineno, head)
    if rhs is None:
        return None, None
    # classify the definition's own expression (strip the 'val x =' head)
    body = re.sub(r"^\s*(?:lazy\s+)?(?:private\s+)?(?:val|def)\s+[\w]+[^=]*=", "", rhs, count=1)
    bucket = classify_text(body)
    if bucket is None:
        bucket, _ = classify(lines, lineno, body.strip(), depth - 1)
    if bucket is None and def_ann:
        return "ANNOTATED", def_ann
    return bucket, None


def find_cross_sites(path, lines):
    """Un-broadcast `.crossJoin(arg)` sites: (lineno, receiver, arg, ann).
    Sites whose arg is wrapped in broadcast(...) are already covered by
    the broadcast census (the wrap IS the classified site)."""
    for idx, raw in enumerate(lines):
        code = strip_comments(raw)
        for m in re.finditer(r"\.crossJoin\(", code):
            blob = code[m.start():]
            k = idx + 1
            while blob.count("(") > blob.count(")") and k < min(idx + 14, len(lines)):
                blob += "\n" + strip_comments(lines[k])
                k += 1
            arg = balanced_arg(blob, blob.find("(")).strip()
            if re.match(r"broadcast\(", arg):
                continue
            # receiver: the statement text up to this .crossJoin — walk
            # back while lines are continuations (start with '.') so a
            # chained 1-row receiver (x.agg(...).crossJoin(a).crossJoin(b))
            # classifies as a whole; plus the last bare identifier as a
            # resolvable fallback
            back = idx
            while back > 0 and re.match(r"\s*\.", lines[back].lstrip()[:1] and lines[back]) \
                    and re.match(r"\s*[.)]", lines[back]):
                back -= 1
            recv_text = "\n".join(
                strip_comments(x) for x in lines[back:idx]) + "\n" + code[: m.start()]
            recv = None
            rm = re.search(r"(?<![\w.])([A-Za-z_][\w]*)\s*$", code[: m.start()])
            if rm:
                recv = rm.group(1)
            ann = None
            for j in range(max(0, idx - 2), min(len(lines), idx + 2)):
                am = ANNOT.search(lines[j])
                if am:
                    ann = am.group(1).strip()
            yield idx + 1, recv, recv_text, arg, ann


def main():
    out_json = None
    if "--json" in sys.argv:
        out_json = sys.argv[sys.argv.index("--json") + 1]
    sites = []
    cross_sites = []
    for path in scala_files(SRC):
        with open(path) as f:
            lines = f.read().splitlines()
        rel = os.path.relpath(path, os.path.join(SRC, "..", "..", ".."))
        param_anns = {}
        for ln in lines:
            pm = PARAM_ANNOT.search(ln)
            if pm:
                param_anns[pm.group(1)] = pm.group(2).strip()
        for lineno, arg, ann in find_sites(path, lines):
            bucket, reason = classify(lines, lineno, arg)
            if bucket is None and ann:
                bucket, reason = "ANNOTATED", ann
            if bucket is None:
                hm = HEAD_ID.match(arg)
                if hm and hm.group(1) in param_anns:
                    tail_ok = all(
                        meth in NONGROW
                        for meth in re.findall(r"\.([A-Za-z_][\w]*)\s*\(", arg[hm.end(1):])
                    )
                    if tail_ok:
                        bucket, reason = "ANNOTATED", param_anns[hm.group(1)]
            if bucket is None:
                bucket = "OTHER"
            sites.append({
                "site": f"{rel}:{lineno}",
                "arg": re.sub(r"\s+", " ", arg)[:90],
                "bucket": bucket,
                "reason": reason,
            })
        # crossJoin pass: a BroadcastNestedLoopJoin builds the SMALLER
        # side whichever position it sits in, so the site passes when
        # EITHER the argument or the receiver is provably bounded.
        for lineno, recv, recv_text, arg, ann in find_cross_sites(path, lines):
            bucket, reason = classify(lines, lineno, arg)
            side = "arg"
            if bucket is None and not re.search(
                    r"\.(join|crossJoin|union\w*)\(", recv_text):
                # a join inside the chain could splice in another frame's
                # grain, so the chain-text shortcut is join-free only
                bucket = classify_text(recv_text)
                if bucket:
                    side = "receiver-chain"
            if bucket is None and recv:
                bucket, reason = classify(lines, lineno, recv)
                side = "receiver"
            if bucket is None and ann:
                bucket, reason, side = "ANNOTATED", ann, "annotation"
            if bucket is None:
                hm = HEAD_ID.match(arg)
                if hm and hm.group(1) in param_anns:
                    bucket, reason, side = "ANNOTATED", param_anns[hm.group(1)], "param"
            if bucket is None:
                bucket, side = "OTHER", "-"
            cross_sites.append({
                "site": f"{rel}:{lineno}",
                "arg": re.sub(r"\s+", " ", arg)[:90],
                "receiver": recv,
                "bucket": bucket,
                "bounded_side": side,
                "reason": reason,
            })
    counts = {}
    for s in sites:
        counts[s["bucket"]] = counts.get(s["bucket"], 0) + 1
    ccounts = {}
    for s in cross_sites:
        ccounts[s["bucket"]] = ccounts.get(s["bucket"], 0) + 1
    report = {"total": len(sites), "counts": counts,
              "other": [s for s in sites if s["bucket"] == "OTHER"],
              "sites": sites,
              "cross_total": len(cross_sites), "cross_counts": ccounts,
              "cross_other": [s for s in cross_sites if s["bucket"] == "OTHER"],
              "cross_sites": cross_sites}
    if out_json:
        with open(out_json, "w") as f:
            json.dump(report, f, indent=1)
    print(f"broadcast sites: {len(sites)}  buckets: {counts}")
    print(f"crossJoin sites (un-broadcast): {len(cross_sites)}  buckets: {ccounts}")
    for s in report["other"]:
        print(f"  OTHER {s['site']}  broadcast({s['arg']})")
    for s in report["cross_other"]:
        print(f"  OTHER {s['site']}  {s['receiver']}.crossJoin({s['arg']})")
    bad = len(report["other"]) + len(report["cross_other"])
    if bad:
        print(f"FAIL: {bad} unclassified broadcast/crossJoin build sides")
        return 1
    print("PASS: every broadcast() and crossJoin() site is provably bounded or annotated")
    return 0


if __name__ == "__main__":
    sys.exit(main())
