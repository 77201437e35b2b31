#!/usr/bin/env python3
"""Relational (jdbc:) tier correctness artifact builder.

Compares two graft.Verify output dirs — one produced against the parquet
tier, one against the SAME tier loaded into a JDBC store (JdbcLoad) — and
writes a per-query JSON record: bit-equal / mismatch / non-runner (with the
Verify stderr reason). Row compare is order-INSENSITIVE multiset equality
(sorted canonical tuples): the two runs execute identical plans, but a
query without a total ORDER BY may legitimately emit ties in a different
order over a different scan source.

Usage:
  python3 scripts/check_jdbc_tier.py <parquetVerifyDir> <jdbcVerifyDir> \
      <jdbcVerifyStderrLog> <outJson> [roundN] [expectedNonRunners]

expectedNonRunners (default empty) is a comma-separated list of the
NAMES of known structural non-runners; ANY non-runner outside that set
fails the exit code. Name-based rather than count-based (review r17): a
count allowance could mask a swap where a declared non-runner starts
running while a previously comparable query silently stops. Since r16
closed the REST non-runners the expected set is empty.
"""
import json, math, os, re, sys
import pyarrow.parquet as pq


def canon(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, list):
        return "[" + ",".join(canon(x) for x in v) + "]"
    return repr(v)


def rows_of(path):
    tbl = pq.read_table(path)
    cols = sorted(tbl.column_names)
    rows = [tuple(canon(tbl.column(c)[i].as_py()) for c in cols)
            for i in range(tbl.num_rows)]
    return cols, sorted(rows)


def main(pq_dir, jdbc_dir, err_log, out_json, round_n, expected_nonrunners=""):
    # Verify's per-query failure lines name the non-runners and why
    reasons = {}
    if os.path.exists(err_log):
        for line in open(err_log, errors="replace"):
            # search, not match: an sbt-produced log prefixes every
            # stderr line with "[error] ", and an anchored match would
            # lose every reason
            m = re.search(r"\[verify\] (\S+) failed: (.*)", line.strip())
            if m:
                reasons[m.group(1)] = m.group(2)[:300]

    def dirs_of(d):
        return {e for e in os.listdir(d) if os.path.isdir(os.path.join(d, e))}

    # enumerate from BOTH sides PLUS every name the stderr reasons dict
    # captured: a query missing from the parquet dir (env flake in that
    # run) must appear in the record as incomparable, and a query that
    # failed on BOTH sides (no result dir anywhere) must still be counted
    # as a non-runner — neither may silently shrink queries_total into
    # fake full coverage (review r15/r16)
    pq_names, jdbc_names = dirs_of(pq_dir), dirs_of(jdbc_dir)
    names = sorted(pq_names | jdbc_names | set(reasons))
    per_query, n_equal, n_mismatch, n_nopq, n_unread = {}, 0, 0, 0, 0
    for name in names:
        jpath = os.path.join(jdbc_dir, name)
        if name not in jdbc_names:
            # jdbc side never produced a result: a non-runner whether or
            # not the parquet side ran (double-failure is noted, not lost)
            reason = reasons.get(name, "no result dir (reason not captured)")
            if name not in pq_names:
                reason += " (parquet-side result also missing)"
            per_query[name] = {"status": "non-runner", "reason": reason}
            continue
        if name not in pq_names:
            per_query[name] = {
                "status": "no-parquet-result",
                "reason": "jdbc result has no parquet-side twin to compare"}
            n_nopq += 1
            continue
        # a truncated/empty result dir (run died mid-write) is recorded
        # as unreadable for that one query, not an abort of the artifact
        try:
            pc, prows = rows_of(os.path.join(pq_dir, name))
            jc, jrows = rows_of(jpath)
        except Exception as e:
            per_query[name] = {"status": "unreadable",
                               "detail": f"{type(e).__name__}: {e}"[:300]}
            n_unread += 1
            continue
        if pc != jc:
            per_query[name] = {"status": "mismatch",
                               "detail": f"columns parquet={pc} jdbc={jc}"}
            n_mismatch += 1
        elif prows != jrows:
            diff = sum(1 for a, b in zip(prows, jrows) if a != b) \
                + abs(len(prows) - len(jrows))
            per_query[name] = {
                "status": "mismatch",
                "detail": f"rows parquet={len(prows)} jdbc={len(jrows)}, "
                          f"{diff} differing"}
            n_mismatch += 1
        else:
            per_query[name] = {"status": "equal", "rows": len(prows)}
            n_equal += 1
    record = {
        "round": round_n,
        "parquet_dir": pq_dir,
        "jdbc_dir": jdbc_dir,
        "queries_total": len(names),
        "runnable": n_equal + n_mismatch,
        "equal": n_equal,
        "mismatch": n_mismatch,
        "no_parquet_result": n_nopq,
        "unreadable": n_unread,
        "non_runners": len(names) - n_equal - n_mismatch - n_nopq - n_unread,
        "per_query": per_query,
    }
    with open(out_json, "w") as f:
        json.dump(record, f, indent=1, sort_keys=True)
    print(f"{n_equal} equal, {n_mismatch} mismatch, "
          f"{len(names) - n_equal - n_mismatch - n_nopq - n_unread} non-runners, "
          f"{n_unread} unreadable, "
          f"{n_nopq} without a parquet twin (of {len(names)}) -> {out_json}")
    # incomparable coverage is a loud exit too: the artifact must not
    # read as full bit-equality when a query was never compared —
    # INCLUDING non-runners beyond the declared structural allowance
    # (review r16: a run where every query crashed used to exit 0,
    # since only mismatch/nopq/unread tripped the code)
    expected = {n for n in (expected_nonrunners or "").split(",") if n}
    actual_nonrun = {n for n, r in per_query.items()
                     if r["status"] == "non-runner"}
    unexpected = sorted(actual_nonrun - expected)
    if unexpected:
        print(f"UNEXPECTED non-runners (not in declared set): {unexpected}")
    return 1 if (n_mismatch or n_nopq or n_unread or unexpected) else 0


if __name__ == "__main__":
    if len(sys.argv) < 5:
        sys.exit(__doc__)
    sys.exit(main(sys.argv[1], sys.argv[2], sys.argv[3], sys.argv[4],
                  int(sys.argv[5]) if len(sys.argv) > 5 else None,
                  sys.argv[6] if len(sys.argv) > 6 else ""))
