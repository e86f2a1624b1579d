#!/usr/bin/env python3
"""Mechanical losslessness audit for the prefix-blocked oracles.

The q329/q331 oracles and the seven other pair-family oracles all block
candidate pairs with the Bayardo/Xiao prefix filter — the same
ALGORITHM the Spark operators under test use, so a shared
misderivation (say, an off-by-one in the prefix length) could pass the
hash gate on both sides (round-11 verdict, "What's wrong #2"). This
tool closes that hole mechanically:

 1. PAIR-SET EQUALITY: re-runs the committed q329 (self-join), q331
    (cross-frame), and q333 (self-join at the SECOND parameter point
    tau=0.7/n=2, so a ceil-boundary misderivation that cancels at 0.5
    cannot hide) oracle SQL — read from a Verify dump's
    oracle_sql.json, so the audit covers exactly the text the driver
    checks against — and compares the (id, id, jaccard) rows with an
    INDEPENDENT brute-force restatement (all-pairs join, no blocking
    at all) built into this file. Any pruning bug in the blocked CTEs
    shows up as a missing pair.
 2. FRAGMENT SHARING: asserts the blocked pair CTE text from q329's
    SQL appears VERBATIM inside each of the other oracles that are
    supposed to reuse OracleSql.blockedPairCtes, so an edit that forks
    one oracle's copy is flagged instead of drifting silently.

Usage: python3 tools/brute_audit.py <sfDir> <outDir> [artifact.json]

    sbt "runMain graft.Verify /root/testdata/sf0.01 /tmp/v001"
    python3 tools/brute_audit.py /root/testdata/sf0.01 /tmp/v001 \
        tools/BRUTE_AUDIT.json

sf0.01 is the intended scale (brute force is all-pairs — minutes at
sf0.1, seconds at sf0.01). Exit 0 = every check passed.
"""
import json
import sys
import time

# the oracles that embed OracleSql.blockedPairCtes (self-join form)
SHARED_SELF = [
    "q22_ngram_jaccard_pairs", "q49_dup_clusters", "q101_leakage_free_split",
    "q155_cluster_resolution", "q283_cluster_medoids",
]
# ...and OracleSql.crossPrefixPairCtes (cross-frame form)
SHARED_CROSS = ["q77_cross_corpus_pairs", "q100_streaming_cross_dedup",
                "q109_incremental_dedup", "q332_cross_prefix_indexed"]

BRUTE_SELF = """
WITH toks AS (
  SELECT doc_id, string_split(trim(text), ' ') AS w FROM documents
), g AS (
  SELECT doc_id, list_distinct(
    [w[i] || ' ' || w[i+1] || ' ' || w[i+2] for i in range(1, len(w) - 1)]) AS t
  FROM toks
)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
  len(list_intersect(a.t, b.t)) * 1.0 /
    len(list_distinct(list_concat(a.t, b.t))) AS jaccard
FROM g a JOIN g b ON a.doc_id < b.doc_id
WHERE len(list_intersect(a.t, b.t)) * 1.0 /
    len(list_distinct(list_concat(a.t, b.t))) >= 0.5
"""

BRUTE_CROSS = """
WITH toks AS (
  SELECT doc_id, string_split(trim(text), ' ') AS w FROM documents
), g AS (
  SELECT doc_id, list_distinct(
    [w[i] || ' ' || w[i+1] || ' ' || w[i+2] for i in range(1, len(w) - 1)]) AS t
  FROM toks
), gw AS (SELECT * FROM g WHERE doc_id % 3 = 0
), go AS (SELECT * FROM g WHERE doc_id % 3 <> 0
)
SELECT a.doc_id AS id_new, b.doc_id AS id_old,
  len(list_intersect(a.t, b.t)) * 1.0 /
    len(list_distinct(list_concat(a.t, b.t))) AS jaccard
FROM gw a JOIN go b ON true
WHERE len(list_intersect(a.t, b.t)) * 1.0 /
    len(list_distinct(list_concat(a.t, b.t))) >= 0.5
"""

# Second parameterization (r12 verdict #7): every other blocked oracle
# runs at tau=0.5/n=3, so a prefix-length misderivation (the ceil
# boundary) that happens to cancel at 0.5 could pass every gate. q333
# commits the blocked form at tau=0.7 over BIGRAMS, sliced to
# doc_id % 4 == 1 since r14 (the tau=0.7 bigram verify approaches
# all-pairs in DuckDB and dominated the 10x sweep); this is its
# independent all-pairs restatement AT THE SAME SLICE.
BRUTE_SELF_T07N2 = """
WITH toks AS (
  SELECT doc_id, string_split(trim(text), ' ') AS w FROM documents
  WHERE doc_id % 4 = 1
), g AS (
  SELECT doc_id, list_distinct(
    [w[i] || ' ' || w[i+1] for i in range(1, len(w))]) AS t
  FROM toks
)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
  len(list_intersect(a.t, b.t)) * 1.0 /
    len(list_distinct(list_concat(a.t, b.t))) AS jaccard
FROM g a JOIN g b ON a.doc_id < b.doc_id
WHERE len(list_intersect(a.t, b.t)) * 1.0 /
    len(list_distinct(list_concat(a.t, b.t))) >= 0.7
"""


def rows(con, sql):
    df = con.execute(sql).fetchdf()
    return set(tuple(round(v, 12) if isinstance(v, float) else v
                     for v in r) for r in df.itertuples(index=False))


def main(sf_dir, out_dir, artifact=None):
    import duckdb
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'")
    report = {"sf_dir": sf_dir, "checks": {}}
    ok = True

    for name, brute in (("q329_prefix_filter_pairs", BRUTE_SELF),
                        ("q331_cross_prefix_pairs", BRUTE_CROSS),
                        ("q333_prefix_pairs_tau07", BRUTE_SELF_T07N2)):
        t0 = time.time()
        blocked = rows(con, oracles[name])
        brute_rows = rows(con, brute)
        missing = brute_rows - blocked    # recall loss — the audit's point
        spurious = blocked - brute_rows   # would mean broken verification
        passed = not missing and not spurious
        ok = ok and passed
        report["checks"][name] = {
            "pairs": len(brute_rows), "missing": len(missing),
            "spurious": len(spurious), "pass": passed,
            "sec": round(time.time() - t0, 1),
        }
        print(f"{'OK  ' if passed else 'FAIL'} {name}: "
              f"{len(brute_rows)} brute pairs, {len(missing)} missing, "
              f"{len(spurious)} spurious ({report['checks'][name]['sec']}s)")

    # fragment sharing: the blocked CTE body q329 uses must be embedded
    # verbatim in every other self-join oracle — everything from the
    # first CTE name up to the oracle-specific final SELECT
    frag = oracles["q329_prefix_filter_pairs"]
    start = frag.index("toks AS")
    p_end = frag.index("\nSELECT", start)
    frag = frag[start:p_end].rstrip().rstrip(")") + ")"
    for name in SHARED_SELF:
        shared = frag in oracles.get(name, "")
        ok = ok and shared
        report["checks"][f"fragment_self:{name}"] = {"pass": shared}
        print(f"{'OK  ' if shared else 'FAIL'} fragment shared: {name}")
    cross = oracles["q331_cross_prefix_pairs"]
    cstart = cross.index(", tk AS")
    cend = cross.index("\nSELECT", cstart)
    cfrag = cross[cstart:cend].rstrip().rstrip(")") + ")"
    for name in SHARED_CROSS:
        shared = cfrag in oracles.get(name, "")
        ok = ok and shared
        report["checks"][f"fragment_cross:{name}"] = {"pass": shared}
        print(f"{'OK  ' if shared else 'FAIL'} fragment shared: {name}")

    report["pass"] = ok
    if artifact:
        json.dump(report, open(artifact, "w"), indent=1)
        print(f"audit artifact -> {artifact}")
    print("BRUTE AUDIT " + ("PASS" if ok else "FAIL"))
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2],
                  sys.argv[3] if len(sys.argv) > 3 else None))
