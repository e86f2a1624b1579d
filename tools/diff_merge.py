#!/usr/bin/env python3
"""Differential test: random batch sequences through the REFERENCE
merge_listings (runs the actual /root/reference code) vs our Spark
MergeListings, compared key-by-key. Dev-only tool.

Usage:
  python3 tools/diff_merge.py gen /tmp/mergediff      # write batches + expected
  python3 tools/diff_merge.py cmp /tmp/mergediff      # after the Scala runner
Scala side: sbt "runMain graft.tools.MergeDiffRunner /tmp/mergediff"
"""
import json
import os
import random
import sys

sys.path.insert(0, "/root/reference/data_process")
from merge import merge_listings  # noqa: E402

N_BATCHES = int(os.environ.get("NB", 6))
N_IDS = int(os.environ.get("NI", 25))
ROWS_PER_BATCH = int(os.environ.get("NR", 40))


def gen_row(rng, ids):
    row = {}
    # some rows are keyless-with-url (J2), most are keyed
    oid = rng.choice(ids)
    if rng.random() < 0.07:
        row["offer_url"] = f"url-{oid}"
    else:
        row["offer_id"] = str(oid)
        if rng.random() < 0.8:
            row["offer_url"] = f"url-{oid}"
    if rng.random() < 0.85:
        d = rng.randint(1, 28)
        row["updated_date"] = f"2026-01-{d:02d} {rng.randint(0,23):02d}:00:00"
    elif rng.random() < 0.3:
        row["updated_date"] = ""          # falsy edge
    if rng.random() < 0.75:
        row["price_value"] = rng.choice(
            [40000, 45000, 50000, 55000.5, 60000])
    if rng.random() < 0.6:
        row["is_unpublished"] = rng.random() < 0.25
    if rng.random() < 0.5:
        row["description"] = f"desc-{rng.randint(1, 5)}"
    if rng.random() < 0.5:
        row["timestamp"] = f"ts-{rng.randint(1, 9)}"
    if rng.random() < 0.3:
        row["image_urls"] = [f"img-{rng.randint(1, 3)}.jpg"]
    return row


def gen(outdir):
    os.makedirs(outdir, exist_ok=True)
    rng = random.Random(int(os.environ.get("SEED", 42)))
    ids = list(range(1, N_IDS + 1))
    master = []
    for b in range(N_BATCHES):
        batch = [gen_row(rng, ids) for _ in range(ROWS_PER_BATCH)]
        with open(f"{outdir}/batch_{b}.json", "w") as f:
            json.dump(batch, f, ensure_ascii=False)
        master = merge_listings(master, json.loads(json.dumps(batch)))
    with open(f"{outdir}/expected.json", "w") as f:
        json.dump(master, f, ensure_ascii=False)
    print(f"wrote {N_BATCHES} batches + expected ({len(master)} keys)")


def normval(v):
    if isinstance(v, bool):
        return v
    if isinstance(v, (int, float)):
        return float(v)
    if v == "":
        return ""
    return v


def cmp(outdir):
    exp = {r["offer_id"]: r for r in json.load(open(f"{outdir}/expected.json"))}
    act = {r["offer_id"]: r for r in json.load(open(f"{outdir}/actual.json"))}
    if exp.keys() != act.keys():
        print(f"KEY MISMATCH: only-expected={exp.keys()-act.keys()} "
              f"only-actual={act.keys()-exp.keys()}")
        return 1
    bad = 0
    for k in sorted(exp):
        fields = set(exp[k]) | set(act[k])
        for f in sorted(fields):
            e, a = exp[k].get(f), act[k].get(f)
            if isinstance(e, float) and e != e:      # reference NaN artifact
                e = None
            if normval(e) != normval(a):
                print(f"MISMATCH id={k} field={f}: expected={e!r} actual={a!r}")
                bad += 1
    print("IDENTICAL" if not bad else f"{bad} field mismatches")
    return 1 if bad else 0


if __name__ == "__main__":
    cmd, outdir = sys.argv[1], sys.argv[2]
    sys.exit(gen(outdir) if cmd == "gen" else cmp(outdir))
