#!/usr/bin/env python3
"""Artifact stamp-order guard (the r15 gap: the q2/q24 rewrite landed
AFTER every sf1/sf3 artifact was generated, so the round's 3-SF green
claim was an extrapolation). Refuses to bless a round whose committed
bench/correctness artifacts predate the shipping HEAD:

  - the working tree must be clean (an artifact generated on a dirty
    tree describes no commit at all);
  - every listed artifact's mtime must be >= the HEAD commit time;
  - bench detail artifacts that carry a "git_head" field must carry
    THIS head.

Usage: tools/stamp_check.py [artifact ...]
Defaults to the three-point gate set. Exit 0 = stamp order holds.
"""
import json, os, subprocess, sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DEFAULT = ["BENCH_DETAIL.json", "BENCH_DETAIL_sf1.json",
           "BENCH_DETAIL_sf3.json", "CORRECTNESS_sf1.json",
           "CORRECTNESS_sf3.json"]

def git(*args):
    return subprocess.run(["git", "-C", REPO] + list(args),
                          capture_output=True, text=True).stdout.strip()

head = git("rev-parse", "HEAD")
head_time = int(git("log", "-1", "--format=%ct"))
dirty = git("status", "--porcelain")
fails = []
# artifacts regenerated in this working tree but not yet committed are
# fine (the commit that ships them comes next); any OTHER dirt means
# the artifacts describe code that is not HEAD
dirt = [l for l in dirty.splitlines()
        if l[3:].split(" -> ")[-1] not in set(DEFAULT + sys.argv[1:])]
if dirt:
    fails.append(f"working tree dirty beyond the artifacts themselves: "
                 f"{[l.strip() for l in dirt[:5]]}")

for name in (sys.argv[1:] or DEFAULT):
    path = os.path.join(REPO, name)
    if not os.path.exists(path):
        fails.append(f"{name}: missing")
        continue
    mtime = int(os.path.getmtime(path))
    if mtime < head_time:
        fails.append(f"{name}: mtime {mtime} predates HEAD commit "
                     f"{head_time} ({head[:10]}) — regenerate at HEAD")
    try:
        doc = json.load(open(path))
        stamped = doc.get("git_head") if isinstance(doc, dict) else None
        if stamped and stamped != head:
            fails.append(f"{name}: stamped git_head {stamped[:10]} != "
                         f"HEAD {head[:10]} — regenerate at HEAD")
    except Exception:
        pass

if fails:
    print("STAMP-ORDER VIOLATIONS:")
    for f in fails:
        print(" -", f)
    sys.exit(1)
print(f"stamp order OK at {head[:10]}: "
      f"{len(sys.argv[1:] or DEFAULT)} artifacts at-or-after HEAD")
