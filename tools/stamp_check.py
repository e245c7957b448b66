#!/usr/bin/env python3
"""Artifact stamp-order guard (the r15 gap: the q2/q24 rewrite landed
AFTER every sf1/sf3 artifact was generated, so the round's 3-SF green
claim was an extrapolation). Refuses to bless a round whose committed
bench/correctness artifacts predate the shipping CODE state:

  - the working tree must be clean apart from the artifacts themselves
    (an artifact generated on an otherwise-dirty tree describes no
    commit at all);
  - every listed artifact's mtime must be >= the last commit that
    touched the runtime surface (src/, build.sbt, project/) — the
    artifact-only commit that ships them must not invalidate them;
  - bench artifacts that carry a "git_head" field must have been
    stamped at a commit whose src TREE equals HEAD's (tree-hash
    compare, so doc-only commits after stamping are fine).

Usage: tools/stamp_check.py [artifact ...]
Defaults to the three-point gate set. Exit 0 = stamp order holds.
"""
import json, os, subprocess, sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DEFAULT = ["BENCH_DETAIL.json", "BENCH_DETAIL_sf1.json",
           "BENCH_DETAIL_sf3.json", "BENCH_sf1.json", "BENCH_sf3.json",
           "CORRECTNESS_sf1.json", "CORRECTNESS_sf3.json"]
CODE_PATHS = ["src", "build.sbt", "project"]

def git(*args):
    return subprocess.run(["git", "-C", REPO] + list(args),
                          capture_output=True, text=True).stdout.strip()

head = git("rev-parse", "HEAD")
code_time = int(git("log", "-1", "--format=%ct", "--", *CODE_PATHS))
head_src_tree = git("rev-parse", "HEAD:src")
dirty = git("status", "--porcelain")
fails = []
# artifacts regenerated in this working tree but not yet committed are
# fine (the commit that ships them comes next); any OTHER dirt means
# the artifacts describe code that is not committed
allowed = set(DEFAULT + sys.argv[1:])
# robust to the status-column width (" M path" unstaged, "M  path"
# staged, "MM path" both): take everything after the first whitespace
dirt = [l for l in dirty.splitlines()
        if l.split(None, 1)[-1].split(" -> ")[-1].strip('"')
        not in allowed]
if dirt:
    fails.append(f"working tree dirty beyond the artifacts themselves: "
                 f"{[l.strip() for l in dirt[:5]]}")

for name in (sys.argv[1:] or DEFAULT):
    path = os.path.join(REPO, name)
    if not os.path.exists(path):
        fails.append(f"{name}: missing")
        continue
    mtime = int(os.path.getmtime(path))
    if mtime < code_time:
        fails.append(f"{name}: mtime {mtime} predates the last code "
                     f"commit {code_time} — regenerate at HEAD")
    try:
        doc = json.load(open(path))
        stamped = doc.get("git_head") if isinstance(doc, dict) else None
        if stamped:
            stamped_tree = git("rev-parse", f"{stamped}:src")
            if not stamped_tree:
                fails.append(f"{name}: stamped git_head {stamped[:10]} "
                             f"is not a commit in this repo")
            elif stamped_tree != head_src_tree:
                fails.append(f"{name}: stamped at {stamped[:10]} whose "
                             f"src tree differs from HEAD's — "
                             f"regenerate at HEAD")
    except Exception:
        pass

if fails:
    print("STAMP-ORDER VIOLATIONS:")
    for f in fails:
        print(" -", f)
    sys.exit(1)
print(f"stamp order OK at {head[:10]}: "
      f"{len(sys.argv[1:] or DEFAULT)} artifacts at-or-after the "
      f"shipping code state")
