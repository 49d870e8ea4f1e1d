#!/usr/bin/env python3
"""Regenerate LEAKCHECK.json: scan the repo tree for anything that
should never appear in a public artifact (cloud keys, bucket URIs,
chat-archive links, private package imports, non-public hosts).

Run from the repo root:  python3 tools/leakcheck.py [--round N]

The artifact embeds the scan timestamp and HEAD commit so each round's
0-hit claim is verifiable as a genuine re-run, not a copied file.
"""
import json
import re
import subprocess
import sys
import time
from pathlib import Path

CATEGORIES = {
    # private/vendored package roots that must never be imported here
    "internal-import": r"^\s*import\s+(?!(graft|org\.apache|org\.scalatest|org\.scalacheck|scala|java|javax)\b)[a-z]\w+\.(internal|private|corp)\b",
    # URLs that are not public documentation/source hosts
    "internal-url": r"https?://(?!(github\.com|raw\.githubusercontent\.com|spark\.apache\.org|duckdb\.org|www\.w3\.org|arxiv\.org|doi\.org|localhost|127\.0\.0\.1)\b)[\w.-]+\.(corp|internal|private)\b",
    "internal-pkg2": r"\b(com|net|io)\.[a-z]+\.(internal|corp|private)\.",
    # object-store buckets (any scheme) — testdata is local parquet only
    "internal-bucket": r"\b(s3|s3a|gs|gcs|abfss?|wasbs?)://[\w.-]+",
    # chat-archive permalinks
    "slack-link": r"\b[\w-]+\.slack\.com/archives/\w+",
    # cloud / API credentials
    "api-key": r"\b(AKIA[0-9A-Z]{16}|sk-[A-Za-z0-9]{24,}|ghp_[A-Za-z0-9]{36}|xox[bap]-[A-Za-z0-9-]{10,})\b",
    # env vars pointing at non-public infra
    "axon-env": r"\b[A-Z_]*(INTERNAL|CORP|PRIVATE)_(URL|HOST|BUCKET|ENDPOINT)\b",
}

SCAN_SUFFIXES = {".scala", ".sbt", ".py", ".md", ".json", ".sql", ".conf", ".txt"}
SKIP_DIRS = {"target", ".git", ".bloop", ".metals", "spark-warehouse"}


def main() -> int:
    rnd = None
    if "--round" in sys.argv:
        rnd = int(sys.argv[sys.argv.index("--round") + 1])
    root = Path(__file__).resolve().parent.parent
    pats = {k: re.compile(v) for k, v in CATEGORIES.items()}
    hits = {k: [] for k in CATEGORIES}
    n_files = 0
    for p in sorted(root.rglob("*")):
        if not p.is_file() or p.suffix not in SCAN_SUFFIXES:
            continue
        if any(d in p.parts for d in SKIP_DIRS):
            continue
        if p.name == "leakcheck.py":  # the patterns themselves
            continue
        n_files += 1
        try:
            text = p.read_text(errors="replace")
        except OSError:
            continue
        for i, line in enumerate(text.splitlines(), 1):
            for k, pat in pats.items():
                if pat.search(line):
                    hits[k].append(f"{p.relative_to(root)}:{i}: {line.strip()[:160]}")
    commit = subprocess.run(["git", "rev-parse", "HEAD"], cwd=root,
                            capture_output=True, text=True).stdout.strip()
    out = {
        "round": rnd,
        "generated_utc": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        "commit": commit,
        "files_scanned": n_files,
        "n_hits": sum(len(v) for v in hits.values()),
        "hits": hits,
    }
    (root / "LEAKCHECK.json").write_text(json.dumps(out, indent=2) + "\n")
    print(f"LEAKCHECK.json: {out['n_hits']} hits over {n_files} files @ {commit[:9]}")
    return 0 if out["n_hits"] == 0 else 1


if __name__ == "__main__":
    sys.exit(main())
