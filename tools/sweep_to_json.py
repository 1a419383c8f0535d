#!/usr/bin/env python3
"""Fold a tools/oracle_check.py run's stdout into the committed
sweep-artifact JSON shape (CORRECTNESS_SF*_r*.json).

Usage: sweep_to_json.py <oracle_check_stdout_file> <sfdir> <note> <out.json>
"""
import json
import sys
from pathlib import Path


def main(log: str, sfdir: str, note: str, out: str) -> int:
    results = {}
    for line in Path(log).read_text().splitlines():
        for tag, verdict in (("PASS ", "pass"), ("FAIL ", "fail"),
                             ("NO-ORACLE ", "rows-only")):
            if line.startswith(tag):
                results[line[len(tag):].split(":")[0]] = verdict
    doc = {
        "sf": sfdir,
        "total": len(results),
        "passed": sum(1 for v in results.values() if v == "pass"),
        "failed": sum(1 for v in results.values() if v == "fail"),
        "note": note,
        "results": dict(sorted(results.items())),
    }
    Path(out).write_text(json.dumps(doc, indent=1) + "\n")
    print(f"{out}: {doc['passed']}/{doc['total']} pass, {doc['failed']} fail")
    return 1 if doc["failed"] else 0


if __name__ == "__main__":
    sys.exit(main(*sys.argv[1:5]))
