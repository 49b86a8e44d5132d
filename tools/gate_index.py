#!/usr/bin/env python3
"""Regenerate the "Gate index" section in SURVEY.md and COVERAGE.md.

Scans src/main/scala/graft/queries/*.scala for gate registrations
("name" -> (fn _)) and rewrites the trailing Gate index table in both
inventory docs so every driver CORRECTNESS key maps to its
implementation. Run after adding/removing a gate. Dev tool only.
"""
import re, glob

MARKER = "## Gate index — every driver CORRECTNESS key"
HDR = """
## Gate index — every driver CORRECTNESS key → implementation

Complete machine-checked map (EntryAnalysisSpec asserts queries ↔ oracles
stay 1:1; this table is regenerated when gates are added). Every key the
driver's CORRECTNESS_r{N}.json reports appears here and in COVERAGE.md.

"""

def main():
    reg = {}
    for f in glob.glob('/root/repo/src/main/scala/graft/queries/*.scala'):
        txt = open(f).read()
        short = f.split('/')[-1].replace('.scala', '')
        for m in re.finditer(r'"([a-z0-9_]+)"\s*->\s*\(([A-Za-z0-9.]+)\s*_\)', txt):
            reg.setdefault(m.group(1), (short, m.group(2)))
        for m in re.finditer(r'"([a-z0-9_]+)"\s*->\s*\(\((?:s|spark)', txt):
            reg.setdefault(m.group(1), (short, '(inline)'))
    rows = [f"| `{k}` | `queries/{mod}.{fn.lstrip('.')}` |"
            for k, (mod, fn) in sorted(reg.items())]
    idx = "\n".join(["| Gate key | Implementation |", "|---|---|"] + rows) + "\n"
    for path in ('/root/repo/SURVEY.md', '/root/repo/COVERAGE.md'):
        txt = open(path).read()
        if MARKER in txt:
            txt = txt[:txt.index(MARKER)].rstrip() + "\n"
        open(path, 'w').write(txt.rstrip() + "\n" + HDR + idx)
    print(f"gate index: {len(rows)} rows -> SURVEY.md, COVERAGE.md")

if __name__ == '__main__':
    main()
