#!/usr/bin/env python3
"""Two-step scaling exponent tables from the local bench captures (round via argv[1], default r14).

Step 1: sf0.1 -> sf1 (10x), exp = log10(t1/t01).
Step 2: sf1 -> sf3 (3x),  exp = log(t3/t1)/log(3).
Emits markdown fragments for SCALING.md.
"""
import json, math, sys

def load(p):
    with open(p) as f: return json.load(f)

R = sys.argv[1] if len(sys.argv) > 1 else "r14"
b01 = load(f"BENCH_LOCAL_{R}_sf0.1.json")
b1  = load(f"BENCH_LOCAL_{R}_sf1.json")
b3  = load(f"BENCH_LOCAL_{R}_sf3.json")

FAMILIES = {}  # query -> family letter, derived from SURVEY
import re
sec = None
for line in open("SURVEY.md"):
    m = re.match(r"### ([A-H])\. ", line)
    if m: sec = m.group(1)
    m = re.match(r"\| *\d+ *\| *`(q_\w+)`", line)
    if m and sec: FAMILIES[m.group(1)] = sec

q01, q1, q3 = b01["queries"], b1["queries"], b3["queries"]
common = sorted(set(q01) & set(q1) & set(q3))
rows = []
for q in common:
    t01, t1, t3 = q01[q], q1[q], q3[q]
    if min(t01, t1, t3) <= 0: continue
    e1 = math.log10(t1 / t01)
    e2 = math.log(t3 / t1) / math.log(3)
    rows.append((q, t01, t1, t3, e1, e2))

print(f"queries common to all three captures: {len(rows)}")
print(f"totals: sf0.1 {b01['value']:.1f}s  sf1 {b1['value']:.1f}s  sf3 {b3['value']:.1f}s")
print(f"builds: {b01['build_sec']:.1f} / {b1['build_sec']:.1f} / {b3['build_sec']:.1f}")
print(f"failures: {b01['failures']} {b1['failures']} {b3['failures']}")
print()

# family table
fam = {}
for q, t01, t1, t3, e1, e2 in rows:
    fam.setdefault(FAMILIES.get(q, "?"), []).append((e1, e2, q, t3))
print("| family | n | median exp 10x | median exp 3x | max exp 3x | max query |")
print("|---|---|---|---|---|---|")
for f in sorted(fam):
    xs = fam[f]
    med1 = sorted(e for e, _, _, _ in xs)[len(xs)//2]
    med2 = sorted(e for _, e, _, _ in xs)[len(xs)//2]
    mx = max(xs, key=lambda r: r[1])
    print(f"| {f} | {len(xs)} | {med1:.2f} | {med2:.2f} | {mx[1]:.2f} | `{mx[2]}` |")
print()

# queries >=1s at sf3, by combined exponent
big = [r for r in rows if r[3] >= 1.0]
big.sort(key=lambda r: -r[5])
print("| query | sf0.1 s | sf1 s | sf3 s | exp 10x | exp 3x |")
print("|---|---|---|---|---|---|")
for q, t01, t1, t3, e1, e2 in big:
    print(f"| `{q}` | {t01:.2f} | {t1:.2f} | {t3:.2f} | {e1:.2f} | {e2:.2f} |")
print()

# watchlist: steep at the larger step
steep = [r for r in rows if r[5] > 1.1 and r[3] >= 0.5]
steep.sort(key=lambda r: -r[5])
print("steep at sf1->sf3 (exp>1.1, t_sf3>=0.5s):")
for q, t01, t1, t3, e1, e2 in steep:
    print(f"  {q}: {t1:.2f} -> {t3:.2f}  exp {e2:.2f}")
