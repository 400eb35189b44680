"""Summarise experiments/r3_results.jsonl (written by r3_chip_batch.sh)
into a comparison table: ms/substep + particle-steps/s per config tag,
plus raw text blocks for the profile/fidelity/smoke entries."""

import json
import sys

path = sys.argv[1] if len(sys.argv) > 1 else "experiments/r3_results.jsonl"
rows, texts = [], []
for line in open(path):
    rec = json.loads(line)
    r = rec.get("result")
    if isinstance(r, dict) and "detail" in r:
        d = r["detail"]
        rows.append((
            rec["tag"], d["n"], d["ms_per_step"], r["value"],
            r.get("vs_baseline"), "ERR" if "error" in rec else "",
        ))
    else:
        texts.append(rec)

if rows:
    print(f"{'tag':24} {'n':>9} {'ms/step':>9} {'p-steps/s':>12} {'vs_base':>8}")
    for tag, n, ms, v, vb, err in rows:
        print(f"{tag:24} {n:>9} {ms:>9.1f} {v:>12.3e} {vb:>8.4f} {err}")
for rec in texts:
    tag = rec["tag"]
    err = f" [ERROR rc={rec['error']}]" if "error" in rec else ""
    print(f"\n=== {tag}{err} ===")
    print(rec.get("text", json.dumps(rec.get("result"))))
