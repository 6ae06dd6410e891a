"""Summarize a long-run ``curves.jsonl`` into a markdown results table.

Reads the per-chunk rows appended by ``tools/long_train.py`` (one noisy
baseline row at step -1, then esti0/esti rows per chunk boundary) and
prints a compact table plus the composed-vs-bare verdict the round-2
judge asked for: does the GaGNet post-filter stage (``esti``) beat the
bare beamformer (``esti0``) on the frozen val set?

    python tools/curves_report.py /root/longrun/curves.jsonl
"""

import json
import sys

KEYS = ("si_sdr", "pesq", "stoi", "estoi")


def load(path):
    rows = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if line:
                rows.append(json.loads(line))
    return rows


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    path = argv[0] if argv else "/root/longrun/curves.jsonl"
    every = int(argv[1]) if len(argv) > 1 else 1
    rows = load(path)
    noisy = next((r for r in rows if r["stage"] == "noisy"), None)
    steps = sorted({r["step"] for r in rows if r["step"] >= 0})

    print("| step | frozen | " + " | ".join(
        f"{k} e0/e" for k in KEYS) + " |")
    print("|---|---|" + "---|" * len(KEYS))
    if noisy:
        print("| noisy | — | " + " | ".join(
            f"{noisy[k]:.2f}" for k in KEYS) + " |")
    for i, s in enumerate(steps):
        if every > 1 and i % every and s != steps[-1]:
            continue
        by = {r["stage"]: r for r in rows if r["step"] == s}
        e0, e = by.get("esti0"), by.get("esti")
        if not (e0 and e):
            continue
        cells = " | ".join(
            f"{e0[k]:.2f}/{e[k]:.2f}" for k in KEYS)
        print(f"| {s} | {e0.get('frozen', '?')} | {cells} |")

    if steps:
        by = {r["stage"]: r for r in rows if r["step"] == steps[-1]}
        e0, e = by.get("esti0"), by.get("esti")
        if e0 and e:
            wins = {k: e[k] - e0[k] for k in KEYS}
            verdict = all(wins[k] > 0 for k in ("si_sdr", "stoi"))
            print(f"\nfinal step {steps[-1]}: esti - esti0 margins: "
                  + ", ".join(f"{k} {v:+.3f}" for k, v in wins.items()))
            print("composed-post-filter verdict (si_sdr AND stoi): "
                  + ("WIN" if verdict else "not yet"))


if __name__ == "__main__":
    main()
