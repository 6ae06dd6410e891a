"""Render the long-run quality curves (curves.jsonl) as small multiples.

One panel per metric (SI-SDR, PESQ, STOI, ESTOI), two categorical series
(esti0 = bare beamformer, esti = composed post-filter output), the noisy
baseline as a gray context reference line, and the freeze point marked.
Colors are the validated reference dataviz palette (slots 1-2, light
mode); marks follow its specs (2px lines, >=8px end markers with a 2px
surface ring, hairline solid gridlines, selective direct labels, text in
ink tokens - never series color).

    python tools/plot_curves.py CURVES_r3.jsonl --out release/curves.png
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

SURFACE = "#fcfcfb"
INK = "#0b0b0b"
SECONDARY = "#52514e"
MUTED = "#898781"
GRID = "#e1e0d9"
BASELINE = "#c3c2b7"
SERIES = {"esti0": "#2a78d6", "esti": "#eb6834"}  # palette slots 1-2
NOISY = MUTED

PANELS = [
    ("si_sdr", "SI-SDR (dB)"),
    ("pesq", "PESQ (MOS-LQO)"),
    ("stoi", "STOI"),
    ("estoi", "ESTOI"),
]


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("curves")
    ap.add_argument("--out", default="release/curves.png")
    ap.add_argument("--freeze-at", type=int, default=18000)
    args = ap.parse_args(argv)

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    rows = [json.loads(l) for l in open(args.curves) if l.strip()]
    noisy = next(r for r in rows if r["stage"] == "noisy")
    series = {s: [(r["step"], r) for r in rows if r["stage"] == s]
              for s in ("esti0", "esti")}

    fig, axes = plt.subplots(2, 2, figsize=(9.6, 6.4), dpi=150)
    fig.patch.set_facecolor(SURFACE)
    fig.suptitle(
        "Composed-model training: bare beamformer vs post-filtered output"
        "  (frozen 7-item val set)",
        fontsize=11, color=INK, x=0.5, y=0.995, fontweight="semibold",
    )

    for ax, (key, title) in zip(axes.ravel(), PANELS):
        ax.set_facecolor(SURFACE)
        for spine in ("top", "right", "left"):
            ax.spines[spine].set_visible(False)
        ax.spines["bottom"].set_color(BASELINE)
        ax.spines["bottom"].set_linewidth(1)
        ax.grid(axis="y", color=GRID, linewidth=1, linestyle="-")
        ax.set_axisbelow(True)
        ax.tick_params(colors=MUTED, labelsize=8, length=0)

        # noisy baseline: constant gray context line, directly labeled
        ax.axhline(noisy[key], color=NOISY, linewidth=1.2)

        # freeze point: hairline marker
        ax.axvline(args.freeze_at, color=GRID, linewidth=1)

        ends = {n: pts[-1][1][key] for n, pts in series.items()}
        span = (max(max(r[key] for _, r in p) for p in series.values())
                - min(min(r[key] for _, r in p) for p in series.values())
                ) or 1.0
        collide = abs(ends["esti0"] - ends["esti"]) < 0.06 * span
        for name, pts in series.items():
            xs = [s for s, _ in pts]
            ys = [r[key] for _, r in pts]
            ax.plot(xs, ys, color=SERIES[name], linewidth=2,
                    solid_capstyle="round", solid_joinstyle="round")
            # end marker: >=8px dot with a 2px surface ring
            ax.plot(xs[-1], ys[-1], "o", markersize=5.5,
                    markerfacecolor=SERIES[name],
                    markeredgecolor=SURFACE, markeredgewidth=1.4)
            # converging end labels get nudged apart, not stacked
            dy = -3
            if collide:
                hi = max(ends, key=ends.get)
                dy = 4 if (name == hi or (ends["esti0"] == ends["esti"]
                                          and name == "esti")) else -10
            ax.annotate(f"{ys[-1]:.3f}" if key in ("stoi", "estoi")
                        else f"{ys[-1]:.2f}",
                        (xs[-1], ys[-1]), textcoords="offset points",
                        xytext=(6, dy), fontsize=8, color=SECONDARY)
        ax.annotate("noisy", (0.01, noisy[key]),
                    xycoords=("axes fraction", "data"),
                    textcoords="offset points", xytext=(2, 3),
                    fontsize=7.5, color=SECONDARY)
        ax.annotate("frozen →", (args.freeze_at, 0.04),
                    xycoords=("data", "axes fraction"),
                    textcoords="offset points", xytext=(3, 0),
                    fontsize=7.5, color=SECONDARY)
        ax.set_title(title, fontsize=9.5, color=INK, loc="left", pad=6)
        ax.set_xlim(0, None)
        ax.xaxis.set_major_formatter(
            plt.FuncFormatter(lambda v, _: f"{v / 1000:g}k" if v else "0")
        )

    # one legend for the figure (>=2 series: legend always present)
    handles = [plt.Line2D([], [], color=SERIES[s], linewidth=2,
                          label=lbl)
               for s, lbl in (("esti0", "esti0 — bare EaBNet beamformer"),
                              ("esti", "esti — composed + GaGNet"))]
    handles.append(plt.Line2D([], [], color=NOISY, linewidth=1.2,
                              label="noisy input (unprocessed)"))
    fig.legend(handles=handles, loc="upper center", ncol=3, frameon=False,
               bbox_to_anchor=(0.5, 0.965), fontsize=8.5,
               labelcolor=SECONDARY)
    fig.supxlabel("training step", fontsize=9, color=MUTED, y=0.015)
    fig.tight_layout(rect=(0, 0.02, 1, 0.93))
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    fig.savefig(args.out, facecolor=SURFACE, bbox_inches="tight")
    print(f"[plot] wrote {args.out}")


if __name__ == "__main__":
    main()
