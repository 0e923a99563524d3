"""Render the training-demonstration report artifacts from a run log dir.

    python scripts/training_demo_report.py --log-dir log/<run> \
        --out docs/training_demo

Produces curves.png (small-multiple loss/balance/R1/throughput panels from
stats.jsonl) and first/last EMA composite sheets (downscaled), for
docs/TRAINING_DEMO.md. The reference's analog of these artifacts is the
stats.jsonl + fakes*.png stream its training loop writes
(reference lib/experiments/migan_default.py:429-585).
"""

import argparse
import json
import os
import os.path as osp

import numpy as np

# dataviz reference palette (light mode): categorical slots 1-3, chrome ink
BLUE, ORANGE, AQUA = "#2a78d6", "#eb6834", "#1baf7a"
SURFACE, INK, INK2 = "#fcfcfb", "#0b0b0b", "#52514e"
GRID, MUTED, BASE = "#e1e0d9", "#898781", "#c3c2b7"


def load_stats(log_dir):
    rows = []
    with open(osp.join(log_dir, "stats.jsonl")) as f:
        for line in f:
            rows.append(json.loads(line))
    return rows


def series(rows, key):
    """Collector entries are {"num", "mean", "std"} dicts; scalar fields
    (sec_per_kimg etc.) are plain numbers."""
    xs, ys = [], []
    for r in rows:
        v = r.get(key)
        if isinstance(v, dict):
            v = v.get("mean")
        if v is not None and np.isfinite(v):
            xs.append(r["kimg"])
            ys.append(v)
    return np.asarray(xs), np.asarray(ys)


def style_axis(ax, title):
    ax.set_facecolor(SURFACE)
    ax.set_title(title, color=INK, fontsize=11, loc="left", pad=8)
    ax.grid(True, color=GRID, linewidth=0.75)
    ax.tick_params(colors=MUTED, labelsize=8)
    for side in ("top", "right"):
        ax.spines[side].set_visible(False)
    for side in ("left", "bottom"):
        ax.spines[side].set_color(BASE)
    ax.set_xlabel("kimg", color=INK2, fontsize=9)


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--log-dir", required=True)
    p.add_argument("--out", default="docs/training_demo")
    args = p.parse_args()

    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    rows = load_stats(args.log_dir)
    os.makedirs(args.out, exist_ok=True)

    fig, axes = plt.subplots(2, 2, figsize=(11, 7), facecolor=SURFACE)
    fig.subplots_adjust(hspace=0.45, wspace=0.25)

    ax = axes[0, 0]
    for key, color, label in (("Loss/G/loss", BLUE, "G adversarial"),
                              ("Loss/D/loss", ORANGE, "D total")):
        x, y = series(rows, key)
        if len(x):
            ax.plot(x, y, color=color, linewidth=2, label=label)
    style_axis(ax, "Adversarial losses (tick means)")
    ax.legend(frameon=False, fontsize=8, labelcolor=INK2)

    ax = axes[0, 1]
    for key, color, label in (("Loss/scores/real", BLUE, "D(real)"),
                              ("Loss/scores/fake", ORANGE, "D(fake)")):
        x, y = series(rows, key)
        if len(x):
            ax.plot(x, y, color=color, linewidth=2, label=label)
    ax.axhline(0.0, color=BASE, linewidth=1)
    style_axis(ax, "Discriminator balance (logits)")
    ax.legend(frameon=False, fontsize=8, labelcolor=INK2)

    ax = axes[1, 0]
    x, y = series(rows, "Loss/r1_penalty")
    if len(x):
        ax.plot(x, y, color=BLUE, linewidth=2)
        ax.set_yscale("log")
    style_axis(ax, "R1 gradient penalty (log scale)")

    ax = axes[1, 1]
    x, y = series(rows, "sec_per_kimg")
    if len(x) > 1:
        # skip tick 0 (compile); img/s = 1000 / sec_per_kimg
        ax.plot(x[1:], 1000.0 / y[1:], color=BLUE, linewidth=2)
    style_axis(ax, "Throughput (img/s, steady-state ticks)")

    out_png = osp.join(args.out, "curves.png")
    fig.savefig(out_png, dpi=110, facecolor=SURFACE, bbox_inches="tight")
    print(f"wrote {out_png} ({len(rows)} ticks)")

    # first + last composite EMA sheets, downscaled to keep the repo small
    from PIL import Image

    sheets = sorted(f for f in os.listdir(args.log_dir)
                    if f.startswith("fakes") and f.endswith("_combined.png"))
    for tag, name in ((sheets[0], "sheet_first.png"),
                      (sheets[-1], "sheet_last.png")) if sheets else ():
        img = Image.open(osp.join(args.log_dir, tag))
        img.thumbnail((1024, 1024), Image.LANCZOS)
        img.save(osp.join(args.out, name))
        print(f"wrote {osp.join(args.out, name)} (from {tag})")


if __name__ == "__main__":
    main()
