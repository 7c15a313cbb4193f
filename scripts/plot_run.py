#!/usr/bin/env python
"""Plot training curves from a run's metrics.jsonl.

Offline counterpart of the reference's ``output.ipynb`` (which pulls W&B runs
by id and plots training-time bars + raw/smoothed loss + eval loss): the
JSONL sink is always written, so curves render air-gapped.

  python scripts/plot_run.py runs/metrics.jsonl -o runs/curves.png
"""
import argparse
import json


def load(path):
    rows = []
    with open(path) as f:
        for line in f:
            try:
                rows.append(json.loads(line))
            except json.JSONDecodeError:
                continue
    return rows


def smooth(xs, beta=0.97):
    out, m = [], None
    for x in xs:
        m = x if m is None else beta * m + (1 - beta) * x
        out.append(m)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("jsonl")
    ap.add_argument("-o", "--out", default="curves.png")
    args = ap.parse_args()

    rows = load(args.jsonl)
    train = [(r["step"], r["train/loss"]) for r in rows if "train/loss" in r]
    evals = [(r["step"], r["eval/eval_loss"]) for r in rows
             if "eval/eval_loss" in r]
    tput = [(r["step"], r["train/tokens_per_s"]) for r in rows
            if "train/tokens_per_s" in r]

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, axes = plt.subplots(1, 3, figsize=(15, 4))
    if train:
        steps, losses = zip(*train)
        axes[0].plot(steps, losses, alpha=0.3, label="raw")
        axes[0].plot(steps, smooth(losses), label="smoothed")
        axes[0].set_title("train loss")
        axes[0].legend()
    if evals:
        s, l = zip(*evals)
        axes[1].plot(s, l, marker="o")
        axes[1].set_title("eval loss")
    if tput:
        s, t = zip(*tput)
        axes[2].plot(s, t)
        axes[2].set_title("tokens/s")
    for ax in axes:
        ax.set_xlabel("step")
        ax.grid(alpha=0.3)
    fig.tight_layout()
    fig.savefig(args.out, dpi=120)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
