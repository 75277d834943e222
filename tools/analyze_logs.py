#!/usr/bin/env python
"""Plot loss/metric curves from train.log.jsonl files (reference
tools/analyze_logs.py surface, for our JSONL schema).

Usage:
  python tools/analyze_logs.py plot_curve work_dirs/*/train.log.jsonl \
      --keys loss abs_rel --out curves.png
  python tools/analyze_logs.py cal_train_time work_dirs/x/train.log.jsonl
"""
import argparse
import json
import sys


def load_log(path):
    records = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if line:
                records.append(json.loads(line))
    return records


def plot_curve(args):
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    plt.figure(figsize=(8, 5))
    for path in args.logs:
        records = load_log(path)
        for key in args.keys:
            xs = [r["iter"] for r in records if key in r]
            ys = [r[key] for r in records if key in r]
            if xs:
                plt.plot(xs, ys, label=f"{path}:{key}", marker=".")
    plt.xlabel("iter")
    plt.legend(fontsize=7)
    plt.grid(alpha=0.3)
    plt.tight_layout()
    plt.savefig(args.out, dpi=150)
    print(f"saved {args.out}")


def cal_train_time(args):
    for path in args.logs:
        records = [r for r in load_log(path)
                   if r.get("mode") == "train" and "time" in r]
        if not records:
            print(f"{path}: no train records")
            continue
        times = [r["time"] for r in records[1:]] or [records[0]["time"]]
        import numpy as np
        print(f"{path}: mean iter-block time {np.mean(times):.3f}s, "
              f"fastest {min(times):.3f}s, slowest {max(times):.3f}s")


def main():
    parser = argparse.ArgumentParser()
    sub = parser.add_subparsers(dest="task", required=True)
    p1 = sub.add_parser("plot_curve")
    p1.add_argument("logs", nargs="+")
    p1.add_argument("--keys", nargs="+", default=["loss"])
    p1.add_argument("--out", default="curves.png")
    p2 = sub.add_parser("cal_train_time")
    p2.add_argument("logs", nargs="+")
    args = parser.parse_args()
    if args.task == "plot_curve":
        plot_curve(args)
    else:
        cal_train_time(args)


if __name__ == "__main__":
    main()
