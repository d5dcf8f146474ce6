#!/usr/bin/env python
"""Aggregate multi-seed utility-study CSVs (tools/utility_study.py) into a
mean +/- spread table per (threshold, n_d_steps) cell.

Usage: python tools/aggregate_utility_study.py csv1 [csv2 ...]

For each cell and seed it extracts the BEST pixel-FID over checkpoints,
the FINAL pixel-FID, and the final G-update count, then prints
mean +/- (max-min)/2 across seeds — the round-3 single-seed table's
robustness check (VERDICT round-3 item 5).
"""

import csv
import sys
from collections import defaultdict


def main(argv):
    cells = defaultdict(lambda: defaultdict(list))  # cell -> file -> rows
    for path in argv:
        with open(path) as f:
            for row in csv.DictReader(f):
                key = (float(row["threshold"]), int(row["n_d_steps"]))
                cells[key][path].append(
                    (int(row["epoch"]), int(row["g_updates"]),
                     float(row["pixel_fid"])))

    def spread(vals):
        m = sum(vals) / len(vals)
        return m, (max(vals) - min(vals)) / 2.0

    print(f"{'thr':>5} {'k':>2} {'seeds':>5} {'best_fid':>16} "
          f"{'final_fid':>16} {'final_g_updates':>18}")
    for key in sorted(cells, key=lambda t: (t[0], -t[1])):
        best, final, gups = [], [], []
        for path, rows in sorted(cells[key].items()):
            rows.sort()
            best.append(min(r[2] for r in rows))
            final.append(rows[-1][2])
            gups.append(rows[-1][1])
        bm, bs = spread(best)
        fm, fs = spread(final)
        gm, gs = spread([float(g) for g in gups])
        print(f"{key[0]:>5} {key[1]:>2} {len(best):>5} "
              f"{bm:>8.3f} ±{bs:<6.3f} {fm:>8.3f} ±{fs:<6.3f} "
              f"{gm:>10.0f} ±{gs:<6.0f}")


if __name__ == "__main__":
    main(sys.argv[1:])
