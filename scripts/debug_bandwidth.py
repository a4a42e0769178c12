"""Bandwidth-sufficiency analysis over DP debug dumps.

Python/matplotlib equivalent of the reference's R analysis
(reference: scripts/debug_bandwidth.R, fed by the compiled-in
``_DEBUG_BANDWIDTH`` flag, tombo/resquiggle.py:84-105): given a
directory of per-read ``dp_debug.*.npz`` dumps produced by running the
single-read path with ``TOMBO_TPU_DEBUG_DP=<dir>``, report how close
each read's optimal path runs to the adaptive band edges.  Paths that
hug an edge indicate the configured ``--signal-align-parameters``
bandwidth is too small for the sample.

Usage: python scripts/debug_bandwidth.py <dump_dir> [out.pdf]
"""
import glob
import os
import sys

import numpy as np
import matplotlib
matplotlib.use("Agg")
import matplotlib.pyplot as plt


def main():
    dump_dir = sys.argv[1]
    out_fn = sys.argv[2] if len(sys.argv) > 2 else "bandwidth_debug.pdf"
    fns = sorted(glob.glob(os.path.join(dump_dir, "dp_debug.*.npz")))
    if not fns:
        sys.exit("no dp_debug.*.npz dumps in " + dump_dir)

    margins = []
    per_read_min = []
    bandwidth = None
    for fn in fns:
        d = np.load(fn)
        path_pos = d["read_tb"][1:] - \
            d["band_event_starts"][:d["read_tb"].shape[0] - 1]
        bandwidth = int(d["fwd_pass"].shape[1])
        edge = np.minimum(path_pos, bandwidth - 1 - path_pos)
        margins.append(edge)
        per_read_min.append(edge.min())
    margins = np.concatenate(margins)
    per_read_min = np.asarray(per_read_min)

    fig, axes = plt.subplots(1, 2, figsize=(11, 4.5))
    axes[0].hist(margins, bins=60)
    axes[0].set_yscale("log")
    axes[0].set_xlabel("per-base distance of optimal path from band edge")
    axes[0].set_ylabel("bases")
    axes[0].set_title("all bases, %d reads (bandwidth %d)"
                      % (len(fns), bandwidth))
    axes[1].hist(per_read_min, bins=40)
    axes[1].set_xlabel("per-read minimum edge margin")
    axes[1].set_ylabel("reads")
    axes[1].set_title("per-read worst case")
    fig.tight_layout()
    fig.savefig(out_fn)

    close = float((per_read_min < 0.05 * bandwidth).mean())
    print("wrote %s: %d reads, min margin %d, median per-read min %d, "
          "%.1f%% of reads within 5%% of the band edge"
          % (out_fn, len(fns), per_read_min.min(),
             int(np.median(per_read_min)), 100 * close))
    if close > 0.1:
        print("=> bandwidth likely insufficient; raise "
              "--signal-align-parameters bandwidth")


if __name__ == "__main__":
    main()
