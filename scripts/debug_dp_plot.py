#!/usr/bin/env python3
"""Render per-read DP debug dumps produced by ``TOMBO_TPU_DEBUG_DP``.

Matplotlib replacement for the reference's R DP debug plots
(reference: tombo/resquiggle.py:136-266 ``_debug_plot_dp``/``_debug_fit``):
each ``dp_debug.<read_id>.npz`` becomes one PDF page with

1. the banded forward-pass score matrix (band-local coordinates) with the
   traced optimal path overlaid, and
2. the path's distance to each band edge per base — the bandwidth-tuning
   view behind the reference's ``_DEBUG_BANDWIDTH`` output.

Usage: python scripts/debug_dp_plot.py <dump_dir> [out.pdf]
"""
import glob
import os
import sys

import numpy as np


def plot_one(npz_fn, pdf):
    import matplotlib.pyplot as plt
    d = np.load(npz_fn)
    fwd = d["fwd_pass"]
    read_tb = d["read_tb"]
    band_starts = d["band_event_starts"]
    lower = d["lower_margin"]
    upper = d["upper_margin"]

    fig, (ax_dp, ax_bw) = plt.subplots(
        2, 1, figsize=(11, 7), height_ratios=[3, 1])
    finite = np.isfinite(fwd)
    vmin = np.percentile(fwd[finite], 2) if finite.any() else 0
    im = ax_dp.imshow(fwd.T, aspect="auto", origin="lower",
                      interpolation="nearest", cmap="magma",
                      vmin=vmin)
    fig.colorbar(im, ax=ax_dp, label="forward score")
    n = min(read_tb.shape[0] - 1, band_starts.shape[0])
    path = read_tb[1:n + 1] - band_starts[:n]
    ax_dp.plot(np.arange(1, n + 1), path, color="#00e5ff", lw=0.8,
               label="optimal path")
    ax_dp.set_xlabel("base (sequence position)")
    ax_dp.set_ylabel("band-local event offset")
    ax_dp.set_title(os.path.basename(npz_fn), fontsize=9)
    ax_dp.legend(fontsize=7, loc="upper left")

    m = min(lower.shape[0], upper.shape[0])
    ax_bw.plot(np.minimum(lower[:m], upper[:m]), lw=0.7, color="#d62728")
    ax_bw.axhline(0, color="k", lw=0.5)
    ax_bw.set_xlabel("base")
    ax_bw.set_ylabel("min band margin")
    ax_bw.set_title(
        "bandwidth %d; min margin %d (0 = path clipped by band)"
        % (int(d["bandwidth"]), int(np.minimum(lower[:m],
                                               upper[:m]).min())),
        fontsize=8)
    fig.tight_layout()
    pdf.savefig(fig)
    plt.close(fig)


def main():
    if len(sys.argv) < 2:
        sys.exit(__doc__)
    dump_dir = sys.argv[1]
    out_fn = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
        dump_dir, "dp_debug.pdf")
    import matplotlib
    matplotlib.use("Agg")
    from matplotlib.backends.backend_pdf import PdfPages
    fns = sorted(glob.glob(os.path.join(dump_dir, "dp_debug.*.npz")))
    if not fns:
        sys.exit("No dp_debug.*.npz files in " + dump_dir)
    with PdfPages(out_fn) as pdf:
        for fn in fns:
            plot_one(fn, pdf)
    print("Wrote %s (%d reads)" % (out_fn, len(fns)))


if __name__ == "__main__":
    main()
