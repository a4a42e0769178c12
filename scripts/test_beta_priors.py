"""Coverage-dampened fraction analysis: beta-prior pseudocount grid.

Python/matplotlib equivalent of the reference's R analysis
(reference: scripts/test_beta_priors.R): visualize the posterior
modified-fraction estimate as a function of (coverage, unmodified count)
for a given pair of damp pseudocounts, the quantity behind
``--coverage-dampened-counts`` (default [2, 0],
tombo_tpu/config.py COV_DAMP_COUNTS; reference:
tombo/_default_parameters.py:190 and tombo/tombo_stats.py:2537
``calc_damp_fraction``).

Usage: python scripts/test_beta_priors.py [unmod_pseudo mod_pseudo [out.pdf]]
"""
import sys

import numpy as np
import matplotlib
matplotlib.use("Agg")
import matplotlib.pyplot as plt


def main():
    a = float(sys.argv[1]) if len(sys.argv) > 1 else 2.0   # unmod pseudo
    b = float(sys.argv[2]) if len(sys.argv) > 2 else 0.0   # mod pseudo
    out_fn = sys.argv[3] if len(sys.argv) > 3 else "damp_priors.pdf"

    max_cov = 30
    grid = np.full((max_cov + 1, max_cov + 1), np.nan)
    for cov in range(1, max_cov + 1):
        for n_unmod in range(cov + 1):
            n_mod = cov - n_unmod
            # damp_frac = (n_mod + b) / (cov + a + b): the dampened
            # fraction written to stats files as damp_frac
            grid[n_unmod, cov] = (n_mod + b) / (cov + a + b)

    fig, ax = plt.subplots(figsize=(8, 6))
    im = ax.imshow(grid, origin="lower", aspect="auto", vmin=0, vmax=1,
                   cmap="RdBu_r")
    ax.set_xlabel("coverage")
    ax.set_ylabel("unmodified reads")
    ax.set_title("dampened modified fraction, pseudocounts "
                 "(unmod=%g, mod=%g)" % (a, b))
    fig.colorbar(im, ax=ax, label="damp_frac")
    fig.savefig(out_fn)
    print("wrote", out_fn)

    # sanity print: raw vs dampened fraction at full modification
    for cov in (1, 2, 5, 10, 20):
        print("cov=%2d all-mod: raw=1.00 damp=%.3f" %
              (cov, (cov + b) / (cov + a + b)))


if __name__ == "__main__":
    main()
