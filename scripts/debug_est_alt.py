#!/usr/bin/env python3
"""Visualize alternative-base density isolation.

Python/matplotlib equivalent of the reference's debug_est_alt.R: plots
standard vs alternative k-mer densities and the isolated difference
density for chosen k-mers from saved density files.
"""
import argparse
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np

from tombo_tpu import config
from tombo_tpu.stats.estimate import parse_kmer_densities_file


def main():
    p = argparse.ArgumentParser()
    p.add_argument("alt_density_fn")
    p.add_argument("std_density_fn")
    p.add_argument("--kmers", nargs="+", required=True)
    p.add_argument("--pdf-filename", default="debug_est_alt.pdf")
    args = p.parse_args()

    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from matplotlib.backends.backend_pdf import PdfPages

    alt_dens = parse_kmer_densities_file(args.alt_density_fn)
    std_dens = parse_kmer_densities_file(args.std_density_fn)
    n_pts = next(iter(alt_dens.values())).shape[0]
    x = np.linspace(config.KERNEL_DENSITY_RANGE[0],
                    config.KERNEL_DENSITY_RANGE[1], n_pts)
    with PdfPages(args.pdf_filename) as pdf:
        for km in args.kmers:
            fig, ax = plt.subplots(figsize=(6, 3.5))
            ax.plot(x, std_dens[km], label="standard")
            ax.plot(x, alt_dens[km], label="alternative")
            diff = np.maximum(alt_dens[km] - std_dens[km], 0)
            ax.fill_between(x, diff, alpha=0.3, label="difference")
            ax.set_title(km)
            ax.set_xlabel("Normalized signal level")
            ax.legend(fontsize=8)
            fig.tight_layout()
            pdf.savefig(fig)
            plt.close(fig)


if __name__ == "__main__":
    main()
