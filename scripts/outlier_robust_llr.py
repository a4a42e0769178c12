"""Shape analysis of the outlier-robust scaled LLR statistic.

Python/matplotlib equivalent of the reference's R analysis
(reference: scripts/outlier_robust_llr.R): for a sweep of
canonical-vs-alternative level separations, plot the standard
log-likelihood ratio (unbounded in the tails — one outlier observation
dominates a read) against the scaled LLR actually used by
``detect_modifications alternative_model``
(tombo_tpu/stats/kernels.py calc_scaled_llh_ratio_const_var;
reference: tombo/_c_helper.pyx:313), plus the two level densities.

Usage: python scripts/outlier_robust_llr.py [out.pdf]
"""
import sys

import numpy as np
import matplotlib
matplotlib.use("Agg")
import matplotlib.pyplot as plt
from matplotlib.backends.backend_pdf import PdfPages

import os
sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
from tombo_tpu.stats import kernels  # noqa: E402

CONST_VAR = 0.12
REF_MEAN = 0.0
ALT_OFFSETS = np.arange(0.05, 0.85, 0.10)
X = np.arange(-2.0, 2.0, 0.05)


def main():
    out_fn = sys.argv[1] if len(sys.argv) > 1 else "llr_shapes.pdf"
    sd = np.sqrt(CONST_VAR)
    with PdfPages(out_fn) as pdf:
        for off in ALT_OFFSETS:
            alt_mean = REF_MEAN + off
            std_llr = kernels.calc_llh_ratio_const_var(
                X[:, None], np.full((X.shape[0], 1), REF_MEAN),
                np.full((X.shape[0], 1), alt_mean), CONST_VAR)
            scaled = kernels.calc_scaled_llh_ratio_const_var(
                X[:, None], np.full((X.shape[0], 1), REF_MEAN),
                np.full((X.shape[0], 1), alt_mean), CONST_VAR)
            dens_ref = np.exp(-np.square(X - REF_MEAN) / (2 * CONST_VAR))
            dens_alt = np.exp(-np.square(X - alt_mean) / (2 * CONST_VAR))
            dens_ref /= sd * np.sqrt(2 * np.pi)
            dens_alt /= sd * np.sqrt(2 * np.pi)

            fig, ax = plt.subplots(figsize=(9, 5))
            ax.plot(X, std_llr, label="standard LLR", lw=1.5)
            ax.plot(X, scaled, label="outlier-robust scaled LLR", lw=1.5)
            ax.plot(X, dens_ref, "--", label="canonical level density",
                    lw=1.0)
            ax.plot(X, dens_alt, "--", label="alternative level density",
                    lw=1.0)
            ax.axhline(0, color="0.6", lw=0.5)
            ax.set_xlabel("observed normalized level")
            ax.set_ylabel("statistic / density")
            ax.set_title("level separation %.2f (const var %.2f)"
                         % (off, CONST_VAR))
            ax.set_ylim(-4, 4)
            ax.legend(fontsize=8)
            pdf.savefig(fig)
            plt.close(fig)
    print("wrote", out_fn)


if __name__ == "__main__":
    main()
