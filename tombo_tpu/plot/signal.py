"""Genome-anchored raw-signal plots, k-mer distributions, per-read stats.

Matplotlib implementations of the reference's R plot suites
(reference: tombo/_plot_commands.py:451-2268 + R_scripts/): overlaid
normalized signal per base across genomic intervals, motif-centered
panels, per-read statistic heatmaps, k-mer level distributions and
trace clustering.
"""
from __future__ import annotations

from typing import Dict, List, Sequence

import h5py
import numpy as np

from ..errors import TomboTpuError
from ..io import fast5 as f5io
from ..stats.region import RegionData

_BASE_COLORS = {"A": "#00CC00", "C": "#0000CC", "G": "#FFB300",
                "T": "#CC0000", "N": "#888888"}


def _load_read_signal_segments(r_data, reg_start, reg_end):
    """Per-base normalized signal segments over [reg_start, reg_end)
    (reference: tombo/tombo_helper.py:2090-2207 ``get_raw_signal``)."""
    with h5py.File(r_data.fn, "r") as fp:
        raw = f5io.get_raw_signal(fp)
        grp = fp["/Analyses/" + r_data.corr_group]
        events = grp["Events"][:]
        rsrtr = int(grp["Events"].attrs["read_start_rel_to_raw"])
        shift = float(grp.attrs["shift"])
        scale = float(grp.attrs["scale"])
        rna = bool(grp.attrs.get("rna", False))
    if rna:
        raw = raw[::-1]
    norm = (raw.astype(np.float64) - shift) / scale
    starts = events["start"].astype(np.int64)
    lengths = events["length"].astype(np.int64)
    n_bases = starts.shape[0]

    # genome position of each read-centric base
    segs = []
    for i in range(n_bases):
        if r_data.strand == "+":
            g_pos = r_data.start + i
        else:
            g_pos = r_data.end - 1 - i
        if not (reg_start <= g_pos < reg_end):
            continue
        s = rsrtr + starts[i]
        e = s + lengths[i]
        segs.append((g_pos, norm[s:e]))
    return segs


def plot_region_signal(ax, reg: RegionData, fasta=None, num_reads=None,
                       overplot_thresh=50):
    """Overlay per-read signal for a region on ``ax``."""
    reads = reg.reads[:num_reads] if num_reads else reg.reads
    n_plotted = 0
    for r_data in reads:
        if n_plotted >= overplot_thresh:
            break
        try:
            segs = _load_read_signal_segments(r_data, reg.start, reg.end)
        except (OSError, KeyError, TomboTpuError):
            continue
        xs, ys = [], []
        for g_pos, sig in segs:
            if sig.shape[0] == 0:
                continue
            xs.append(g_pos - reg.start +
                      np.linspace(0, 1, sig.shape[0], endpoint=False))
            ys.append(sig)
        if not xs:
            continue
        ax.plot(np.concatenate(xs), np.concatenate(ys), lw=0.4, alpha=0.5,
                color="#1f77b4" if r_data.strand == "+" else "#d62728")
        n_plotted += 1
    if fasta is not None:
        try:
            seq = fasta.get_seq(reg.chrm, reg.start, reg.end,
                                error_end=False)
        except TomboTpuError:
            seq = ""
        ylim = ax.get_ylim()
        for i, b in enumerate(seq):
            ax.text(i + 0.5, ylim[0], b, ha="center", va="bottom",
                    fontsize=7, color=_BASE_COLORS.get(b, "#888888"))
    ax.set_xlim(0, reg.end - reg.start)
    ax.set_title("%s:%d-%d (%s)" % (reg.chrm, reg.start + 1, reg.end,
                                    reg.strand), fontsize=8)
    return n_plotted


def _new_pdf(pdf_fn):
    import matplotlib
    matplotlib.use("Agg")
    from matplotlib.backends.backend_pdf import PdfPages
    return PdfPages(pdf_fn)


def plot_intervals(regions: Sequence[RegionData], pdf_fn, fasta=None,
                   num_reads=None, titles=None):
    """One page per interval with overlaid signal."""
    import matplotlib.pyplot as plt
    with _new_pdf(pdf_fn) as pdf:
        for i, reg in enumerate(regions):
            fig, ax = plt.subplots(figsize=(10, 3.5))
            plot_region_signal(ax, reg, fasta, num_reads)
            ax.set_ylabel("Normalized signal")
            if titles is not None and i < len(titles):
                ax.set_title(titles[i], fontsize=8)
            fig.tight_layout()
            pdf.savefig(fig)
            plt.close(fig)


def select_max_coverage_regions(reads_index, num_regions, num_bases):
    """Intervals with maximal coverage
    (reference: tombo/_plot_commands.py:1659-1730)."""
    cov_peaks = []
    for (chrm, strand), cov in reads_index.iter_cs_coverage():
        if cov is None or cov.shape[0] == 0:
            continue
        best = int(np.argmax(cov))
        cov_peaks.append((int(cov[best]), chrm, strand, best))
    cov_peaks.sort(reverse=True)
    out = []
    for covv, chrm, strand, pos in cov_peaks[:num_regions]:
        start = max(0, pos - num_bases // 2)
        out.append(RegionData(chrm, strand, start, start + num_bases))
    return out


def select_motif_regions(fasta, motif, reads_index, num_regions,
                         num_bases):
    """Intervals centered on motif occurrences with coverage
    (reference: tombo/_plot_commands.py:1831-2000)."""
    out = []
    for chrm in fasta.iter_chrms():
        seq = fasta.get_seq(chrm)
        for m in motif.motif_pat.finditer(seq):
            pos = m.start() + motif.mod_pos - 1
            for strand in "+-":
                cov = reads_index.get_coverage(chrm, pos, strand)
                if cov and cov > 0:
                    start = max(0, pos - num_bases // 2)
                    out.append((cov, RegionData(chrm, strand, start,
                                                start + num_bases)))
        if len(out) > num_regions * 50:
            break
    out.sort(key=lambda x: -x[0])
    return [reg for _, reg in out[:num_regions]]


def plot_kmer_dist(reads_index, pdf_fn, kmer_width=2, num_reads=100,
                   read_mean=False, rng=None):
    """K-mer level distributions
    (reference: tombo/_plot_commands.py:451-560)."""
    import matplotlib.pyplot as plt
    levels: Dict[str, List[float]] = {}
    n_parsed = 0
    reads = list(reads_index.iter_reads())
    (rng or np.random.default_rng(0)).shuffle(reads)
    for r_data in reads:
        try:
            with h5py.File(r_data.fn, "r") as fp:
                events = fp["/Analyses/" + r_data.corr_group + "/Events"]
                means = events["norm_mean"][:]
                seq = b"".join(events["base"][:]).decode()
        except (OSError, KeyError):
            continue
        read_levels: Dict[str, List[float]] = {}
        for i in range(len(seq) - kmer_width + 1):
            read_levels.setdefault(seq[i:i + kmer_width], []).append(
                means[i + kmer_width - 1])
        for km, vals in read_levels.items():
            levels.setdefault(km, []).extend(
                [float(np.mean(vals))] if read_mean else vals)
        n_parsed += 1
        if n_parsed >= num_reads:
            break
    if not levels:
        raise TomboTpuError("No valid reads for k-mer distribution plot.")
    kms = sorted(levels)
    fig, ax = plt.subplots(figsize=(max(6, len(kms) * 0.3), 4))
    ax.violinplot([levels[km] for km in kms], showmedians=True)
    ax.set_xticks(np.arange(1, len(kms) + 1))
    ax.set_xticklabels(kms, rotation=90, fontsize=6)
    ax.set_ylabel("Normalized signal level")
    fig.tight_layout()
    fig.savefig(pdf_fn)
    plt.close(fig)


def plot_per_read_stats(pr_stats, regions, pdf_fn, num_reads=50):
    """Per-read statistic heatmaps over intervals
    (reference: tombo/_plot_commands.py:~900-1100 plot_per_read)."""
    import matplotlib.pyplot as plt
    with _new_pdf(pdf_fn) as pdf:
        for reg in regions:
            blk = pr_stats.get_region_per_read_stats(
                reg.chrm, reg.strand, reg.start, reg.end, num_reads)
            if blk is None or blk.shape[0] == 0:
                continue
            read_ids = sorted(set(blk["read_id"]))
            mat = np.full((len(read_ids), reg.end - reg.start), np.nan)
            for rec in blk:
                mat[read_ids.index(rec["read_id"]),
                    int(rec["pos"]) - reg.start] = rec["stat"]
            fig, ax = plt.subplots(figsize=(10, 3.5))
            im = ax.imshow(mat, aspect="auto", interpolation="nearest",
                           cmap="RdBu")
            fig.colorbar(im, ax=ax, label="per-read statistic")
            ax.set_title("%s:%d-%d (%s)" % (
                reg.chrm, reg.start + 1, reg.end, reg.strand), fontsize=8)
            ax.set_xlabel("Position")
            ax.set_ylabel("Reads")
            fig.tight_layout()
            pdf.savefig(fig)
            plt.close(fig)


def cluster_most_significant(reads_index, ctrl_reads_index, stats_fn,
                             fasta, pdf_fn, num_regions=10, num_bases=21):
    """Hierarchically cluster per-read level traces at significant sites
    (reference: tombo/_plot_commands.py:2122-2268)."""
    import matplotlib.pyplot as plt
    from scipy.cluster import hierarchy
    from ..output.text import load_stats_file
    regions = load_stats_file(stats_fn).get_most_signif_regions(
        num_bases, num_regions)
    with _new_pdf(pdf_fn) as pdf:
        for chrm, start, end, strand, _rid, txt in regions:
            traces = []
            for idx in (reads_index, ctrl_reads_index):
                if idx is None:
                    continue
                reg = RegionData(chrm, strand, start, end).add_reads(
                    idx, require_full_span=True)
                mat = reg.get_base_levels()
                traces.append(mat.T)
            if not traces:
                continue
            mat = np.concatenate(traces, axis=0)
            mat = mat[~np.isnan(mat).any(axis=1)]
            if mat.shape[0] < 3:
                continue
            link = hierarchy.linkage(mat, "ward")
            order = hierarchy.leaves_list(link)
            fig, ax = plt.subplots(figsize=(8, 4))
            im = ax.imshow(mat[order], aspect="auto", cmap="viridis")
            fig.colorbar(im, ax=ax, label="level")
            ax.set_title(txt, fontsize=8)
            fig.tight_layout()
            pdf.savefig(fig)
            plt.close(fig)
