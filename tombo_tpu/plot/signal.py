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


def _model_levels_for_region(model, fasta, reg, alt=False):
    """Expected (mean, sd) per genomic base of ``reg`` for a k-mer model,
    NaN where the context is incomplete or non-ACGT.  For ``alt`` models
    the modified base is taken at the model's central position."""
    from ..seq import rev_comp
    k, cpos = model.kmer_width, model.central_pos
    if reg.strand == "+":
        s, e = reg.start - cpos, reg.end + (k - 1 - cpos)
    else:
        s, e = reg.start - (k - 1 - cpos), reg.end + cpos
    pad_l = max(0, -s)
    seq = fasta.get_seq(reg.chrm, max(0, s), e, error_end=False)
    seq = "N" * pad_l + seq + "N" * (e - max(0, s) + pad_l - len(seq))
    if reg.strand == "-":
        seq = rev_comp(seq)
    if alt:
        from ..seq import encode_seq, seq_to_kmer_codes
        codes = seq_to_kmer_codes(encode_seq(seq), k)
        means = np.where(codes >= 0,
                         model.means[np.maximum(codes, 0), cpos], np.nan)
        sds = np.where(codes >= 0,
                       model.sds[np.maximum(codes, 0), cpos], np.nan)
    else:
        means, sds = model.get_exp_levels_from_seq_with_gaps(seq, False)
    if reg.strand == "-":
        means, sds = means[::-1], sds[::-1]
    return means, sds


def plot_region_signal(ax, reg: RegionData, fasta=None, num_reads=None,
                       overplot_thresh=50, overplot_type="Downsample",
                       model=None, alt_model=None):
    """Per-read signal for a region on ``ax``.

    ``overplot_type`` selects the high-coverage rendering once more than
    ``overplot_thresh`` reads cover the region (reference:
    tombo/_option_parsers.py:343-346,649-652 and the R plot suites):
    ``Downsample`` overlays only the first ``overplot_thresh`` reads;
    ``Boxplot`` draws per-base boxplots of per-read base levels;
    ``Quantile`` draws 10/25/50/75/90-percentile bands; ``Density`` draws
    per-base violins of the base-level distribution.
    """
    reads = reg.reads[:num_reads] if num_reads else reg.reads
    summarize = (overplot_type != "Downsample" and
                 len(reads) > overplot_thresh)
    n_plotted = 0
    # per-base mean level per read, for the summary plot types
    base_levels: List[List[float]] = [
        [] for _ in range(reg.end - reg.start)]
    for r_data in reads:
        if not summarize and n_plotted >= overplot_thresh:
            break
        try:
            segs = _load_read_signal_segments(r_data, reg.start, reg.end)
        except (OSError, KeyError, TomboTpuError):
            continue
        if summarize:
            for g_pos, sig in segs:
                if sig.shape[0]:
                    base_levels[g_pos - reg.start].append(
                        float(np.mean(sig)))
            n_plotted += 1
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
    if summarize and any(base_levels):
        filled = [(i, lv) for i, lv in enumerate(base_levels) if lv]
        poss = [i + 0.5 for i, _ in filled]
        vals = [lv for _, lv in filled]
        if overplot_type == "Boxplot":
            ax.boxplot(vals, positions=poss, widths=0.7,
                       manage_ticks=False, showfliers=False)
        elif overplot_type == "Density":
            ax.violinplot(vals, positions=poss, widths=0.9,
                          showmedians=True, showextrema=False)
        else:  # Quantile
            qs = np.array([np.percentile(lv, (10, 25, 50, 75, 90))
                           for lv in vals])
            poss = np.asarray(poss)
            ax.fill_between(poss, qs[:, 0], qs[:, 4], alpha=0.25,
                            color="#1f77b4", lw=0)
            ax.fill_between(poss, qs[:, 1], qs[:, 3], alpha=0.45,
                            color="#1f77b4", lw=0)
            ax.plot(poss, qs[:, 2], color="#0a3d6e", lw=1.0)
    for mdl, is_alt, color in ((model, False, "#444444"),
                               (alt_model, True, "#b0226e")):
        if mdl is None or fasta is None:
            continue
        means, sds = _model_levels_for_region(mdl, fasta, reg, alt=is_alt)
        xs = np.arange(reg.end - reg.start) + 0.5
        ax.errorbar(xs, means, yerr=sds, fmt="_", ms=9, lw=0,
                    elinewidth=1.0, capsize=2, color=color, alpha=0.8,
                    label="alt model" if is_alt else "standard model")
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
                   num_reads=None, titles=None, overplot_thresh=50,
                   overplot_type="Downsample", model=None, alt_model=None):
    """One page per interval with overlaid signal."""
    import matplotlib.pyplot as plt
    with _new_pdf(pdf_fn) as pdf:
        for i, reg in enumerate(regions):
            fig, ax = plt.subplots(figsize=(10, 3.5))
            plot_region_signal(ax, reg, fasta, num_reads,
                               overplot_thresh, overplot_type,
                               model=model, alt_model=alt_model)
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
                         num_bases, deepest_coverage=False, rng=None):
    """Intervals centered on motif occurrences with coverage
    (reference: tombo/_plot_commands.py:1831-2000).

    Default picks a random sample of covered motif sites;
    ``deepest_coverage`` instead takes the highest-coverage sites
    (reference: tombo/_option_parsers.py:493-495 ``deepcov_opt``)."""
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
    if deepest_coverage:
        out.sort(key=lambda x: -x[0])
    else:
        (rng or np.random.default_rng(0)).shuffle(out)
    return [reg for _, reg in out[:num_regions]]


def plot_kmer_dist(reads_index, pdf_fn, kmer_width=2, num_reads=100,
                   read_mean=False, rng=None, num_kmer_threshold=1,
                   dont_plot=False, data_fn=None):
    """K-mer level distributions
    (reference: tombo/_plot_commands.py:451-560).

    ``num_kmer_threshold``: observations of each k-mer required to include
    a read in read-level averages.  ``data_fn``: dump the plotted levels
    as a pickle (the TPU build's substitute for the reference's
    ``--r-data-filename`` R workspace).  ``dont_plot`` produces only that
    data file."""
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
        if read_mean and num_kmer_threshold > 1 and any(
                len(v) < num_kmer_threshold for v in read_levels.values()):
            # reference requires every k-mer observed >= threshold times
            # to include a read in read-level averages
            continue
        for km, vals in read_levels.items():
            if len(vals) < num_kmer_threshold:
                continue
            levels.setdefault(km, []).extend(
                [float(np.mean(vals))] if read_mean else vals)
        n_parsed += 1
        if n_parsed >= num_reads:
            break
    if not levels:
        raise TomboTpuError("No valid reads for k-mer distribution plot.")
    if data_fn is not None:
        import pickle
        with open(data_fn, "wb") as fp:
            pickle.dump(levels, fp)
    if dont_plot:
        return
    kms = sorted(levels)
    fig, ax = plt.subplots(figsize=(max(6, len(kms) * 0.3), 4))
    ax.violinplot([levels[km] for km in kms], showmedians=True)
    ax.set_xticks(np.arange(1, len(kms) + 1))
    ax.set_xticklabels(kms, rotation=90, fontsize=6)
    ax.set_ylabel("Normalized signal level")
    fig.tight_layout()
    fig.savefig(pdf_fn)
    plt.close(fig)


def plot_per_read_stats(pr_stats, regions, pdf_fn, num_reads=50,
                        box_center=False):
    """Per-read statistic heatmaps over intervals
    (reference: tombo/_plot_commands.py:~900-1100 plot_per_read).

    ``box_center`` outlines the central base column (reference:
    tombo/_option_parsers.py:490-492 ``boxc_opt``)."""
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
            if box_center:
                from matplotlib.patches import Rectangle
                c = (reg.end - reg.start) // 2
                ax.add_patch(Rectangle(
                    (c - 0.5, -0.5), 1.0, mat.shape[0], fill=False,
                    edgecolor="black", lw=1.2))
            fig.colorbar(im, ax=ax, label="per-read statistic")
            ax.set_title("%s:%d-%d (%s)" % (
                reg.chrm, reg.start + 1, reg.end, reg.strand), fontsize=8)
            ax.set_xlabel("Position")
            ax.set_ylabel("Reads")
            fig.tight_layout()
            pdf.savefig(fig)
            plt.close(fig)


def plot_motif_with_stats(reads_index, fasta, motif, stats_fn, pdf_fn,
                          num_regions=10, num_context=5,
                          num_statistics=200, num_reads=50,
                          overplot_thresh=50,
                          overplot_type="Downsample",
                          model=None, alt_model=None):
    """Signal at the most significant motif-centered sites plus per-offset
    statistic distributions (reference:
    tombo/_plot_commands.py:2034-2130 ``plot_motif_centered_signif``).

    Signal panels show the top ``num_regions`` most-significant sites
    whose genomic context matches ``motif``; the final page boxplots the
    statistic across the top ``num_statistics`` motif sites at each base
    offset within motif +/- ``num_context``.
    """
    import matplotlib.pyplot as plt
    from ..output.text import load_stats_file
    from ..seq import rev_comp

    stats = load_stats_file(stats_fn)
    width = motif.motif_len + 2 * num_context

    def motif_site_start(chrm, pos, strand):
        """Motif-occurrence start if ``pos`` is the modified base of a
        motif match on ``strand``, else None."""
        if strand == "+":
            m_start = pos - (motif.mod_pos - 1)
            seq = fasta.get_seq(chrm, max(0, m_start),
                                m_start + motif.motif_len, error_end=False)
        else:
            m_start = pos - (motif.motif_len - motif.mod_pos)
            seq = rev_comp(fasta.get_seq(
                chrm, max(0, m_start), m_start + motif.motif_len,
                error_end=False))
        if m_start < 0 or len(seq) < motif.motif_len:
            return None
        return m_start if motif.motif_pat.match(seq) else None

    # most-significant sites that sit inside a motif occurrence
    motif_sites = []
    for pos_stat in stats.most_signif_stats:
        chrm = stats._get_chrm_name(pos_stat)
        strand = pos_stat["strand"].decode()
        pos = int(pos_stat["pos"])
        m_start = motif_site_start(chrm, pos, strand)
        if m_start is None:
            continue
        motif_sites.append((chrm, strand, pos, m_start))
        if len(motif_sites) >= num_statistics:
            break
    if not motif_sites:
        raise TomboTpuError(
            "No most-significant sites match the provided motif.")

    with _new_pdf(pdf_fn) as pdf:
        for chrm, strand, pos, m_start in motif_sites[:num_regions]:
            start = max(0, m_start - num_context)
            reg = RegionData(chrm, strand, start,
                             start + width).add_reads(reads_index)
            fig, ax = plt.subplots(figsize=(10, 3.5))
            plot_region_signal(ax, reg, fasta, num_reads,
                               overplot_thresh, overplot_type,
                               model=model, alt_model=alt_model)
            ax.set_ylabel("Normalized signal")
            fig.tight_layout()
            pdf.savefig(fig)
            plt.close(fig)

        # statistic-by-offset panel over all collected motif sites
        by_offset: Dict[int, List[float]] = {}
        for chrm, strand, pos, m_start in motif_sites:
            start = max(0, m_start - num_context)
            blk = stats.get_reg_stats(chrm, strand, start, start + width)
            if blk is None:
                continue
            slot = stats.stat_slot
            for rec in blk:
                off = int(rec["pos"]) - m_start
                if strand == "-":
                    off = motif.motif_len - 1 - off
                by_offset.setdefault(off, []).append(float(rec[slot]))
        if by_offset:
            offs = sorted(by_offset)
            fig, ax = plt.subplots(figsize=(10, 3.5))
            ax.boxplot([by_offset[o] for o in offs], positions=offs,
                       manage_ticks=False, showfliers=False)
            ax.axvspan(-0.5, motif.motif_len - 0.5, color="#ffdd55",
                       alpha=0.25)
            ax.set_xlabel("Offset from motif start (motif shaded)")
            ax.set_ylabel(stats.stat_slot)
            ax.set_title("%s (%d motif sites)" % (motif.raw_motif,
                                                  len(motif_sites)),
                         fontsize=9)
            fig.tight_layout()
            pdf.savefig(fig)
            plt.close(fig)


def cluster_most_significant(reads_index, ctrl_reads_index, stats_fn,
                             fasta, pdf_fn, num_regions=10, num_bases=21,
                             slide_span=0, data_fn=None):
    """Hierarchically cluster per-read level traces at significant sites
    (reference: tombo/_plot_commands.py:2122-2268).

    ``slide_span``: search +/- this many bases of offset per trace and
    align each trace to the region median trace at the offset minimizing
    its squared distance before clustering (the TPU analog of the
    reference's slide-span distance search,
    tombo/_option_parsers.py:332-335).  ``data_fn`` dumps the clustered
    matrices as a pickle (substitute for ``--r-data-filename``)."""
    import matplotlib.pyplot as plt
    from scipy.cluster import hierarchy
    from ..output.text import load_stats_file
    regions = load_stats_file(stats_fn).get_most_signif_regions(
        num_bases, num_regions)
    saved = {}
    with _new_pdf(pdf_fn) as pdf:
        for chrm, start, end, strand, _rid, txt in regions:
            traces = []
            ext = max(0, int(slide_span))
            for idx in (reads_index, ctrl_reads_index):
                if idx is None:
                    continue
                reg = RegionData(chrm, strand, max(0, start - ext),
                                 end + ext).add_reads(
                    idx, require_full_span=True)
                mat = reg.get_base_levels()
                traces.append(mat.T)
            if not traces:
                continue
            mat = np.concatenate(traces, axis=0)
            mat = mat[~np.isnan(mat).any(axis=1)]
            if ext > 0 and mat.shape[0] >= 3:
                # pick, per trace, the offset best matching the median
                # core trace, then trim every trace to the core window
                w = end - start
                med = np.nanmedian(mat[:, ext:ext + w], axis=0)
                aligned = np.empty((mat.shape[0], w))
                for i, row in enumerate(mat):
                    offs = [(float(np.sum((row[o:o + w] - med) ** 2)), o)
                            for o in range(2 * ext + 1)]
                    best = min(offs)[1]
                    aligned[i] = row[best:best + w]
                mat = aligned
            if mat.shape[0] < 3:
                continue
            link = hierarchy.linkage(mat, "ward")
            order = hierarchy.leaves_list(link)
            saved[txt] = mat[order]
            fig, ax = plt.subplots(figsize=(8, 4))
            im = ax.imshow(mat[order], aspect="auto", cmap="viridis")
            fig.colorbar(im, ax=ax, label="level")
            ax.set_title(txt, fontsize=8)
            fig.tight_layout()
            pdf.savefig(fig)
            plt.close(fig)
    if data_fn is not None:
        import pickle
        with open(data_fn, "wb") as fp:
            pickle.dump(saved, fp)
