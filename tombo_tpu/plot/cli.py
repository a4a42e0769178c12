"""``tombo-tpu plot`` subcommands (reference: tombo/__main__.py:104-147)."""
from __future__ import annotations

import numpy as np

from .. import config
from ..errors import TomboTpuError


def _reads_index(dirs, args):
    from ..io.index import ReadsIndex
    return ReadsIndex(dirs, args.corrected_group)


def _common(p, with_dirs=True):
    if with_dirs:
        p.add_argument("fast5_basedirs", nargs="+")
    p.add_argument("--corrected-group",
                   default=config.DEFAULT_CORRECTED_GROUP)
    p.add_argument("--pdf-filename", default="tombo_results.plot.pdf")
    p.add_argument("--num-regions", type=int, default=10)
    p.add_argument("--num-bases", type=int, default=21)
    p.add_argument("--num-reads", type=int, default=50)
    p.add_argument("--quiet", "-q", action="store_true")


def add_plot_parsers(subparsers):
    grp = subparsers.add_parser(
        "plot", help="Plot nanopore signal and testing results.")
    sub = grp.add_subparsers(dest="subcommand", required=True)

    # ------------------------------------------------ signal plots
    def _max_cov(args):
        from . import signal as psig
        idx = _reads_index(args.fast5_basedirs, args)
        regions = psig.select_max_coverage_regions(
            idx, args.num_regions, args.num_bases)
        for reg in regions:
            reg.add_reads(idx)
        from ..io.fasta import Fasta
        fasta = Fasta(args.genome_fasta) if args.genome_fasta else None
        psig.plot_intervals(regions, args.pdf_filename, fasta,
                            args.num_reads)
        return 0
    p = sub.add_parser("max_coverage",
                       help="Plot raw signal at maximal coverage.")
    _common(p)
    p.add_argument("--genome-fasta")
    p.set_defaults(func=_max_cov)

    def _genome_locs(args):
        from . import signal as psig
        from ..stats.region import RegionData
        idx = _reads_index(args.fast5_basedirs, args)
        regions = []
        for loc in args.genome_locations:
            parts = loc.split(":")
            chrm, pos = parts[0], int(parts[1].replace(",", "")) - 1
            strand = parts[2] if len(parts) > 2 else "+"
            start = max(0, pos - args.num_bases // 2)
            regions.append(RegionData(chrm, strand, start,
                                      start + args.num_bases).add_reads(idx))
        from ..io.fasta import Fasta
        fasta = Fasta(args.genome_fasta) if args.genome_fasta else None
        psig.plot_intervals(regions, args.pdf_filename, fasta,
                            args.num_reads)
        return 0
    p = sub.add_parser("genome_locations",
                       help="Plot raw signal at defined locations.")
    _common(p)
    p.add_argument("--genome-locations", nargs="+", required=True,
                   help="chrm:pos[:strand] (1-based)")
    p.add_argument("--genome-fasta")
    p.set_defaults(func=_genome_locs)

    def _motif_centered(args):
        from . import signal as psig
        from ..io.fasta import Fasta
        from ..seq import TomboMotif
        idx = _reads_index(args.fast5_basedirs, args)
        fasta = Fasta(args.genome_fasta)
        motif = TomboMotif(args.motif, 1)
        regions = psig.select_motif_regions(
            fasta, motif, idx, args.num_regions, args.num_bases)
        for reg in regions:
            reg.add_reads(idx)
        psig.plot_intervals(regions, args.pdf_filename, fasta,
                            args.num_reads)
        return 0
    p = sub.add_parser("motif_centered",
                       help="Plot raw signal at a specific motif.")
    _common(p)
    p.add_argument("--motif", required=True)
    p.add_argument("--genome-fasta", required=True)
    p.set_defaults(func=_motif_centered)

    def _max_diff(args):
        from . import signal as psig
        from ..output.text import get_chrm_sizes, iter_mean_slot_values
        from ..stats.region import RegionData
        idx = _reads_index(args.fast5_basedirs, args)
        ctrl = _reads_index(args.control_fast5_basedirs, args)
        chrm_sizes = get_chrm_sizes(idx, ctrl)
        diffs = []
        for chrm, strand, cs1, cs2 in iter_mean_slot_values(
                idx, chrm_sizes, "norm_mean", ctrl):
            if cs1 is None or cs2 is None:
                continue
            d = np.abs(cs1 - cs2)
            d[np.isnan(d)] = 0
            for pos in np.argsort(d)[::-1][:args.num_regions]:
                diffs.append((d[pos], chrm, strand, int(pos)))
        diffs.sort(reverse=True)
        regions = []
        for _, chrm, strand, pos in diffs[:args.num_regions]:
            start = max(0, pos - args.num_bases // 2)
            regions.append(RegionData(
                chrm, strand, start, start + args.num_bases).add_reads(idx))
        psig.plot_intervals(regions, args.pdf_filename, None,
                            args.num_reads)
        return 0
    p = sub.add_parser("max_difference",
                       help="Plot where signal differs most between "
                            "samples.")
    _common(p)
    p.add_argument("--control-fast5-basedirs", nargs="+", required=True)
    p.set_defaults(func=_max_diff)

    def _most_signif(args):
        from . import signal as psig
        from ..io.fasta import Fasta
        from ..output.text import load_stats_file
        from ..stats.region import RegionData
        idx = _reads_index(args.fast5_basedirs, args)
        fasta = (Fasta(args.genome_fasta) if args.genome_fasta else None)
        regions = []
        titles = []
        for chrm, start, end, strand, _rid, txt in load_stats_file(
                args.statistics_filename).get_most_signif_regions(
                    args.num_bases, args.num_regions):
            regions.append(RegionData(chrm, strand, start,
                                      end).add_reads(idx))
            titles.append("%s:%d-%d (%s) %s" % (chrm, start + 1, end,
                                                strand, txt))
        psig.plot_intervals(regions, args.pdf_filename, fasta,
                            args.num_reads, titles)
        return 0
    p = sub.add_parser("most_significant",
                       help="Plot raw signal at most modified locations.")
    _common(p)
    p.add_argument("--statistics-filename", required=True)
    p.add_argument("--genome-fasta")
    p.set_defaults(func=_most_signif)

    def _per_read(args):
        from . import signal as psig
        from ..stats.files import PerReadStats
        from ..stats.region import RegionData
        prs = PerReadStats(args.per_read_statistics_filename)
        regions = []
        for loc in args.genome_locations:
            parts = loc.split(":")
            chrm, pos = parts[0], int(parts[1].replace(",", "")) - 1
            strand = parts[2] if len(parts) > 2 else "+"
            start = max(0, pos - args.num_bases // 2)
            regions.append(RegionData(chrm, strand, start,
                                      start + args.num_bases))
        psig.plot_per_read_stats(prs, regions, args.pdf_filename,
                                 args.num_reads)
        return 0
    p = sub.add_parser("per_read",
                       help="Plot per-read modification statistics.")
    p.add_argument("--per-read-statistics-filename", required=True)
    p.add_argument("--genome-locations", nargs="+", required=True)
    p.add_argument("--pdf-filename", default="tombo_results.plot.pdf")
    p.add_argument("--num-bases", type=int, default=51)
    p.add_argument("--num-reads", type=int, default=100)
    p.add_argument("--corrected-group",
                   default=config.DEFAULT_CORRECTED_GROUP)
    p.add_argument("--quiet", "-q", action="store_true")
    p.set_defaults(func=_per_read)

    # -------------------------------------------------- accuracy plots
    def _roc_common(p, per_read=False):
        p.add_argument("--statistics-filenames", nargs="+", required=True)
        if per_read:
            p.add_argument("--per-read-statistics-filenames", nargs="+")
        p.add_argument("--motif-descriptions", nargs="+",
                       help='"motif:mod_pos:name[::...]" per stats file')
        p.add_argument("--modified-locations", nargs="+",
                       help='"mod_name:locs.bed" per stats file')
        p.add_argument("--unmodified-locations", nargs="+")
        p.add_argument("--genome-fasta")
        p.add_argument("--pdf-filename", default="tombo_results.roc.pdf")
        p.add_argument("--statistics-per-block", type=int, default=100000)
        p.add_argument("--total-statistics-limit", type=int,
                       default=5000000)
        p.add_argument("--quiet", "-q", action="store_true")

    def _gather_roc_stats(args, stats_objs):
        from . import accuracy as acc
        from ..io.fasta import Fasta
        from ..output.text import parse_motif_descs
        all_stats = {}
        if args.motif_descriptions:
            fasta = Fasta(args.genome_fasta)
            for stats, descs in zip(stats_objs, args.motif_descriptions):
                motif_descs = parse_motif_descs(descs)
                for mod_name, mod_stats in acc.compute_motif_stats(
                        stats, motif_descs, fasta,
                        args.statistics_per_block,
                        args.total_statistics_limit).items():
                    all_stats[mod_name] = mod_stats
        else:
            if not args.modified_locations:
                raise TomboTpuError(
                    "Must provide either motifs or bed files describing "
                    "ground truth modification locations.")
            from .accuracy import parse_locs_file
            for stats, mod_desc, unmod_fn in zip(
                    stats_objs, args.modified_locations,
                    args.unmodified_locations):
                mod_name, mod_fn = mod_desc.split(":")
                gt = (parse_locs_file(mod_fn), parse_locs_file(unmod_fn),
                      mod_name)
                from .accuracy import compute_ground_truth_stats
                all_stats.update(compute_ground_truth_stats(stats, gt))
        return all_stats

    def _roc(args):
        from . import accuracy as acc
        from ..output.text import load_stats_file
        stats_objs = [load_stats_file(fn)
                      for fn in args.statistics_filenames]
        all_stats = _gather_roc_stats(args, stats_objs)
        curves = acc.prep_accuracy_rates(all_stats,
                                         verbose=not args.quiet)
        acc.plot_roc_curves(curves, args.pdf_filename)
        return 0
    p = sub.add_parser("roc", help="Plot ROC curve from known motifs.")
    _roc_common(p)
    p.set_defaults(func=_roc)

    def _sample_compare_roc(args):
        # identical machinery applied to sample-compare statistics files
        return _roc(args)
    p = sub.add_parser("sample_compare_roc",
                       help="ROC comparing two samples at known motifs.")
    _roc_common(p)
    p.set_defaults(func=_sample_compare_roc)

    def _per_read_roc(args):
        from . import accuracy as acc
        from ..stats.files import PerReadStats
        fns = (args.per_read_statistics_filenames or
               args.statistics_filenames)
        stats_objs = []
        for fn in fns:
            prs = PerReadStats(fn)
            stats_objs.append(acc._PerReadStatsIterAdapter(
                prs, prs.are_pvals))
        all_stats = _gather_roc_stats(args, stats_objs)
        curves = acc.prep_accuracy_rates(all_stats,
                                         verbose=not args.quiet)
        acc.plot_roc_curves(curves, args.pdf_filename)
        return 0
    p = sub.add_parser("per_read_roc",
                       help="Per-read ROC from known motifs.")
    _roc_common(p, per_read=True)
    p.set_defaults(func=_per_read_roc)

    p = sub.add_parser("sample_compare_per_read_roc",
                       help="Per-read ROC comparing samples.")
    _roc_common(p, per_read=True)
    p.set_defaults(func=_per_read_roc)

    # ------------------------------------------------------ other plots
    def _kmer(args):
        from . import signal as psig
        idx = _reads_index(args.fast5_basedirs, args)
        psig.plot_kmer_dist(idx, args.pdf_filename, args.kmer_width,
                            args.num_reads, args.read_mean)
        return 0
    p = sub.add_parser("kmer", help="Plot signal across k-mers.")
    _common(p)
    p.add_argument("--kmer-width", type=int, default=2)
    p.add_argument("--read-mean", action="store_true")
    p.set_defaults(func=_kmer)

    def _cluster(args):
        from . import signal as psig
        from ..io.fasta import Fasta
        idx = _reads_index(args.fast5_basedirs, args)
        ctrl = (_reads_index(args.control_fast5_basedirs, args)
                if args.control_fast5_basedirs else None)
        psig.cluster_most_significant(
            idx, ctrl, args.statistics_filename,
            Fasta(args.genome_fasta) if args.genome_fasta else None,
            args.pdf_filename, args.num_regions, args.num_bases)
        return 0
    p = sub.add_parser("cluster_most_significant",
                       help="Cluster traces at most significant sites.")
    _common(p)
    p.add_argument("--statistics-filename", required=True)
    p.add_argument("--control-fast5-basedirs", nargs="+")
    p.add_argument("--genome-fasta")
    p.set_defaults(func=_cluster)

    def _motif_with_stats(args):
        from . import signal as psig
        from ..io.fasta import Fasta
        from ..seq import TomboMotif
        idx = _reads_index(args.fast5_basedirs, args)
        fasta = Fasta(args.genome_fasta)
        motif = TomboMotif(args.motif, 1)
        regions = psig.select_motif_regions(
            fasta, motif, idx, args.num_regions, args.num_bases)
        for reg in regions:
            reg.add_reads(idx)
        psig.plot_intervals(regions, args.pdf_filename, fasta,
                            args.num_reads)
        return 0
    p = sub.add_parser("motif_with_stats",
                       help="Plot signal and statistics around a motif.")
    _common(p)
    p.add_argument("--motif", required=True)
    p.add_argument("--genome-fasta", required=True)
    p.add_argument("--statistics-filename")
    p.set_defaults(func=_motif_with_stats)
