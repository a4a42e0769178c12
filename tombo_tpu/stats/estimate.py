"""K-mer model estimation: canonical, alternative (KDE) and motif models.

Behavioral port of the reference's model estimation
(reference: tombo/tombo_stats.py:1242-2190): per-region per-k-mer level
tabulation, Theil-Sen model centering to median normalization, kernel
density alternative-base isolation (quadratic density shift correction +
spectral subtraction) and motif-restricted alternative models.
"""
from __future__ import annotations

import io as _io
import re
from collections import defaultdict
from concurrent.futures import ThreadPoolExecutor
from typing import Dict, List, Optional, Tuple

import h5py
import numpy as np
from scipy import stats as sps

from .. import config
from ..errors import TomboTpuError
from ..io import fast5 as f5io
from ..io.model_io import AltModel, KmerModel, all_kmers
from ..pipeline import resquiggle as rsq
from ..seq import TomboMotif, rev_comp
from . import levels_cache
from .region import RegionData, load_read_levels

DNA_BASES = "ACGT"


def calc_med_sd(vals: np.ndarray) -> Tuple[float, float]:
    """(reference: tombo/tombo_stats.py:1236-1240)."""
    return float(np.median(vals)), float(np.std(vals))


def get_reads_events(levels_list) -> Optional[Dict[int, np.ndarray]]:
    """Per-genomic-position stacked base levels
    (reference: tombo/tombo_helper.py:2210-2256)."""
    poss, sigs = [], []
    for rl in levels_list:
        means = rl.means
        if means is None:
            continue
        r = rl.r_data
        if means.shape[0] != r.end - r.start:
            continue
        if r.strand == "-":
            means = means[::-1]
        sigs.append(means)
        poss.append(np.arange(r.start, r.end))
    if not sigs:
        return None
    chrm_pos = np.concatenate(poss)
    chrm_sig = np.concatenate(sigs)
    order = np.argsort(chrm_pos, kind="mergesort")
    chrm_pos = chrm_pos[order]
    chrm_sig = chrm_sig[order]
    splits = np.where(np.diff(chrm_pos) > 0)[0] + 1
    return dict(zip(chrm_pos[np.concatenate([[0], splits])],
                    np.split(chrm_sig, splits)))


def get_region_kmer_levels(reg_data: RegionData, fasta, cov_thresh,
                           upstrm_bases, dnstrm_bases, cs_cov_thresh,
                           est_mean, region_size, motif: Optional[
                               TomboMotif] = None, valid_poss=None,
                           rng: Optional[np.random.Generator] = None):
    """(reference: tombo/tombo_stats.py:1242-1360)."""
    reads = list(reg_data.reads)
    if cs_cov_thresh is not None:
        if rng is None:
            rng = np.random.default_rng()
        rng.shuffle(reads)
        thresh_bases = region_size * cs_cov_thresh
        cumm = np.cumsum([max(r.end, reg_data.end) -
                          min(r.start, reg_data.start) for r in reads])
        sel = np.argmax(cumm >= thresh_bases)
        if cumm.shape[0] and cumm[-1] >= thresh_bases:
            reads = reads[:max(int(sel), 1)]
        reg_data = RegionData(reg_data.chrm, reg_data.strand,
                              reg_data.start, reg_data.end, reads)
    base_events = get_reads_events(reg_data.load_levels())
    if not base_events:
        return None

    reg_cov = np.array([
        len(base_events[pos]) if pos in base_events else 0
        for pos in range(reg_data.start, reg_data.end)])
    cov_intervals = np.where(np.diff(np.concatenate(
        [[False], reg_cov > cov_thresh])))[0]
    if reg_cov[-1] > cov_thresh:
        cov_intervals = np.concatenate([cov_intervals, [region_size]])
    if cov_intervals.shape[0] <= 1:
        return None
    cov_intervals = cov_intervals.reshape(-1, 2)

    kmer_width = upstrm_bases + dnstrm_bases + 1
    if motif is None:
        reg_kmer_levels = {km: [] for km in all_kmers(kmer_width)}
    else:
        reg_kmer_levels = {
            (km, i_offset - 1): []
            for km in all_kmers(kmer_width)
            for i_offset in motif.find_mod_poss(km)}

    bb, ab = ((upstrm_bases, dnstrm_bases) if reg_data.strand == "+"
              else (dnstrm_bases, upstrm_bases))
    for cov_start, cov_end in cov_intervals:
        seq_start = reg_data.start + int(cov_start) - bb
        seq_end = reg_data.start + int(cov_end) + ab
        int_seq = fasta.get_seq(reg_data.chrm, max(0, seq_start), seq_end,
                                error_end=False)
        if seq_start < 0:
            int_seq = "N" * -seq_start + int_seq
        if len(int_seq) < seq_end - seq_start:
            int_seq += "N" * (seq_end - seq_start - len(int_seq))
        int_len = int(cov_end) - int(cov_start)

        if valid_poss is None and motif is None:
            int_poss = [(p, None) for p in range(int_len)]
        else:
            if valid_poss is not None:
                key = (reg_data.chrm, reg_data.strand)
                if key not in valid_poss:
                    continue
                reg_mod_poss = (np.asarray(valid_poss[key]) -
                                reg_data.start - int(cov_start))
                reg_mod_poss = reg_mod_poss[
                    (reg_mod_poss >= 0) & (reg_mod_poss < int_len)]
            elif reg_data.strand == "+":
                reg_mod_poss = [
                    m.start() + motif.mod_pos - 1 - bb
                    for m in motif.motif_pat.finditer(int_seq)
                    if 0 <= m.start() + motif.mod_pos - 1 - bb < int_len]
            else:
                reg_mod_poss = [
                    m.start() + motif.motif_len - motif.mod_pos - bb
                    for m in motif.rev_comp_pat.finditer(int_seq)
                    if 0 <= m.start() + motif.motif_len - motif.mod_pos - bb
                    < int_len]
            int_poss = [
                (mod_pos - i_offset + bb,
                 i_offset if reg_data.strand == "+"
                 else kmer_width - i_offset - 1)
                for mod_pos in reg_mod_poss
                for i_offset in range(kmer_width)
                if 0 <= mod_pos - i_offset + bb < int_len]

        for pos, offset in int_poss:
            pos_kmer = int_seq[pos:pos + kmer_width]
            if reg_data.strand == "-":
                pos_kmer = rev_comp(pos_kmer)
            key = pos_kmer if offset is None else (pos_kmer, offset)
            if key not in reg_kmer_levels:
                continue
            evts = base_events.get(
                pos + reg_data.start + int(cov_start))
            if evts is None:
                continue
            if est_mean:
                reg_kmer_levels[key].append(
                    (float(np.mean(evts)), float(np.std(evts))))
            else:
                reg_kmer_levels[key].append(calc_med_sd(evts))
    return reg_kmer_levels


# spawn-worker state for process-parallel k-mer level extraction (the
# reference fans the same tabulation out across processes,
# reference: tombo/tombo_stats.py:1361-1452; the per-site python loops
# are GIL-bound so a thread pool caps at ~1 core)
_EST_PROC_STATE: dict = {}


def _est_proc_init(reads_index, fasta, cov_thresh, upstrm_bases,
                   dnstrm_bases, cs_cov_thresh, est_mean, region_size,
                   motif, valid_poss):
    import os
    os.environ["JAX_PLATFORMS"] = "cpu"
    # read the sidecar, never mutate it from a worker
    os.environ["TOMBO_TPU_LEVELS_SIDECAR_WRITE"] = "0"
    _EST_PROC_STATE.update(
        reads_index=reads_index, fasta=fasta, cov_thresh=cov_thresh,
        upstrm_bases=upstrm_bases, dnstrm_bases=dnstrm_bases,
        cs_cov_thresh=cs_cov_thresh, est_mean=est_mean,
        region_size=region_size, motif=motif, valid_poss=valid_poss)


def _est_proc_run(reg_desc):
    s = _EST_PROC_STATE
    chrm, strand, start, end = reg_desc
    reg = RegionData(chrm, strand, start, end).add_reads(s["reads_index"])
    try:
        return get_region_kmer_levels(
            reg, s["fasta"], s["cov_thresh"], s["upstrm_bases"],
            s["dnstrm_bases"], s["cs_cov_thresh"], s["est_mean"],
            s["region_size"], s["motif"], s["valid_poss"],
            np.random.default_rng(0))
    except TomboTpuError:
        return None


def extract_kmer_levels(reads_index, fasta, region_size, cov_thresh,
                        upstrm_bases, dnstrm_bases, cs_cov_thresh,
                        est_mean=False, num_processes=4, motif=None,
                        valid_poss=None, rng=None):
    """(reference: tombo/tombo_stats.py:1361-1452).

    Large runs fan regions out over spawned worker processes (the
    per-site tabulation loops are GIL-bound); small runs keep the
    thread pool (spawn startup would dominate)."""
    import os
    regions = [RegionData(chrm, strand, start, start + region_size)
               for chrm, strand, start in reads_index.iter_cov_regs(
                   cov_thresh, region_size)]
    for reg in regions:
        reg.add_reads(reads_index)

    # device lane: per-site median/std over stacked levels in one
    # packed dispatch per region chunk (stats/estimate_device.py);
    # motif / valid-position variants keep the host lane
    from . import estimate_device as est_dev
    if est_dev.enabled() and motif is None and valid_poss is None:
        with levels_cache.building():
            return est_dev.get_region_kmer_levels_device(
                regions, fasta, cov_thresh, upstrm_bases, dnstrm_bases,
                cs_cov_thresh, est_mean, region_size, rng=rng)

    procs_env = os.environ.get("TOMBO_TPU_EST_PROCS", "auto")
    if procs_env == "auto":
        total_bases = sum(r.end - r.start
                          for reg in regions for r in reg.reads)
        procs_worth = total_bases >= 20_000_000
    else:
        procs_worth = procs_env == "1"
    if (procs_worth and num_processes > 1 and
            len(regions) >= 2 * num_processes):
        import multiprocessing as mp
        from concurrent.futures import ProcessPoolExecutor
        ppool = ProcessPoolExecutor(
            max_workers=num_processes,
            mp_context=mp.get_context("spawn"),
            initializer=_est_proc_init,
            initargs=(reads_index, fasta, cov_thresh, upstrm_bases,
                      dnstrm_bases, cs_cov_thresh, est_mean, region_size,
                      motif, valid_poss))
        try:
            out = list(ppool.map(
                _est_proc_run,
                [(r.chrm, r.strand, r.start, r.end) for r in regions],
                chunksize=2))
        finally:
            ppool.shutdown()
        return [r for r in out if r is not None]

    def one(reg):
        return get_region_kmer_levels(
            reg, fasta, cov_thresh, upstrm_bases, dnstrm_bases,
            cs_cov_thresh, est_mean, region_size, motif, valid_poss, rng)

    # cache misses populate the per-directory levels sidecar, so a
    # subsequent detection (or estimation) pass over the same reads
    # skips HDF5 entirely (stats/levels_cache.py)
    with levels_cache.building(), ThreadPoolExecutor(num_processes) as pool:
        out = list(pool.map(one, regions))
    return [r for r in out if r is not None]


def _tabulate(all_reg_kmer_levels, min_kmer_obs, keys, key_name):
    all_kmer_mean_sds = []
    for key in keys:
        levels = [reg_levels[key] for reg_levels in all_reg_kmer_levels
                  if len(reg_levels[key]) > 0]
        if not levels:
            raise TomboTpuError(
                "At least one %s is not covered at any positions by "
                "--minimum-test-reads." % key_name)
        kmer_levels = np.concatenate(levels)
        if kmer_levels.shape[0] < min_kmer_obs:
            raise TomboTpuError(
                "K-mers represented in fewer observations than requested "
                "in the provided reads. Consider a shorter k-mer or "
                "providing more reads. %d observations found in least "
                "common kmer." % kmer_levels.shape[0])
        out_key = key if isinstance(key, tuple) else (key,)
        all_kmer_mean_sds.append(
            out_key + (float(np.median(kmer_levels[:, 0])),
                       float(np.median(kmer_levels[:, 1]))))
    return all_kmer_mean_sds


def tabulate_kmer_levels(all_reg_kmer_levels, min_kmer_obs):
    """(reference: tombo/tombo_stats.py:1454-1500)."""
    kmer_width = len(next(iter(all_reg_kmer_levels[0].keys())))
    return _tabulate(all_reg_kmer_levels, min_kmer_obs,
                     all_kmers(kmer_width), "k-mer")


def tabulate_mod_kmer_levels(all_reg_kmer_levels, min_kmer_obs, motif):
    """(reference: tombo/tombo_stats.py:2110-2158)."""
    kmer_width = len(next(iter(all_reg_kmer_levels[0].keys()))[0])
    keys = [(km, offset - 1) for km in all_kmers(kmer_width)
            for offset in motif.find_mod_poss(km)]
    return _tabulate(all_reg_kmer_levels, min_kmer_obs, keys,
                     "modified k-mer")


def center_model_to_median_norm(reads_index, init_ref: KmerModel,
                                max_reads=config.NUM_READS_TO_ADJUST_MODEL):
    """Median Theil-Sen shift/scale correction over re-normalized reads
    (reference: tombo/tombo_stats.py:1599-1704)."""
    upstrm = init_ref.central_pos
    dnstrm = init_ref.kmer_width - init_ref.central_pos - 1

    def get_read_corr_factors(r_data):
        with h5py.File(r_data.fn, "r") as fp:
            raw = f5io.get_raw_signal(fp)
            events = fp["/Analyses/" + r_data.corr_group + "/Events"]
            event_starts = events["start"][:].astype(np.int64)
            r_seq = b"".join(events["base"][:]).decode()
        if r_data.rna:
            raw = raw[::-1]
            if config.USE_RNA_EVENT_SCALE:
                params = config.load_resquiggle_parameters(
                    config.RNA_SAMP_TYPE)
                num_events = rsq.compute_num_events(
                    raw.shape[0], r_data.end - r_data.start,
                    params.mean_obs_per_event,
                    config.MIN_EVENT_TO_SEQ_RATIO)
                valid_cpts = rsq.valid_cpts_w_cap_t_test(
                    raw.astype(np.float64), params.min_obs_per_base,
                    params.running_stat_width, num_events)
                if config.COLLAPSE_RNA_STALLS:
                    valid_cpts = rsq.remove_stall_cpts(
                        rsq.identify_stalls(raw,
                                            config.DEFAULT_STALL_PARAMS),
                        valid_cpts)
                sv = rsq.get_scale_values_from_events(
                    raw, valid_cpts, config.OUTLIER_THRESH,
                    num_events=config.RNA_SCALE_NUM_EVENTS,
                    max_frac_events=config.RNA_SCALE_MAX_FRAC_EVENTS)
                norm_signal, scale_values = rsq.normalize_raw_signal(
                    raw, scale_values=sv)
            else:
                norm_signal, scale_values = rsq.normalize_raw_signal(raw)
        else:
            norm_signal, scale_values = rsq.normalize_raw_signal(raw)

        rsrtr = r_data.read_start_rel_to_raw + event_starts[upstrm]
        if dnstrm > 1:
            event_starts = event_starts[upstrm:-(dnstrm - 1)]
        else:
            event_starts = event_starts[upstrm:]
        event_starts = event_starts - event_starts[0]
        norm_signal = norm_signal[rsrtr:rsrtr + event_starts[-1]]
        r_ref_means, _ = init_ref.get_exp_levels_from_seq(r_seq)
        from ..ops import ref_impl
        (_, _, shift_corr, scale_corr) = rsq.calc_kmer_fitted_shift_scale(
            scale_values.shift, scale_values.scale,
            ref_impl.new_means(norm_signal, event_starts), r_ref_means,
            method="theil_sen")
        return shift_corr, scale_corr

    all_shift, all_scale = [], []
    all_reads = list(reads_index.iter_reads())
    np.random.default_rng(0).shuffle(all_reads)
    for r_data in all_reads:
        try:
            sc, cc = get_read_corr_factors(r_data)
            all_shift.append(sc)
            all_scale.append(cc)
            if len(all_shift) >= max_reads:
                break
        except Exception:
            continue
    if not all_shift:
        raise TomboTpuError(
            "No reads successfully processed for sequence-based "
            "normalization parameter re-fitting.")
    return init_ref.center_model(float(np.median(all_shift)),
                                 float(np.median(all_scale)))


def estimate_kmer_model(reads_index, fasta, cov_thresh, upstrm_bases,
                        dnstrm_bases, min_kmer_obs, kmer_specific_sd,
                        cs_cov_thresh, est_mean=False,
                        region_size=config.DEFAULT_REGION_SIZE,
                        num_processes=4) -> KmerModel:
    """(reference: tombo/tombo_stats.py:1716-1740)."""
    all_reg_kmer_levels = extract_kmer_levels(
        reads_index, fasta, region_size, cov_thresh, upstrm_bases,
        dnstrm_bases, cs_cov_thresh, est_mean, num_processes)
    if not all_reg_kmer_levels:
        raise TomboTpuError("No regions contain enough coverage for "
                            "model estimation.")
    mean_sds = tabulate_kmer_levels(all_reg_kmer_levels, min_kmer_obs)
    init_ref = KmerModel.from_kmer_ref(mean_sds, upstrm_bases)
    centered = center_model_to_median_norm(reads_index, init_ref)
    if not kmer_specific_sd:
        centered = centered.make_constant_sd()
    return centered


# --------------------------------------------------------------------------
# Alternative model estimation via kernel densities
# (reference: tombo/tombo_stats.py:1811-2108)
# --------------------------------------------------------------------------

def parse_base_levels(all_reads, std_ref: KmerModel, kmer_obs_thresh,
                      max_kmer_obs, min_kmer_obs_to_est):
    """Accumulate per-k-mer level observations from reads until every
    k-mer reaches the requested observation count
    (reference: tombo/tombo_stats.py:1811-1884)."""
    k = std_ref.kmer_width
    central = std_ref.central_pos
    dnstrm = k - central - 1
    levels: Dict[str, List[float]] = {km: [] for km in all_kmers(k)}
    completed = set()
    for r_data in all_reads:
        try:
            # through the LRU + per-directory sidecar (stats/region.py):
            # warm alt-estimation runs never open HDF5
            rl = load_read_levels(r_data, with_seq=True)
            r_means, r_seq = rl.means, rl.seq
        except (OSError, KeyError, TomboTpuError):
            continue
        for i, level in enumerate(r_means[central:-dnstrm]):
            km = r_seq[i:i + k]
            if km in completed or km not in levels:
                continue
            levels[km].append(float(level))
            if len(levels[km]) > max_kmer_obs:
                completed.add(km)
        if len(completed) == len(levels):
            break
        if min(len(v) for v in levels.values()) > kmer_obs_thresh:
            break
    fewest = min(len(v) for v in levels.values())
    if fewest < kmer_obs_thresh and fewest < min_kmer_obs_to_est:
        raise TomboTpuError(
            "Too few minimal k-mer observations to continue to "
            "alternative estimation. Minimal k-mer has %d total "
            "observations and %d observations per k-mer are required."
            % (fewest, min_kmer_obs_to_est))
    return levels


def est_kernel_density(reads_index, std_ref, kmer_obs_thresh,
                       density_basename, save_x, kernel_dens_bw,
                       alt_or_stnd_name="alt",
                       max_kmer_obs=config.MAX_KMER_OBS,
                       min_kmer_obs_to_est=config.MIN_KMER_OBS_TO_EST,
                       rng=None):
    """(reference: tombo/tombo_stats.py:1916-1944)."""
    all_reads = list(reads_index.iter_reads())
    (rng or np.random.default_rng(0)).shuffle(all_reads)
    with levels_cache.building():
        base_levels = parse_base_levels(
            all_reads, std_ref, kmer_obs_thresh, max_kmer_obs,
            min_kmer_obs_to_est)
    kmer_dens = {}
    for km, norm_levels in base_levels.items():
        norm_levels = np.array(norm_levels)
        kde = sps.gaussian_kde(
            norm_levels,
            bw_method=kernel_dens_bw / norm_levels.std(ddof=1))
        with np.errstate(under="ignore"):
            kmer_dens[km] = kde.evaluate(save_x)
    if density_basename is not None:
        write_kmer_densities_file(
            density_basename + "." + alt_or_stnd_name + "_density.txt",
            kmer_dens, save_x)
    return kmer_dens


def write_kmer_densities_file(dens_fn, kmer_dens, save_x):
    """(reference: tombo/tombo_stats.py:1886-1893)."""
    with _io.open(dens_fn, "wt") as fp:
        fp.write("Kmer\tSignal\tDensity\n")
        fp.write("\n".join(
            "\t".join(map(str, (km, x, y)))
            for km, dens in kmer_dens.items()
            for x, y in zip(save_x, dens)) + "\n")


def parse_kmer_densities_file(dens_fn):
    """(reference: tombo/tombo_stats.py:1895-1914)."""
    raw = defaultdict(list)
    with _io.open(dens_fn) as fp:
        fp.readline()
        for line in fp:
            km, _, dens_i = line.split()
            raw[km].append(float(dens_i))
    out = {}
    first_len = None
    for km, dens in raw.items():
        if first_len is None:
            first_len = len(dens)
        if len(dens) != first_len:
            raise TomboTpuError("Density file is not valid.")
        out[km] = np.array(dens)
    return out


def isolate_alt_density(alt_dens, std_dens, alt_base, alt_frac_pctl,
                        std_ref: KmerModel, save_x) -> AltModel:
    """Quadratic density-shift correction + spectral subtraction
    (reference: tombo/tombo_stats.py:1991-2072)."""
    def calc_mean(dens):
        sel = dens > 1e-10
        return np.average(save_x[sel], weights=dens[sel])

    no_alt_means, no_alt_diffs = [], []
    for km in std_dens:
        if alt_base in km:
            continue
        m = calc_mean(std_dens[km])
        no_alt_means.append(m)
        no_alt_diffs.append(calc_mean(alt_dens[km]) - m)
    calc_offset = np.poly1d(np.polyfit(no_alt_means, no_alt_diffs, 2))
    unit = save_x[1] - save_x[0]

    shifted_alt_dens = {}
    for km, kad in alt_dens.items():
        est_offset = int(calc_offset(calc_mean(std_dens[km])) / unit)
        if est_offset < 0:
            shifted_alt_dens[km] = np.concatenate(
                [[0.0] * -est_offset, kad[:est_offset]])
        else:
            shifted_alt_dens[km] = np.concatenate(
                [kad[est_offset:], [0.0] * est_offset])

    def get_peak_frac(ksd, kad):
        std_peak = np.argmax(ksd)
        local_peaks = np.where(np.concatenate([
            [False], (kad[1:-1] > kad[:-2]) & (kad[1:-1] > kad[2:]),
            [False]]))[0]
        if local_peaks.shape[0] == 0:
            return 1.0
        matched = local_peaks[np.argmin(np.abs(local_peaks - std_peak))]
        return kad[matched] / ksd[std_peak]

    std_frac = np.percentile([
        get_peak_frac(std_dens[km], shifted_alt_dens[km])
        for km in std_dens if km.count(alt_base) == 1], alt_frac_pctl)

    model_sd = float(np.nanmean(std_ref.sds))
    alt_ref_entries = []
    kmers = all_kmers(std_ref.kmer_width)
    for code, km in enumerate(kmers):
        n_alt = km.count(alt_base)
        if n_alt == 0:
            continue
        kmer_std_frac = std_frac ** n_alt
        with np.errstate(under="ignore"):
            diff_dens = shifted_alt_dens[km] - std_dens[km] * kmer_std_frac
            diff_dens[diff_dens < 0] = 0
            alt_level = float(np.average(save_x, weights=diff_dens))
        for m in re.finditer(alt_base, km):
            alt_ref_entries.append((km, m.start(), alt_level, model_sd))
    return AltModel.from_kmer_ref(alt_ref_entries, std_ref.central_pos,
                                  alt_base)


def estimate_alt_model(reads_index, ctrl_reads_index, std_ref: KmerModel,
                       alt_base, alt_frac_pctl, kmer_obs_thresh,
                       density_basename=None, kernel_dens_bw=0.05,
                       alt_dens_fn=None, std_dens_fn=None,
                       num_dens_points=config.NUM_DENS_POINTS) -> AltModel:
    """(reference: tombo/tombo_stats.py:2073-2106)."""
    if alt_dens_fn is None or std_dens_fn is None:
        save_x = np.linspace(config.KERNEL_DENSITY_RANGE[0],
                             config.KERNEL_DENSITY_RANGE[1],
                             num_dens_points)
        alt_dens = est_kernel_density(
            reads_index, std_ref, kmer_obs_thresh, density_basename,
            save_x, kernel_dens_bw, "alternate")
        std_dens = est_kernel_density(
            ctrl_reads_index, std_ref, kmer_obs_thresh, density_basename,
            save_x, kernel_dens_bw, "control")
    else:
        alt_dens = parse_kmer_densities_file(alt_dens_fn)
        std_dens = parse_kmer_densities_file(std_dens_fn)
        n_pts = next(iter(alt_dens.values())).shape[0]
        if n_pts != next(iter(std_dens.values())).shape[0]:
            raise TomboTpuError("Alternative and standard density "
                                "estimates do not correspond.")
        save_x = np.linspace(config.KERNEL_DENSITY_RANGE[0],
                             config.KERNEL_DENSITY_RANGE[1], n_pts)
    return isolate_alt_density(alt_dens, std_dens, alt_base,
                               alt_frac_pctl, std_ref, save_x)


def estimate_motif_alt_model(reads_index, fasta, motif_desc, upstrm_bases,
                             dnstrm_bases, min_kmer_obs, cov_thresh,
                             cs_cov_thresh, valid_poss=None,
                             region_size=config.DEFAULT_REGION_SIZE,
                             num_processes=4) -> AltModel:
    """(reference: tombo/tombo_stats.py:2160-2189)."""
    try:
        raw_motif, mod_pos = motif_desc.split(":")
    except ValueError:
        raise TomboTpuError("Invalid motif description format.")
    motif = TomboMotif(raw_motif, int(mod_pos))
    all_reg_kmer_levels = extract_kmer_levels(
        reads_index, fasta, region_size, cov_thresh, upstrm_bases,
        dnstrm_bases, cs_cov_thresh, False, num_processes, motif,
        valid_poss)
    if not all_reg_kmer_levels:
        raise TomboTpuError("No regions contain enough coverage for "
                            "model estimation.")
    mean_sds = tabulate_mod_kmer_levels(all_reg_kmer_levels, min_kmer_obs,
                                        motif)
    alt_ref = AltModel.from_kmer_ref(
        mean_sds, upstrm_bases, motif.mod_base, motif=motif)
    return alt_ref.make_constant_sd()
