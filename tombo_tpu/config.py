"""Typed configuration tree with every tuned constant of the reference.

This is the TPU-native equivalent of the reference's flat constants module
(reference: tombo/_default_parameters.py:1-202).  All science constants keep
their reference values so outputs are comparable; they are organized as frozen
dataclasses so a full run configuration can be serialized next to outputs for
reproducibility (SURVEY.md §5.6).
"""
from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from typing import Optional, Tuple

DNA_SAMP_TYPE = "DNA"
RNA_SAMP_TYPE = "RNA"

# Bundled k-mer model registry (reference: tombo/_default_parameters.py:11-22).
STANDARD_MODELS = {
    DNA_SAMP_TYPE: "tombo.DNA.model.npz",
    RNA_SAMP_TYPE: "tombo.RNA.180mV.model.npz",
}
ALTERNATE_MODELS = {
    DNA_SAMP_TYPE + "_5mC": "tombo.DNA.5mC.model.npz",
    DNA_SAMP_TYPE + "_6mA": "tombo.DNA.6mA.model.npz",
    DNA_SAMP_TYPE + "_dcm": "tombo.DNA.dcm.model.npz",
    DNA_SAMP_TYPE + "_dam": "tombo.DNA.dam.model.npz",
    DNA_SAMP_TYPE + "_CpG": "tombo.DNA.CpG.model.npz",
    RNA_SAMP_TYPE + "_5mC": "tombo.RNA.5mC.model.npz",
}


@dataclass(frozen=True)
class SegParams:
    """Segmentation (event detection) parameters.

    Reference: tombo/_default_parameters.py:34-37 ``SEG_PARAMS_TABLE``.
    """

    running_stat_width: int
    min_obs_per_base: int
    raw_min_obs_per_base: int
    mean_obs_per_event: int


SEG_PARAMS_TABLE = {
    RNA_SAMP_TYPE: SegParams(12, 6, 2, 15),
    DNA_SAMP_TYPE: SegParams(5, 3, 1, 5),
}


@dataclass(frozen=True)
class AlignParams:
    """Signal-to-sequence alignment parameters.

    Reference: tombo/_default_parameters.py:50-53 ``ALGN_PARAMS_TABLE``.
    """

    match_evalue: float
    skip_pen: float
    bandwidth: int
    save_bandwidth: int
    max_half_z_score: Optional[float]
    band_bound_thresh: int
    start_bw: int
    start_save_bw: int
    start_n_bases: int


ALGN_PARAMS_TABLE = {
    RNA_SAMP_TYPE: AlignParams(6, 4, 500, 1500, 20.0, 50, 1000, 3000, 250),
    DNA_SAMP_TYPE: AlignParams(4.2, 4.2, 300, 1500, 20.0, 40, 750, 2500, 250),
}

# Signal-matching score filter thresholds
# (reference: tombo/_default_parameters.py:57-60).
SIG_MATCH_THRESH = {RNA_SAMP_TYPE: 2.0, DNA_SAMP_TYPE: 1.1}

# Outlier signal winsorizing threshold (reference: _default_parameters.py:63).
OUTLIER_THRESH = 5.0

# Skipped-base (deletion) resolution constants
# (reference: _default_parameters.py:67-75).
EXTRA_SIG_FACTOR = 1.1
DEL_FIX_WINDOW = 2
MAX_DEL_FIX_WINDOW = 10
MAX_RAW_CPTS = 200
MIN_EVENT_TO_SEQ_RATIO = 1.1

# Start-of-read masking for the adaptive DP
# (reference: _default_parameters.py:69-70).
MASK_BASES = 50
MASK_FILL_Z_SCORE = -15.0

# RNA event-based scaling (reference: _default_parameters.py:78-80).
USE_RNA_EVENT_SCALE = True
RNA_SCALE_NUM_EVENTS = 10000
RNA_SCALE_MAX_FRAC_EVENTS = 0.75

# Stall collapsing (reference: _default_parameters.py:84-97).
COLLAPSE_RNA_STALLS = True
COLLAPSE_DNA_STALLS = False


@dataclass(frozen=True)
class StallParams:
    """RNA stall identification parameters.

    Reference: tombo/_default_parameters.py:89-97 (mean-window method is the
    default, ``STALL_PARAMS = MEAN_STALL_PARAMS``).
    """

    window_size: int
    threshold: float
    edge_buffer: int
    min_consecutive_obs: int
    # mean-windows method
    n_windows: Optional[int] = None
    mini_window_size: Optional[int] = None
    # percentile method
    lower_pctl: Optional[float] = None
    upper_pctl: Optional[float] = None


MEAN_STALL_PARAMS = StallParams(
    window_size=7 * 50, threshold=40, edge_buffer=100,
    min_consecutive_obs=200, n_windows=7, mini_window_size=50)
PCTL_STALL_PARAMS = StallParams(
    window_size=400, threshold=100, edge_buffer=50,
    min_consecutive_obs=200, lower_pctl=5, upper_pctl=95)
DEFAULT_STALL_PARAMS = MEAN_STALL_PARAMS


@dataclass(frozen=True)
class StartClipParams:
    """Read-start discovery from mapping-clipped basecalls.

    Reference: tombo/_default_parameters.py:100 ``START_CLIP_PARAMS``.
    """

    bandwidth: int = 1000
    num_genome_bases: int = 200


START_CLIP_PARAMS = StartClipParams()

# Whether to use clipped basecalls for read-start discovery; the reference
# hard-codes this off (reference: tombo/resquiggle.py:80 USE_START_CLIP_BASES).
USE_START_CLIP_BASES = False


@dataclass(frozen=True)
class TrimRnaParams:
    """RNA adapter trimming (off by default, as in the reference).

    Reference: tombo/tombo_stats.py:121-123.
    """

    moving_window_size: int = 50
    min_running_values: int = 100
    thresh_scale: float = 0.7
    max_raw_obs: int = 40000


DEFAULT_TRIM_RNA_PARAMS = TrimRnaParams()

# Per-read testing thresholds (reference: _default_parameters.py:107-118).
LLR_THRESH = {DNA_SAMP_TYPE: (-1.5, 2.5), RNA_SAMP_TYPE: (-2.5, 2.5)}
SAMP_COMP_THRESH = {DNA_SAMP_TYPE: (0.15, 0.5), RNA_SAMP_TYPE: (0.05, 0.4)}
DE_NOVO_THRESH = {DNA_SAMP_TYPE: (0.15, 0.5), RNA_SAMP_TYPE: (0.05, 0.4)}

# Outlier-robust scaled log-likelihood-ratio parameters
# (reference: _default_parameters.py:132-134).
OCLLHR_SCALE = 4.0
OCLLHR_HEIGHT = 1.0
OCLLHR_POWER = 0.2

# Fisher's method window offset (reference: _default_parameters.py:136).
FM_OFFSET_DEFAULT = 1

# Posterior estimation priors for control-sample reference means
# (reference: _default_parameters.py:139-140).
MEAN_PRIOR_CONST = 5.0
SD_PRIOR_CONST = 40.0

# Model estimation (reference: _default_parameters.py:147-152).
ALT_EST_BATCH = 1000
MAX_KMER_OBS = 10000
MIN_KMER_OBS_TO_EST = 50
KERNEL_DENSITY_RANGE = (-5, 5)
ALT_EST_PCTL = 5

# Misc (reference: _default_parameters.py:158-197).
SMALLEST_PVAL = 1e-50
ROBUST_QUANTS = (46.5, 53.5)
NUM_DENS_POINTS = 500
NUM_READS_FOR_SCALE = 1000
SHIFT_CHANGE_THRESH = 0.1
SCALE_CHANGE_THRESH = 0.1
MAX_SCALING_ITERS = 3
NUM_READS_TO_ADJUST_MODEL = 5000
MAX_POINTS_FOR_THEIL_SEN = 1000
ROC_PLOT_POINTS = 1000
PHRED_BASE = 33
NANOPOLISH_CENTRAL_POS = 2
COV_DAMP_COUNTS = (2.0, 0.0)
MOST_SIGNIF_NUM_BATCHES_DEFAULT = 10
PLOT_PVAL_MAX, PLOT_LLR_MAX = 4, 4

# Assume constant SD in the canonical model (reference: tombo_stats.py:112).
CONST_SD_MODEL = True

# E[|Z|] for Z ~ N(0,1): half-normal expected value used to derive the DP
# z-shift (reference: tombo_stats.py:97 HALF_NORM_EXPECTED_VAL).
HALF_NORM_EXPECTED_VAL = 0.7978845608028654

# Genome-block size for region-parallel statistics passes
# (reference: tombo/_option_parsers.py:290-291 --multiprocess-region-size).
DEFAULT_REGION_SIZE = 10000

# Default HDF5 group names (reference: tombo/_option_parsers.py:100-101).
DEFAULT_CORRECTED_GROUP = "RawGenomeCorrected_000"
DEFAULT_BASECALL_GROUP = "Basecall_1D_000"
DEFAULT_BASECALL_SUBGROUP = "BaseCalled_template"


@dataclass(frozen=True)
class ResquiggleParams:
    """Fully-derived re-squiggle parameter bundle.

    The TPU equivalent of the reference's ``resquiggleParams`` namedtuple
    (reference: tombo/tombo_helper.py:174-199) as assembled by
    ``load_resquiggle_parameters`` (reference: tombo/tombo_stats.py:1505-1556).
    """

    match_evalue: float
    skip_pen: float
    bandwidth: int
    max_half_z_score: Optional[float]
    running_stat_width: int
    min_obs_per_base: int
    raw_min_obs_per_base: int
    mean_obs_per_event: int
    z_shift: float
    stay_pen: float
    use_t_test_seg: bool
    band_bound_thresh: int
    start_bw: int
    start_save_bw: int
    start_n_bases: int

    def replace(self, **kw) -> "ResquiggleParams":
        return dataclasses.replace(self, **kw)


def get_dynamic_prog_params(match_evalue: float) -> Tuple[float, float]:
    """Derive (z_shift, stay_pen) from the expected match e-value.

    Reference: tombo/tombo_stats.py:2364-2370 ``get_dynamic_prog_params``.
    """
    z_shift = HALF_NORM_EXPECTED_VAL + match_evalue
    stay_pen = match_evalue
    return z_shift, stay_pen


def load_resquiggle_parameters(
        seq_samp_type: str,
        sig_aln_params: Optional[Tuple] = None,
        seg_params: Optional[Tuple] = None,
        use_save_bandwidth: bool = False) -> ResquiggleParams:
    """Assemble the derived re-squiggle parameter bundle for a sample type.

    Reference: tombo/tombo_stats.py:1505-1556 ``load_resquiggle_parameters``.
    """
    if sig_aln_params is None:
        ap = ALGN_PARAMS_TABLE[seq_samp_type]
    else:
        (match_evalue, skip_pen, bandwidth, save_bandwidth, max_half_z_score,
         band_bound_thresh, start_bw, start_save_bw, start_n_bases) = \
            sig_aln_params
        ap = AlignParams(
            float(match_evalue), float(skip_pen), int(bandwidth),
            int(save_bandwidth), float(max_half_z_score),
            int(band_bound_thresh), int(start_bw), int(start_save_bw),
            int(start_n_bases))
    bandwidth = ap.save_bandwidth if use_save_bandwidth else ap.bandwidth

    if seg_params is None:
        sp = SEG_PARAMS_TABLE[seq_samp_type]
    else:
        sp = SegParams(*map(int, seg_params))

    z_shift, stay_pen = get_dynamic_prog_params(ap.match_evalue)

    return ResquiggleParams(
        match_evalue=ap.match_evalue, skip_pen=ap.skip_pen,
        bandwidth=bandwidth, max_half_z_score=ap.max_half_z_score,
        running_stat_width=sp.running_stat_width,
        min_obs_per_base=sp.min_obs_per_base,
        raw_min_obs_per_base=sp.raw_min_obs_per_base,
        mean_obs_per_event=sp.mean_obs_per_event,
        z_shift=z_shift, stay_pen=stay_pen,
        use_t_test_seg=seq_samp_type == RNA_SAMP_TYPE,
        band_bound_thresh=ap.band_bound_thresh,
        start_bw=ap.start_bw, start_save_bw=ap.start_save_bw,
        start_n_bases=ap.start_n_bases)


def resolved_params_json(rsqgl_params=None, **extra) -> str:
    """Serialize the fully-resolved parameter set to JSON for output
    provenance: stored in corrected FAST5 groups and stats files so every
    artifact records the exact configuration that produced it (SURVEY
    §5.6 TPU-equivalent of the reference's advanced-args reproducibility
    gap)."""
    import dataclasses
    import json

    import numpy as np

    def to_plain(v):
        if dataclasses.is_dataclass(v) and not isinstance(v, type):
            return {k: to_plain(x)
                    for k, x in dataclasses.asdict(v).items()}
        if isinstance(v, (tuple, list)):
            return [to_plain(x) for x in v]
        if isinstance(v, (np.integer,)):
            return int(v)
        if isinstance(v, (np.floating,)):
            return float(v)
        return v

    out = {}
    if rsqgl_params is not None:
        out["resquiggle"] = to_plain(rsqgl_params)
    for k, v in extra.items():
        out[k] = to_plain(v)
    return json.dumps(out, sort_keys=True)
