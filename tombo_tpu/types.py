"""Core record types for the pipeline.

Behavioral equivalents of the reference namedtuple data model
(reference: tombo/tombo_helper.py:109-337), as lightweight dataclasses.
Arrays are numpy on the host and handed to device kernels in batches.
"""
from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from typing import List, Optional, Tuple

import numpy as np


@dataclass
class AlignInfo:
    """Reference: tombo/tombo_helper.py:109-125 ``alignInfo``."""
    read_id: str = ""
    subgroup: str = "BaseCalled_template"
    clip_start: int = 0
    clip_end: int = 0
    insertions: int = 0
    deletions: int = 0
    matches: int = 0
    mismatches: int = 0


@dataclass
class GenomeLocation:
    """Reference: tombo/tombo_helper.py:270-277 ``genomeLocation``."""
    start: int
    strand: str
    chrom: str


@dataclass
class ScaleValues:
    """Signal normalization parameters
    (reference: tombo/tombo_helper.py:161-172 ``scaleValues``)."""
    shift: float
    scale: float
    lower_lim: Optional[float] = None
    upper_lim: Optional[float] = None
    outlier_thresh: Optional[float] = None

    def replace(self, **kw) -> "ScaleValues":
        return dataclasses.replace(self, **kw)


@dataclass
class SeqSampleType:
    """Reference: tombo/tombo_helper.py:330-337 ``seqSampleType``."""
    name: str
    rev_sig: bool


@dataclass
class SequenceData:
    """Reference: tombo/tombo_helper.py:279-286 ``sequenceData``."""
    seq: str
    id: str
    mean_q_score: float


@dataclass
class ChannelInfo:
    """Reference: tombo/tombo_helper.py:288-298 ``channelInfo``."""
    offset: float
    range: float
    digitisation: float
    number: int = 0
    sampling_rate: int = 4000


@dataclass
class DpResults:
    """Dynamic programming results
    (reference: tombo/tombo_helper.py:255-268 ``dpResults``)."""
    read_start_rel_to_raw: int
    segs: np.ndarray          # int64, len = n_bases + 1
    ref_means: np.ndarray     # float64
    ref_sds: np.ndarray       # float64
    genome_seq: str


@dataclass
class ResquiggleResults:
    """Re-squiggle results
    (reference: tombo/tombo_helper.py:216-253 ``resquiggleResults``)."""
    align_info: Optional[AlignInfo] = None
    genome_loc: Optional[GenomeLocation] = None
    genome_seq: Optional[str] = None
    mean_q_score: Optional[float] = None
    raw_signal: Optional[np.ndarray] = None
    channel_info: Optional[ChannelInfo] = None
    read_start_rel_to_raw: Optional[int] = None
    segs: Optional[np.ndarray] = None
    scale_values: Optional[ScaleValues] = None
    sig_match_score: Optional[float] = None
    norm_params_changed: Optional[bool] = None
    start_clip_bases: Optional[str] = None
    stall_ints: Optional[List[Tuple[int, int]]] = None

    def replace(self, **kw) -> "ResquiggleResults":
        return dataclasses.replace(self, **kw)


@dataclass
class ReadData:
    """Per-read index record
    (reference: tombo/tombo_helper.py:127-158 ``readData``)."""
    start: int
    end: int
    filtered: bool
    read_start_rel_to_raw: int
    strand: str
    fn: str
    corr_group: str
    rna: bool
    sig_match_score: Optional[float] = None
    mean_q_score: Optional[float] = None
    read_id: Optional[str] = None


@dataclass
class RegionStats:
    """Per-region fraction statistics block
    (reference: tombo/tombo_helper.py:300-316 ``regionStats``)."""
    reg_frac_standard_base: np.ndarray
    reg_poss: np.ndarray
    chrm: str
    strand: str
    start: int
    reg_cov: np.ndarray
    ctrl_cov: np.ndarray
    valid_cov: np.ndarray


@dataclass
class GroupStats:
    """Per-region group-comparison statistics block
    (reference: tombo/tombo_helper.py:318-328 ``groupStats``)."""
    reg_stats: np.ndarray
    reg_poss: np.ndarray
    chrm: str
    strand: str
    start: int
    reg_cov: np.ndarray
    ctrl_cov: np.ndarray
