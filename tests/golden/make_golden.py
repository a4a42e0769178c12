#!/usr/bin/env python3
"""Generate the committed golden on-disk fixtures.

Each fixture is crafted HERE with raw h5py/pickle using the literal
schema from the REFERENCE source (file:line cited per fixture), entirely
independent of tombo_tpu's writers.  tests/test_golden.py then parses
the committed bytes with tombo_tpu's readers — so any drift in this
build's on-disk compatibility contract (index pickle layout, stats HDF5
schema, corrected-group FAST5 layout, .tombo.model layout) fails loudly.

Run from the repo root to regenerate: python tests/golden/make_golden.py
"""
import os
import pickle

import h5py
import numpy as np

OUT = os.path.dirname(os.path.abspath(__file__))


def make_index_fixtures():
    """Reference index pickle: {(chrm, strand): [record, ...]} with the
    11-field record layout of tombo/tombo_helper.py:1170-1185 and the
    historical 8/10-field layouts (tombo/tombo_helper.py:1235-1283)."""
    rec11 = ("read_a.fast5", 100, 200, 42, "RawGenomeCorrected_000",
             "BaseCalled_template", False, False, 0.55, 11.5, "rid_a")
    rec11b = ("read_b.fast5", 150, 260, 17, "RawGenomeCorrected_000",
              "BaseCalled_template", False, False, 0.75, 9.0, "rid_b")
    with open(os.path.join(OUT, "golden_v11.index"), "wb") as fp:
        pickle.dump({("chrA", "+"): [rec11, rec11b]}, fp, protocol=2)
    with open(os.path.join(OUT, "golden_v10.index"), "wb") as fp:
        pickle.dump({("chrA", "-"): [rec11[:10]]}, fp, protocol=2)
    with open(os.path.join(OUT, "golden_v8.index"), "wb") as fp:
        pickle.dump({("chrB", "+"): [rec11[:8]]}, fp, protocol=2)


def make_fast5_fixture():
    """Reference-layout FAST5 with raw signal + corrected group
    (raw layout: tombo/tombo_helper.py:770-800 get_raw_read_slot;
    corrected group: tombo/tombo_helper.py:2342-2460
    write_new_fast5_group)."""
    segs = np.array([0, 5, 9, 14, 20], np.int64)
    raw = np.arange(60, dtype=np.int16) % 23
    seq = "ACGT"
    rsrtr = 10
    norm_means = np.array([1.5, -0.25, 0.75, 2.0])
    with h5py.File(os.path.join(OUT, "golden_corrected.fast5"),
                   "w") as fp:
        read_grp = fp.create_group("Raw/Reads/Read_7")
        read_grp.attrs["read_id"] = b"golden_read"
        read_grp.create_dataset("Signal", data=raw, dtype="i2")
        ch = fp.create_group("UniqueGlobalKey/channel_id")
        ch.attrs["offset"] = 0.0
        ch.attrs["range"] = 1400.0
        ch.attrs["digitisation"] = 8192.0
        ch.attrs["sampling_rate"] = 4000.0

        corr = fp.create_group(
            "Analyses/RawGenomeCorrected_000/BaseCalled_template")
        corr.attrs["status"] = "success"
        corr.attrs["rna"] = False
        corr.attrs["signal_match_score"] = 0.42
        corr.attrs["shift"] = 3.5
        corr.attrs["scale"] = 2.25
        corr.attrs["norm_type"] = "median"
        corr.attrs["outlier_threshold"] = 5.0
        aln = corr.create_group("Alignment")
        aln.attrs["mapped_start"] = 1000
        aln.attrs["mapped_end"] = 1004
        aln.attrs["mapped_strand"] = "+"
        aln.attrs["mapped_chrom"] = "chrA"
        aln.attrs["clipped_bases_start"] = 2
        aln.attrs["clipped_bases_end"] = 3
        aln.attrs["num_insertions"] = 0
        aln.attrs["num_deletions"] = 1
        aln.attrs["num_matches"] = 4
        aln.attrs["num_mismatches"] = 0
        event_data = np.array(
            list(zip(norm_means, np.full(4, np.nan), segs[:-1],
                     np.diff(segs), list(seq))),
            dtype=[("norm_mean", "f8"), ("norm_stdev", "f8"),
                   ("start", "u4"), ("length", "u4"), ("base", "S1")])
        ev = corr.create_dataset("Events", data=event_data,
                                 compression="gzip")
        ev.attrs["read_start_rel_to_raw"] = rsrtr


def make_model_fixture():
    """Reference .tombo.model layout (tombo/tombo_stats.py:605-620)."""
    kmers = [a + b for a in "ACGT" for b in "ACGT"]
    means = np.linspace(-2, 2, 16)
    sds = np.full(16, 0.65)
    rec = np.array(list(zip(kmers, means, sds)),
                   dtype=[("kmer", "S2"), ("mean", "f8"), ("sd", "f8")])
    with h5py.File(os.path.join(OUT, "golden.tombo.model"), "w") as fp:
        fp.create_dataset("model", data=rec, compression="gzip")
        fp.attrs["central_pos"] = 1
        fp.attrs["model_name"] = "golden_standard"


def make_stats_fixtures():
    """Reference stats-file schemas: ModelStats
    (tombo/tombo_stats.py:2612-2770), LevelStats (3063-3210) and
    PerReadStats (3335-3362, record dtype 4148-4151)."""
    # ---- ModelStats (dampened-fraction) file
    with h5py.File(os.path.join(OUT, "golden_model.tombo.stats"),
                   "w") as fp:
        fp.attrs["stat_type"] = "de_novo"
        fp.attrs["block_size"] = 1000
        fp.attrs["Cov_Threshold"] = 2
        blocks = fp.create_group("Statistic_Blocks")
        blk = blocks.create_group("Block_0")
        blk.attrs["chrm"] = "chrA"
        blk.attrs["strand"] = "+"
        blk.attrs["start"] = 0
        rows = np.array(
            [(0.25, 0.2, 11, 10, 0, 10), (0.75, 0.8, 17, 12, 0, 12)],
            dtype=[("damp_frac", "f8"), ("frac", "f8"), ("pos", "u4"),
                   ("cov", "u4"), ("control_cov", "u4"),
                   ("valid_cov", "u4")])
        blk.create_dataset("block_stats", data=rows, compression="gzip")
        ms = fp.create_group("Most_Significant_Stats")
        ms_rows = np.array(
            [(0.25, 0.2, 11, 10, 0, 10, 0, b"+"),
             (0.75, 0.8, 17, 12, 0, 12, 0, b"+")],
            dtype=[("damp_frac", "f8"), ("frac", "f8"), ("pos", "u4"),
                   ("cov", "u4"), ("control_cov", "u4"),
                   ("valid_cov", "u4"), ("chrm", "u4"), ("strand", "S1")])
        ms.create_dataset("Most_Significant_Stats", data=ms_rows,
                          compression="gzip")
        ms.create_group("chrm_ids").attrs["chrA"] = 0
        cd = fp.create_group("Cov_Damp_Counts")
        cd.attrs["unmod"] = 2.0
        cd.attrs["mod"] = 0.0

    # ---- LevelStats (group-comparison) file
    with h5py.File(os.path.join(OUT, "golden_level.tombo.stats"),
                   "w") as fp:
        fp.attrs["stat_type"] = "ks"
        fp.attrs["block_size"] = 1000
        fp.attrs["Cov_Threshold"] = 50
        blocks = fp.create_group("Statistic_Blocks")
        blk = blocks.create_group("Block_0")
        blk.attrs["chrm"] = "chrA"
        blk.attrs["strand"] = "-"
        blk.attrs["start"] = 0
        rows = np.array(
            [(0.001, 5, 60, 55), (0.2, 9, 70, 66)],
            dtype=[("stat", "f8"), ("pos", "u4"), ("cov", "u4"),
                   ("control_cov", "u4")])
        blk.create_dataset("block_stats", data=rows, compression="gzip")
        ms = fp.create_group("Most_Significant_Stats")
        ms_rows = np.array(
            [(0.001, 5, 60, 55, 0, b"-")],
            dtype=[("stat", "f8"), ("pos", "u4"), ("cov", "u4"),
                   ("control_cov", "u4"), ("chrm", "u4"),
                   ("strand", "S1")])
        ms.create_dataset("Most_Significant_Stats", data=ms_rows,
                          compression="gzip")
        ms.create_group("chrm_ids").attrs["chrA"] = 0

    # ---- PerReadStats file
    with h5py.File(os.path.join(OUT, "golden.tombo.per_read_stats"),
                   "w") as fp:
        fp.attrs["stat_type"] = "de_novo"
        fp.attrs["block_size"] = 1000
        blocks = fp.create_group("Statistic_Blocks")
        blk = blocks.create_group("Block_0")
        blk.attrs["chrm"] = "chrA"
        blk.attrs["strand"] = "+"
        blk.attrs["start"] = 0
        rows = np.array(
            [(11, 0.01, 0), (11, 0.9, 1), (17, 0.5, 0)],
            dtype=[("pos", "u4"), ("stat", "f8"), ("read_id", "u4")])
        blk.create_dataset("block_stats", data=rows, compression="gzip")
        dt = h5py.special_dtype(vlen=str)
        read_ids = np.array(["rid_a", "rid_b"], dtype=dt)
        ds = blk.create_dataset("read_ids", read_ids.shape, dtype=dt,
                                compression="gzip")
        ds[...] = read_ids
        blk.create_dataset("read_id_vals", data=np.array([0, 1]),
                           compression="gzip")


if __name__ == "__main__":
    make_index_fixtures()
    make_fast5_fixture()
    make_model_fixture()
    make_stats_fixtures()
    print("golden fixtures written to", OUT)
