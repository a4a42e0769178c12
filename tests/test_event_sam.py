"""Legacy event re-squiggle: external-aligner SAM input + pA normalization
(reference: tombo/_event_resquiggle.py:567-761 SAM parsing,
tombo/tombo_stats.py:528-541 pA/pA_raw scaling)."""
import os

import h5py
import numpy as np

from tombo_tpu import config
from tombo_tpu.io.fast5 import read_corrected_events
from tombo_tpu.io.model_io import KmerModel
from tombo_tpu.pipeline.aligner import ExactAligner
from tombo_tpu.pipeline.event_resquiggle import (
    event_resquiggle_all_reads, event_resquiggle_read, parse_sam_file)
from tombo_tpu.testing import (random_reference, simulate_read,
                               write_basecaller_events,
                               write_synthetic_fast5)


def _build_reads(tmp_path, n_reads=5, seed=17, with_model=False):
    rng = np.random.default_rng(seed)
    fasta = random_reference(rng, 3000)
    model = KmerModel.load_default(config.DNA_SAMP_TYPE)
    fast5_dir = str(tmp_path / "ev_fast5s")
    os.makedirs(fast5_dir, exist_ok=True)
    reads = []
    for i in range(n_reads):
        read = simulate_read(rng, fasta, model, read_len=300,
                             read_id="evs_%03d" % i)
        fn = os.path.join(fast5_dir, read.read_id + ".fast5")
        write_synthetic_fast5(fn, read)
        write_basecaller_events(fn, read, jitter=2, rng=rng,
                                model=model if with_model else None)
        reads.append(read)
    return fasta, model, fast5_dir, reads


def _write_sam(path, fasta, reads):
    from tombo_tpu.seq import rev_comp
    chrm = fasta.iter_chrms()[0]
    with open(path, "w") as fp:
        fp.write("@SQ\tSN:%s\tLN:%d\n" % (chrm, len(fasta.get_seq(chrm))))
        for read in reads:
            if read.strand == "+":
                flag, seq = 0, read.seq
            else:
                flag, seq = 16, rev_comp(read.seq)
            fp.write("\t".join([
                read.read_id, str(flag), chrm, str(read.start + 1), "60",
                "%dM" % len(read.seq), "*", "0", "0", seq,
                "#" * len(seq)]) + "\n")


def test_sam_parse_and_resquiggle(tmp_path):
    """SAM-driven event re-squiggle (no in-process aligner) produces
    exactly the results of the aligner path on the same reads."""
    fasta, model, fast5_dir, reads = _build_reads(tmp_path)
    sam_fn = str(tmp_path / "aln.sam")
    _write_sam(sam_fn, fasta, reads)

    alns = parse_sam_file(sam_fn, fasta)
    assert set(alns) == {r.read_id for r in reads}
    for read in reads:
        av = alns[read.read_id].align_vals
        # error-free reads: every column a match
        assert all(rb == gb for rb, gb in av)
        assert len(av) == len(read.seq)
        assert alns[read.read_id].genome_loc.start == read.start
        assert alns[read.read_id].genome_loc.strand == read.strand

    n_ok, n_fail, fails = event_resquiggle_all_reads(
        fast5_dir, None, corr_grp="RawGenomeCorrected_sam",
        num_threads=2, sam_fn=sam_fn, fasta=fasta)
    assert n_ok == len(reads), fails

    n_ok2, _, fails2 = event_resquiggle_all_reads(
        fast5_dir, ExactAligner(fasta), corr_grp="RawGenomeCorrected_aln",
        num_threads=2)
    assert n_ok2 == len(reads), fails2

    for read in reads:
        fn = os.path.join(fast5_dir, read.read_id + ".fast5")
        ev_sam, rs_sam, ai_sam, _ = read_corrected_events(
            fn, "RawGenomeCorrected_sam/%s" %
            config.DEFAULT_BASECALL_SUBGROUP)
        ev_aln, rs_aln, ai_aln, _ = read_corrected_events(
            fn, "RawGenomeCorrected_aln/%s" %
            config.DEFAULT_BASECALL_SUBGROUP)
        assert rs_sam == rs_aln
        assert np.array_equal(ev_sam["start"], ev_aln["start"])
        assert np.array_equal(ev_sam["base"], ev_aln["base"])
        assert np.array_equal(ev_sam["norm_mean"], ev_aln["norm_mean"])


def test_sam_soft_clip(tmp_path):
    """Soft-clipped SAM records clip the corresponding basecalls."""
    fasta, model, fast5_dir, reads = _build_reads(tmp_path, n_reads=1,
                                                  seed=23)
    read = reads[0]
    from tombo_tpu.seq import rev_comp
    chrm = fasta.iter_chrms()[0]
    n_clip = 20
    if read.strand == "+":
        flag, seq = 0, read.seq
        pos = read.start + n_clip + 1
        cigar = "%dS%dM" % (n_clip, len(read.seq) - n_clip)
    else:
        flag, seq = 16, rev_comp(read.seq)
        pos = read.start + 1
        # read-oriented start clip is the SAM-forward END for '-' reads
        cigar = "%dM%dS" % (len(read.seq) - n_clip, n_clip)
    sam_fn = str(tmp_path / "clip.sam")
    with open(sam_fn, "w") as fp:
        fp.write("\t".join([
            read.read_id, str(flag), chrm, str(pos), "60", cigar,
            "*", "0", "0", seq, "#" * len(seq)]) + "\n")
    alns = parse_sam_file(sam_fn, fasta)
    aln = alns[read.read_id]
    assert aln.start_clip == n_clip and aln.end_clip == 0
    assert len(aln.align_vals) == len(read.seq) - n_clip
    assert all(rb == gb for rb, gb in aln.align_vals)

    fn = os.path.join(fast5_dir, read.read_id + ".fast5")
    _, rd = event_resquiggle_read(fn, None, alignment=aln,
                                  corr_grp="RawGenomeCorrected_clip")
    ev, _, ai, _ = read_corrected_events(
        fn, "RawGenomeCorrected_clip/%s" % config.DEFAULT_BASECALL_SUBGROUP)
    assert ev.shape[0] == len(read.seq) - n_clip
    assert ai["clipped_bases_start"] == n_clip


def test_event_resquiggle_cli_sam(tmp_path):
    """CLI wiring: event_resquiggle --alignment-file runs without any
    in-process aligner."""
    from tombo_tpu.cli.main import main
    fasta, model, fast5_dir, reads = _build_reads(tmp_path, seed=31)
    fasta_fn = str(tmp_path / "ref.fasta")
    fasta.write(fasta_fn)
    sam_fn = str(tmp_path / "cli.sam")
    _write_sam(sam_fn, fasta, reads)
    assert main(["build_model", "event_resquiggle", fast5_dir, fasta_fn,
                 "--alignment-file", sam_fn, "--overwrite",
                 "--normalization-type", "pA_raw"]) == 0
    fn0 = os.path.join(fast5_dir, reads[0].read_id + ".fast5")
    ev, _, _, _ = read_corrected_events(
        fn0, "%s/%s" % (config.DEFAULT_CORRECTED_GROUP,
                        config.DEFAULT_BASECALL_SUBGROUP))
    assert ev.shape[0] == len(reads[0].seq)
    # output provenance: the corrected group records the resolved params
    import json
    with h5py.File(fn0, "r") as fp:
        rp = fp["Analyses/%s/%s" % (
            config.DEFAULT_CORRECTED_GROUP,
            config.DEFAULT_BASECALL_SUBGROUP)].attrs["resolved_params"]
        rp = json.loads(rp if isinstance(rp, str) else rp.decode())
        assert rp["norm_type"] == "pA_raw"
        assert rp["pipeline"] == "event_resquiggle"


def test_external_aligner_subprocess(tmp_path):
    """--minimap2-executable path: reads are exported to FASTA batches,
    the aligner runs as a subprocess per batch, and the merged SAM feeds
    the re-squiggle (reference: tombo/_event_resquiggle.py:750-812)."""
    import stat
    import sys

    fasta, model, fast5_dir, reads = _build_reads(tmp_path, seed=41)
    fasta_fn = str(tmp_path / "ref.fasta")
    fasta.write(fasta_fn)
    full_sam = str(tmp_path / "full.sam")
    _write_sam(full_sam, fasta, reads)

    # fake minimap2: emits the pre-computed SAM records for exactly the
    # read ids present in the input FASTA batch
    exe = str(tmp_path / "fake_minimap2")
    with open(exe, "w") as fp:
        fp.write("""#!%s
import sys
reads_fn = sys.argv[-1]
ids = set(l[1:].strip() for l in open(reads_fn) if l.startswith('>'))
for line in open(%r):
    if line.startswith('@') or line.split('\\t', 1)[0] in ids:
        sys.stdout.write(line)
""" % (sys.executable, full_sam))
    os.chmod(exe, os.stat(exe).st_mode | stat.S_IXUSR)

    from tombo_tpu.cli.main import main
    assert main(["build_model", "event_resquiggle", fast5_dir, fasta_fn,
                 "--minimap2-executable", exe,
                 "--alignment-batch-size", "2", "--align-processes", "2",
                 "--corrected-group", "RawGenomeCorrected_ext",
                 "--overwrite", "--timeout", "600"]) == 0
    for read in reads:
        ev, _, _, _ = read_corrected_events(
            os.path.join(fast5_dir, read.read_id + ".fast5"),
            "RawGenomeCorrected_ext/%s" % config.DEFAULT_BASECALL_SUBGROUP)
        assert ev.shape[0] == len(read.seq)


def test_external_aligner_command_shapes(tmp_path):
    """bwa-mem and graphmap invocations mirror the reference's option
    prep (tombo/_event_resquiggle.py:750-762): bwa writes SAM to stdout,
    graphmap to -o <file>."""
    import json
    import stat
    import sys

    from tombo_tpu.pipeline.event_resquiggle import run_external_aligner

    fasta, model, fast5_dir, reads = _build_reads(tmp_path, n_reads=2,
                                                  seed=53)
    argv_log = str(tmp_path / "argv.jsonl")
    exe = str(tmp_path / "fake_aligner")
    with open(exe, "w") as fp:
        fp.write("""#!%s
import json, sys
with open(%r, "a") as log:
    log.write(json.dumps(sys.argv[1:]) + "\\n")
args = sys.argv[1:]
if "-o" in args:  # graphmap style: write empty SAM to -o target
    open(args[args.index("-o") + 1], "w").write("")
""" % (sys.executable, argv_log))
    os.chmod(exe, os.stat(exe).st_mode | stat.S_IXUSR)

    fns = [os.path.join(fast5_dir, r.read_id + ".fast5") for r in reads]
    run_external_aligner(fns, "ref.fa", exe, "bwa_mem",
                         align_threads=3, batch_size=10)
    run_external_aligner(fns, "ref.fa", exe, "graphmap",
                         align_threads=2, batch_size=10)
    run_external_aligner(fns, "ref.fa", exe, "minimap2",
                         index_fn="genome.mmi", batch_size=10)
    with open(argv_log) as fp:
        calls = [json.loads(line) for line in fp]
    bwa, gm, mm2 = calls
    assert bwa[:6] == ["mem", "-x", "ont2d", "-v", "1", "-t"]
    assert bwa[6] == "3" and bwa[7] == "ref.fa"
    assert gm[0] == "align" and gm[1:3] == ["-r", "ref.fa"]
    assert "-L" in gm and gm[gm.index("-L") + 1] == "sam"
    assert gm[gm.index("-t") + 1] == "2"
    assert mm2[:2] == ["-ax", "map-ont"] and "genome.mmi" in mm2

    import pytest as _pytest
    from tombo_tpu.errors import TomboTpuError
    with _pytest.raises(TomboTpuError):
        run_external_aligner(fns, "ref.fa", "/nonexistent/aligner",
                             "minimap2", batch_size=10)


def test_pa_normalization(tmp_path):
    """pA_raw channel scaling and pA fitted normalization
    (reference: tombo/tombo_stats.py:528-541)."""
    fasta, model, fast5_dir, reads = _build_reads(tmp_path, n_reads=1,
                                                  seed=29, with_model=True)
    read = reads[0]
    fn = os.path.join(fast5_dir, read.read_id + ".fast5")

    event_resquiggle_read(fn, ExactAligner(fasta),
                          corr_grp="RawGenomeCorrected_par",
                          norm_type="pA_raw")
    with h5py.File(fn, "r") as fp:
        attrs = fp["/Analyses/RawGenomeCorrected_par/%s" %
                   config.DEFAULT_BASECALL_SUBGROUP].attrs
        # write_synthetic_fast5 channel: offset 0, range 1400, dig 8192
        assert abs(attrs["shift"] - 0.0) < 1e-9
        assert abs(attrs["scale"] - 8192.0 / 1400.0) < 1e-9
        assert attrs["norm_type"] == "pA_raw"

    # pA: method-of-moments k-mer fitted correction from a pore model
    pm_fn = str(tmp_path / "pore_model.tsv")
    with open(pm_fn, "w") as fp:
        fp.write("kmer\tlevel_mean\tlevel_stdv\n")
        for code in range(4 ** model.kmer_width):
            kmer = ""
            c = code
            for _ in range(model.kmer_width):
                kmer = "ACGT"[c % 4] + kmer
                c //= 4
            fp.write("%s\t%f\t%f\n" % (kmer, model.means[code],
                                       model.sds[code]))
    from tombo_tpu.pipeline.event_resquiggle import parse_pore_model_file
    pm = parse_pore_model_file(pm_fn)
    event_resquiggle_read(fn, ExactAligner(fasta),
                          corr_grp="RawGenomeCorrected_pa",
                          norm_type="pA", pore_model=pm)
    with h5py.File(fn, "r") as fp:
        grp = fp["/Analyses/RawGenomeCorrected_pa/%s" %
                 config.DEFAULT_BASECALL_SUBGROUP]
        assert grp.attrs["norm_type"] == "pA"
        # the fitted correction moved shift/scale off the raw channel
        # values (pA_raw: shift 0, scale 8192/1400)
        assert abs(grp.attrs["shift"]) > 1.0
        assert abs(grp.attrs["scale"] - 8192.0 / 1400.0) > 1.0
        # and the normalized levels land in model space: the synthetic
        # signal is level*60+450 DAC, so fitted norm_means track the
        # model's level distribution
        norm_means = grp["Events"]["norm_mean"]
        assert abs(np.median(norm_means) -
                   np.median(model.means)) < 0.5


def _write_m5(path, fasta, reads):
    """m5 alignment lines (blasr/graphmap format): aligned sequence pair
    in target-forward orientation (reference m5 lane:
    tombo/_event_resquiggle.py:567-613)."""
    from tombo_tpu.seq import rev_comp
    chrm = fasta.iter_chrms()[0]
    t_len = len(fasta.get_seq(chrm))
    with open(path, "w") as fp:
        for read in reads:
            target = fasta.get_seq(chrm, read.start, read.end)
            q_aln = read.seq if read.strand == "+" else rev_comp(read.seq)
            n = len(read.seq)
            fp.write(" ".join([
                read.read_id, str(n), "0", str(n), read.strand,
                chrm, str(t_len), str(read.start), str(read.end), "+",
                str(n), str(n), "0", "0", "0", "254",
                q_aln, "|" * n, target]) + "\n")


def test_m5_parse_and_resquiggle(tmp_path):
    """m5-driven event re-squiggle matches the SAM lane record for
    record and produces identical corrected events."""
    from tombo_tpu.pipeline.event_resquiggle import parse_m5_file

    fasta, model, fast5_dir, reads = _build_reads(tmp_path, seed=29)
    m5_fn = str(tmp_path / "aln.m5")
    sam_fn = str(tmp_path / "aln.sam")
    _write_m5(m5_fn, fasta, reads)
    _write_sam(sam_fn, fasta, reads)

    m5_alns = parse_m5_file(m5_fn)
    sam_alns = parse_sam_file(sam_fn, fasta)
    assert set(m5_alns) == set(sam_alns) == {r.read_id for r in reads}
    for rid in m5_alns:
        assert m5_alns[rid].align_vals == sam_alns[rid].align_vals, rid
        assert m5_alns[rid].genome_loc == sam_alns[rid].genome_loc
        assert m5_alns[rid].start_clip == sam_alns[rid].start_clip
        assert m5_alns[rid].end_clip == sam_alns[rid].end_clip

    n_ok, n_fail, fails = event_resquiggle_all_reads(
        fast5_dir, None, corr_grp="RawGenomeCorrected_m5",
        num_threads=2, sam_fn=m5_fn, fasta=None)
    assert n_ok == len(reads), fails


def test_m5_record_clipping():
    """Gap columns at either end are clipped with the genome start
    adjusted on the strand-appropriate side (reference:
    tombo/_event_resquiggle.py:529-565 ``clip_m5_alignment``)."""
    from tombo_tpu.pipeline.event_resquiggle import parse_m5_record

    rec = dict(qName="r", qLength="8", qStart="0", qEnd="8", qStrand="+",
               tName="c", tLength="100", tStart="10", tEnd="17",
               tStrand="+", score="5", numMatch="5", numMismatch="0",
               numIns="1", numDel="2", mapQV="254",
               qAlignedSeq="A-ACGTA-", matchPattern="||||||||",
               tAlignedSeq="-GACGT-C")
    out = parse_m5_record(rec)
    # leading (A,-) and (-,G) columns clip 1 read + 1 genome base;
    # trailing (A,-), (-,C) clip 1 read + 1 genome base
    assert out.align_vals == list(zip("ACGT", "ACGT"))
    assert out.start_clip == 1 and out.end_clip == 1
    assert out.genome_loc.start == 11       # '+' strand: start-side clip
    rec["qStrand"] = "-"
    out_rc = parse_m5_record(rec)
    assert out_rc.genome_loc.strand == "-"
    # '-' strand: genome start moves by the END-side clipped genome bases
    assert out_rc.genome_loc.start == 11
