#!/usr/bin/env python3
"""Dump a per-read statistics file to wig-like TSV text.

Equivalent of the reference debug tool
(reference: scripts/dump_per_read_statistics.py): writes
chrm / pos / strand / stat / read_id rows for downstream analysis.
"""
import argparse
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from tombo_tpu.stats.files import PerReadStats


def main():
    p = argparse.ArgumentParser()
    p.add_argument("per_read_stats_fn")
    p.add_argument("--out-filename", default="-")
    args = p.parse_args()

    prs = PerReadStats(args.per_read_stats_fn)
    out = (sys.stdout if args.out_filename == "-"
           else open(args.out_filename, "w"))
    out.write("chrm\tpos\tstrand\tstat\tread_id\n")
    for chrm, strand, start, block_stats, lookup in \
            prs.iter_per_read_blocks():
        for rec in block_stats:
            out.write("%s\t%d\t%s\t%g\t%s\n" % (
                chrm, rec["pos"], strand, rec["stat"],
                lookup[rec["read_id"]]))
    if out is not sys.stdout:
        out.close()
    prs.close()


def _main():
    try:
        main()
    except BrokenPipeError:
        pass


if __name__ == "__main__":
    _main()
