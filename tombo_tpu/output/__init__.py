"""Genome-browser text output (wiggle / bedGraph / FASTA).

Behavioral port of the reference's text output commands
(reference: tombo/_text_output_commands.py).
"""
from .text import (  # noqa: F401
    write_all_browser_files, write_cov_wig, write_frac_wigs,
    write_signal_and_diff_wigs, write_slot_mean_wig, write_most_signif,
    iter_mean_slot_values, get_chrm_sizes)
