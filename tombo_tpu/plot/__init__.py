"""Plotting commands (matplotlib).

TPU-native replacement for the reference's rpy2/R/ggplot2 plotting stack
(reference: tombo/_plot_commands.py + tombo/R_scripts/): the same command
surface rendered with matplotlib to PDF.
"""
from .cli import add_plot_parsers  # noqa: F401
