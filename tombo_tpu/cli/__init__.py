"""Command line interface (``tombo-tpu``)."""
from .main import main  # noqa: F401
