"""Aggregated query registry — import all suites, expose QUERIES/ORACLES."""

from . import relational  # noqa: F401
from . import textops  # noqa: F401
from . import vectorops  # noqa: F401
from . import features  # noqa: F401
from . import packing  # noqa: F401

from .registry import ORACLES, QUERIES  # noqa: F401
