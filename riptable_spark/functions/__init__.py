from . import binning, datetime, math, nullsafe, strings  # noqa: F401
