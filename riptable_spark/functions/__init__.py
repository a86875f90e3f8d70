# spans is imported lazily at callsites: it builds Column literals at
# module import, which needs an active SparkSession
from . import binning, datetime, math, nullsafe, stats, strings  # noqa: F401
