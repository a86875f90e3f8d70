"""riptable_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of the riptable reference (see SURVEY.md).

Architecture: thin operator library + Dataset façade over pyspark DataFrames.
Everything compiles to declarative DataFrame plans so Catalyst/Tungsten/AQE
pick the physical strategy; Pandas UDFs appear only for sequential
recurrences (EMA) and multimodal decode stubs.
"""

from .session import get_spark
from .struct import Struct

__all__ = ["get_spark", "Struct"]
__version__ = "0.1.0"
