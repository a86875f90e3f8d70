"""riptable_spark: PySpark-native analytics engine with the riptable
query surface (SURVEY.md §2). Spark-first: DataFrame/Catalyst plans, not
a kernel port."""

from .dataset import Categorical, Dataset, GroupBy, Multiset
from .dataset import Categorical as Cat  # reference alias (rt __init__:63)
from .operators.categorical import CatZero
from .session import get_spark
from .struct import Struct

__all__ = [
    "Cat",
    "Categorical",
    "CatZero",
    "Dataset",
    "GroupBy",
    "Multiset",
    "Struct",
    "get_spark",
]
