from qendpoint_spark.dictionary.rank import zip_with_rank
from qendpoint_spark.dictionary.builder import (
    build_dictionary,
    merge_role_sections,
    rank_sections,
)

__all__ = [
    "zip_with_rank",
    "build_dictionary",
    "merge_role_sections",
    "rank_sections",
]
