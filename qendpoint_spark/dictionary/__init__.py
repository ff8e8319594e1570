from qendpoint_spark.dictionary.rank import zip_with_rank
from qendpoint_spark.dictionary.builder import build_dictionary

__all__ = ["zip_with_rank", "build_dictionary"]
