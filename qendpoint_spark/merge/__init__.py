from qendpoint_spark.merge.kcat import merge_datasets, diff_datasets

__all__ = ["merge_datasets", "diff_datasets"]
