from qendpoint_spark.plans.pattern import choose_order, scan_pattern

__all__ = ["choose_order", "scan_pattern"]
