from qendpoint_spark.plans.pattern import (
    PatternStats,
    choose_order,
    scan_bgp,
    scan_pattern,
)

__all__ = ["PatternStats", "choose_order", "scan_bgp", "scan_pattern"]
