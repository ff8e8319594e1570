from qendpoint_spark.linking.entity_linking import link_mentions, build_alias_dict
from qendpoint_spark.linking.canonicalize import (
    connected_components,
    canonicalize_triples,
)

__all__ = [
    "link_mentions",
    "build_alias_dict",
    "connected_components",
    "canonicalize_triples",
]
