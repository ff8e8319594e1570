from qendpoint_spark.encoding.encoder import encode_triples, decode_triples
from qendpoint_spark.encoding.indexes import (
    ORDERS,
    sorted_table,
    spo_table,
    ops_table,
    pso_table,
    predicate_index,
    object_index,
    with_adjacency_bits,
)
from qendpoint_spark.encoding.header import (
    build_header,
    export_ntriples,
    with_datatype,
)

__all__ = [
    "encode_triples",
    "decode_triples",
    "ORDERS",
    "sorted_table",
    "spo_table",
    "ops_table",
    "pso_table",
    "predicate_index",
    "object_index",
    "with_adjacency_bits",
    "build_header",
    "export_ntriples",
    "with_datatype",
]
