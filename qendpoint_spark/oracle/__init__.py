from qendpoint_spark.oracle.pandas_oracle import (
    oracle_dictionary,
    oracle_encode,
    oracle_extract_documents,
)

__all__ = ["oracle_dictionary", "oracle_encode", "oracle_extract_documents"]
