from qendpoint_spark.sources.ntriples import (
    guess_format,
    read_ntriples,
    read_ntriples_archive,
    read_ntriples_dir,
    read_rdf_source,
)

__all__ = [
    "guess_format",
    "read_ntriples",
    "read_ntriples_archive",
    "read_ntriples_dir",
    "read_rdf_source",
]
