from qendpoint_spark.sources.deltafile import (
    delta_file_entries,
    parse_delta_file,
    read_delta_file,
    write_delta_file,
)
from qendpoint_spark.sources.ntriples import (
    guess_format,
    read_nquads,
    read_ntriples,
    read_ntriples_archive,
    read_ntriples_dir,
    read_rdf_source,
)
from qendpoint_spark.sources.turtle import (
    parse_trig,
    parse_turtle,
    read_trig,
    read_turtle,
)

__all__ = [
    "delta_file_entries",
    "parse_delta_file",
    "read_delta_file",
    "write_delta_file",
    "guess_format",
    "read_nquads",
    "read_ntriples",
    "read_ntriples_archive",
    "read_ntriples_dir",
    "read_rdf_source",
    "parse_trig",
    "parse_turtle",
    "read_trig",
    "read_turtle",
]
