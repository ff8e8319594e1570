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
from qendpoint_spark.sources.jsonld import parse_jsonld, read_jsonld
from qendpoint_spark.sources.rdfxml import parse_rdfxml, read_rdfxml
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
    "parse_jsonld",
    "parse_rdfxml",
    "parse_trig",
    "parse_turtle",
    "read_jsonld",
    "read_rdfxml",
    "read_trig",
    "read_turtle",
]
