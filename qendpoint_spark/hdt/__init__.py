"""Binary `.hdt` container interchange (read + write).

The rest of the repo keeps HDT's *logical* model (four-section
dictionary, BitmapTriples adjacency, MSD typed sections) in Parquet
tables — the at-rest format SURVEY §1.6 maps to the lakehouse. This
package adds the reference's *physical* container so data can move in
and out of the qEndpoint/hdt-java ecosystem: a `.hdt` file written
here loads in the reference (same cookies, section codecs and CRCs),
and a reference-written basic-SPO `.hdt` loads here.

Format sources (reference, file:line):
  - container framing:  core/hdt/impl/HDTBase.java:99-119
  - control info:       core/options/ControlInformation.java:66-89
  - four sections:      core/dictionary/impl/FourSectionDictionary.java:96-108
  - PFC section codec:  core/dictionary/impl/section/PFCDictionarySection.java:94-140,397-413
  - log64 sequences:    core/compact/sequence/SequenceLog64.java:322-346
  - plain bitmaps:      core/compact/bitmap/Bitmap64Big.java:290-315
  - bitmap triples:     core/triples/impl/WriteBitmapTriples.java:79-98,202-309
  - vbyte + crcs:       core/compact/integer/VByte.java:84-93, util/crc/*.java
  - MSD literals map:   core/dictionary/impl/MultipleSectionDictionary.java:123-206
  - quad graph layer:   core/triples/impl/BitmapQuadTriples.java:206-219,
                        core/compact/bitmap/MultiRoaringBitmap.java:173-215,362-395
"""

from qendpoint_spark.hdt.reader import hdt_to_dataframes, read_hdt
from qendpoint_spark.hdt.writer import write_hdt, write_hdt_msd, write_hdtq

__all__ = [
    "write_hdt",
    "write_hdt_msd",
    "write_hdtq",
    "read_hdt",
    "hdt_to_dataframes",
]
