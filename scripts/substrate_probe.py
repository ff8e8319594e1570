"""Substrate capacity probe: how much parallel capacity does this host
actually provide? Used to contextualize scaling-efficiency numbers in
BENCH/BASELINE.md (the sandbox is a shared VM — ALU capacity and
memory bandwidth saturate well below the 32 advertised vCPUs).

Usage: python scripts/substrate_probe.py [cores ...]
Prints ALU throughput (xxhash over a long range — compute-bound) and
string-shuffle throughput (dedup of a string table — memory/bandwidth-
bound) per core count.
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from qendpoint_spark.session import get_spark  # noqa: E402


def probe(cores: int) -> tuple[float, float]:
    spark = get_spark(f"probe{cores}", cores=cores)
    spark.range(10_000_000, numPartitions=cores).select(
        F.bit_xor(F.xxhash64("id"))
    ).collect()
    n = 20_000_000_000
    t0 = time.time()
    spark.range(n, numPartitions=cores * 2).select(
        F.bit_xor(F.xxhash64("id", F.lit(1), F.lit(2)))
    ).collect()
    alu = n / (time.time() - t0) / 1e6
    rows = 17_000_000
    df = (
        spark.range(rows, numPartitions=cores * 2)
        .select(
            F.concat(
                F.lit("http://example.org/doc/"),
                (F.col("id") % 2_000_000).cast("string"),
            ).alias("s"),
            F.lit("http://example.org/prop/mentions").alias("p"),
            F.concat(
                F.lit("http://example.org/ent/token"),
                (F.col("id") % 40).cast("string"),
            ).alias("o"),
        )
        .persist()
    )
    df.count()
    t0 = time.time()
    df.dropDuplicates(["s", "p", "o"]).count()
    shuffle = rows / (time.time() - t0) / 1e6
    spark.stop()
    return alu, shuffle


def main() -> None:
    cores_list = [int(c) for c in sys.argv[1:]] or [2, 8, 32]
    for c in cores_list:
        alu, sh = probe(c)
        print(f"cores={c:3d}  ALU={alu:7.0f} M hashes/s   string-shuffle={sh:6.1f} M rows/s")


if __name__ == "__main__":
    main()
