"""Hot-key JOIN salt probe at 69M rows (round-2 follow-up: the skew
probe measured the dictionary AGGREGATION under a 50%-hot term —
map-side combine absorbed it; this probes the ENCODE-shaped JOIN,
where a hot probe key cannot be pre-combined, at expand-640 scale).

Variants over the same 69M-row probe table (one subject term = 50% of
rows) joined to a unique-keyed 1M-term dictionary, broadcasts disabled
to model the beyond-broadcast dictionary regime:

  aqe_on    plain shuffled join, AQE skew-join enabled (the default)
  aqe_off   plain shuffled join, AQE skew-join disabled
  salted    explicit salting: dictionary side exploded xK, probe side
            salt = xxhash64(row) % K, join on (term, salt) — the
            classic manual fix the north_rule asks us to weigh

Usage: python scripts/salt_probe.py [rows] [salt_k]
Appends findings to BENCH/salt_probe_latest.json; the kept/rejected
decision goes in BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from qendpoint_spark.session import get_spark  # noqa: E402

ROWS = int(sys.argv[1]) if len(sys.argv) > 1 else 69_000_000
SALT_K = int(sys.argv[2]) if len(sys.argv) > 2 else 32
DICT_TERMS = 1_000_000


def main() -> None:
    spark = get_spark("salt-probe", cores=8)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set(
        "spark.sql.adaptive.autoBroadcastJoinThreshold", "-1"
    )
    # 50% of probe rows hit term 0; the rest spread over 1M terms
    probe = (
        spark.range(ROWS, numPartitions=64)
        .select(
            F.when(F.col("id") % 2 == 0, F.lit(0))
            .otherwise(F.pmod(F.xxhash64("id"), F.lit(DICT_TERMS)))
            .alias("k"),
            F.col("id").alias("payload"),
        )
        .localCheckpoint(eager=True)
    )
    dim = (
        spark.range(DICT_TERMS)
        .select(F.col("id").alias("k"), (F.col("id") + 7).alias("mapped"))
        .localCheckpoint(eager=True)
    )

    def timed(name: str, fn) -> float:
        t0 = time.time()
        n = fn()
        dt = round(time.time() - t0, 2)
        print(f"# {name}: {dt}s rows={n}", file=sys.stderr, flush=True)
        return dt

    results: dict[str, float] = {}

    def plain() -> int:
        return probe.join(dim, "k").agg(F.bit_xor("mapped")).collect()[0][0] or 0

    def salted() -> int:
        dim_s = dim.select(
            "k", "mapped", F.explode(F.sequence(F.lit(0), F.lit(SALT_K - 1))).alias("salt")
        )
        probe_s = probe.withColumn(
            "salt", F.pmod(F.xxhash64("payload"), F.lit(SALT_K)).cast("int")
        )
        return (
            probe_s.join(dim_s, ["k", "salt"]).agg(F.bit_xor("mapped")).collect()[0][0]
            or 0
        )

    # warm the input caches once
    probe.count(), dim.count()
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    results["aqe_on"] = timed("aqe_on", plain)
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
    results["aqe_off"] = timed("aqe_off", plain)
    results["salted"] = timed(f"salted_k{SALT_K}", salted)
    # second interleaved pass (host noise)
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    results["aqe_on_2"] = timed("aqe_on_2", plain)
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
    results["aqe_off_2"] = timed("aqe_off_2", plain)
    results["salted_2"] = timed(f"salted_k{SALT_K}_2", salted)

    out = {"rows": ROWS, "salt_k": SALT_K, "dict_terms": DICT_TERMS,
           "hot_share": 0.5, "timings_s": results}
    path = Path(__file__).resolve().parent.parent / "BENCH" / "salt_probe_latest.json"
    path.write_text(json.dumps(out, indent=2) + "\n")
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
