"""Turtle parse-path throughput bench (verdict r4 item 7).

The Turtle/TriG reader is a pure-Python recursive-descent parser run
per file inside mapInPandas (`sources/turtle.py`) — parallel ACROSS
files, sequential within one (Turtle is stateful: prefixes, bnode
scopes). That is ~10-50x slower per byte than the JVM-regex N-Triples
fast path, so the operational question at scale is: how many files per
core do you need before the parse saturates the cores?

This bench writes a sharded synthetic .ttl corpus from the sf
documents table (same triple grammar as the NT path), then measures
end-to-end read_turtle().count() wall at local[8] and local[32] plus
the NT fast path on the equivalent .nt bytes as the reference point.

Writes BENCH/turtle_bench.json:
  {mb, files, ttl: {c8_sec, c32_sec, c8_mb_s, c32_mb_s, scaling_eff},
   nt: {c32_sec, c32_mb_s}, ttl_vs_nt_slowdown}

Sharding guidance (recorded in README): keep >= 2 x cores files per
job; one giant .ttl is a single task regardless of cluster size —
split web-crawl Turtle exports at the source or pre-convert to
N-Triples/Parquet for bulk loads.

Usage: python scripts/turtle_bench.py [sf_dir] [files] [expand]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build_corpus(sf_dir: str, out_dir: str, n_files: int, expand: int = 1) -> tuple[int, int]:
    """Shard the documents table into n_files .ttl files (and one .nt
    mirror of the same statements). Returns (ttl_bytes, nt_bytes)."""
    import duckdb

    os.makedirs(out_dir, exist_ok=True)
    rows = duckdb.sql(
        f"SELECT doc_id, lang, source, n_chars FROM "
        f"'{sf_dir}/documents.parquet' ORDER BY doc_id"
    ).fetchall()
    if expand > 1:  # deterministic replication so MB/s dominates
        # Spark-session fixed overhead instead of the reverse
        rows = [
            (doc_id * expand + k, lang, source, n_chars)
            for doc_id, lang, source, n_chars in rows
            for k in range(expand)
        ]
    ttl_total = nt_total = 0
    nt_lines: list[str] = []
    for shard in range(n_files):
        lines = [
            "@prefix p: <http://example.org/prop/> .",
            "@base <http://example.org/doc/> .",
        ]
        for doc_id, lang, source, n_chars in rows[shard::n_files]:
            subj = f"<{doc_id}>"
            lines.append(
                f'{subj} p:lang "{lang}"@{lang} ; '
                f'p:source "{source}" ; '
                f'p:nchars "{n_chars}"'
                "^^<http://www.w3.org/2001/XMLSchema#integer> ."
            )
            base = f"http://example.org/doc/{doc_id}"
            nt_lines.append(
                f'<{base}> <http://example.org/prop/lang> "{lang}"@{lang} .'
            )
            nt_lines.append(
                f'<{base}> <http://example.org/prop/source> "{source}" .'
            )
            nt_lines.append(
                f'<{base}> <http://example.org/prop/nchars> "{n_chars}"'
                "^^<http://www.w3.org/2001/XMLSchema#integer> ."
            )
        data = ("\n".join(lines) + "\n").encode()
        ttl_total += len(data)
        with open(os.path.join(out_dir, f"part{shard:04d}.ttl"), "wb") as f:
            f.write(data)
    nt_data = ("\n".join(nt_lines) + "\n").encode()
    nt_total = len(nt_data)
    with open(os.path.join(out_dir, "mirror.nt"), "wb") as f:
        f.write(nt_data)
    return ttl_total, nt_total


def time_read(cores: int, out_dir: str, fmt: str) -> tuple[float, int]:
    from qendpoint_spark.session import get_spark
    from qendpoint_spark.sources.ntriples import read_ntriples
    from qendpoint_spark.sources.turtle import read_turtle

    spark = get_spark(f"turtle-bench-{fmt}-{cores}", cores=cores)
    t0 = time.time()
    if fmt == "ttl":
        n = read_turtle(
            spark, [os.path.join(out_dir, f) for f in sorted(os.listdir(out_dir)) if f.endswith(".ttl")]
        ).count()
    else:
        n = read_ntriples(spark, os.path.join(out_dir, "mirror.nt")).count()
    dt = time.time() - t0
    spark.stop()
    return dt, n


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    n_files = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    expand = int(sys.argv[3]) if len(sys.argv) > 3 else 400
    out_dir = "/tmp/turtle_bench_corpus"
    ttl_bytes, nt_bytes = build_corpus(sf_dir, out_dir, n_files, expand)
    t8, n8 = time_read(8, out_dir, "ttl")
    t32, n32 = time_read(32, out_dir, "ttl")
    tnt, nnt = time_read(32, out_dir, "nt")
    assert n8 == n32 == nnt, (n8, n32, nnt)
    mb = ttl_bytes / 1e6
    out = {
        "sf_dir": sf_dir,
        "files": n_files,
        "expand": expand,
        "ttl_mb": round(mb, 1),
        "triples": n32,
        "ttl": {
            "c8_sec": round(t8, 1),
            "c32_sec": round(t32, 1),
            "c8_mb_s": round(mb / t8, 2),
            "c32_mb_s": round(mb / t32, 2),
            # 4x cores -> ideal 4x; efficiency = actual/ideal
            "scaling_eff_8_to_32": round((t8 / t32) / 4.0, 3),
        },
        "nt": {
            "c32_sec": round(tnt, 1),
            "c32_mb_s": round(nt_bytes / 1e6 / tnt, 2),
        },
        "ttl_vs_nt_slowdown_per_mb": round(
            (mb / t32) and ((nt_bytes / 1e6 / tnt) / (mb / t32)), 1
        ),
        "guidance": (
            "keep >= 2x cores .ttl files per job; a single file is one "
            "task at any cluster size — pre-split or convert to NT for "
            "bulk loads"
        ),
    }
    with open(os.path.join(REPO, "BENCH", "turtle_bench.json"), "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
