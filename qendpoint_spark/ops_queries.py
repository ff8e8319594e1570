"""Training-data-ops query registry (dedup / similarity / text analysis /
multimodal / linking / canonicalization), each with an exact DuckDB
oracle. Companion to entry_queries.py (KG pipeline queries).

Cross-engine determinism contract (see ops/*.py docstrings): md5-based
integer hashes, fixed-point quantized vectors, integer tie-breaks, and
round(x, 6) on any float that came from a single expression tree.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from qendpoint_spark.entry_queries import _triples_cte
from qendpoint_spark.linking import connected_components, link_mentions
from qendpoint_spark.ops.dedup import (
    embedding_dup_pairs,
    exact_dedup,
    minhash_lsh_pairs,
    minhash_signatures,
    ngram_jaccard_pairs,
    simhash_table,
)
from qendpoint_spark.ops.multimodal import assets_from_documents, extract_features
from qendpoint_spark.ops.similarity import brute_force_topk, lsh_bucketed_topk
from qendpoint_spark.ops.textstats import (
    doc_fingerprint,
    lang_id,
    text_stats,
    token_counts,
)

DOC_IRI = "http://example.org/doc/"
KB_IRI = "http://kb.example.org/"


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


# --------------------------------------------------------------- queries


def q_dedup_exact(spark, sf_dir):
    return exact_dedup(_docs(spark, sf_dir))


def q_text_stats(spark, sf_dir):
    return text_stats(_docs(spark, sf_dir))


def q_token_counts(spark, sf_dir):
    return token_counts(_docs(spark, sf_dir))


def q_lang_id(spark, sf_dir):
    return lang_id(_docs(spark, sf_dir))


def q_fingerprint(spark, sf_dir):
    return doc_fingerprint(_docs(spark, sf_dir))


def q_ngram_jaccard(spark, sf_dir):
    # max_df=64 opt-in matches the oracle's df cutoff (the scale guard
    # is deliberate here; the library default is exact/no-cutoff)
    return ngram_jaccard_pairs(_docs(spark, sf_dir), k=3, threshold=0.5, max_df=64)


def q_minhash_signatures(spark, sf_dir):
    return minhash_signatures(_docs(spark, sf_dir), k=3, num_hashes=16)


def q_minhash_lsh(spark, sf_dir):
    return minhash_lsh_pairs(_docs(spark, sf_dir), k=3, num_hashes=16)


def q_simhash(spark, sf_dir):
    return simhash_table(_docs(spark, sf_dir), bits=16)


def q_embed_dup(spark, sf_dir):
    return embedding_dup_pairs(_emb(spark, sf_dir), min_cos=0.3)


def q_sim_topk(spark, sf_dir):
    return brute_force_topk(_emb(spark, sf_dir), query_mod=97, k=5)


def q_sim_lsh_topk(spark, sf_dir):
    return lsh_bucketed_topk(_emb(spark, sf_dir), query_mod=97, k=5)


def q_multimodal_features(spark, sf_dir):
    return extract_features(assets_from_documents(_docs(spark, sf_dir)))


def q_multimodal_resize(spark, sf_dir):
    from qendpoint_spark.ops.multimodal import resize_assets

    return resize_assets(assets_from_documents(_docs(spark, sf_dir)), 256, 256)


def q_multimodal_frames(spark, sf_dir):
    from qendpoint_spark.ops.multimodal import sample_frames

    return sample_frames(assets_from_documents(_docs(spark, sf_dir)), max_frames=8)


def q_embed_dup_lsh(spark, sf_dir):
    from qendpoint_spark.ops.dedup import embedding_dup_pairs_lsh

    # pinned signature (bits=3, 4 tables): the oracle's literal planes
    return embedding_dup_pairs_lsh(_emb(spark, sf_dir), min_cos=0.3, bits=3, tables=4)


def q_sim_topk_ivf(spark, sf_dir):
    """IVF ANN serving the frozen coarse quantizer (trained once by
    k-means — scripts/train_ivf_centroids.py): assignment + probe +
    top-k over integer-quantized vectors, value-exact vs the SQL
    oracle built from the same centroid literals. The iterative
    trainer itself keeps its pytest recall gate (tests/test_ivf.py)."""
    from qendpoint_spark.ops.ivf import ivf_topk_frozen

    return ivf_topk_frozen(_emb(spark, sf_dir), query_mod=97, k=5, nprobe=2)


def q_entity_link(spark, sf_dir):
    """Mentions = qualifying tokens; synthetic deterministic alias dict
    with ambiguous aliases (hash-gated _alt candidates)."""
    docs = _docs(spark, sf_dir)
    toks = (
        docs.select(
            F.concat(F.lit(DOC_IRI), F.col("doc_id").cast("string")).alias("doc_iri"),
            F.explode(F.split(F.coalesce(F.col("text"), F.lit("")), " ")).alias("alias"),
        )
        .filter(F.length("alias") >= 4)
        .distinct()
    )
    vocab = toks.select("alias").distinct()

    def h8(col):
        return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long")

    primary = vocab.select(
        "alias",
        F.concat(F.lit(KB_IRI), F.col("alias")).alias("entity_iri"),
        F.round((h8(F.col("alias")) % 1000) / 1000.0, 6).alias("prior"),
    )
    alts = vocab.filter(h8(F.col("alias")) % 3 == 0).select(
        "alias",
        F.concat(F.lit(KB_IRI), F.col("alias"), F.lit("_alt")).alias("entity_iri"),
        F.round((h8(F.concat(F.col("alias"), F.lit("x"))) % 1000) / 1000.0, 6).alias(
            "prior"
        ),
    )
    alias_dict = primary.unionByName(alts)
    return link_mentions(toks, alias_dict, broadcast_dict=True, top_k=1)


def q_entity_link_blocked(spark, sf_dir):
    """Same linking contract as kg_entity_link but through the 100-TB
    path: broadcast OFF, both sides repartitioned on block_key (first
    alias token) -> co-partitioned sort-merge join with AQE skew split.
    Result must be identical to the broadcast plan (same oracle)."""
    docs = _docs(spark, sf_dir)
    toks = (
        docs.select(
            F.concat(F.lit(DOC_IRI), F.col("doc_id").cast("string")).alias("doc_iri"),
            F.explode(F.split(F.coalesce(F.col("text"), F.lit("")), " ")).alias("alias"),
        )
        .filter(F.length("alias") >= 4)
        .distinct()
    )
    vocab = toks.select("alias").distinct()

    def h8(col):
        return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long")

    primary = vocab.select(
        "alias",
        F.concat(F.lit(KB_IRI), F.col("alias")).alias("entity_iri"),
        F.round((h8(F.col("alias")) % 1000) / 1000.0, 6).alias("prior"),
    )
    alts = vocab.filter(h8(F.col("alias")) % 3 == 0).select(
        "alias",
        F.concat(F.lit(KB_IRI), F.col("alias"), F.lit("_alt")).alias("entity_iri"),
        F.round((h8(F.concat(F.col("alias"), F.lit("x"))) % 1000) / 1000.0, 6).alias(
            "prior"
        ),
    )
    alias_dict = primary.unionByName(alts).withColumn(
        "block_key", F.split(F.col("alias"), " ").getItem(0)
    )
    return link_mentions(
        toks, alias_dict, broadcast_dict=False, top_k=1
    ).select("doc_iri", "alias", "entity_iri", "prior", "link_rank")


def q_canonical_triples(spark, sf_dir):
    """Pipeline-integrated canonicalization: rewrite the extracted
    triples through the CC map of a star-shaped sameas graph
    (components = doc_id - doc_id % 5 groups; representative = the
    head, which is the string-min member). Exercises
    canonicalize_triples — the triples_canon pipeline stage — in the
    driver gate."""
    from qendpoint_spark.entry_queries import _triples
    from qendpoint_spark.linking import canonicalize_triples

    docs = _docs(spark, sf_dir)
    tri = _triples(spark, sf_dir)
    sameas = docs.select(
        F.concat(
            F.lit(DOC_IRI), (F.col("doc_id") - F.col("doc_id") % 5).cast("string")
        ).alias("iri_a"),
        F.concat(F.lit(DOC_IRI), F.col("doc_id").cast("string")).alias("iri_b"),
    )
    return canonicalize_triples(tri, sameas)


def q_quality_filter(spark, sf_dir):
    """Training-data filtering: keep documents passing the quality
    gate (the dedup/filter step a pretraining pipeline applies)."""
    stats = text_stats(_docs(spark, sf_dir))
    return stats.filter(
        (F.col("quality_score") >= 0.05) & (F.col("n_tokens") >= 10)
    ).select("doc_id", "n_tokens", "quality_score")


def q_dedup_keepers(spark, sf_dir):
    """Materialized dedup decision: the surviving document set after
    exact dedup (keeper of each content group)."""
    return exact_dedup(_docs(spark, sf_dir)).filter(
        F.col("doc_id") == F.col("keeper_id")
    ).select("doc_id", "group_size")


def q_minhash_accuracy(spark, sf_dir):
    """MinHash estimate audit: signature-agreement fraction vs exact
    shingle Jaccard for the LSH candidate pairs — the quality check a
    production dedup pipeline runs on its own index."""
    from qendpoint_spark.ops.dedup import (
        NUM_HASHES,
        minhash_signatures,
        ngram_jaccard_pairs,
    )

    docs = _docs(spark, sf_dir)
    sig = minhash_signatures(docs, k=3, num_hashes=NUM_HASHES)
    exact = ngram_jaccard_pairs(docs, k=3, threshold=0.5, max_df=64).select(
        "doc_a", "doc_b", "jaccard"
    )
    a = sig.select(
        F.col("doc_id").alias("doc_a"),
        *[F.col(f"mh{i}").alias(f"a{i}") for i in range(NUM_HASHES)],
    )
    b = sig.select(
        F.col("doc_id").alias("doc_b"),
        *[F.col(f"mh{i}").alias(f"b{i}") for i in range(NUM_HASHES)],
    )
    agree = sum(
        F.when(F.col(f"a{i}") == F.col(f"b{i}"), 1).otherwise(0)
        for i in range(NUM_HASHES)
    )
    return (
        exact.join(a, "doc_a")
        .join(b, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            "jaccard",
            F.round(agree / F.lit(float(NUM_HASHES)), 6).alias("mh_estimate"),
        )
    )


def q_dedup_lsh_quality(spark, sf_dir):
    """Measured LSH dedup quality on a CONTROLLED near-dup corpus —
    the metric a production pipeline monitors before deleting data.

    Construction: every document gets one injected near-duplicate
    (doc_id + 1,000,000, last token dropped -> shingle Jaccard ~0.95),
    so ground truth is known by ID arithmetic, not by eyeballing a
    saturated replica corpus. Output is ONE metrics row:
      recall    = injected pairs (exact J >= 0.5) caught by LSH banding
      precision = LSH candidate pairs whose exact J really is >= 0.5
      meets_target = recall >= 0.9 at the pinned (16 hashes, 4x4 bands)
    With r=4 rows/band the band-collision probability at J~0.95 is
    1-(1-J^4)^4 ~ 0.9998, so recall ~1.0 is the HEALTHY reading; a drop
    flags a broken hash or banding change."""
    from qendpoint_spark.ops.dedup import (
        minhash_lsh_pairs,
        ngram_jaccard_pairs,
    )
    from qendpoint_spark.ops.textstats import round6_exact

    docs = _docs(spark, sf_dir).select("doc_id", "text")
    mutants = docs.select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"),
        F.regexp_replace(
            F.coalesce(F.col("text"), F.lit("")), " [^ ]+$", ""
        ).alias("text"),
    )
    corpus = docs.unionByName(mutants)
    exact = ngram_jaccard_pairs(corpus, k=3, threshold=0.5).select(
        "doc_a", "doc_b"
    )
    lsh = minhash_lsh_pairs(corpus, k=3, num_hashes=16)
    injected = exact.filter(F.col("doc_b") == F.col("doc_a") + 1_000_000)
    hits = injected.join(lsh, ["doc_a", "doc_b"], "left_semi")
    cand_true = lsh.join(exact, ["doc_a", "doc_b"], "left_semi")
    row = (
        injected.agg(F.count(F.lit(1)).alias("n_true"))
        .crossJoin(hits.agg(F.count(F.lit(1)).alias("n_hit")))
        .crossJoin(lsh.agg(F.count(F.lit(1)).alias("n_cand")))
        .crossJoin(cand_true.agg(F.count(F.lit(1)).alias("n_cand_true")))
    )
    return row.select(
        "n_true",
        "n_hit",
        round6_exact(F.col("n_hit"), F.col("n_true")).alias("recall"),
        "n_cand",
        "n_cand_true",
        round6_exact(F.col("n_cand_true"), F.col("n_cand")).alias(
            "precision"
        ),
        (
            round6_exact(F.col("n_hit"), F.col("n_true")) >= 0.9
        ).alias("meets_target"),
    )


def q_canonicalize_cc(spark, sf_dir):
    """Real large-star/small-star CC over star-shaped sameas edges whose
    components have a closed form (group head = doc_id - doc_id % 5) —
    the oracle recomputes the expected map without iteration."""
    docs = _docs(spark, sf_dir)
    edges = docs.select(
        F.concat(
            F.lit(DOC_IRI), (F.col("doc_id") - F.col("doc_id") % 5).cast("string")
        ).alias("u"),
        F.concat(F.lit(DOC_IRI), F.col("doc_id").cast("string")).alias("v"),
    )
    return connected_components(edges)


OPS_QUERIES = {
    "dedup_exact": q_dedup_exact,
    "text_stats": q_text_stats,
    "token_counts": q_token_counts,
    "lang_id": q_lang_id,
    "doc_fingerprint": q_fingerprint,
    "dedup_ngram_jaccard": q_ngram_jaccard,
    "dedup_minhash_signatures": q_minhash_signatures,
    "dedup_minhash_lsh": q_minhash_lsh,
    "dedup_simhash": q_simhash,
    "dedup_embedding": q_embed_dup,
    "sim_topk_bruteforce": q_sim_topk,
    "sim_topk_lsh": q_sim_lsh_topk,
    "sim_topk_ivf": q_sim_topk_ivf,
    "multimodal_features": q_multimodal_features,
    "multimodal_resize": q_multimodal_resize,
    "multimodal_frames": q_multimodal_frames,
    "dedup_embedding_lsh": q_embed_dup_lsh,
    "kg_entity_link": q_entity_link,
    "kg_entity_link_blocked": q_entity_link_blocked,
    "kg_canonicalize_cc": q_canonicalize_cc,
    "kg_canonical_triples": q_canonical_triples,
    "quality_filter": q_quality_filter,
    "dedup_keepers": q_dedup_keepers,
    "dedup_minhash_accuracy": q_minhash_accuracy,
    "dedup_lsh_quality": q_dedup_lsh_quality,
}

# --------------------------------------------------------------- oracles

_H8 = "('0x' || substring(md5({x}), 1, 8))::BIGINT"


def _q6(numer: str, denom: str) -> str:
    """SQL twin of textstats.round6_exact: exact integer half-up
    rounding of numer/denom at 6 decimals (round(double, 6) diverges
    across engines on exact .5 boundaries at the 7th decimal)."""
    return f"((({numer}) * 2000000 + ({denom})) // (2 * ({denom})) / 1000000.0)"

_MH_COLS = ", ".join(
    "min(('0x' || substring(md5(shingle || '#%d'), 1, 8))::BIGINT) AS mh%d"
    % (i, i)
    for i in range(16)
)

_TOKS = """
toks AS (
  SELECT doc_id, list_filter(string_split(coalesce(text, ''), ' '),
                             t -> length(t) > 0) AS l
  FROM documents
)"""

_TK = """
tk AS (
  SELECT doc_id, unnest(lst) AS tok, generate_subscripts(lst, 1) AS pos
  FROM (SELECT doc_id, string_split(coalesce(text, ''), ' ') AS lst
        FROM documents)
)"""

_SHINGLES = """
sh AS (
  SELECT DISTINCT doc_id, shingle FROM (
    SELECT doc_id, unnest(
      CASE WHEN len(lst) >= 3
           THEN list_transform(generate_series(1, len(lst) - 2),
                               i -> array_to_string(lst[i:i+2], ' '))
           ELSE [array_to_string(lst, ' ')] END) AS shingle
    FROM (SELECT doc_id, string_split(coalesce(text, ''), ' ') AS lst
          FROM documents)
  ) WHERE length(shingle) > 0
)"""

_QV = """
qv AS (
  SELECT vec_id, label,
         list_transform(embedding, x -> round(x::DOUBLE * 1000)::BIGINT) AS q
  FROM embeddings
)"""


def _lsh_buckets_cte() -> str:
    """Shared CTE fragment: qv + hyperplane signature buckets, built
    from the SAME hyperplane literals as ops.similarity (integer
    projections -> exact signatures)."""
    from qendpoint_spark.ops.similarity import HYPERPLANES, LSH_BITS, LSH_TABLES

    hp_rows = ",\n    ".join(
        f"({i // LSH_BITS}, {i % LSH_BITS}, [{', '.join(map(str, vec))}]::BIGINT[])"
        for i, vec in enumerate(HYPERPLANES[: LSH_BITS * LSH_TABLES])
    )
    return f"""{_QV},
hp AS (
  SELECT * FROM (VALUES
    {hp_rows}
  ) AS t(tbl, bit, hvec)
),
hd AS (
  SELECT vec_id, tbl, bit, sum(x * y) AS d
  FROM (SELECT v.vec_id, h.tbl, h.bit, unnest(v.q) AS x, unnest(h.hvec) AS y
        FROM qv v CROSS JOIN hp h)
  GROUP BY 1, 2, 3
),
buckets AS (
  SELECT vec_id, tbl,
         sum(CASE WHEN d >= 0 THEN (1 << bit) ELSE 0 END)::INTEGER AS bucket
  FROM hd GROUP BY 1, 2
)"""


def _lsh_hyperplane_oracle(query_mod: int = 97, k: int = 5) -> str:
    """SQL twin of similarity.lsh_bucketed_topk."""
    return f"""
WITH {_lsh_buckets_cte()},
cand AS (
  SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS neighbor_id
  FROM buckets q
  JOIN buckets c ON c.tbl = q.tbl AND c.bucket = q.bucket
                AND c.vec_id <> q.vec_id
  WHERE q.vec_id % {query_mod} = 0
),
scored AS (
  SELECT query_id, neighbor_id, sum(x * y)::BIGINT AS qdot
  FROM (SELECT cd.query_id, cd.neighbor_id, unnest(vq.q) AS x, unnest(vn.q) AS y
        FROM cand cd
        JOIN qv vq ON vq.vec_id = cd.query_id
        JOIN qv vn ON vn.vec_id = cd.neighbor_id)
  GROUP BY 1, 2
)
SELECT query_id, neighbor_id, rank, qdot FROM (
  SELECT query_id, neighbor_id, qdot,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY qdot DESC, neighbor_id ASC) AS rank
  FROM scored
) WHERE rank <= {k}"""


def _embed_dup_lsh_oracle(min_cos: float = 0.3) -> str:
    """SQL twin of dedup.embedding_dup_pairs_lsh (same hyperplane
    literals; candidates from any shared signature bucket)."""
    return f"""
WITH {_lsh_buckets_cte()},
cand AS (
  SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
  FROM buckets a
  JOIN buckets b ON b.tbl = a.tbl AND b.bucket = a.bucket
               AND a.vec_id < b.vec_id
),
dots AS (
  SELECT vec_a, vec_b,
         sum(x * y)::BIGINT AS qdot,
         sum(x * x)::BIGINT AS qna,
         sum(y * y)::BIGINT AS qnb
  FROM (SELECT c.vec_a, c.vec_b, unnest(va.q) AS x, unnest(vb.q) AS y
        FROM cand c
        JOIN qv va ON va.vec_id = c.vec_a
        JOIN qv vb ON vb.vec_id = c.vec_b)
  GROUP BY 1, 2
)
SELECT vec_a, vec_b, qdot,
       round(qdot / sqrt(qna::DOUBLE * qnb::DOUBLE), 6) AS cos_q
FROM dots
WHERE round(qdot / sqrt(qna::DOUBLE * qnb::DOUBLE), 6) >= {min_cos}"""


_ASSETS_DIMS = """
assets AS (
  SELECT doc_id AS asset_id,
         CASE (doc_id % 3) WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
              ELSE 'video' END AS kind,
         octet_length(encode(coalesce(text, '')))::BIGINT AS n,
         md5(coalesce(text, '')) AS src_md5
  FROM documents
),
dims AS (
  SELECT asset_id, kind, src_md5,
         (CASE kind WHEN 'image' THEN n % 640 + 1 ELSE n % 1280 + 1 END)::BIGINT AS w,
         (CASE kind WHEN 'image' THEN n % 480 + 1 ELSE n % 720 + 1 END)::BIGINT AS h,
         (n % 250 + 1)::BIGINT AS n_frames
  FROM assets WHERE kind <> 'audio'
)"""


def _resize_oracle(max_w: int = 256, max_h: int = 256) -> str:
    return f"""
WITH {_ASSETS_DIMS},
resz AS (
  SELECT asset_id, kind, w, h,
    CASE WHEN w <= {max_w} AND h <= {max_h} THEN w
         WHEN (h * least(w, {max_w})) // w > {max_h}
              THEN greatest((w * {max_h}) // h, 1)
         ELSE greatest(least(w, {max_w}), 1) END AS out_w,
    CASE WHEN w <= {max_w} AND h <= {max_h} THEN h
         WHEN (h * least(w, {max_w})) // w > {max_h} THEN {max_h}
         ELSE greatest((h * least(w, {max_w})) // w, 1) END AS out_h,
    src_md5
  FROM dims
)
SELECT asset_id, kind,
       w::INTEGER AS src_width, h::INTEGER AS src_height,
       out_w::INTEGER AS out_width, out_h::INTEGER AS out_height,
       md5(src_md5 || '#' || out_w || 'x' || out_h) AS resized_md5
FROM resz"""


def _frames_oracle(max_frames: int = 8) -> str:
    return f"""
WITH {_ASSETS_DIMS},
f AS (
  SELECT asset_id, src_md5,
         unnest(generate_series(0, n_frames - 1,
                                greatest(1, n_frames // {max_frames}))) AS i
  FROM dims WHERE kind = 'video'
)
SELECT asset_id, i::INTEGER AS frame_no, (i * 40)::INTEGER AS frame_ts_ms,
       md5(src_md5 || '#' || i) AS frame_md5
FROM f"""


def _ivf_frozen_oracle(query_mod: int = 97, k: int = 5, nprobe: int = 2) -> str:
    """SQL twin of ivf_topk_frozen, built from the SAME centroid
    literals — integer distances make assignment/probe/top-k exact."""
    from qendpoint_spark.ops.ivf import FROZEN_CENTROIDS

    cent_rows = ",\n    ".join(
        f"({cid}, [{', '.join(map(str, vec))}]::BIGINT[])"
        for cid, vec in enumerate(FROZEN_CENTROIDS)
    )
    return f"""
WITH {_QV},
cent AS (
  SELECT * FROM (VALUES
    {cent_rows}
  ) AS t(cid, cvec)
),
ad AS (
  SELECT vec_id, cid, sum((x - y) * (x - y))::BIGINT AS d2
  FROM (SELECT v.vec_id, c.cid, unnest(v.q) AS x, unnest(c.cvec) AS y
        FROM qv v CROSS JOIN cent c)
  GROUP BY 1, 2
),
assign AS (
  SELECT vec_id, cid FROM (
    SELECT vec_id, cid,
           row_number() OVER (PARTITION BY vec_id ORDER BY d2 ASC, cid ASC) AS rk
    FROM ad
  ) WHERE rk = 1
),
probes AS (
  SELECT vec_id AS query_id, cid FROM (
    SELECT vec_id, cid,
           row_number() OVER (PARTITION BY vec_id ORDER BY d2 ASC, cid ASC) AS rk
    FROM ad WHERE vec_id % {query_mod} = 0
  ) WHERE rk <= {nprobe}
),
cand AS (
  SELECT query_id, neighbor_id, sum((x - y) * (x - y))::BIGINT AS d2
  FROM (
    SELECT p.query_id, a.vec_id AS neighbor_id,
           unnest(vq.q) AS x, unnest(vn.q) AS y
    FROM probes p
    JOIN assign a ON a.cid = p.cid AND a.vec_id <> p.query_id
    JOIN qv vq ON vq.vec_id = p.query_id
    JOIN qv vn ON vn.vec_id = a.vec_id
  ) GROUP BY 1, 2
)
SELECT query_id, neighbor_id, rank, d2 FROM (
  SELECT query_id, neighbor_id, d2,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY d2 ASC, neighbor_id ASC) AS rank
  FROM cand
) WHERE rank <= {k}"""

OPS_ORACLES = {
    "dedup_exact": """
WITH hashed AS (
  SELECT doc_id, md5(lower(trim(coalesce(text, '')))) AS text_hash
  FROM documents
),
g AS (
  SELECT text_hash, min(doc_id) AS keeper_id, count(*) AS group_size
  FROM hashed GROUP BY text_hash
)
SELECT h.doc_id, h.text_hash, g.keeper_id, g.group_size
FROM hashed h JOIN g USING (text_hash)""",
    "text_stats": f"""
WITH {_TOKS},
base AS (
  SELECT doc_id,
         len(l) AS n_tokens,
         len(list_filter(l, t -> t IN ('the','a','of','and'))) AS n_stopwords,
         len(list_distinct(l)) AS n_distinct,
         coalesce(list_sum(list_transform(l, t -> length(t))), 0)::BIGINT AS sum_token_len
  FROM toks
)
SELECT doc_id, n_tokens,
       {_q6('sum_token_len', 'greatest(n_tokens, 1)')} AS avg_token_len,
       {_q6('n_stopwords', 'greatest(n_tokens, 1)')} AS stopword_ratio,
       {_q6('n_distinct', 'greatest(n_tokens, 1)')} AS distinct_ratio,
       {_q6('least(n_tokens, 100) * (greatest(n_tokens, 1) - n_stopwords) * n_distinct',
            '100 * greatest(n_tokens, 1) * greatest(n_tokens, 1)')} AS quality_score
FROM base""",
    "token_counts": f"""
WITH {_TOKS}
SELECT d.doc_id,
       len(t.l) AS n_ws_tokens,
       len(regexp_extract_all(coalesce(d.text, ''), '[a-z0-9]+')) AS n_re_tokens,
       length(coalesce(d.text, '')) AS n_chars_calc
FROM documents d JOIN toks t USING (doc_id)""",
    "lang_id": f"""
WITH {_TOKS},
c AS (
  SELECT doc_id,
         len(list_filter(l, t -> t IN ('the','of'))) AS cnt_en,
         len(list_filter(l, t -> t IN ('der','und'))) AS cnt_de,
         len(list_filter(l, t -> t IN ('el','los'))) AS cnt_es,
         len(list_filter(l, t -> t IN ('le','les'))) AS cnt_fr
  FROM toks
)
SELECT d.doc_id, d.lang AS declared_lang, c.cnt_en, c.cnt_de, c.cnt_es, c.cnt_fr,
       CASE WHEN greatest(cnt_en, cnt_de, cnt_es, cnt_fr) = 0 THEN 'und'
            WHEN cnt_de = greatest(cnt_en, cnt_de, cnt_es, cnt_fr) THEN 'de'
            WHEN cnt_en = greatest(cnt_en, cnt_de, cnt_es, cnt_fr) THEN 'en'
            WHEN cnt_es = greatest(cnt_en, cnt_de, cnt_es, cnt_fr) THEN 'es'
            ELSE 'fr' END AS pred_lang
FROM documents d JOIN c USING (doc_id)""",
    "doc_fingerprint": f"""
WITH {_TK}
SELECT doc_id,
       (sum(pos * {_H8.format(x='tok')}) % 2147483647)::BIGINT AS fingerprint
FROM tk WHERE length(tok) > 0 GROUP BY doc_id""",
    "dedup_ngram_jaccard": f"""
WITH {_SHINGLES},
sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
rare AS (SELECT shingle FROM sh GROUP BY shingle HAVING count(*) <= 64),
shx AS (SELECT sh.doc_id, sh.shingle FROM sh JOIN rare USING (shingle)),
common AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
  FROM shx a JOIN shx b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT doc_a, doc_b, n_common, sa.n_sh AS n_a, sb.n_sh AS n_b,
       {_q6('n_common', 'sa.n_sh + sb.n_sh - n_common')} AS jaccard
FROM common
JOIN sizes sa ON sa.doc_id = doc_a
JOIN sizes sb ON sb.doc_id = doc_b
WHERE {_q6('n_common', 'sa.n_sh + sb.n_sh - n_common')} >= 0.5""",
    "dedup_minhash_signatures": f"""
WITH {_SHINGLES}
SELECT doc_id, {_MH_COLS}
FROM sh GROUP BY doc_id""",
    "dedup_minhash_lsh": f"""
WITH {_SHINGLES},
sig AS (
  SELECT doc_id, {_MH_COLS}
  FROM sh GROUP BY doc_id
),
bands AS (
  {" UNION ALL ".join(
    "SELECT doc_id, " + str(b) + " AS band, md5(concat_ws(':', "
    + ", ".join(f"mh{b*4+r}::VARCHAR" for r in range(4))
    + ")) AS band_hash FROM sig"
    for b in range(4)
)}
)
SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
FROM bands a JOIN bands b
  ON a.band = b.band AND a.band_hash = b.band_hash AND a.doc_id < b.doc_id""",
    "dedup_simhash": f"""
WITH {_TK},
tokc AS (
  SELECT doc_id, tok, count(*) AS cnt, {_H8.format(x='tok')} AS h
  FROM tk WHERE length(tok) > 0 GROUP BY doc_id, tok
),
votes AS (
  SELECT doc_id, j, sum(cnt * (((h >> j) & 1) * 2 - 1)) AS s
  FROM tokc, (SELECT unnest(generate_series(0, 15)) AS j)
  GROUP BY doc_id, j
)
SELECT doc_id,
       sum(CASE WHEN s > 0 THEN (1::BIGINT << j) ELSE 0 END)::BIGINT AS simhash
FROM votes GROUP BY doc_id""",
    "dedup_embedding": f"""
WITH {_QV},
pairs AS (
  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, a.label,
         a.q AS qa, b.q AS qb
  FROM qv a JOIN qv b ON a.label = b.label AND a.vec_id < b.vec_id
),
dots AS (
  SELECT vec_a, vec_b, label,
         sum(x * y)::BIGINT AS qdot,
         sum(x * x)::BIGINT AS qna,
         sum(y * y)::BIGINT AS qnb
  FROM (SELECT vec_a, vec_b, label, unnest(qa) AS x, unnest(qb) AS y
        FROM pairs)
  GROUP BY 1, 2, 3
)
SELECT vec_a, vec_b, label, qdot,
       round(qdot / sqrt(qna::DOUBLE * qnb::DOUBLE), 6) AS cos_q
FROM dots
WHERE round(qdot / sqrt(qna::DOUBLE * qnb::DOUBLE), 6) >= 0.3""",
    "sim_topk_bruteforce": f"""
WITH {_QV},
queries AS (SELECT vec_id AS query_id, q AS qq FROM qv WHERE vec_id % 97 = 0),
scored AS (
  SELECT query_id, neighbor_id, sum(x * y)::BIGINT AS qdot
  FROM (SELECT qs.query_id, c.vec_id AS neighbor_id,
               unnest(qs.qq) AS x, unnest(c.q) AS y
        FROM queries qs, qv c WHERE c.vec_id <> qs.query_id)
  GROUP BY 1, 2
)
SELECT query_id, neighbor_id, rank, qdot FROM (
  SELECT query_id, neighbor_id, qdot,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY qdot DESC, neighbor_id ASC) AS rank
  FROM scored
) WHERE rank <= 5""",
    "sim_topk_lsh": _lsh_hyperplane_oracle(query_mod=97, k=5),
    "sim_topk_ivf": _ivf_frozen_oracle(query_mod=97, k=5, nprobe=2),
    "dedup_embedding_lsh": _embed_dup_lsh_oracle(min_cos=0.3),
    "multimodal_resize": _resize_oracle(256, 256),
    "multimodal_frames": _frames_oracle(8),
    "multimodal_features": """
WITH assets AS (
  SELECT doc_id AS asset_id,
         CASE (doc_id % 3) WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
              ELSE 'video' END AS kind,
         encode(coalesce(text, '')) AS payload,
         coalesce(text, '') AS payload_txt
  FROM documents
)
SELECT asset_id, kind,
       octet_length(payload)::BIGINT AS n_bytes,
       md5(payload_txt) AS payload_md5,
       (CASE kind WHEN 'image' THEN octet_length(payload) % 640 + 1
                  WHEN 'audio' THEN 0
                  ELSE octet_length(payload) % 1280 + 1 END)::INTEGER AS width,
       (CASE kind WHEN 'image' THEN octet_length(payload) % 480 + 1
                  WHEN 'audio' THEN 0
                  ELSE octet_length(payload) % 720 + 1 END)::INTEGER AS height,
       (CASE kind WHEN 'image' THEN 0
                  WHEN 'audio' THEN octet_length(payload) * 8
                  ELSE octet_length(payload) * 40 END)::INTEGER AS duration_ms,
       (CASE kind WHEN 'image' THEN 1
                  WHEN 'audio' THEN 0
                  ELSE octet_length(payload) % 250 + 1 END)::INTEGER AS n_frames
FROM assets""",
    "kg_entity_link": f"""
WITH mention AS (
  SELECT DISTINCT 'http://example.org/doc/' || doc_id AS doc_iri, tok AS alias
  FROM (SELECT doc_id, unnest(string_split(coalesce(text, ''), ' ')) AS tok
        FROM documents)
  WHERE length(tok) >= 4
),
vocab AS (SELECT DISTINCT alias FROM mention),
dict AS (
  SELECT alias, 'http://kb.example.org/' || alias AS entity_iri,
         round(({_H8.format(x='alias')} % 1000) / 1000.0, 6) AS prior
  FROM vocab
  UNION ALL
  SELECT alias, 'http://kb.example.org/' || alias || '_alt',
         round(({_H8.format(x="alias || 'x'")} % 1000) / 1000.0, 6)
  FROM vocab WHERE {_H8.format(x='alias')} % 3 = 0
)
SELECT doc_iri, alias, entity_iri, prior, link_rank FROM (
  SELECT m.doc_iri, m.alias, d.entity_iri, d.prior,
         row_number() OVER (PARTITION BY m.doc_iri, m.alias
                            ORDER BY d.prior DESC, d.entity_iri ASC) AS link_rank
  FROM mention m JOIN dict d USING (alias)
) WHERE link_rank <= 1""",
    "quality_filter": f"""
WITH {_TOKS},
base AS (
  SELECT doc_id,
         len(l) AS n_tokens,
         len(list_filter(l, t -> t IN ('the','a','of','and'))) AS n_stopwords,
         len(list_distinct(l)) AS n_distinct
  FROM toks
),
scored AS (
  SELECT doc_id, n_tokens,
         {_q6('least(n_tokens, 100) * (greatest(n_tokens, 1) - n_stopwords) * n_distinct',
              '100 * greatest(n_tokens, 1) * greatest(n_tokens, 1)')} AS quality_score
  FROM base
)
SELECT doc_id, n_tokens, quality_score FROM scored
WHERE quality_score >= 0.05 AND n_tokens >= 10""",
    "dedup_keepers": """
WITH hashed AS (
  SELECT doc_id, md5(lower(trim(coalesce(text, '')))) AS text_hash
  FROM documents
),
g AS (
  SELECT text_hash, min(doc_id) AS keeper_id, count(*) AS group_size
  FROM hashed GROUP BY text_hash
)
SELECT h.doc_id, g.group_size
FROM hashed h JOIN g USING (text_hash)
WHERE h.doc_id = g.keeper_id""",
    "dedup_minhash_accuracy": f"""
WITH {_SHINGLES},
sig AS (
  SELECT doc_id, {_MH_COLS}
  FROM sh GROUP BY doc_id
),
sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
rare AS (SELECT shingle FROM sh GROUP BY shingle HAVING count(*) <= 64),
shx AS (SELECT sh.doc_id, sh.shingle FROM sh JOIN rare USING (shingle)),
common AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
  FROM shx a JOIN shx b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
exact AS (
  SELECT doc_a, doc_b,
         {_q6('n_common', 'sa.n_sh + sb.n_sh - n_common')} AS jaccard
  FROM common
  JOIN sizes sa ON sa.doc_id = doc_a
  JOIN sizes sb ON sb.doc_id = doc_b
  WHERE {_q6('n_common', 'sa.n_sh + sb.n_sh - n_common')} >= 0.5
)
SELECT e.doc_a, e.doc_b, e.jaccard,
       round(({" + ".join(f"CASE WHEN a.mh{i} = b.mh{i} THEN 1 ELSE 0 END" for i in range(16))})
             / 16.0, 6) AS mh_estimate
FROM exact e
JOIN sig a ON a.doc_id = e.doc_a
JOIN sig b ON b.doc_id = e.doc_b""",
    "dedup_lsh_quality": f"""
WITH corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 1000000 AS doc_id,
         regexp_replace(coalesce(text, ''), ' [^ ]+$', '') AS text
  FROM documents
),
sh AS (
  SELECT DISTINCT doc_id, shingle FROM (
    SELECT doc_id, unnest(
      CASE WHEN len(lst) >= 3
           THEN list_transform(generate_series(1, len(lst) - 2),
                               i -> array_to_string(lst[i:i+2], ' '))
           ELSE [array_to_string(lst, ' ')] END) AS shingle
    FROM (SELECT doc_id, string_split(coalesce(text, ''), ' ') AS lst
          FROM corpus)
  ) WHERE length(shingle) > 0
),
sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
common AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
exact AS (
  SELECT doc_a, doc_b
  FROM common
  JOIN sizes sa ON sa.doc_id = doc_a
  JOIN sizes sb ON sb.doc_id = doc_b
  WHERE {_q6('n_common', 'sa.n_sh + sb.n_sh - n_common')} >= 0.5
),
sig AS (
  SELECT doc_id, {_MH_COLS}
  FROM sh GROUP BY doc_id
),
bands AS (
  {" UNION ALL ".join(
    "SELECT doc_id, " + str(b) + " AS band, md5(concat_ws(':', "
    + ", ".join(f"mh{b*4+r}::VARCHAR" for r in range(4))
    + ")) AS band_hash FROM sig"
    for b in range(4)
)}
),
lsh AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a JOIN bands b
    ON a.band = b.band AND a.band_hash = b.band_hash
   AND a.doc_id < b.doc_id
),
injected AS (
  SELECT * FROM exact WHERE doc_b = doc_a + 1000000
),
hits AS (
  SELECT i.* FROM injected i JOIN lsh USING (doc_a, doc_b)
),
cand_true AS (
  SELECT l.* FROM lsh l JOIN exact USING (doc_a, doc_b)
)
SELECT
  (SELECT count(*) FROM injected) AS n_true,
  (SELECT count(*) FROM hits) AS n_hit,
  {_q6('(SELECT count(*) FROM hits)', '(SELECT count(*) FROM injected)')}
    AS recall,
  (SELECT count(*) FROM lsh) AS n_cand,
  (SELECT count(*) FROM cand_true) AS n_cand_true,
  {_q6('(SELECT count(*) FROM cand_true)', '(SELECT count(*) FROM lsh)')}
    AS precision,
  {_q6('(SELECT count(*) FROM hits)', '(SELECT count(*) FROM injected)')}
    >= 0.9 AS meets_target""",
    # the triples CTE is SHARED with the kg prelude (entry_queries.
    # _triples_cte) so the extraction grammar can never diverge between
    # the pipeline oracles and this canonicalization oracle
    "kg_canonical_triples": "WITH "
    + _triples_cte("triples")
    + """
SELECT DISTINCT
  CASE WHEN s LIKE 'http://example.org/doc/%'
       THEN 'http://example.org/doc/' ||
            (CAST(substring(s, 24) AS BIGINT)
             - CAST(substring(s, 24) AS BIGINT) % 5)
       ELSE s END AS s,
  p,
  CASE WHEN o LIKE 'http://example.org/doc/%'
       THEN 'http://example.org/doc/' ||
            (CAST(substring(o, 24) AS BIGINT)
             - CAST(substring(o, 24) AS BIGINT) % 5)
       ELSE o END AS o
FROM triples""",
    "kg_canonicalize_cc": """
WITH g AS (
  SELECT doc_id, doc_id - doc_id % 5 AS head FROM documents
),
sizes AS (SELECT head, count(*) AS n FROM g GROUP BY head)
SELECT 'http://example.org/doc/' || g.doc_id AS node,
       'http://example.org/doc/' || g.head AS component
FROM g JOIN sizes USING (head) WHERE sizes.n > 1""",
}
# the blocked (repartition-join) linking path must produce the exact
# same result as the broadcast plan — one oracle serves both
OPS_ORACLES["kg_entity_link_blocked"] = OPS_ORACLES["kg_entity_link"]
