"""Multimodal-column queries: metadata-only (payload never read) and the
Arrow-batched decode-stub pipeline."""

from __future__ import annotations

from pyspark.sql import functions as F

from airflow_cms_inpatient_etl_spark.operators.multimodal import (
    attach_binary_payload,
    decode_features,
    sample_frames,
)
from airflow_cms_inpatient_etl_spark.queries.base import register
from airflow_cms_inpatient_etl_spark.sources.registry import load_table


@register(
    "multimodal_metadata",
    oracle="""
    SELECT doc_id,
           'application/fake-image' AS mime,
           OCTET_LENGTH(CAST(text AS BLOB)) AS n_bytes,
           OCTET_LENGTH(CAST(text AS BLOB)) % 4096 AS shard_bucket
    FROM documents
    """,
)
def multimodal_metadata(spark, sf_dir):
    """Typed metadata over binary payload columns — the query shape that must
    prune the payload out of the scan entirely."""
    d = load_table(spark, sf_dir, "documents")
    mm = attach_binary_payload(d)
    return mm.select(
        "doc_id",
        F.col("meta.mime").alias("mime"),
        F.col("meta.n_bytes").cast("bigint").alias("n_bytes"),
        (F.col("meta.n_bytes") % 4096).cast("bigint").alias("shard_bucket"),
    )


@register(
    "multimodal_decode_stub",
    oracle="""
    SELECT doc_id,
           CAST(OCTET_LENGTH(CAST(text AS BLOB)) AS INT) AS n_bytes,
           CAST(OCTET_LENGTH(CAST(text AS BLOB)) % 640 + 1 AS INT) AS fake_width,
           CAST(OCTET_LENGTH(CAST(text AS BLOB)) % 480 + 1 AS INT) AS fake_height,
           CAST(OCTET_LENGTH(CAST(text AS BLOB)) % 3 + 1 AS INT) AS fake_channels
    FROM documents
    """,
)
def multimodal_decode_stub(spark, sf_dir):
    """mapInPandas decode stage (stub kernel, real Arrow plumbing) — the
    deterministic fake features are oracle-checkable arithmetic on byte length."""
    d = load_table(spark, sf_dir, "documents")
    return decode_features(attach_binary_payload(d))


@register(
    "multimodal_frame_sample",
    oracle="""
    WITH meta AS (
        SELECT doc_id,
               CAST(FLOOR(OCTET_LENGTH(CAST(text AS BLOB)) / 100) AS BIGINT) + 1 AS n_frames
        FROM documents
    )
    SELECT doc_id, n_frames, CAST(UNNEST(RANGE(0, n_frames, 7)) AS BIGINT) AS frame_idx
    FROM meta
    """,
)
def multimodal_frame_sample(spark, sf_dir):
    """Frame sampling (video-style): metadata-driven explode of every-7th
    frame index — one row per sampled frame, payload column never read."""
    from pyspark.sql import functions as F

    d = load_table(spark, sf_dir, "documents")
    out = sample_frames(decode_features(attach_binary_payload(d)), every_k=7)
    return out.select(
        "doc_id",
        F.col("n_frames").cast("bigint").alias("n_frames"),
        F.col("frame_idx").cast("bigint").alias("frame_idx"),
    )


@register(
    "multimodal_audio_chunks",
    oracle="""
    WITH meta AS (
        SELECT doc_id,
               CAST(OCTET_LENGTH(CAST(text AS BLOB)) AS BIGINT) AS duration_ms
        FROM documents
    ),
    chunks AS (
        SELECT doc_id, duration_ms,
               UNNEST(RANGE(0, duration_ms, 5000)) AS s
        FROM meta
    )
    SELECT doc_id, duration_ms,
           CAST(s AS BIGINT) AS chunk_start_ms,
           CAST(LEAST(s + 5000, duration_ms) AS BIGINT) AS chunk_end_ms
    FROM chunks
    """,
)
def multimodal_audio_chunks(spark, sf_dir):
    """Audio chunking (ASR-style 5-second segments): metadata-driven explode
    of the payload timeline, final chunk clipped to the true duration —
    payload bytes never read; the row-expansion shape real audio pipelines
    use before a batched transcription/feature kernel."""
    from airflow_cms_inpatient_etl_spark.operators.multimodal import chunk_audio

    d = load_table(spark, sf_dir, "documents")
    return chunk_audio(attach_binary_payload(d), chunk_ms=5000)


_CAS_CHUNK = 32  # fixed chunk width (stub unit: characters; real CAS = bytes)


@register(
    "multimodal_cas_chunk_dedup",
    oracle=f"""
    WITH chunks AS (
        SELECT doc_id,
               MD5(SUBSTRING(text, CAST(off AS BIGINT), {_CAS_CHUNK})) AS chunk_hash,
               CAST(LENGTH(SUBSTRING(text, CAST(off AS BIGINT), {_CAS_CHUNK})) AS BIGINT)
                 AS chunk_len
        FROM documents,
             UNNEST(RANGE(1, LENGTH(text) + 1, {_CAS_CHUNK})) AS t(off)
    )
    SELECT chunk_hash,
           CAST(COUNT(*) AS BIGINT) AS n_refs,
           MIN(chunk_len) AS chunk_len,
           CAST((COUNT(*) - 1) * MIN(chunk_len) AS BIGINT) AS saved
    FROM chunks
    GROUP BY chunk_hash
    HAVING COUNT(*) >= 2
    """,
)
def multimodal_cas_chunk_dedup(spark, sf_dir):
    """Content-addressable-storage chunk dedup over payloads: split each
    payload into fixed-width chunks, hash each, and report every chunk stored
    more than once with its reference count and the bytes a dedup store would
    save — the blob-store dedup report (restic/borg/S3-inventory shape)
    applied to multimodal payload columns.  Stub note: the fixture payload is
    UTF-8 text so the chunk unit here is characters (DuckDB lacks BLOB
    substring); a real CAS swaps in byte slices and, for shift-robustness,
    content-defined boundaries (rolling hash, see `text_rolling_hash`) — the
    explode/hash/groupBy plan is identical.  One narrow map stage (explode ∝
    payload/chunk ratio) into one hash-keyed aggregate; no self-join — cost
    is linear in corpus bytes, and the HAVING keeps output ∝ shared chunks
    only."""
    d = load_table(spark, sf_dir, "documents")
    chunks = d.select(
        "text",
        F.explode(
            F.sequence(F.lit(1), F.length("text"), F.lit(_CAS_CHUNK))
        ).alias("off"),
    )
    sliced = chunks.select(
        F.expr(f"substring(text, off, {_CAS_CHUNK})").alias("chunk")
    ).select(
        F.md5(F.col("chunk").cast("binary")).alias("chunk_hash"),
        F.length("chunk").cast("long").alias("chunk_len"),
    )
    return (
        sliced.groupBy("chunk_hash")
        .agg(F.count(F.lit(1)).alias("n_refs"), F.min("chunk_len").alias("chunk_len"))
        .filter(F.col("n_refs") >= 2)
        .select(
            "chunk_hash",
            "n_refs",
            "chunk_len",
            ((F.col("n_refs") - 1) * F.col("chunk_len")).alias("saved"),
        )
    )


_CDC_W = 8   # rolling-gram width for boundary detection
_CDC_D = 32  # boundary divisor => expected chunk length ~= D
_CDC_B = 131                            # polynomial base
_CDC_M = 2147483647                     # modulus (Mersenne prime 2^31-1)
_CDC_BW = pow(_CDC_B, _CDC_W, _CDC_M)   # B^W mod M — the leave-window weight
_CDC_POWS = [pow(_CDC_B, j, _CDC_M) for j in range(_CDC_W)]
# Oracle computes each window hash from the DEFINITION (O(W) per position —
# fine for an oracle); Spark maintains it by the O(1) rolling recurrence.
# Agreement between the two proves the recurrence.
_CDC_POWS_SQL = "[" + ",".join(f"CAST({p} AS BIGINT)" for p in _CDC_POWS) + "]"


@register(
    "multimodal_cdc_chunk_dedup",
    oracle=f"""
    WITH cuts AS (
        SELECT doc_id, text, LENGTH(text) AS len,
               LIST_FILTER(
                   RANGE({_CDC_W}, LENGTH(text) + 1),
                   e -> LIST_SUM(LIST_TRANSFORM(RANGE(0, {_CDC_W}),
                            j -> ASCII(SUBSTRING(text, CAST(e - j AS INT), 1))
                                 * ({_CDC_POWS_SQL})[j + 1]))
                        % {_CDC_M} % {_CDC_D} = 0
               ) AS cut_ends
        FROM documents
    ),
    bounds AS (
        SELECT doc_id, text,
               LIST_SORT(LIST_DISTINCT(LIST_APPEND(cut_ends, len))) AS ends
        FROM cuts
    ),
    chunks AS (
        SELECT doc_id,
               UNNEST(LIST_TRANSFORM(
                   RANGE(1, LEN(ends) + 1),
                   i -> SUBSTRING(text,
                                  CASE WHEN i = 1 THEN 1 ELSE ends[i - 1] + 1 END,
                                  ends[i] - (CASE WHEN i = 1 THEN 1 ELSE ends[i - 1] + 1 END) + 1)
               )) AS chunk
        FROM bounds
    )
    SELECT MD5(chunk) AS chunk_hash,
           CAST(COUNT(*) AS BIGINT) AS n_refs,
           MIN(CAST(LENGTH(chunk) AS BIGINT)) AS chunk_len,
           CAST((COUNT(*) - 1) * MIN(CAST(LENGTH(chunk) AS BIGINT)) AS BIGINT) AS saved
    FROM chunks
    GROUP BY MD5(chunk)
    HAVING COUNT(*) >= 2
    """,
)
def multimodal_cdc_chunk_dedup(spark, sf_dir):
    """Content-defined chunking dedup (the restic/borgbackup/LBFS algorithm):
    a chunk boundary falls wherever the rolling {_w}-gram's polynomial hash
    (base {_b}, mod 2^31-1) ≡ 0 mod {_d}, so boundaries are a function of
    CONTENT, not position — inserting bytes near the start of a payload
    shifts fixed-width chunk frames everywhere (killing
    `multimodal_cas_chunk_dedup`-style dedup) but leaves every boundary
    after the edit untouched, so downstream chunks still dedup.  The hash is
    maintained by the true Rabin-style O(1)-per-byte rolling recurrence
    h' = (h*B + enter - leave*B^W) mod M inside ONE `aggregate` fold over
    the pre-split char array (element_at is O(1) random access; the md5-per-
    position predecessor paid a W-byte hash PLUS an O(p) substring walk at
    every position).  The oracle computes each window hash from the O(W)
    definition, so cross-engine agreement proves the recurrence.  Then one
    explode of the small chunk list into the same hash-keyed savings
    aggregate as the fixed-width variant.  Cost is linear in corpus bytes
    with an O(1) per-byte constant; expected chunk ≈ {_d} units.
    Shift-robustness is asserted in tests (prefix edit preserves the shared
    tail chunks)."""
    d = load_table(spark, sf_dir, "documents")
    # newh is written twice (hash update + cut test) because SQL lambdas have
    # no let-binding; it is O(1) either way and Catalyst CSEs the subtree.
    newh = (
        f"pmod(acc.h * {_CDC_B} + ascii(c) - IF(acc.p + 1 > {_CDC_W}, "
        f"ascii(element_at(cs, acc.p + 1 - {_CDC_W})) * {_CDC_BW}L, 0L), {_CDC_M}L)"
    )
    cut_expr = (
        f"aggregate(cs, "
        f"named_struct('p', 0, 'h', cast(0 as bigint), 'ends', cast(array() as array<int>)), "
        f"(acc, c) -> named_struct("
        f"  'p', acc.p + 1, "
        f"  'h', {newh}, "
        f"  'ends', IF(acc.p + 1 >= {_CDC_W} AND pmod({newh}, {_CDC_D}) = 0, "
        f"             concat(acc.ends, array(acc.p + 1)), acc.ends)), "
        f"acc -> acc.ends)"
    )
    bounds = d.select("doc_id", "text", F.split("text", "").alias("cs")).select(
        "doc_id",
        "text",
        F.expr(
            f"array_sort(array_distinct(concat({cut_expr}, array(length(text)))))"
        ).alias("ends"),
    )
    chunk_expr = (
        "transform(sequence(1, size(ends)), i -> substring(text, "
        "  CASE WHEN i = 1 THEN 1 ELSE element_at(ends, i - 1) + 1 END, "
        "  element_at(ends, i) - (CASE WHEN i = 1 THEN 1 ELSE element_at(ends, i - 1) + 1 END) + 1))"
    )
    chunks = bounds.select(F.explode(F.expr(chunk_expr)).alias("chunk"))
    return (
        chunks.select(
            F.md5(F.col("chunk").cast("binary")).alias("chunk_hash"),
            F.length("chunk").cast("long").alias("clen"),
        )
        .groupBy("chunk_hash")
        .agg(F.count(F.lit(1)).alias("n_refs"), F.min("clen").alias("chunk_len"))
        .filter(F.col("n_refs") >= 2)
        .select(
            "chunk_hash",
            "n_refs",
            "chunk_len",
            ((F.col("n_refs") - 1) * F.col("chunk_len")).alias("saved"),
        )
    )


multimodal_cdc_chunk_dedup.__doc__ = (
    multimodal_cdc_chunk_dedup.__doc__.replace("{_w}", str(_CDC_W))
    .replace("{_d}", str(_CDC_D))
    .replace("{_b}", str(_CDC_B))
)
