"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video payloads are carried as ``binary`` columns with a typed
metadata struct alongside — the Spark-native multimodal table layout.  The
actual codec work (image decode, resample, frame extraction) would run in
Arrow-batched ``mapInPandas`` stages; the codec libraries are not in this
container, so the decode kernel is a deterministic stub (clearly marked),
while everything Spark-side — schema, batching, partitioning, UDF signature —
is real and tested.

At 100 TB: payload columns dominate I/O, so the metadata-only queries must
never read them (parquet column pruning does this for free), and decode stages
size partitions by bytes (``spark.sql.files.maxPartitionBytes``), not rows.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DECODED_SCHEMA = (
    "doc_id bigint, n_bytes int, fake_width int, fake_height int, fake_channels int"
)


def attach_binary_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Build the multimodal layout from the documents fixture: payload binary +
    metadata struct (mime, byte length).  Stands in for real image bytes."""
    payload = F.encode(F.col(text_col), "UTF-8")
    return df.select(
        "doc_id",
        payload.alias("payload"),
        F.struct(
            F.lit("application/fake-image").alias("mime"),
            F.length(payload).alias("n_bytes"),
        ).alias("meta"),
    )


def decode_stub(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
    """STUB image decode: real pipelines put PIL/ffmpeg here; this container
    has neither, so emit deterministic fake dimensions derived from the bytes.
    The Arrow batch flow, schema contract, and partition behavior are the real
    thing — only the kernel is fake."""
    import pandas as pd

    for pdf in batches:
        n_bytes = pdf["payload"].map(len)
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "n_bytes": n_bytes,
                "fake_width": n_bytes % 640 + 1,
                "fake_height": n_bytes % 480 + 1,
                "fake_channels": n_bytes % 3 + 1,
            }
        )


def decode_features(multimodal: DataFrame) -> DataFrame:
    """Arrow-batched decode stage (mapInPandas) over the payload column."""
    return multimodal.select("doc_id", "payload").mapInPandas(decode_stub, schema=DECODED_SCHEMA)


def sample_frames(decoded: DataFrame, every_k: int = 7) -> DataFrame:
    """Frame sampling for video-style payloads: one output row per sampled
    frame index.  The frame count derives from the payload metadata (stub:
    n_bytes DIV 100 frames); real decoders swap the kernel, the explode-based
    row expansion is the production shape (no driver loops, prunes payloads).
    """
    n_frames = (F.col("n_bytes") / 100).cast("int") + 1
    return decoded.select(
        "doc_id",
        n_frames.alias("n_frames"),
        F.explode(F.sequence(F.lit(0), n_frames - 1, F.lit(every_k))).alias("frame_idx"),
    )


def chunk_audio(multimodal: DataFrame, chunk_ms: int = 5000) -> DataFrame:
    """Audio-style chunking: split each payload's timeline into fixed-length
    chunks (stub duration: 1 ms per payload byte; real decoders read the
    container header instead).  One output row per chunk via sequence +
    explode — metadata-driven, payload column never read, no driver loops;
    the final short chunk is clipped to the true duration.  A zero-byte
    payload is legal input and yields zero chunks: sequence(0, -1, step) is a
    runtime error in Spark, so the start list is guarded to an empty array
    (explode then drops the row, matching SQL UNNEST(RANGE(0, 0, step)))."""
    duration = F.col("meta.n_bytes").cast("bigint")
    starts = F.when(
        duration > 0,
        F.sequence(F.lit(0).cast("bigint"), duration - 1, F.lit(chunk_ms).cast("bigint")),
    ).otherwise(F.array().cast("array<bigint>"))
    return multimodal.select(
        "doc_id",
        duration.alias("duration_ms"),
        F.explode(starts).alias("chunk_start_ms"),
    ).select(
        "doc_id",
        "duration_ms",
        "chunk_start_ms",
        F.least(F.col("chunk_start_ms") + chunk_ms, F.col("duration_ms")).alias("chunk_end_ms"),
    )


def resize_stub(batches, target_w: int = 64, target_h: int = 64):
    """STUB resize kernel: real pipelines put PIL/opencv here.  Emits the
    post-resize metadata deterministically; the Arrow batch flow is real."""
    import pandas as pd

    for pdf in batches:
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "width": target_w,
                "height": target_h,
                "scale_x": target_w / pdf["fake_width"],
                "scale_y": target_h / pdf["fake_height"],
            }
        )


def resize_features(decoded: DataFrame, target_w: int = 64, target_h: int = 64) -> DataFrame:
    return decoded.mapInPandas(
        lambda it: resize_stub(it, target_w, target_h),
        schema="doc_id bigint, width int, height int, scale_x double, scale_y double",
    )


def caption_containment_gate(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    pair_img: str = "doc_id",
    pair_cap: str = "caption_doc",
    caption_tokens: int = 12,
    shingle_k: int = 3,
    gate_bp: int = 5000,
) -> DataFrame:
    """Image-text alignment gate (PURE operator — pairing comes in as data;
    bench queries plant their mis-pairings in their own layer): score each
    (image, caption) pair by CAPTION CONTAINMENT over word ``shingle_k``-gram
    shingles — the share of the caption's first ``caption_tokens`` tokens'
    shingles that appear anywhere in the image doc's text — and flag pairs
    at or above ``gate_bp`` basis points.  Scores are integer basis points
    (multiply-then-integer-divide): no float division in an oracle-checked
    aggregate.

    Scale: both shingle sides hash to 60-bit ints map-side (payload text
    never keys an exchange); the containment join is hash-equi on (doc, h)
    — cost ∝ caption shingles, i.e. ~``caption_tokens`` rows per image at
    any corpus size; the gate is a filterable flag so downstream stages
    prune misaligned pairs at the scan.
    """
    from airflow_cms_inpatient_etl_spark.operators.text import hash60, words
    from airflow_cms_inpatient_etl_spark.sources.registry import spread_scan

    # spread the degenerate single-file scan before the per-token md5 HOFs
    # (guarded no-op on a parallel production scan)
    toks = spread_scan(
        docs.select(id_col, words(F.col(text_col)).alias("__w")), id_col
    )

    def sh_hashes(arr):
        n = F.size(arr) - (shingle_k - 1)
        return F.when(
            n >= 1,
            F.transform(
                F.sequence(F.lit(1), F.greatest(n, F.lit(1))),
                lambda i: hash60(F.concat_ws(" ", F.slice(arr, i, shingle_k))),
            ),
        ).otherwise(F.array().cast("array<long>"))

    img_sh = toks.select(
        F.col(id_col), F.explode(sh_hashes(F.col("__w"))).alias("h")
    ).distinct()
    cap_sh = toks.select(
        F.col(id_col),
        F.explode(sh_hashes(F.slice(F.col("__w"), 1, caption_tokens))).alias("h"),
    ).distinct()
    c = cap_sh.select(F.col(id_col).alias(pair_cap), "h")
    i = img_sh.select(F.col(id_col).alias("__img_doc"), F.col("h").alias("__ih"))
    scored = (
        pairs.join(c, pair_cap)
        .join(
            i,
            (F.col(pair_img) == F.col("__img_doc")) & (F.col("h") == F.col("__ih")),
            "left",
        )
        .groupBy(pair_img, pair_cap)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_caption_shingles"),
            F.count("__ih").cast("long").alias("n_matched"),
        )
    )
    bp = F.expr("n_matched * 10000 div n_caption_shingles")
    return scored.select(
        pair_img,
        pair_cap,
        "n_caption_shingles",
        "n_matched",
        bp.cast("long").alias("align_bp"),
        (bp >= gate_bp).alias("is_aligned"),
    )


def transcript_containment_gate(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    pair_audio: str = "doc_id",
    pair_transcript: str = "transcript_doc",
    chunk_ms: int = 5000,
    gate_bp: int = 5000,
) -> DataFrame:
    """Audio-transcript ALIGNMENT gate (PURE operator — pairing comes in as
    data, exactly like ``caption_containment_gate``): score each (audio,
    transcript) pair by CHUNK-HASH CONTAINMENT — the share of the audio
    doc's DISTINCT ``chunk_ms``-segment content hashes that appear anywhere
    in the paired transcript's (likewise distinct) segment-hash set — and
    flag pairs at or above ``gate_bp`` basis points.  Set semantics are
    deliberate (and what the oracle checks): repeated identical chunks
    count once, so the score is containment of the distinct-hash set, not
    a per-segment coverage ratio.  Scores are integer basis points
    (multiply-then-integer-divide): no float division in an oracle-checked
    aggregate.

    The ASR kernel is replaced by the container's deterministic stub
    contract (``attach_binary_payload``: 1 payload byte = 1 ms, and a
    segment "transcribes" back to the text it covers), so a segment's
    transcription is the ``chunk_ms``-char substring at its offset and both
    sides chunk identically — a matched transcript contains every audio
    chunk hash (10000 bp); a swapped transcript shares none (~0 bp).

    Scale: chunk hashes are 60-bit ints derived map-side (payload text
    never keys an exchange); per-doc chunk count is duration/chunk_ms (the
    ``multimodal_audio_chunks`` explode); the containment join is hash-equi
    on (transcript_doc, h); the gate is a filterable flag so downstream
    ASR-training stages prune misaligned pairs at the scan.
    """
    from airflow_cms_inpatient_etl_spark.operators.text import hash60
    from airflow_cms_inpatient_etl_spark.sources.registry import spread_scan

    base = spread_scan(
        docs.select(F.col(id_col), F.col(text_col).alias("__t")), id_col
    )
    starts = F.when(
        F.length("__t") >= 1,
        F.sequence(F.lit(0), F.length("__t") - 1, F.lit(chunk_ms)),
    ).otherwise(F.array().cast("array<integer>"))
    chunk_hashes = F.transform(
        starts, lambda s: hash60(F.substring(F.col("__t"), s + 1, F.lit(chunk_ms)))
    )
    ch = base.select(F.col(id_col), F.explode(chunk_hashes).alias("h")).distinct()
    a = ch.select(F.col(id_col).alias(pair_audio), "h")
    t = ch.select(F.col(id_col).alias("__tr_doc"), F.col("h").alias("__th"))
    scored = (
        pairs.join(a, pair_audio)
        .join(
            t,
            (F.col(pair_transcript) == F.col("__tr_doc"))
            & (F.col("h") == F.col("__th")),
            "left",
        )
        .groupBy(pair_audio, pair_transcript)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_chunks"),
            F.count("__th").cast("long").alias("n_matched"),
        )
    )
    bp = F.expr("n_matched * 10000 div n_chunks")
    return scored.select(
        pair_audio,
        pair_transcript,
        "n_chunks",
        "n_matched",
        bp.cast("long").alias("align_bp"),
        (bp >= gate_bp).alias("is_aligned"),
    )


def scene_cut_segments(
    multimodal: DataFrame,
    frame_bytes: int = 100,
    modulus: int = 251,
    threshold: int = 125,
) -> DataFrame:
    """Video scene segmentation: per-frame feature → adjacent-frame delta →
    cut when the delta exceeds ``threshold`` → scenes as the running count of
    cuts (gaps-and-islands over the frame timeline) → one row per scene with
    its frame span and summed feature mass.

    The frame feature is a deterministic stub (``(n_bytes·(idx+1)) mod m`` —
    integer, oracle-checkable); real pipelines swap in a decoded histogram /
    embedding delta and keep everything downstream of the feature column
    unchanged.  Scale shape: the payload column is never read (metadata-driven
    explode, same as ``sample_frames``); ONE exchange on doc_id feeds both the
    lag window and the cumulative-sum window, and the final (doc_id, scene_id)
    aggregation reuses that partitioning (hash(doc_id) clusters every scene
    key), so the whole operator is explode → 1 shuffle → two window passes +
    partial agg, linear in total frames at any corpus size."""
    cuts = _scene_labeled_frames(multimodal, frame_bytes, modulus, threshold)
    return cuts.groupBy("doc_id", "scene_id").agg(
        F.min("frame_idx").alias("start_frame"),
        F.max("frame_idx").alias("end_frame"),
        F.count(F.lit(1)).alias("scene_frames"),
        F.sum("intensity").alias("sum_intensity"),
    )


def _scene_labeled_frames(
    multimodal: DataFrame, frame_bytes: int, modulus: int, threshold: int
) -> DataFrame:
    """Frame-level scene labeling shared by scene_cut_segments and
    scene_keyframes: (doc_id, frame_idx, intensity, scene_id) — the explode +
    lag-delta + running-sum chain over ONE doc_id exchange."""
    from pyspark.sql import Window as W

    n_bytes = F.col("meta.n_bytes").cast("bigint")
    n_frames = F.floor(n_bytes / frame_bytes) + 1
    frames = multimodal.select(
        "doc_id",
        n_bytes.alias("n_bytes"),
        F.explode(F.sequence(F.lit(0).cast("bigint"), n_frames - 1)).alias("frame_idx"),
    ).withColumn(
        "intensity", (F.col("n_bytes") * (F.col("frame_idx") + 1)) % modulus
    )
    timeline = W.partitionBy("doc_id").orderBy("frame_idx")
    return frames.withColumn(
        "is_cut",
        F.when(
            F.abs(
                F.col("intensity") - F.lag("intensity").over(timeline)
            ) > threshold,
            F.lit(1),
        ).otherwise(F.lit(0)),
    ).withColumn("scene_id", F.sum("is_cut").over(timeline))


def scene_keyframes(
    multimodal: DataFrame,
    frame_bytes: int = 100,
    modulus: int = 251,
    threshold: int = 125,
) -> DataFrame:
    """Keyframe selection per detected scene — the step video curation runs
    AFTER shot segmentation (one representative frame per shot feeds the
    captioner/embedder instead of every frame): the keyframe is the scene's
    max-feature frame, ties toward the earliest index (argmax via
    max(struct(intensity, -frame_idx)) — folds map-side under partial
    aggregation).  Same single doc_id exchange as scene_cut_segments; the
    keyframe aggregation reuses that partitioning."""
    cuts = _scene_labeled_frames(multimodal, frame_bytes, modulus, threshold)
    best = cuts.groupBy("doc_id", "scene_id").agg(
        F.count(F.lit(1)).alias("scene_frames"),
        F.max(
            F.struct(F.col("intensity"), (-F.col("frame_idx")).alias("neg"))
        ).alias("m"),
    )
    return best.select(
        "doc_id",
        "scene_id",
        (-F.col("m.neg")).cast("long").alias("keyframe_idx"),
        F.col("m.intensity").alias("keyframe_intensity"),
        "scene_frames",
    )
