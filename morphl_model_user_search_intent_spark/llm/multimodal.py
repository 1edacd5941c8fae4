"""Multimodal column support (SURVEY.md §2.11).

Two layers:

* q_multimodal — typed STRUCT bundling of text + metadata + embedding
  (documents ⋈ embeddings), oracle-checked by projecting the struct
  fields back out.
* q_multimodal_binary — the opaque-binary pattern for image/audio/
  video payloads: a binary column + typed metadata struct, processed
  by an Arrow-batched ``mapInPandas`` "decoder".  The real codec
  libraries are not in this container, so the decode step is a
  clearly-marked deterministic stand-in (see ``_decode_batch``);
  the Spark-side plumbing — schema, batch iteration, UDF signature —
  is real and tested.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import table
from ..registry import register


@register(
    "q_multimodal",
    oracle="""
    SELECT d.doc_id, d.lang, d.n_chars,
           e.label,
           CAST(len(e.embedding) AS INT) AS emb_dim,
           ROUND(sqrt(list_inner_product(CAST(e.embedding AS DOUBLE[]),
                                         CAST(e.embedding AS DOUBLE[]))), 6)
             AS emb_norm
    FROM documents d JOIN embeddings e ON e.vec_id = d.doc_id
    """,
)
def q_multimodal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal record assembly: one struct column per document
    bundling text metadata and its embedding, then field projection
    (nested access stays columnar — Parquet would store the struct
    fields as separate columns, so projecting ``bundle.meta.lang``
    reads one column at 100 TB, not the whole struct)."""
    d = table(spark, sf_dir, "documents")
    e = table(spark, sf_dir, "embeddings")
    norm = F.sqrt(
        F.aggregate(
            F.col("bundle.embedding"),
            F.lit(0.0),
            lambda acc, x: acc + x.cast("double") * x.cast("double"),
        )
    )
    return (
        d.join(e, e.vec_id == d.doc_id)
        .select(
            "doc_id",
            F.struct(
                F.struct("lang", "n_chars").alias("meta"),
                F.col("embedding"),
                F.col("label"),
            ).alias("bundle"),
        )
        .select(
            "doc_id",
            F.col("bundle.meta.lang").alias("lang"),
            F.col("bundle.meta.n_chars").alias("n_chars"),
            F.col("bundle.label").alias("label"),
            F.size("bundle.embedding").alias("emb_dim"),
            F.round(norm, 6).alias("emb_norm"),
        )
    )


# Typed output schema of the decode stage — this is the contract a
# real image/audio decoder would fill.
_DECODE_SCHEMA = (
    "doc_id bigint, fmt string, n_bytes int, checksum bigint, "
    "width int, height int"
)


def _decode_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Arrow-batched 'decoder' for opaque binary payloads.

    STUB: real codecs (PIL/ffmpeg/librosa) are not in this container
    (environment constraint) — in production this function body is
    the only thing that changes.  The stand-in derives deterministic
    pseudo-metadata from the bytes so tests have stable goldens:
    checksum = sum of bytes, width/height = simple byte-derived dims.
    """
    try:  # the real path, if a codec ever ships in the image
        import PIL  # noqa: F401

        have_codec = True
    except ImportError:
        have_codec = False

    for pdf in batches:
        payloads = pdf["payload"]
        n_bytes = payloads.map(len)
        checksum = payloads.map(lambda b: int(sum(b)))
        if have_codec:  # pragma: no cover - codec not present in CI
            raise NotImplementedError(
                "real image decode not wired; container has no codecs"
            )
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "fmt": pdf["fmt"],
                "n_bytes": n_bytes.astype("int32"),
                "checksum": checksum,
                "width": (checksum % 640).astype("int32"),
                "height": (n_bytes % 480).astype("int32"),
            }
        )


@register("q_multimodal_binary", oracle=None)
def q_multimodal_binary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Opaque-binary multimodal pipeline (rows-only).

    The document text stands in for an image payload: encode to a
    ``binary`` column with a typed metadata struct, then run the
    Arrow-batched decode/feature-extract stage via ``mapInPandas``.
    Partition sizing note: binary blobs make rows wide — at 100 TB
    keep ``spark.sql.files.maxPartitionBytes`` small enough that a
    batch of blobs fits executor memory, and select the binary column
    only inside the decode stage (column pruning drops it everywhere
    else).
    """
    d = table(spark, sf_dir, "documents")
    binary = d.select(
        "doc_id",
        F.encode("text", "utf-8").alias("payload"),
        F.lit("fake/img").alias("fmt"),
    )
    return binary.mapInPandas(_decode_batch, schema=_DECODE_SCHEMA)


# Frame-sampling contract: 1 payload row in → N sampled-frame rows out.
_FRAME_SCHEMA = (
    "doc_id bigint, frame_idx int, frame_offset int, frame_bytes int, "
    "resized_w int, resized_h int"
)

_FRAME_SIZE = 256  # bytes per pseudo-frame
_SAMPLE_EVERY = 4  # keep every 4th frame
_TARGET_W, _TARGET_H = 224, 224  # "resize" target


def _frame_sample_batch(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """Arrow-batched frame-sampler + resizer for opaque video payloads.

    STUB like :func:`_decode_batch` (no ffmpeg in this container): the
    payload is treated as a fixed-rate byte stream of 256-byte
    "frames"; every 4th frame is sampled and "resized" to a fixed
    224×224 target.  The production body swaps byte-slicing for real
    frame extraction — the Spark contract (fan-out row multiplicity,
    schema, batch iteration) is exactly what ships.
    """
    for pdf in batches:
        out: dict[str, list] = {k: [] for k in (
            "doc_id", "frame_idx", "frame_offset", "frame_bytes",
            "resized_w", "resized_h",
        )}
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            n_frames = max(1, len(payload) // _FRAME_SIZE)
            for idx in range(0, n_frames, _SAMPLE_EVERY):
                chunk = payload[idx * _FRAME_SIZE:(idx + 1) * _FRAME_SIZE]
                out["doc_id"].append(doc_id)
                out["frame_idx"].append(idx)
                out["frame_offset"].append(idx * _FRAME_SIZE)
                out["frame_bytes"].append(len(chunk))
                out["resized_w"].append(_TARGET_W)
                out["resized_h"].append(_TARGET_H)
        yield pd.DataFrame(out)


@register("q_multimodal_frames", oracle=None)
def q_multimodal_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sampling over opaque video-like payloads (rows-only): the
    1-row-in → N-frame-rows-out fan-out via ``mapInPandas``, the shape
    a video training-data pipeline runs before per-frame featurizers.

    Scale posture: fan-out multiplies row count ×(frames/sample-rate),
    so this stage must run AFTER any filtering joins and BEFORE
    repartitioning for the downstream featurizer; the binary column is
    selected only here (pruned everywhere else), and output batches
    stay bounded because each input batch contributes ≤
    batch_rows × max_frames rows streamed through Arrow.
    """
    d = table(spark, sf_dir, "documents")
    payloads = d.select(
        "doc_id", F.encode("text", "utf-8").alias("payload")
    )
    return payloads.mapInPandas(_frame_sample_batch, schema=_FRAME_SCHEMA)


@register(
    "q_multimodal_manifest",
    oracle="""
    WITH d AS (SELECT doc_id, n_chars, lang FROM documents),
    e AS (SELECT vec_id, len(embedding) AS dims FROM embeddings)
    SELECT d.lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN e.vec_id IS NOT NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_with_embedding,
           CAST(SUM(d.n_chars) AS BIGINT) AS text_bytes,
           CAST(MAX(e.dims) AS BIGINT) AS embedding_dims
    FROM d LEFT JOIN e ON e.vec_id = d.doc_id
    GROUP BY d.lang
    """,
)
def q_multimodal_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dataset manifest across modalities: per language, document
    counts, embedding coverage, raw text bytes, and vector
    dimensionality — the data card a multimodal training corpus
    ships with (and the first thing checked when a modality silently
    drops out of an ingest).

    One broadcast-able id join between the modality tables and a
    tiny rollup — the manifest is metadata-only, so at 100 TB it
    reads footer statistics and id columns, never payloads (the
    binary modality adds a byte-length column the same way via the
    binaryFile source, kept out of the oracle because DuckDB's
    fixture views carry no binary table).
    """
    d = table(spark, sf_dir, "documents").select(
        "doc_id", "n_chars", "lang"
    )
    e = table(spark, sf_dir, "embeddings").select(
        "vec_id", F.size("embedding").alias("dims")
    )
    return (
        d.join(e, d.doc_id == e.vec_id, "left")
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(
                F.when(F.col("vec_id").isNotNull(), 1).otherwise(0)
            ).alias("n_with_embedding"),
            F.sum("n_chars").alias("text_bytes"),
            F.max("dims").cast("bigint").alias("embedding_dims"),
        )
    )


# Audio contract: payload → fixed-size windows → per-window energy.
_AUDIO_SCHEMA = (
    "doc_id bigint, window_idx int, n_samples int, "
    "energy bigint, active int"
)

_SAMPLE_BYTES = 2  # pseudo 16-bit PCM
_WIN_SAMPLES = 64  # samples per analysis window
_HOP_SAMPLES = 32  # 50% overlap
_ENERGY_GATE = 120_000_000  # activity threshold on Σ sample²


def _audio_window_batch(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """Arrow-batched audio windower + energy gate (VAD shape).

    STUB like :func:`_decode_batch` (no soundfile/librosa in this
    container): the payload bytes are read as little-endian unsigned
    16-bit "PCM" samples, framed into 64-sample windows with 50%
    overlap, and gated on integer Σ sample² energy.  The production
    body swaps the byte view for a real decoder; the contract —
    1 payload row in → N window rows out, integer features, bounded
    Arrow batches — is exactly what ships for voice-activity
    segmentation of training audio.
    """
    import numpy as np

    for pdf in batches:
        out: dict[str, list] = {k: [] for k in (
            "doc_id", "window_idx", "n_samples", "energy", "active",
        )}
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            buf = bytes(payload)
            usable = (len(buf) // _SAMPLE_BYTES) * _SAMPLE_BYTES
            samples = np.frombuffer(buf[:usable], dtype="<u2").astype(
                np.int64
            )
            idx = 0
            start = 0
            while start < len(samples):
                win = samples[start:start + _WIN_SAMPLES]
                energy = int((win * win).sum())
                out["doc_id"].append(doc_id)
                out["window_idx"].append(idx)
                out["n_samples"].append(len(win))
                out["energy"].append(energy)
                out["active"].append(int(energy >= _ENERGY_GATE))
                idx += 1
                start += _HOP_SAMPLES
        yield pd.DataFrame(out)


@register("q_multimodal_audio", oracle=None)
def q_multimodal_audio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio windowing + energy-gate segmentation over opaque payloads
    (rows-only): the overlapped-window fan-out every speech pipeline
    runs before ASR/feature extraction, with integer per-window
    energies so the stub is exactly reproducible (the pytest twin
    recomputes a document's windows in pure Python and compares).

    Scale posture mirrors q_multimodal_frames: fan-out ×(len/hop)
    happens AFTER filters, binary column pruned everywhere else;
    per-window state is one int64, so executor memory is bounded by
    the Arrow batch size, not the audio length.
    """
    d = table(spark, sf_dir, "documents")
    payloads = d.select(
        "doc_id", F.encode("text", "utf-8").alias("payload")
    )
    return payloads.mapInPandas(_audio_window_batch, schema=_AUDIO_SCHEMA)
