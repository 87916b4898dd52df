"""Standing audio-dedup index (round 10) — the audio family riding the
image index's machinery VERBATIM: the 1-D waveform fingerprint already
packs into the SAME (doc_id, band, bv) shape as the image dHash
(4 x 16-bit bands, multimodal.audio_fp_from_samples), so every verb,
the ``bband`` bucketing, the uniqueness contract AND the near-dup gate
apply unchanged — only the band extractor differs (``audio_bands``:
stdlib WAV decode -> fingerprint, one Arrow pass).

With this module the modality matrix is complete: text (MinHash index),
embeddings (SRP/IVF/IVF-PQ indexes), images (dHash index), audio (this)
and video (frame-augmented dHash index) each have a persisted index, an
ingest-time incremental dedup gate, and the full lifecycle verbs backed
by the shared fold/manifest cores.

Scale design: identical to the image index — the fingerprint gate's
verify rule IS the image rule (plain Hamming <= DHASH_MAX_HAMMING over
the 4 bands), so the shared gate is reused as-is, not re-derived."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .image_index import (
    _bband_col,
    build_image_index,
    image_index_append,
    image_index_ingest_batch,
    incremental_image_dedup,
    incremental_image_dedup_sql,
)
from .multimodal import audio_fp_grid_sql, extract_audio_fp

# layout-only verbs: reused verbatim (they never look at band semantics)
from .image_index import compact_image_index as compact_audio_index  # noqa: E402,F401
from .image_index import (  # noqa: E402,F401
    compact_streamed_image_index as compact_streamed_audio_index,
)
from .image_index import image_index_delete as audio_index_delete  # noqa: E402,F401
from .image_index import read_image_index as read_audio_index  # noqa: E402,F401


def audio_bands(media: DataFrame) -> DataFrame:
    """(doc_id, band, bv, bband) for a batch of audio clips — the
    decode+fingerprint pass, run ONCE per batch.  Undecodable payloads
    are excluded (the image_bands rule); silent/constant clips keep their
    all-zero bands — they are TRUE near-dups of each other and the gate's
    batch-sized probe keeps the zero bucket benign (the image index's
    documented argument)."""
    return (
        extract_audio_fp(media)
        .filter(F.col("decode_ok"))
        .select(
            F.col("media_id").alias("doc_id"),
            "band",
            "bv",
        )
        .withColumn("bband", _bband_col())
    )


def build_audio_index(spark, media: DataFrame, path: str) -> None:
    """Bulk build — the image verb with the audio band extractor."""
    build_image_index(spark, media, path, bands_fn=audio_bands)


def audio_index_append(spark, path: str, media: DataFrame) -> None:
    """Flat-layout incremental maintenance — the image verb reused."""
    image_index_append(spark, path, media, bands_fn=audio_bands)


def audio_index_ingest_batch(
    spark, batch_media: DataFrame, batch_id: int, path: str
) -> None:
    """Replay-idempotent streamed landing — the image verb reused."""
    image_index_ingest_batch(
        spark, batch_media, batch_id, path, bands_fn=audio_bands
    )


def incremental_audio_dedup(
    spark, media: DataFrame, index_bands: DataFrame | None
) -> tuple[DataFrame, DataFrame]:
    """Dedup a batch of clips against the persisted fingerprint index and
    within the batch — the IMAGE gate verbatim (same verify rule: exact
    Hamming <= DHASH_MAX_HAMMING over the 4 bands), different extractor."""
    return incremental_image_dedup(
        spark, media, index_bands, bands_fn=audio_bands
    )


def incremental_audio_dedup_sql(
    d: str, split: int | str, table: str = "documents"
) -> str:
    """DuckDB oracle of the two-batch flow — the image oracle's
    s1/dup2/s2 body over the audio fingerprint's text-recomputed grid."""
    return incremental_image_dedup_sql(
        d, split, table, grid_sql_fn=audio_fp_grid_sql
    )


# ---------------------------------------------------------------------------
# SPECTRAL variant (round 11): the Walsh-Hadamard band-energy fingerprint
# (multimodal.audio_spectral_bands_from_samples — amplitude-robust where
# the waveform fingerprint's adjacent-sample ties collapse under
# quantized gain) packs into the SAME (doc_id, band, bv) shape, so the
# ENTIRE verb surface below is the image core with one different
# extractor — the bands_fn/grid_sql_fn hooks doing exactly what they
# were built for.  A production corpus keeps ONE of the two standing
# audio indexes (or both, as belt-and-braces recall); the gates are
# interchangeable by path.
# ---------------------------------------------------------------------------

from .multimodal import audio_spectral_grid_sql, extract_audio_spectral  # noqa: E402


def audio_spectral_bands(media: DataFrame) -> DataFrame:
    """(doc_id, band, bv, bband) for a batch of clips — the spectral
    decode+fingerprint pass (one Arrow stage), the audio_bands rule."""
    return (
        extract_audio_spectral(media)
        .filter(F.col("decode_ok"))
        .select(
            F.col("media_id").alias("doc_id"),
            "band",
            "bv",
        )
        .withColumn("bband", _bband_col())
    )


def build_audio_spectral_index(spark, media: DataFrame, path: str) -> None:
    """Bulk build — the image verb with the spectral extractor."""
    build_image_index(spark, media, path, bands_fn=audio_spectral_bands)


def audio_spectral_index_ingest_batch(
    spark, batch_media: DataFrame, batch_id: int, path: str
) -> None:
    """Replay-idempotent streamed landing — the image verb reused."""
    image_index_ingest_batch(
        spark, batch_media, batch_id, path, bands_fn=audio_spectral_bands
    )


def incremental_audio_spectral_dedup(
    spark, media: DataFrame, index_bands: DataFrame | None
) -> tuple[DataFrame, DataFrame]:
    """The image gate verbatim over the spectral fingerprint — rejects
    re-uploads the waveform gate misses (quantized volume changes)."""
    return incremental_image_dedup(
        spark, media, index_bands, bands_fn=audio_spectral_bands
    )


def _spectral_grid_as_bands(d: str, table: str = "documents") -> str:
    """grid_sql_fn hook shape: the spectral grid exposing ``bands``."""
    return audio_spectral_grid_sql(d, table, rel="bands")


def incremental_audio_spectral_dedup_sql(
    d: str, split: int | str, table: str = "documents"
) -> str:
    """DuckDB oracle of the two-batch flow — the image oracle's
    s1/dup2/s2 body over the spectral text-recomputed grid."""
    return incremental_image_dedup_sql(
        d, split, table, grid_sql_fn=_spectral_grid_as_bands
    )
