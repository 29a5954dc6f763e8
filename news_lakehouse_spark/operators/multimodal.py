"""Multimodal column plumbing: binary payloads + typed metadata.

Design for a 100 TB multimodal corpus: media lives in an opaque
BINARY column with typed metadata columns beside it (modality, byte
size, content hash). Decode / feature-extraction / resize /
frame-sampling run as Arrow-batched Pandas functions over
``mapInPandas`` — one Python worker per partition, whole Arrow record
batches per call, never row-at-a-time.

The actual codecs (PIL/librosa/ffmpeg) are NOT in this container, so
the decode bodies are stubbed: `decode_image`/`decode_audio` raise
NotImplementedError unless given the deterministic fake codec, and
`extract_features` ships a real, deterministic byte-level feature so
the full Spark plumbing (schema, batching, partition shape) is
exercised and tested end-to-end.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_SCHEMA = (
    "doc_id long, modality string, n_bytes int, content_sha string, "
    "head_hex string"
)


def with_binary_payload(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Pack a column into the canonical (payload, modality, n_bytes)
    multimodal shape. Real corpora read the payload from object
    storage; the test corpus synthesizes it from text."""
    return df.select(
        F.col(id_col),
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
        F.lit("text").alias("modality"),
        F.octet_length(F.col(text_col)).alias("n_bytes"),
    )


def decode_image(payload: bytes, codec: str = "real"):
    """STUB: image decode requires PIL/opencv, absent in this image.

    reference point: a real implementation decodes to HxWxC uint8 and
    is called from extract_features' mapInPandas loop — the Spark-side
    contract is unchanged."""
    if codec == "fake":
        # deterministic fake: 'decode' to (height, width) from byte stats
        return (len(payload) % 31 + 1, len(payload) % 17 + 1)
    raise NotImplementedError("image codecs not available in this container")


def decode_audio(payload: bytes, codec: str = "real"):
    """STUB: audio decode requires soundfile/librosa, absent here."""
    if codec == "fake":
        return [b / 255.0 for b in payload[:16]]
    raise NotImplementedError("audio codecs not available in this container")


def extract_features(payloads: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over the payload column.

    Deterministic byte-level features stand in for codec output; the
    distributed execution shape (mapInPandas over whole batches, typed
    output schema) is the real thing.
    """
    import hashlib

    import pandas as pd

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            raw = pdf["payload"]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "modality": pdf["modality"],
                    "n_bytes": raw.map(len).astype("int32"),
                    "content_sha": raw.map(
                        lambda b: hashlib.sha256(bytes(b)).hexdigest()
                    ),
                    "head_hex": raw.map(lambda b: bytes(b[:8]).hex()),
                }
            )

    return payloads.mapInPandas(run, schema=FEATURE_SCHEMA)
