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


def extract_features(payloads: DataFrame, include_hex_sha: bool = False) -> DataFrame:
    """Arrow-batched feature extraction over the payload column.

    Deterministic byte-level features stand in for codec output; the
    distributed execution shape (mapInPandas over whole batches, typed
    output schema) is the real thing.

    ``include_hex_sha`` adds sha256 of the UPPERCASE hex encoding of
    the payload (matching ``sha2(hex(col))`` / DuckDB
    ``sha256(hex(content))``) in the same pass — callers needing both
    byte features and an engine-portable digest must not pay a second
    scan of the binary source for it.
    """
    import hashlib

    import pandas as pd

    schema = FEATURE_SCHEMA + (", hex_sha string" if include_hex_sha else "")

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            raw = pdf["payload"]
            cols = {
                "doc_id": pdf["doc_id"],
                "modality": pdf["modality"],
                "n_bytes": raw.map(len).astype("int32"),
                "content_sha": raw.map(
                    lambda b: hashlib.sha256(bytes(b)).hexdigest()
                ),
                "head_hex": raw.map(lambda b: bytes(b[:8]).hex()),
            }
            if include_hex_sha:
                cols["hex_sha"] = raw.map(
                    lambda b: hashlib.sha256(
                        bytes(b).hex().upper().encode()
                    ).hexdigest()
                )
            yield pd.DataFrame(cols)

    return payloads.mapInPandas(run, schema=schema)


RESIZE_SCHEMA = "doc_id long, height int, width int, pixels binary"


def resize_images(
    df: DataFrame, height: int = 8, width: int = 8, codec: str = "fake"
) -> DataFrame:
    """Arrow-batched image resize over (doc_id, payload).

    Real path (``codec="real"``) needs PIL/opencv — absent here, so it
    raises inside the worker exactly where a real decoder would run.
    The fake codec is a deterministic byte-grid downsample: payload
    bytes strided to height×width — cardinality, schema, and batch
    shape identical to the real operator.
    """
    import pandas as pd

    n_out = height * width

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            if codec != "fake":
                decode_image(b"", codec)  # raises NotImplementedError
            pixels = []
            for b in pdf["payload"]:
                raw = bytes(b) or b"\x00"
                stride = max(len(raw) // n_out, 1)
                px = (raw[::stride] + raw * (n_out // len(raw) + 1))[:n_out]
                pixels.append(px)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "height": height,
                    "width": width,
                    "pixels": pixels,
                }
            )

    return df.mapInPandas(run, schema=RESIZE_SCHEMA)


FRAME_SCHEMA = "doc_id long, frame_idx int, frame bytes".replace("bytes", "binary")


def sample_frames(
    df: DataFrame, n_frames: int = 4, codec: str = "fake"
) -> DataFrame:
    """Uniform frame sampling over a (doc_id, payload) 'video' column.

    Emits one row per sampled frame — mapInPandas legitimately changes
    cardinality, which is the point: a 100 TB video corpus fans out to
    frames *inside* the scan partition, with no shuffle and no driver
    involvement. Fake codec: the payload split into n_frames chunks.
    """
    import pandas as pd

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            if codec != "fake":
                raise NotImplementedError(
                    "video codecs not available in this container"
                )
            ids, idxs, frames = [], [], []
            for doc_id, b in zip(pdf["doc_id"], pdf["payload"]):
                raw = bytes(b) or b"\x00"
                chunk = max(len(raw) // n_frames, 1)
                for i in range(n_frames):
                    ids.append(doc_id)
                    idxs.append(i)
                    frames.append(raw[i * chunk : (i + 1) * chunk] or raw[-1:])
            yield pd.DataFrame(
                {"doc_id": ids, "frame_idx": idxs, "frame": frames}
            )

    return df.mapInPandas(run, schema=FRAME_SCHEMA)
