"""Multimodal column plumbing: binary payloads + typed metadata.

Design for a 100 TB multimodal corpus: media lives in an opaque
BINARY column with typed metadata columns beside it (modality, byte
size, content hash). Decode / feature-extraction / resize /
frame-sampling run as Arrow-batched Pandas functions over
``mapInPandas`` — one Python worker per partition, whole Arrow record
batches per call, never row-at-a-time.

Codec coverage: formats that need no external library decode FOR REAL
in-container — netpbm P5/P6 and uncompressed 24-bit BMP images (pure
numpy header+raster parse) and RIFF/WAV PCM audio (stdlib ``wave`` +
numpy). Compressed formats (PNG/JPEG/MP3/video containers) require
PIL/soundfile/ffmpeg, absent in this image, and raise
NotImplementedError at the exact worker call site a real decoder would
occupy; the deterministic ``codec="fake"`` path remains for plumbing
tests that want format-independent bytes.
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


def _parse_netpbm(b: bytes):
    """P5 (gray) / P6 (RGB) binary netpbm → HxWxC uint8 ndarray."""
    import numpy as np

    magic = b[:2]
    channels = 1 if magic == b"P5" else 3
    # header = magic + 3 ASCII ints (width height maxval), separated by
    # whitespace, with '#' comments allowed; raster starts after ONE
    # whitespace byte following maxval
    pos, vals = 2, []
    while len(vals) < 3:
        while pos < len(b) and b[pos : pos + 1].isspace():
            pos += 1
        if b[pos : pos + 1] == b"#":
            pos = b.index(b"\n", pos) + 1
            continue
        start = pos
        while pos < len(b) and not b[pos : pos + 1].isspace():
            pos += 1
        vals.append(int(b[start:pos]))
    pos += 1  # the single whitespace after maxval
    width, height, maxval = vals
    if maxval > 255:
        raise NotImplementedError("16-bit netpbm not supported")
    n = width * height * channels
    raster = np.frombuffer(b, dtype=np.uint8, count=n, offset=pos)
    return raster.reshape(height, width, channels)


def _parse_bmp(b: bytes):
    """Uncompressed 24-bit BMP → HxWx3 uint8 ndarray (RGB)."""
    import struct

    import numpy as np

    offset = struct.unpack_from("<I", b, 10)[0]
    width, height = struct.unpack_from("<ii", b, 18)
    bpp = struct.unpack_from("<H", b, 28)[0]
    compression = struct.unpack_from("<I", b, 30)[0]
    if bpp != 24 or compression != 0:
        raise NotImplementedError(
            f"only uncompressed 24-bit BMP supported (got bpp={bpp}, "
            f"compression={compression})"
        )
    flipped = height > 0  # positive height = bottom-up row order
    height = abs(height)
    row_bytes = (width * 3 + 3) & ~3  # rows pad to 4-byte boundaries
    rows = np.frombuffer(
        b, dtype=np.uint8, count=row_bytes * height, offset=offset
    ).reshape(height, row_bytes)[:, : width * 3]
    img = rows.reshape(height, width, 3)[:, :, ::-1]  # BGR → RGB
    return img[::-1] if flipped else img


def _png_header_dims(b: bytes) -> tuple[int, int, int]:
    """(height, width, channels) from a PNG IHDR chunk — pure byte
    parse, no codec. The IHDR is mandatory and always first (offset 8:
    length + 'IHDR' + width/height as big-endian u32 + bit depth +
    color type), so dimensions are readable without zlib."""
    import struct

    if b[12:16] != b"IHDR":
        raise ValueError("PNG missing IHDR")
    width, height = struct.unpack_from(">II", b, 16)
    color_type = b[25]
    channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}[color_type]
    return height, width, channels


def _jpeg_header_dims(b: bytes) -> tuple[int, int, int]:
    """(height, width, channels) from a JPEG SOF marker — walk the
    marker segments (0xFF <marker> <len16>) until a start-of-frame
    (SOF0-15, excluding DHT/JPG/DAC which share the 0xCn range) and
    read its dimension fields. No entropy decoding; works on any
    baseline or progressive JPEG."""
    i = 2
    n = len(b)
    while i + 9 < n:
        if b[i] != 0xFF:
            raise ValueError("bad JPEG marker stream")
        marker = b[i + 1]
        if marker == 0xFF:  # fill byte
            i += 1
            continue
        if marker == 0xD8 or 0xD0 <= marker <= 0xD7 or marker == 0x01:
            i += 2  # standalone markers carry no length
            continue
        if marker == 0xDA:  # start-of-scan: SOF must precede it
            break
        seg_len = int.from_bytes(b[i + 2 : i + 4], "big")
        if seg_len < 2:
            raise ValueError("bad JPEG segment length")
        if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
            height = int.from_bytes(b[i + 5 : i + 7], "big")
            width = int.from_bytes(b[i + 7 : i + 9], "big")
            channels = b[i + 9]
            return height, width, channels
        i += 2 + seg_len
    raise ValueError("no SOF marker before scan data")


def decode_image(payload: bytes, codec: str = "auto"):
    """Decode an image payload to an HxWxC uint8 ndarray.

    REAL for library-free formats — netpbm P5/P6 and uncompressed
    24-bit BMP — detected by magic bytes. PNG/JPEG/etc. need PIL or
    opencv (absent in this container) and raise NotImplementedError.
    ``codec="fake"`` keeps the deterministic byte-stat stub used by
    format-independent plumbing tests.
    """
    if codec == "fake":
        return (len(payload) % 31 + 1, len(payload) % 17 + 1)
    b = bytes(payload)
    if b[:2] in (b"P5", b"P6"):
        return _parse_netpbm(b)
    if b[:2] == b"BM":
        return _parse_bmp(b)
    raise NotImplementedError(
        f"image format {b[:4]!r} needs an external codec (PIL/opencv), "
        "absent in this container; P5/P6 netpbm and 24-bit BMP decode "
        "natively"
    )


def decode_audio(payload: bytes, codec: str = "auto"):
    """Decode an audio payload to (samples, sample_rate).

    REAL for RIFF/WAV PCM (stdlib ``wave`` + numpy): returns a
    float32 ndarray shaped (n_frames, n_channels) normalized to
    [-1, 1]. Compressed audio (MP3/OGG/FLAC) needs soundfile/librosa
    and raises NotImplementedError. ``codec="fake"`` keeps the stub.
    """
    if codec == "fake":
        return [b / 255.0 for b in payload[:16]]
    b = bytes(payload)
    if b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        raise NotImplementedError(
            f"audio format {b[:4]!r} needs an external codec "
            "(soundfile/librosa), absent in this container; WAV PCM "
            "decodes natively"
        )
    import io
    import wave

    import numpy as np

    with wave.open(io.BytesIO(b)) as w:
        channels = w.getnchannels()
        width = w.getsampwidth()
        rate = w.getframerate()
        raw = w.readframes(w.getnframes())
    if width == 2:
        samples = np.frombuffer(raw, dtype="<i2").astype(np.float32) / 32768.0
    elif width == 1:  # 8-bit WAV is unsigned
        samples = (
            np.frombuffer(raw, dtype=np.uint8).astype(np.float32) - 128.0
        ) / 128.0
    else:
        raise NotImplementedError(f"{width * 8}-bit PCM not supported")
    return samples.reshape(-1, channels), rate


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
            # NULL payloads feature as empty bytes — same no-crash
            # contract as describe_media.
            raw = pdf["payload"].map(lambda b: b"" if b is None else b)
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

    ``codec="auto"`` REALLY decodes (netpbm/BMP — see decode_image),
    converts to grayscale, and nearest-neighbor resamples to
    height×width (numpy index grids; no PIL needed). Compressed
    formats raise inside the worker exactly where a real decoder
    would run. The fake codec is a deterministic byte-grid
    downsample: payload bytes strided to height×width — cardinality,
    schema, and batch shape identical to the real operator.
    """
    import pandas as pd

    n_out = height * width

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import numpy as np

        for pdf in batches:
            pixels = []
            for b in pdf["payload"]:
                # NULL payloads resize like empty ones — never crash the
                # Arrow worker on corpus garbage.
                raw = (b"" if b is None else bytes(b)) or b"\x00"
                if codec == "fake":
                    stride = max(len(raw) // n_out, 1)
                    px = (raw[::stride] + raw * (n_out // len(raw) + 1))[:n_out]
                else:
                    img = decode_image(raw, codec)
                    gray = img.mean(axis=2).astype(np.uint8)
                    h_in, w_in = gray.shape
                    # nearest-neighbor: sample the source center of
                    # each output cell
                    ys = ((np.arange(height) + 0.5) * h_in / height).astype(int)
                    xs = ((np.arange(width) + 0.5) * w_in / width).astype(int)
                    px = gray[np.ix_(ys, xs)].tobytes()
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


MEDIA_SCHEMA = (
    "doc_id long, media_kind string, format string, height int, width int, "
    "channels int, sample_rate int, n_samples int, duration_s double, "
    "rms double"
)


def describe_media(df: DataFrame) -> DataFrame:
    """Arrow-batched media probe over (doc_id, payload): detect the
    format by magic bytes and emit typed metadata — image
    dims/channels for netpbm/BMP (full decode) and for PNG/JPEG
    (header-only parse: IHDR / SOF marker walk, no codec needed —
    compressed PIXEL decode stays library-blocked, but a 100 TB
    corpus audit mostly needs dimensions and format, which are pure
    bytes), sample rate / duration / RMS loudness for WAV PCM.
    Undecodable payloads row out with media_kind='unknown' (no
    recognizable magic) or 'corrupt' (recognized magic, bad
    structure) and NULL metrics — a probe that throws on garbage is
    useless. One pass, no shuffle: runs inside the scan partitions.
    """
    import pandas as pd

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import numpy as np

        for pdf in batches:
            out = {k: [] for k in (
                "doc_id", "media_kind", "format", "height", "width",
                "channels", "sample_rate", "n_samples", "duration_s", "rms",
            )}
            for doc_id, b in zip(pdf["doc_id"], pdf["payload"]):
                row = dict.fromkeys(out)
                row["doc_id"] = doc_id
                if b is None:
                    # NULL payloads are garbage, not errors: the probe's
                    # contract is that undecodable rows classify, never
                    # throw (bytes(None) would TypeError in the worker).
                    row["media_kind"] = "unknown"
                    for k, v in row.items():
                        out[k].append(v)
                    continue
                raw = bytes(b)
                try:
                    if raw[:2] in (b"P5", b"P6") or raw[:2] == b"BM":
                        row["format"] = "netpbm" if raw[:1] == b"P" else "bmp"
                        img = decode_image(raw)
                        row["media_kind"] = "image"
                        row["height"], row["width"], row["channels"] = img.shape
                    elif raw[:8] == b"\x89PNG\r\n\x1a\n":
                        row["format"] = "png"
                        row["media_kind"] = "image"
                        (
                            row["height"], row["width"], row["channels"],
                        ) = _png_header_dims(raw)
                    elif raw[:2] == b"\xff\xd8":
                        row["format"] = "jpeg"
                        row["media_kind"] = "image"
                        (
                            row["height"], row["width"], row["channels"],
                        ) = _jpeg_header_dims(raw)
                    elif raw[:4] == b"RIFF" and raw[8:12] == b"WAVE":
                        row["format"] = "wav"
                        samples, rate = decode_audio(raw)
                        row["media_kind"] = "audio"
                        row["sample_rate"] = rate
                        row["n_samples"] = samples.shape[0]
                        row["duration_s"] = (
                            round(samples.shape[0] / rate, 6) if rate else None
                        )
                        row["rms"] = (
                            round(float(np.sqrt((samples**2).mean())), 6)
                            if samples.size
                            else None
                        )
                    else:
                        row["media_kind"] = "unknown"
                except Exception:
                    row["media_kind"] = "corrupt"
                for k, v in row.items():
                    out[k].append(v)
            yield pd.DataFrame(out)

    return df.mapInPandas(run, schema=MEDIA_SCHEMA)


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
                raw = (b"" if b is None else bytes(b)) or b"\x00"
                chunk = max(len(raw) // n_frames, 1)
                for i in range(n_frames):
                    ids.append(doc_id)
                    idxs.append(i)
                    frames.append(raw[i * chunk : (i + 1) * chunk] or raw[-1:])
            yield pd.DataFrame(
                {"doc_id": ids, "frame_idx": idxs, "frame": frames}
            )

    return df.mapInPandas(run, schema=FRAME_SCHEMA)
