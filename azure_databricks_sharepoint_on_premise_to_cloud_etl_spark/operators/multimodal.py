"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata, processed via Arrow-batched mapInPandas.

Kernels come in two tiers.  General-purpose decode (JPEG/PNG/video)
remains STUBBED — the container has no image/audio libraries — with
the Spark-side plumbing (binary schema, partitioning, Arrow batch
shape, UDF signatures) real and tested; swap the kernel for
PIL/torchvision/ffmpeg in production, plan shape and schema contracts
don't change.  Uncompressed 24-bit BMP, however, is decodable in ~50
lines of pure Python (struct header parse + padded pixel rows), so
``decoder="bmp"`` / ``kernel="bmp"`` give ``extract_meta`` and
``resize_images`` one REAL end-to-end executable case: planted BMP
fixture in, true dimensions and nearest-neighbor-resized BMP out.

Scale notes: mapInPandas streams Arrow record batches — memory is
bounded by ``spark.sql.execution.arrow.maxRecordsPerBatch`` regardless
of partition size; heavy media decode parallelizes per-partition with
zero shuffle.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

from pyspark.sql import DataFrame


# --------------------------------------------------------------------------
# Pure-Python BMP codec (uncompressed 24-bit BITMAPINFOHEADER) — the one
# image format decodable without codec libraries.
# --------------------------------------------------------------------------


def decode_bmp(payload: bytes) -> dict:
    """Parse an uncompressed 24-bit bottom-up BMP: returns width,
    height, channels, and the pixel rows (top-to-bottom, each a list of
    (r, g, b) tuples)."""
    if len(payload) < 54:
        raise ValueError("truncated BMP payload (shorter than headers)")
    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload (missing 'BM' magic)")
    (pix_off,) = struct.unpack_from("<I", payload, 10)
    (hdr_size, width, height) = struct.unpack_from("<Iii", payload, 14)
    (planes, bpp) = struct.unpack_from("<HH", payload, 26)
    (compression,) = struct.unpack_from("<I", payload, 30)
    if hdr_size < 40 or bpp != 24 or compression != 0:
        raise ValueError(
            f"unsupported BMP variant (hdr={hdr_size}, bpp={bpp}, "
            f"compression={compression}) — only uncompressed 24-bit"
        )
    if height < 0:  # top-down variant
        height = -height
        row_order = range(height)
    else:
        row_order = range(height - 1, -1, -1)
    # Bound-check BEFORE the pixel loop: a corrupt/hostile header can
    # declare huge dimensions (unbounded executor allocation) or a
    # pixel offset past the payload (IndexError mid-loop, one bad row
    # failing the whole task).  Declared pixel data must fit the bytes
    # actually present.
    if width <= 0 or height <= 0 or width > 1 << 16 or height > 1 << 16:
        raise ValueError(f"implausible BMP dimensions {width}x{height}")
    row_stride = (width * 3 + 3) & ~3  # rows pad to 4-byte multiples
    if pix_off < 54 or pix_off + height * row_stride > len(payload):
        raise ValueError(
            f"truncated BMP: declared {height}x{row_stride}B rows at "
            f"offset {pix_off} exceed payload of {len(payload)}B"
        )
    rows = []
    for r in row_order:
        base = pix_off + r * row_stride
        row = []
        for c in range(width):
            b, g, rr = payload[base + c * 3 : base + c * 3 + 3]
            row.append((rr, g, b))
        rows.append(row)
    return {"width": width, "height": height, "channels": 3, "pixels": rows}


def encode_bmp(pixels: list[list[tuple[int, int, int]]]) -> bytes:
    """Encode top-to-bottom RGB pixel rows as an uncompressed 24-bit
    bottom-up BMP."""
    height = len(pixels)
    width = len(pixels[0]) if height else 0
    row_stride = (width * 3 + 3) & ~3
    pix_bytes = bytearray()
    for row in reversed(pixels):  # bottom-up storage
        for r, g, b in row:
            pix_bytes += bytes((b, g, r))
        pix_bytes += b"\0" * (row_stride - width * 3)
    header = struct.pack(
        "<2sIHHI", b"BM", 54 + len(pix_bytes), 0, 0, 54
    ) + struct.pack("<IiiHHIIiiII", 40, width, height, 1, 24, 0, len(pix_bytes), 2835, 2835, 0, 0)
    return bytes(header) + bytes(pix_bytes)


def resize_bmp(payload: bytes, target: tuple[int, int]) -> bytes:
    """Nearest-neighbor resize of a 24-bit BMP, re-encoded as BMP."""
    img = decode_bmp(payload)
    w, h = target
    sw, sh, px = img["width"], img["height"], img["pixels"]
    out = [
        [px[(y * sh) // h][(x * sw) // w] for x in range(w)]
        for y in range(h)
    ]
    return encode_bmp(out)

# Pure-Python WAV codec (RIFF/WAVE, PCM integer formats) — the audio
# sibling of the BMP codec above: gives the mapInPandas plumbing a
# REAL executable audio case (true sample rate / channels / duration
# from bytes) in a container with no audio libraries.


def decode_wav(payload: bytes) -> dict:
    """Parse a RIFF/WAVE header and its PCM ``fmt ``/``data`` chunks:
    returns sample_rate, channels, bits_per_sample, n_samples (PCM
    frames), duration_ms.  Compressed/float formats (audio_format !=
    1) raise — this codec exists for header truth, not playback.
    Chunk-walks the RIFF structure, so extra chunks (LIST/cue) before
    or between fmt and data parse fine; a declared data size past the
    payload end raises (truncated file)."""
    if len(payload) < 44:
        raise ValueError("truncated WAV payload (shorter than headers)")
    if payload[0:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a WAV payload (missing RIFF/WAVE magic)")
    pos = 12
    fmt = None
    data_size = None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        (csize,) = struct.unpack_from("<I", payload, pos + 4)
        body = pos + 8
        if cid == b"fmt ":
            if csize < 16 or body + 16 > len(payload):
                raise ValueError("truncated WAV fmt chunk")
            (
                audio_format,
                channels,
                sample_rate,
                _byte_rate,
                block_align,
                bits,
            ) = struct.unpack_from("<HHIIHH", payload, body)
            fmt = (audio_format, channels, sample_rate, block_align, bits)
        elif cid == b"data":
            if body + csize > len(payload):
                raise ValueError(
                    f"truncated WAV: declared {csize}B of data at "
                    f"offset {body}, payload is {len(payload)}B"
                )
            data_size = csize
            if fmt is not None:
                break
        # chunks are word-aligned: odd sizes carry a pad byte
        pos = body + csize + (csize & 1)
    if fmt is None or data_size is None:
        raise ValueError("WAV missing fmt or data chunk")
    audio_format, channels, sample_rate, block_align, bits = fmt
    if audio_format != 1:
        raise ValueError(
            f"unsupported WAV format {audio_format} (PCM-only codec)"
        )
    if channels < 1 or sample_rate < 1 or bits % 8 or bits == 0:
        raise ValueError(
            f"implausible WAV fmt: {channels}ch {sample_rate}Hz {bits}bit"
        )
    expect_align = channels * bits // 8
    if block_align != expect_align:
        raise ValueError(
            f"WAV block_align {block_align} != channels*bits/8 "
            f"{expect_align}"
        )
    n_samples = data_size // block_align
    return {
        "sample_rate": sample_rate,
        "channels": channels,
        "bits_per_sample": bits,
        "n_samples": n_samples,
        "duration_ms": round(n_samples * 1000 / sample_rate),
        "data_offset": pos + 8,
        "block_align": block_align,
    }


def encode_wav(
    samples: list[tuple[int, ...]], sample_rate: int = 8000, bits: int = 16
) -> bytes:
    """Planted-fixture encoder: PCM integer WAV from per-frame channel
    tuples (all frames same arity)."""
    channels = len(samples[0]) if samples else 1
    width = bits // 8
    block_align = channels * width
    data = bytearray()
    for frame in samples:
        for v in frame:
            data += int(v).to_bytes(width, "little", signed=bits > 8)
    hdr = b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
    hdr += b"fmt " + struct.pack(
        "<IHHIIHH",
        16,
        1,
        channels,
        sample_rate,
        sample_rate * block_align,
        block_align,
        bits,
    )
    hdr += b"data" + struct.pack("<I", len(data))
    return bytes(hdr + data)


META_SCHEMA = "doc_id long, n_bytes long, fake_width long, fake_height long, channels long"


def _fake_decode(payload: bytes) -> dict[str, int]:
    """Deterministic stand-in for an image decoder: derives pseudo
    dimensions from the byte length.  Replace with a real decoder
    (e.g. PIL.Image.open(io.BytesIO(payload))) in production."""
    n = len(payload)
    return {
        "n_bytes": n,
        "fake_width": n % 640,
        "fake_height": (n * 7) % 480,
        "channels": 3,
    }


BMP_META_SCHEMA = "doc_id long, n_bytes long, width long, height long, channels long"
WAV_META_SCHEMA = (
    "doc_id long, n_bytes long, sample_rate long, channels long, "
    "bits_per_sample long, n_samples long, duration_ms long"
)


def extract_meta(
    df: DataFrame,
    payload_col: str,
    id_col: str = "doc_id",
    decoder: str = "fake",
    on_error: str = "null",
) -> DataFrame:
    """Per-row media metadata via Arrow-batched mapInPandas.

    ``decoder="fake"`` (default) uses the deterministic byte-length
    stand-in; ``decoder="bmp"`` runs the REAL pure-Python BMP header
    parse — true width/height/channels from the payload bytes.

    ``on_error="null"`` (default) degrades a corrupt/truncated payload
    to null metadata columns instead of failing the task — over a real
    corpus one bad row must not kill the job.  ``on_error="raise"``
    keeps strict behavior for tests/debugging."""
    import pandas as pd

    if decoder == "bmp":
        def decode(p: bytes) -> dict:
            img = decode_bmp(p)
            return {
                "n_bytes": len(p),
                "width": img["width"],
                "height": img["height"],
                "channels": img["channels"],
            }
        schema = BMP_META_SCHEMA
        null_meta = {"n_bytes": None, "width": None, "height": None, "channels": None}
    elif decoder == "wav":
        def decode(p: bytes) -> dict:
            wav = decode_wav(p)
            return {
                "n_bytes": len(p),
                "sample_rate": wav["sample_rate"],
                "channels": wav["channels"],
                "bits_per_sample": wav["bits_per_sample"],
                "n_samples": wav["n_samples"],
                "duration_ms": wav["duration_ms"],
            }
        schema = WAV_META_SCHEMA
        null_meta = {
            "n_bytes": None, "sample_rate": None, "channels": None,
            "bits_per_sample": None, "n_samples": None, "duration_ms": None,
        }
    else:
        decode = _fake_decode
        schema = META_SCHEMA
        null_meta = {
            "n_bytes": None, "fake_width": None, "fake_height": None, "channels": None,
        }

    def safe_decode(p: bytes) -> dict:
        if on_error == "raise":
            return decode(p)
        try:
            return decode(p)
        except (ValueError, struct.error):
            return dict(null_meta)

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            metas = [safe_decode(bytes(p)) for p in pdf[payload_col]]
            out = pd.DataFrame(metas)
            out.insert(0, id_col, pdf[id_col].to_numpy())
            yield out

    return df.select(id_col, payload_col).mapInPandas(run, schema=schema)


RESIZE_SCHEMA = "doc_id long, payload binary, out_width long, out_height long"


def resize_images(
    df: DataFrame,
    payload_col: str,
    target: tuple[int, int] = (224, 224),
    id_col: str = "doc_id",
    kernel: str = "fake",
) -> DataFrame:
    """Image-resize over mapInPandas: real Arrow binary-column batch
    shape.  ``kernel="fake"`` (default) truncates/pads bytes to a size
    derived from the target box; ``kernel="bmp"`` runs the REAL
    pure-Python nearest-neighbor BMP resample and re-encode.  Swap for
    PIL.Image.resize for compressed formats in production — schema and
    plan are unchanged."""
    import pandas as pd

    w, h = target
    if kernel == "bmp":
        def resize(p: bytes) -> bytes:
            return resize_bmp(p, (w, h))
    else:
        fake_len = w * h // 64  # deterministic stand-in for encoded size

        def resize(p: bytes) -> bytes:
            return p[:fake_len].ljust(fake_len, b"\0")

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            out = pd.DataFrame(
                {
                    id_col: pdf[id_col].to_numpy(),
                    "payload": [bytes(resize(bytes(p))) for p in pdf[payload_col]],
                    "out_width": w,
                    "out_height": h,
                }
            )
            yield out

    return df.select(id_col, payload_col).mapInPandas(run, schema=RESIZE_SCHEMA)


FRAMES_SCHEMA = "doc_id long, frame_idx long, frame binary"


def sample_frames(
    df: DataFrame,
    payload_col: str,
    every_n_bytes: int = 64,
    max_frames: int = 8,
    id_col: str = "doc_id",
    kernel: str = "bytes",
) -> DataFrame:
    """Media frame-sampling plumbing: one payload row fans out to
    multiple frame rows (the 1->N batch shape ffmpeg sampling
    produces).

    ``kernel="bytes"`` (default) is the deterministic stand-in: every
    ``every_n_bytes`` slice of the payload is a 'frame'.
    ``kernel="wav"`` is a REAL executable audio case (the BMP-codec
    pattern applied to audio): the RIFF/PCM header is parsed with
    :func:`decode_wav` and up to ``max_frames`` EVENLY-SPACED PCM
    frames (one ``block_align``-byte slice per sampled frame) are
    emitted, ``frame_idx`` carrying the true PCM frame index — so
    downstream code can recover the sample time as
    ``frame_idx / sample_rate``."""
    import pandas as pd

    def frames_of(raw: bytes) -> list[tuple[int, bytes]]:
        if kernel == "wav":
            wav = decode_wav(raw)
            n, ba, off = wav["n_samples"], wav["block_align"], wav["data_offset"]
            take = min(max_frames, n)
            if take == 0:
                return []
            step = max(1, n // take)
            out = []
            for j in range(take):
                i = j * step
                out.append((i, raw[off + i * ba : off + (i + 1) * ba]))
            return out
        return [
            (i, raw[i * every_n_bytes : (i + 1) * every_n_bytes])
            for i in range(min(max_frames, max(1, len(raw) // every_n_bytes)))
        ]

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for doc_id, p in zip(pdf[id_col], pdf[payload_col]):
                for i, fr in frames_of(bytes(p)):
                    ids.append(doc_id)
                    idxs.append(i)
                    frames.append(fr)
            yield pd.DataFrame({id_col: ids, "frame_idx": idxs, "frame": frames})

    return df.select(id_col, payload_col).mapInPandas(run, schema=FRAMES_SCHEMA)


def decode_image_stub(payload: bytes):  # pragma: no cover - documented stub
    """Real decode entry point — not implementable in this container
    (no PIL/opencv). Raises by design; see module docstring."""
    raise NotImplementedError(
        "image decode requires PIL/opencv which are not available in the "
        "test container; the Spark plumbing around it is exercised via "
        "extract_meta's deterministic fake decoder"
    )


def frame_sample_stub(payload: bytes, every_n: int = 30):  # pragma: no cover
    """Video frame-sampling entry point — stub, as above."""
    raise NotImplementedError("video decode not available in this container")
