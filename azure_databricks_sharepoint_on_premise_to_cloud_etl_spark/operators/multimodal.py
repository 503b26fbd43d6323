"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata, processed via Arrow-batched mapInPandas.

The decode/feature-extract kernels are STUBS — the container has no
image/audio libraries — but the Spark-side plumbing (binary schema,
partitioning, Arrow batch shape, UDF signatures) is real and tested.
Swap ``_fake_decode`` for PIL/torchvision/ffmpeg in production; plan
shape and schema contracts don't change.

Scale notes: mapInPandas streams Arrow record batches — memory is
bounded by ``spark.sql.execution.arrow.maxRecordsPerBatch`` regardless
of partition size; heavy media decode parallelizes per-partition with
zero shuffle.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame

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


def extract_meta(
    df: DataFrame, payload_col: str, id_col: str = "doc_id"
) -> DataFrame:
    """Per-row media metadata via Arrow-batched mapInPandas."""
    import pandas as pd

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            metas = [_fake_decode(bytes(p)) for p in pdf[payload_col]]
            out = pd.DataFrame(metas)
            out.insert(0, id_col, pdf[id_col].to_numpy())
            yield out

    return df.select(id_col, payload_col).mapInPandas(run, schema=META_SCHEMA)


RESIZE_SCHEMA = "doc_id long, payload binary, out_width long, out_height long"


def resize_images(
    df: DataFrame,
    payload_col: str,
    target: tuple[int, int] = (224, 224),
    id_col: str = "doc_id",
) -> DataFrame:
    """Image-resize plumbing over mapInPandas: real Arrow binary-column
    batch shape, deterministic fake kernel (truncate/pad bytes to a
    size derived from the target box).  Swap the kernel for
    PIL.Image.resize in production — schema and plan are unchanged."""
    import pandas as pd

    w, h = target

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            fake_len = w * h // 64  # deterministic stand-in for encoded size
            out = pd.DataFrame(
                {
                    id_col: pdf[id_col].to_numpy(),
                    "payload": [
                        bytes(p)[:fake_len].ljust(fake_len, b"\0")
                        for p in pdf[payload_col]
                    ],
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
) -> DataFrame:
    """Video frame-sampling plumbing: one payload row fans out to
    multiple frame rows (the 1->N batch shape ffmpeg sampling
    produces).  Deterministic fake kernel: every ``every_n_bytes``
    slice of the payload is a 'frame'."""
    import pandas as pd

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for doc_id, p in zip(pdf[id_col], pdf[payload_col]):
                raw = bytes(p)
                for i in range(min(max_frames, max(1, len(raw) // every_n_bytes))):
                    ids.append(doc_id)
                    idxs.append(i)
                    frames.append(raw[i * every_n_bytes : (i + 1) * every_n_bytes])
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
