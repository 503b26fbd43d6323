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
