"""Pure-Python sequential-DCT JPEG codec: round-trip pixel truth,
subsampling/restart-marker decode paths, corrupt-payload degradation,
and the Spark extract_meta / resize_images legs over planted fixtures.

Reference parity note: the reference pipelines treat attachments as
opaque binaries (SURVEY.md multimodal extension); the codec itself is
built from the public ITU T.81 spec, not from any reference code.
"""

from __future__ import annotations

import numpy as np
import pytest

from azure_databricks_sharepoint_on_premise_to_cloud_etl_spark.operators import multimodal


def _gradient(w: int, h: int) -> list[list[tuple[int, int, int]]]:
    return [
        [((x * 16) % 256, (y * 16) % 256, (x * y) % 256) for x in range(w)]
        for y in range(h)
    ]


def _gray_rgb(w: int, h: int) -> list[list[tuple[int, int, int]]]:
    """r=g=b ramp: neutral chroma, so 4:2:0 loses nothing in chroma."""
    return [
        [((x * 5 + y * 3) % 256,) * 3 for x in range(w)] for y in range(h)
    ]


def _max_err(a, b) -> float:
    return float(np.abs(np.array(a, float) - np.array(b, float)).max())


def test_jpeg_roundtrip_444_pixel_truth():
    px = _gradient(16, 16)
    raw = multimodal.encode_jpeg(px, quant=2)
    img = multimodal.decode_jpeg(raw)
    assert (img["width"], img["height"], img["channels"]) == (16, 16, 3)
    # quant step 2 on an orthonormal DCT bounds reconstruction error
    # to a few counts; 4 leaves slack for the YCbCr rounding
    assert _max_err(px, img["pixels"]) <= 4.0


def test_jpeg_roundtrip_non_multiple_of_8_dims():
    px = _gradient(13, 9)  # exercises edge-replication padding
    img = multimodal.decode_jpeg(multimodal.encode_jpeg(px, quant=2))
    assert (img["width"], img["height"]) == (13, 9)
    assert _max_err(px, img["pixels"]) <= 4.0


def test_jpeg_grayscale_roundtrip():
    g = [
        [((x * 7 + y * 11) % 256,) * 3 for x in range(9)] for y in range(13)
    ]
    img = multimodal.decode_jpeg(
        multimodal.encode_jpeg(g, quant=2, grayscale=True)
    )
    assert (img["width"], img["height"], img["channels"]) == (9, 13, 1)
    assert _max_err(g, img["pixels"]) <= 2.0


def test_jpeg_420_subsampled_mcu_interleave():
    """4:2:0 exercises the generic MCU interleave (4 luma blocks + 2
    chroma blocks per MCU).  Neutral-chroma input makes subsampling
    lossless, so any interleave/upsample bug shows as pixel error."""
    gg = _gray_rgb(20, 17)
    raw = multimodal.encode_jpeg(gg, quant=2, subsample=(2, 2))
    img = multimodal.decode_jpeg(raw)
    assert (img["width"], img["height"], img["channels"]) == (20, 17, 3)
    assert _max_err(gg, img["pixels"]) <= 2.0


def test_jpeg_restart_markers_reset_predictors():
    px = _gradient(16, 16)
    base = multimodal.decode_jpeg(multimodal.encode_jpeg(px, quant=2))
    rst = multimodal.decode_jpeg(
        multimodal.encode_jpeg(px, quant=2, restart_interval=2)
    )
    assert _max_err(base["pixels"], rst["pixels"]) == 0.0


def test_jpeg_decoder_reads_tables_from_dht_not_convention():
    """The decoder must use the file's own DQT/DHT segments: a coarser
    quantizer changes the byte stream but still round-trips."""
    px = _gradient(16, 16)
    img = multimodal.decode_jpeg(multimodal.encode_jpeg(px, quant=8))
    assert _max_err(px, img["pixels"]) <= 16.0  # q=8 -> coarser


def test_jpeg_corrupt_and_hostile_payloads_raise_value_error():
    px = _gradient(16, 16)
    raw = multimodal.encode_jpeg(px, quant=2)
    for bad in (b"", b"\x00" * 10, b"\xff\xd8\x00", raw[:30], raw[:-5]):
        with pytest.raises(ValueError):
            multimodal.decode_jpeg(bad)
    # progressive profile refused with a clear message
    prog = bytearray(raw)
    i = raw.find(b"\xff\xc0")
    prog[i + 1] = 0xC2
    with pytest.raises(ValueError, match="progressive|profile"):
        multimodal.decode_jpeg(bytes(prog))
    # hostile declared dimensions bounded before allocation
    huge = bytearray(raw)
    import struct

    huge[i + 5 : i + 9] = struct.pack(">HH", 65535, 65535)
    with pytest.raises(ValueError, match="implausible"):
        multimodal.decode_jpeg(bytes(huge))


def test_resize_jpeg_dims_and_content():
    px = [[(200, 30, 90)] * 12 for _ in range(12)]  # flat color
    raw = multimodal.encode_jpeg(px, quant=2)
    out = multimodal.decode_jpeg(multimodal.resize_jpeg(raw, (6, 6)))
    assert (out["width"], out["height"]) == (6, 6)
    assert _max_err([[(200, 30, 90)] * 6 for _ in range(6)], out["pixels"]) <= 6.0


def test_extract_meta_real_jpeg_decode(spark):
    rows = [
        (1, multimodal.encode_jpeg(_gradient(16, 16), quant=2)),
        (2, multimodal.encode_jpeg(_gradient(13, 9), quant=2)),
        (3, multimodal.encode_jpeg(
            _gray_rgb(20, 17), quant=2, subsample=(2, 2)
        )),
        (4, b"not a jpeg at all"),
    ]
    df = spark.createDataFrame(rows, "doc_id LONG, payload BINARY")
    out = {
        r["doc_id"]: r
        for r in multimodal.extract_meta(
            df, "payload", decoder="jpeg"
        ).collect()
    }
    assert (out[1]["width"], out[1]["height"], out[1]["channels"]) == (16, 16, 3)
    assert (out[2]["width"], out[2]["height"]) == (13, 9)
    assert (out[3]["width"], out[3]["height"]) == (20, 17)
    assert out[4]["width"] is None  # corrupt row degrades, task survives
    with pytest.raises(Exception):
        multimodal.extract_meta(
            df, "payload", decoder="jpeg", on_error="raise"
        ).collect()


def test_resize_images_jpeg_kernel(spark):
    raw = multimodal.encode_jpeg(_gradient(16, 16), quant=2)
    df = spark.createDataFrame([(7, raw)], "doc_id LONG, payload BINARY")
    out = multimodal.resize_images(
        df, "payload", target=(8, 8), kernel="jpeg"
    ).collect()
    assert len(out) == 1 and out[0]["out_width"] == 8
    img = multimodal.decode_jpeg(bytes(out[0]["payload"]))
    assert (img["width"], img["height"]) == (8, 8)
