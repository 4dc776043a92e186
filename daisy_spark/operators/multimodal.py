"""Multimodal (image/audio/video) column handling.

Design: media payloads are opaque ``binary`` columns with a typed metadata
struct beside them — the lakehouse-standard layout (one row per asset,
bytes inline for small assets or a URI for large ones).  Heavy per-asset
work (decode, resize, frame-sample, feature-extract) runs as Arrow-batched
``mapInPandas`` so the Python worker sees columnar batches, never one row
at a time, and the operator parallelizes per input partition with no
shuffle.

The actual codecs (PIL/libav/...) are NOT available in this environment,
so the decode kernels are stubbed: :func:`register_codec` installs real
ones; the default ``"stub"`` codec produces deterministic pseudo-metadata
from the byte content, keeping every piece of Spark-side plumbing (schema,
batching, partitioning, UDF signatures) real and testable.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: decoded-asset metadata schema appended by decode_metadata()
MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("n_bytes", T.LongType()),
        T.StructField("format", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
    ]
)

Codec = Callable[[bytes], dict[str, Any]]


def _stub_codec(payload: bytes) -> dict[str, Any]:
    """Deterministic fake decode: metadata derived purely from the bytes.

    Replace via register_codec('image', real_fn) when PIL/av is present.
    """
    n = len(payload)
    return {
        "n_bytes": n,
        "format": "stub",
        # fake-but-deterministic dimensions so downstream logic is testable
        "width": (n % 640) + 1,
        "height": (n % 480) + 1,
        "n_frames": 1,
    }


def image_header_codec(payload: bytes) -> dict[str, Any]:
    """REAL decode path for image containers whose dimensions live in the
    header: PNG (IHDR), JPEG (first SOF0-SOF15 frame segment), GIF
    (logical screen descriptor).  Pure byte parsing — no media libraries
    — so it runs in any Python worker; full-pixel decoders slot in via
    register_codec the same way."""
    n = len(payload)
    meta: dict[str, Any] = {
        "n_bytes": n, "format": "unknown",
        "width": None, "height": None, "n_frames": 1,
    }
    if n >= 24 and payload[:8] == b"\x89PNG\r\n\x1a\n":
        meta["format"] = "png"
        meta["width"] = int.from_bytes(payload[16:20], "big")
        meta["height"] = int.from_bytes(payload[20:24], "big")
    elif n >= 4 and payload[:3] == b"\xff\xd8\xff":
        meta["format"] = "jpeg"
        i = 2
        while i + 9 <= n and payload[i] == 0xFF:
            marker = payload[i + 1]
            if marker in (0x01, 0xD8) or 0xD0 <= marker <= 0xD7:
                i += 2
                continue
            seglen = int.from_bytes(payload[i + 2 : i + 4], "big")
            if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                meta["height"] = int.from_bytes(payload[i + 5 : i + 7], "big")
                meta["width"] = int.from_bytes(payload[i + 7 : i + 9], "big")
                break
            i += 2 + seglen
    elif n >= 10 and payload[:6] in (b"GIF87a", b"GIF89a"):
        meta["format"] = "gif"
        meta["width"] = int.from_bytes(payload[6:8], "little")
        meta["height"] = int.from_bytes(payload[8:10], "little")
    return meta


_CODECS: dict[str, Codec] = {"stub": _stub_codec, "image": image_header_codec}


def register_codec(name: str, fn: Codec) -> None:
    _CODECS[name] = fn


def get_codec(name: str) -> Codec:
    if name not in _CODECS:
        raise NotImplementedError(
            f"codec {name!r} not installed in this environment; "
            f"register_codec({name!r}, fn) with a real decoder "
            f"(available: {sorted(_CODECS)})"
        )
    return _CODECS[name]


def decode_metadata(
    df: DataFrame,
    binary_col: str,
    codec: str = "stub",
    out_col: str = "media",
) -> DataFrame:
    """Append a decoded-metadata struct for each asset via mapInPandas.

    The Python worker receives Arrow record batches; per-batch we run the
    codec over a pandas Series (vectorizable for real codecs that accept
    buffers).  Output schema = input schema + the metadata struct, so the
    operator composes with any upstream/downstream DataFrame logic.
    """
    fn = get_codec(codec)
    in_schema = df.schema
    out_schema = T.StructType(
        list(in_schema.fields) + [T.StructField(out_col, MEDIA_META_SCHEMA)]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = [
                fn(bytes(b)) if b is not None else None
                for b in pdf[binary_col]
            ]
            out = pdf.copy()
            out[out_col] = metas
            yield out

    return df.mapInPandas(run, schema=out_schema)


def frame_sample(
    df: DataFrame,
    binary_col: str,
    every_n: int = 10,
    codec: str = "stub",
) -> DataFrame:
    """Explode a video asset into sampled frame rows (id columns carried
    through; frame payloads produced by the codec — stub yields empty
    bytes with deterministic frame indices).

    Scale shape: mapInPandas emits multiple rows per input row; partition
    count is preserved, so a repartition upstream sizes the decode tasks.
    """
    get_codec(codec)  # fail fast if missing
    id_fields = [f for f in df.schema.fields if f.name != binary_col]
    out_schema = T.StructType(
        id_fields
        + [
            T.StructField("frame_idx", T.IntegerType()),
            T.StructField("frame", T.BinaryType()),
        ]
    )
    id_names = [f.name for f in id_fields]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        fn = get_codec(codec)
        for pdf in batches:
            rows = []
            for _, row in pdf.iterrows():
                payload = row[binary_col]
                meta = fn(bytes(payload)) if payload is not None else None
                n_frames = meta["n_frames"] if meta else 0
                for i in range(0, n_frames, every_n):
                    rows.append(
                        {**{c: row[c] for c in id_names}, "frame_idx": i, "frame": b""}
                    )
            yield pd.DataFrame(
                rows, columns=id_names + ["frame_idx", "frame"]
            ) if rows else pd.DataFrame(columns=id_names + ["frame_idx", "frame"])

    return df.mapInPandas(run, schema=out_schema)


def media_profile(
    df: DataFrame, binary_col: str, id_col: str, codec: str = "stub"
) -> DataFrame:
    """Per-asset metadata row — the hash-checkable core of the decode path
    (byte length is codec-independent truth; stub dims are deterministic).
    """
    meta = decode_metadata(df.select(id_col, binary_col), binary_col, codec=codec)
    return meta.select(
        F.col(id_col),
        F.col("media.n_bytes").alias("n_bytes"),
        F.col("media.format").alias("format"),
        F.col("media.width").alias("width"),
        F.col("media.height").alias("height"),
    )
