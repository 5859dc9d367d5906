"""Multimodal columns: image/audio/video as opaque ``binary`` + typed
metadata, processed by Arrow-batched ``mapInPandas`` operators.

Design for 100 TB: media bytes live in a ``BinaryType`` column (or a
pointer column + ``binaryFile`` scan); Spark never interprets them — all
decode/feature work happens in vectorized Pandas UDF batches on executors,
sized by ``spark.sql.execution.arrow.maxRecordsPerBatch``. Partitioning,
schema, and batch shape here are real and tested; the actual codec calls are
STUBBED (this container ships no PIL/ffmpeg/torchaudio): each decoder first
tries the real library and otherwise uses a deterministic fake derived from
the content hash, clearly marked below. Swapping in the real codec changes
ONE inner function, not the Spark plumbing.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from py_datalake_move_files_spark.functions.scaling import ensure_parallelism

#: typed metadata carried next to the opaque bytes
MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("mime", T.StringType()),
        T.StructField("content", T.BinaryType()),
        T.StructField("n_bytes", T.LongType()),
    ]
)

IMAGE_META_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("mime", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)

FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame_ms", T.LongType()),
        T.StructField("frame_digest", T.StringType()),
    ]
)

FEATURE_DIM = 16


def synth_media(df: DataFrame, id_col: str, *, mime: str = "image/fake") -> DataFrame:
    """Deterministic synthetic media column for tests/demo: bytes derived
    from the id (sha-like expansion). Real pipelines replace this with a
    ``binaryFile`` scan or a bytes column from upstream ingestion."""
    blob = F.to_binary(
        F.concat(*[F.md5(F.concat(F.lit(f"m{i}:"), F.col(id_col).cast("string"))) for i in range(4)]),
        F.lit("hex"),
    )
    return ensure_parallelism(df).select(
        F.col(id_col).alias("media_id"),
        F.lit(mime).alias("mime"),
        blob.alias("content"),
        F.length(blob).cast("long").alias("n_bytes"),
    )


def decode_images(media: DataFrame) -> DataFrame:
    """Image decode + feature extraction over Arrow batches (``mapInPandas``).

    Tries the real decoder (PIL) per executor; falls back to a deterministic
    STUB (content-hash expansion) — swap the marked inner function for
    ``PIL.Image.open(io.BytesIO(content))`` when the codec ships. Batch sizes
    follow ``spark.sql.execution.arrow.maxRecordsPerBatch`` (tested).

    The worker closure is fully self-contained (locals + stdlib/site-packages
    imports only) so it runs on executors that cannot import this package —
    module-level references would be pickled by name and fail there.
    """
    feature_dim = FEATURE_DIM

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib as _hashlib

        import numpy as _np
        import pandas as _pd

        try:  # pragma: no cover - codec not shipped in this container
            import PIL.Image  # noqa: F401

            real = True
        except ImportError:
            real = False

        def fake_decode(content: bytes):
            # STUB decoder — deterministic fake; replace with PIL here.
            h = _hashlib.md5(content).digest()
            width = 16 + h[0] % 64
            height = 16 + h[1] % 64
            rng = _np.frombuffer(h, dtype=_np.uint8).astype(_np.float32)
            return width, height, 3, _np.resize(rng / 255.0, feature_dim)

        for batch in batches:
            out = {
                "media_id": batch["media_id"],
                "mime": batch["mime"],
                "width": [],
                "height": [],
                "channels": [],
                "feature": [],
            }
            for content in batch["content"]:
                if real:  # pragma: no cover
                    raise NotImplementedError(
                        "real PIL decode path: wire Image.open here"
                    )
                w, h, c, feat = fake_decode(bytes(content))
                out["width"].append(w)
                out["height"].append(h)
                out["channels"].append(c)
                out["feature"].append(feat)
            yield _pd.DataFrame(out)

    return media.mapInPandas(run, IMAGE_META_SCHEMA)


def resize_features(decoded: DataFrame, *, out_dim: int = 8) -> DataFrame:
    """'Resize' stage: average-pool the feature vector to ``out_dim`` —
    pure Spark array expressions (no Python), demonstrating post-decode
    transforms staying JVM-side."""
    stride = FEATURE_DIM // out_dim
    pooled = F.expr(
        f"transform(sequence(0, {out_dim - 1}), i -> "
        f"aggregate(slice(feature, i * {stride} + 1, {stride}), 0D, "
        f"(acc, x) -> acc + x) / {stride})"
    )
    return decoded.withColumn("feature_pooled", pooled)


def sample_frames(media: DataFrame, *, every_ms: int = 1000, max_frames: int = 8) -> DataFrame:
    """Video frame sampling stub over ``mapInPandas``: emits one row per
    sampled frame (UDTF shape — output rows ≠ input rows). Frame count is
    derived deterministically from content length; digests stand in for the
    decoded frames (ffmpeg would produce them in the real path)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # self-contained worker closure: see decode_images
        import hashlib as _hashlib

        import pandas as _pd

        for batch in batches:
            rows = []
            for mid, content in zip(batch["media_id"], batch["content"]):
                data = bytes(content)
                n = min(max_frames, 1 + len(data) % max_frames)
                for i in range(n):
                    digest = _hashlib.md5(data + i.to_bytes(4, "big")).hexdigest()
                    rows.append((int(mid), i, i * every_ms, digest))
            yield _pd.DataFrame(
                rows, columns=["media_id", "frame_idx", "frame_ms", "frame_digest"]
            )

    return media.mapInPandas(run, FRAME_SCHEMA)
