"""Multimodal column plumbing — image/audio/video as opaque binary.

The Spark-side machinery (schema, Arrow batch shape, partition sizing,
UDF signatures) is real and tested; the *decoders* are stubs because no
image/audio library exists in this container.  Each decoder first tries
the real library (PIL / soundfile) and otherwise produces a clearly
deterministic fake derived from the payload bytes, so pipelines and
tests exercise the full distributed path.

Scale notes (100 TB of media): binary payloads dominate row width —
``spark.sql.files.maxPartitionBytes`` and Arrow
``maxRecordsPerBatch`` bound memory per task; ``mapInPandas`` streams
one Arrow batch at a time so a task never holds a partition of blobs in
memory at once.  Feature extraction is embarrassingly parallel: no
shuffle until the (tiny) feature rows are aggregated.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),  # image | audio | video
        StructField("payload", BinaryType(), True),
        StructField("meta_format", StringType(), True),
        StructField("meta_bytes", LongType(), True),
    ]
)

IMAGE_FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("n_bytes", LongType(), False),
        StructField("sha256", StringType(), False),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("mode", StringType(), True),
    ]
)


def synthesize_media(df: DataFrame, id_col: str, text_col: str, kind: str = "image") -> DataFrame:
    """Deterministic opaque payloads from a text column (test corpus)."""
    payload = F.encode(F.col(text_col), "UTF-8").cast("binary")
    return df.select(
        F.col(id_col).cast("long").alias("media_id"),
        F.lit(kind).alias("kind"),
        payload.alias("payload"),
        F.lit("synthetic/utf8").alias("meta_format"),
        F.octet_length(payload).cast("long").alias("meta_bytes"),
    )


def _fake_decode_image(payload: bytes) -> tuple[int, int, str]:
    """Deterministic stand-in for image decode (no PIL in container).

    Derives plausible (width, height, mode) purely from payload bytes so
    every run and every engine agrees.
    """
    h = hashlib.sha256(payload).digest()
    width = 64 + h[0] % 192
    height = 64 + h[1] % 192
    mode = ["RGB", "RGBA", "L"][h[2] % 3]
    return width, height, mode


try:  # pragma: no cover - PIL absent in this container
    from PIL import Image  # noqa: F401

    _HAVE_PIL = True
except ImportError:
    _HAVE_PIL = False


def extract_image_features(media: DataFrame) -> DataFrame:
    """Distributed image feature extraction over Arrow batches.

    Real decode when PIL exists; otherwise the deterministic fake.  The
    mapInPandas iterator contract means one Arrow batch in flight per
    task regardless of blob size.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import io

        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                data = bytes(payload) if payload is not None else b""
                sha = hashlib.sha256(data).hexdigest()
                if _HAVE_PIL:  # pragma: no cover
                    try:
                        img = Image.open(io.BytesIO(data))
                        w, hgt, mode = img.width, img.height, img.mode
                    except Exception:
                        w, hgt, mode = _fake_decode_image(data)
                else:
                    w, hgt, mode = _fake_decode_image(data)
                rows.append((int(mid), len(data), sha, w, hgt, mode))
            yield pd.DataFrame(
                rows,
                columns=["media_id", "n_bytes", "sha256", "width", "height", "mode"],
            )

    return media.select("media_id", "payload").mapInPandas(run, IMAGE_FEATURE_SCHEMA)


AUDIO_FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("n_bytes", LongType(), False),
        StructField("sha256", StringType(), False),
        StructField("sample_rate", IntegerType(), True),
        StructField("n_channels", IntegerType(), True),
        StructField("duration_ms", LongType(), True),
    ]
)

try:  # pragma: no cover - soundfile absent in this container
    import soundfile  # noqa: F401

    _HAVE_SOUNDFILE = True
except ImportError:
    _HAVE_SOUNDFILE = False

_SAMPLE_RATES = [8000, 16000, 22050, 44100, 48000]


def _fake_decode_audio(payload: bytes) -> tuple[int, int, int]:
    """Deterministic stand-in for audio decode (no soundfile in container):
    (sample_rate, n_channels, duration_ms) derived from payload bytes,
    with duration consistent with a PCM16 payload of that length."""
    h = hashlib.sha256(payload).digest()
    rate = _SAMPLE_RATES[h[0] % len(_SAMPLE_RATES)]
    channels = 1 + h[1] % 2
    duration_ms = max(1, len(payload) * 1000 // (rate * channels * 2))
    return rate, channels, duration_ms


def extract_audio_features(media: DataFrame) -> DataFrame:
    """Distributed audio feature extraction — same mapInPandas contract
    as images: one Arrow batch in flight per task, real decode when
    soundfile exists, deterministic fake otherwise."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import io

        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                data = bytes(payload) if payload is not None else b""
                sha = hashlib.sha256(data).hexdigest()
                if _HAVE_SOUNDFILE:  # pragma: no cover
                    try:
                        info = soundfile.info(io.BytesIO(data))
                        rate, channels = info.samplerate, info.channels
                        duration_ms = int(info.frames * 1000 / info.samplerate)
                    except Exception:
                        rate, channels, duration_ms = _fake_decode_audio(data)
                else:
                    rate, channels, duration_ms = _fake_decode_audio(data)
                rows.append((int(mid), len(data), sha, rate, channels, duration_ms))
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id",
                    "n_bytes",
                    "sha256",
                    "sample_rate",
                    "n_channels",
                    "duration_ms",
                ],
            )

    return media.select("media_id", "payload").mapInPandas(run, AUDIO_FEATURE_SCHEMA)


def resize_images(media: DataFrame, width: int, height: int) -> DataFrame:
    """Resize stub: the real implementation needs an image library.

    Raises NotImplementedError inside the task when PIL is absent — the
    Spark-side plumbing (signature, schema, batching) is the deliverable.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not _HAVE_PIL:
                raise NotImplementedError(
                    "image resize requires PIL (not in this container); "
                    "plumbing is real — drop in the decoder to enable"
                )
            yield pdf  # pragma: no cover

    return media.mapInPandas(run, media.schema)


def sample_video_frames(media: DataFrame, every_n: int = 30) -> DataFrame:
    """Frame-sampling stub with deterministic fake frame offsets.

    A real decoder would demux the container; the fake derives a frame
    count from payload length so the explode/partition shape is realistic.
    """
    n_frames = F.greatest(F.floor(F.col("meta_bytes") / 100).cast("int"), F.lit(1))
    take = F.sequence(F.lit(0), n_frames - 1, F.lit(every_n))
    return media.select(
        "media_id",
        F.explode(take).alias("frame_idx"),
        F.sha2(
            F.concat(F.col("payload").cast("string"), F.lit("#frame")), 256
        ).alias("frame_key"),
    )
