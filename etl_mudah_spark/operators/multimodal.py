"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata, processed by Arrow-batched Pandas UDFs.

The decode step itself is STUBBED (no image/audio libraries in this
environment): ``decode_image``/``extract_audio_features`` raise
NotImplementedError unless given the deterministic fake decoder, which
produces reproducible pseudo-pixels from the payload bytes. Everything
Spark-side — schema (schemas.MEDIA_ASSETS), partitioning, mapInPandas
batch iteration, UDF signatures, output shapes — is real and tested.

Scale design: binary payloads ride in parquet binary columns;
``mapInPandas`` streams Arrow batches so one task never holds more
than ``spark.sql.execution.arrow.maxRecordsPerBatch`` payloads;
repartition by a size-balancing key (asset_id) before heavy decode so
skewed payload sizes don't strand one executor.
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

DECODE_SCHEMA = (
    "asset_id long, media_type string, n_bytes int, "
    "feat_mean double, feat_std double, thumb_w int, thumb_h int"
)


def fake_decode(payload: bytes, width: int, height: int) -> "np.ndarray":
    """Deterministic stand-in for a real image decode: expands the
    payload digest into a (height, width) float array. Same payload →
    same pixels, so tests are reproducible."""
    digest = hashlib.sha256(payload or b"").digest()
    rng = np.frombuffer(digest, dtype=np.uint8).astype(np.float64)
    n = max(int(width) * int(height), 1)
    reps = int(np.ceil(n / len(rng)))
    return np.tile(rng, reps)[:n].reshape((max(int(height), 1), -1)) / 255.0


def decode_image(payload: bytes, width: int, height: int) -> "np.ndarray":
    """Real decode — requires an image library not present here."""
    raise NotImplementedError(
        "image decoding requires an imaging library (e.g. PIL/opencv); "
        "use fake_decode for tests or inject a decoder into media_features"
    )


def media_features(
    assets: DataFrame,
    decoder: Callable[[bytes, int, int], "np.ndarray"] = fake_decode,
    thumb: tuple[int, int] = (8, 8),
) -> DataFrame:
    """Per-asset feature extraction over Arrow batches (mapInPandas).

    Output: payload size, mean/std of decoded pixels, thumbnail dims
    (the resize is a deterministic stride subsample — the real resize
    slots into the same seam).
    """
    tw, th = thumb

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for row in pdf.itertuples(index=False):
                payload = row.payload or b""
                # nullable ints arrive as NaN in Arrow batches
                w = 16 if pd.isna(row.width) or not row.width else int(row.width)
                h = 16 if pd.isna(row.height) or not row.height else int(row.height)
                px = decoder(payload, w, h)
                # stride subsample "resize" to the thumbnail grid
                ys = np.linspace(0, px.shape[0] - 1, th).astype(int)
                xs = np.linspace(0, px.shape[1] - 1, tw).astype(int)
                tn = px[np.ix_(ys, xs)]
                out.append(
                    (
                        row.asset_id,
                        row.media_type,
                        len(payload),
                        float(px.mean()),
                        float(px.std()),
                        tn.shape[1],
                        tn.shape[0],
                    )
                )
            yield pd.DataFrame(
                out,
                columns=[
                    "asset_id",
                    "media_type",
                    "n_bytes",
                    "feat_mean",
                    "feat_std",
                    "thumb_w",
                    "thumb_h",
                ],
            )

    cols = ["asset_id", "media_type", "payload", "width", "height"]
    return assets.select(*cols).mapInPandas(run, schema=DECODE_SCHEMA)


def frame_sample_plan(assets: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: one row per sampled frame timestamp
    (the decode of each frame is the stubbed seam). Pure Column algebra:
    sequence + explode — no Python until the decoder runs."""
    from pyspark.sql import functions as F

    return (
        assets.where(F.col("media_type") == "video")
        .withColumn(
            "frame_ts_ms",
            F.explode(
                F.sequence(
                    F.lit(0),
                    F.greatest(F.coalesce(F.col("duration_ms"), F.lit(0)) - 1, F.lit(0)),
                    F.lit(every_ms),
                )
            ),
        )
        .select("asset_id", "codec", "frame_ts_ms")
    )


def audio_window_plan(
    assets: DataFrame,
    window_ms: int = 500,
    hop_ms: int | None = None,
) -> DataFrame:
    """Audio analysis-window *plan*: one row per (possibly overlapping)
    analysis window over each audio asset — the audio twin of
    :func:`frame_sample_plan`, completing the image/audio/video seam
    set. Pure Column algebra (sequence + explode on duration); the
    per-window decode/feature step (spectrogram, MFCC, VAD) plugs into
    the same injectable-decoder mapInPandas seam as
    :func:`media_features` — no Python runs until it does.

    ``hop_ms`` defaults to ``window_ms`` (non-overlapping); a smaller
    hop gives the standard overlapped STFT framing. Windows are clipped
    to start strictly inside the asset; the final (possibly short)
    window carries ``win_len_ms`` so downstream padding is explicit.
    """
    from pyspark.sql import functions as F

    hop = hop_ms or window_ms
    dur = F.coalesce(F.col("duration_ms"), F.lit(0))
    return (
        assets.where((F.col("media_type") == "audio") & (dur > 0))
        .withColumn(
            "win_start_ms",
            F.explode(
                F.sequence(
                    F.lit(0),
                    F.greatest(dur - 1, F.lit(0)),
                    F.lit(hop),
                )
            ),
        )
        .select(
            "asset_id",
            "codec",
            "win_start_ms",
            F.least(
                F.lit(window_ms), dur - F.col("win_start_ms")
            ).alias("win_len_ms"),
        )
    )
