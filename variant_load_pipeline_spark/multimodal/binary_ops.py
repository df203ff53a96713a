"""Multimodal (image/audio/video) column plumbing.

Media are opaque ``binary`` columns + typed metadata structs; the heavy
decode/feature steps run as Arrow-batched pandas iterators (``mapInPandas``)
so each executor processes whole record batches without per-row Python
overhead.  Image decode/resize are REAL for PNG via the pure-stdlib codec
in ``multimodal/png.py`` (codec='png', the default) and for baseline
JPEG (grayscale / 4:4:4 YCbCr) via ``multimodal/jpeg.py``
(codec='jpeg'); audio decode is REAL for PCM WAV via
``multimodal/wav.py`` (codec='wav'); MPEG audio (MP3/MP2/MP1) frame-
header METADATA — duration, bitrate, sample rate, channels, integrity —
is REAL via ``audio_metadata`` (``multimodal/mp3.py``).  The
deterministic ``fake`` codec remains for plumbing tests with arbitrary
payloads; full MP3 PCM decode and model embeddings stay stubbed until a
library / model runtime is provisioned (clearly-gated
NotImplementedError).

Design notes for 100 TB media:
* store media in parquet binary columns (or pointers to object storage) and
  ALWAYS carry (media_type, byte_len, content_hash) columns so planning,
  dedup, and skew handling never need to touch bytes;
* repartition by byte-size budget, not row count, before decode stages
  (``repartition_by_bytes``);
* decode outputs are fixed-schema structs so downstream stays columnar.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("media_type", T.StringType()),  # 'image'|'audio'|'video'
        T.StructField("payload", T.BinaryType()),
        T.StructField("byte_len", T.IntegerType()),
        T.StructField("content_hash", T.StringType()),
    ]
)

IMAGE_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_channels", T.IntegerType()),
        T.StructField("mean_intensity", T.DoubleType()),
    ]
)


def with_media_metadata(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Attach byte_len + content_hash (cheap, JVM-side) — the columns every
    downstream stage should predicate on instead of the bytes."""
    return df.withColumn(
        "byte_len", F.length(F.col(payload_col)).cast("int")
    ).withColumn("content_hash", F.md5(F.col(payload_col)))


def exact_media_dedup(df: DataFrame, id_col: str = "media_id") -> DataFrame:
    """Byte-exact dedup on content_hash; canonical survivor = min id."""
    return df.groupBy("content_hash").agg(
        F.min(id_col).alias("canonical_" + id_col),
        F.count(F.lit(1)).alias("n_copies"),
    )


def fake_decode_image(payload: bytes) -> dict:
    """Deterministic fake decoder: derives a plausible (width, height,
    channels, mean) from the bytes so the Spark plumbing is fully testable
    without codec libraries."""
    n = len(payload)
    width = 1 + (n % 64)
    height = 1 + ((n // 64) % 64)
    mean = (sum(payload[:256]) / min(n, 256)) if n else 0.0
    return {
        "width": width,
        "height": height,
        "n_channels": 3,
        "mean_intensity": round(mean, 6),
    }


def png_decode_features(payload: bytes) -> dict:
    """REAL decode via the pure-stdlib PNG codec (multimodal/png.py):
    parse chunks, inflate IDAT, undo scanline filters, report geometry +
    mean intensity over actual pixels."""
    from .png import decode_png

    img = decode_png(payload)
    h, w, c = img.shape
    return {
        "width": int(w),
        "height": int(h),
        "n_channels": int(c),
        "mean_intensity": round(float(img.mean()), 6),
    }


def jpeg_decode_features(payload: bytes) -> dict:
    """REAL decode via the pure-stdlib baseline JPEG codec
    (multimodal/jpeg.py): marker parse, Huffman decode, dequantize, IDCT,
    YCbCr->RGB; reports geometry + mean intensity over actual pixels.
    Grayscale scans report n_channels=1."""
    from .jpeg import decode_jpeg

    img = decode_jpeg(payload)
    if img.ndim == 2:
        h, w = img.shape
        c = 1
    else:
        h, w, c = img.shape
    return {
        "width": int(w),
        "height": int(h),
        "n_channels": int(c),
        "mean_intensity": round(float(img.mean()), 6),
    }


_DECODERS = {
    "fake": fake_decode_image,
    "png": png_decode_features,
    "jpeg": jpeg_decode_features,
}


def decode_images(
    df: DataFrame,
    id_col: str = "media_id",
    payload_col: str = "payload",
    codec: str = "png",
    on_error: str = "raise",
) -> DataFrame:
    """Decode/feature-extract images via mapInPandas (Arrow batches).

    ``codec='png'`` (default) runs the real pure-stdlib PNG decoder;
    ``codec='jpeg'`` runs the real pure-stdlib baseline JPEG decoder
    (grayscale / 4:4:4 YCbCr; progressive and subsampled scans raise a
    clear ValueError rather than mis-decoding); ``codec='fake'`` keeps
    the deterministic stub for plumbing tests with non-image payloads.
    WebP would slot in as a further ``_DECODERS`` entry when a library is
    provisioned.

    ``on_error='raise'`` (default) propagates decoder errors and FAILS
    THE TASK — right for pipelines whose inputs are supposed to be valid.
    ``on_error='null'`` emits a NULL-feature row for undecodable
    payloads instead, the crawl-keeps-flowing mode a 100 TB web corpus
    needs (one corrupt JPEG must not kill the job); filter on
    ``width IS NULL`` downstream.
    """
    if codec not in _DECODERS:
        raise NotImplementedError(
            f"codec '{codec}' requires an image library not present in this "
            f"environment; available: {sorted(_DECODERS)}"
        )
    if on_error not in ("raise", "null"):
        raise ValueError("on_error must be 'raise' or 'null'")
    decode = _DECODERS[codec]
    tolerant = on_error == "null"

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        cols = [f.name for f in IMAGE_FEATURES_SCHEMA.fields]
        null_row = {
            "width": None, "height": None,
            "n_channels": None, "mean_intensity": None,
        }

        def one(p) -> dict:
            raw = bytes(p) if p is not None else b""
            if not tolerant:
                return decode(raw)
            try:
                return decode(raw)
            except Exception:
                return dict(null_row)

        for pdf in batches:
            if not len(pdf):
                yield pd.DataFrame(columns=cols)
                continue
            ids = pdf[id_col].to_numpy()
            feats = [one(p) for p in pdf[payload_col]]
            out = pd.DataFrame(feats)
            out.insert(0, "media_id", ids)
            yield out[cols]

    return df.select(id_col, payload_col).mapInPandas(
        run, schema=IMAGE_FEATURES_SCHEMA
    )


def repartition_by_bytes(
    df: DataFrame, target_bytes_per_partition: int = 128 * 1024 * 1024
) -> DataFrame:
    """Size decode partitions by payload bytes, not row count — media rows
    vary by orders of magnitude and row-count partitioning guarantees skew."""
    total = df.agg(F.sum("byte_len")).collect()[0][0] or 0
    n = max(1, int(total / target_bytes_per_partition))
    return df.repartition(n)


def frame_sample_plan(
    df: DataFrame, every_nth: int = 30, id_col: str = "media_id"
) -> DataFrame:
    """Video frame-sampling PLAN: emits (media_id, frame_idx) rows for the
    frames a decoder would extract — the row-multiplication side of frame
    sampling is real Spark; the pixel decode stays behind ``decode_images``.
    Frame count is derived from byte_len via the fake codec's density."""
    n_frames = F.greatest(
        F.lit(1), (F.col("byte_len") / F.lit(1000)).cast("int")
    )
    return df.select(
        id_col,
        F.explode(
            F.sequence(
                F.lit(0), n_frames - 1, F.lit(every_nth)
            )
        ).alias("frame_idx"),
    )


EMBED_DIM = 16

EMBEDDING_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("embedding", T.ArrayType(T.DoubleType())),
    ]
)


def resize_images(
    df: DataFrame,
    width: int = 224,
    height: int = 224,
    id_col: str = "media_id",
    payload_col: str = "payload",
    codec: str = "png",
) -> DataFrame:
    """Resize stage: (media_id, payload) -> (media_id, payload, width,
    height) with the resized payload.  ``codec='png'`` / ``codec='jpeg'``
    decode, nearest-neighbor resize the actual pixels, and re-encode in
    the same format (pure-stdlib codecs); ``codec='fake'`` keeps the
    deterministic byte slice/pad stub for non-image payloads.  Batch
    shape — Arrow in, Arrow out, binary column preserved — is the
    pipeline contract either way."""
    if codec not in ("fake", "png", "jpeg"):
        raise NotImplementedError(
            f"codec '{codec}' requires an image library not present here"
        )
    target = width * height * 3

    def one(raw: bytes) -> bytes:
        if codec == "png":
            from .png import decode_png, encode_png, resize_nearest

            return encode_png(resize_nearest(decode_png(raw), width, height))
        if codec == "jpeg":
            from .jpeg import decode_jpeg, encode_jpeg
            from .png import resize_nearest

            return encode_jpeg(resize_nearest(decode_jpeg(raw), width, height))
        return (raw * (target // max(1, len(raw)) + 1))[:target]

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf[id_col].to_numpy(),
                    "payload": [
                        one(bytes(p) if p is not None else b"")
                        for p in pdf[payload_col]
                    ],
                    "width": width,
                    "height": height,
                }
            )[["media_id", "payload", "width", "height"]]

    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("payload", T.BinaryType()),
            T.StructField("width", T.IntegerType()),
            T.StructField("height", T.IntegerType()),
        ]
    )
    return df.select(id_col, payload_col).mapInPandas(run, schema=schema)


def extract_features(
    df: DataFrame,
    id_col: str = "media_id",
    payload_col: str = "payload",
    codec: str = "fake",
) -> DataFrame:
    """Feature-extraction stage: payload -> fixed-dim embedding
    (array<double>), the column the similarity/ANN operators consume.
    The fake encoder hashes byte windows into EMBED_DIM deterministic
    components; a real model server / ONNX kernel replaces `encode` only.
    For TEXT, a real model-free embedder exists: use
    ``operators.similarity.hash_embed`` (feature hashing), which feeds
    the quantize/LSH/top-k ANN stack end-to-end with an oracle gate."""
    if codec != "fake":
        raise NotImplementedError(
            f"codec '{codec}' requires a model runtime not present here; "
            "for text columns use operators.similarity.hash_embed instead"
        )

    def encode(raw: bytes) -> list[float]:
        import hashlib

        out = []
        for i in range(EMBED_DIM):
            h = hashlib.md5(raw + bytes([i])).digest()
            out.append(round(int.from_bytes(h[:4], "big") / 2**32, 6))
        return out

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            rows = [
                {
                    "media_id": getattr(r, id_col),
                    "embedding": encode(bytes(getattr(r, payload_col) or b"")),
                }
                for r in pdf.itertuples(index=False)
            ]
            yield pd.DataFrame(rows, columns=["media_id", "embedding"])

    return df.select(id_col, payload_col).mapInPandas(
        run, schema=EMBEDDING_SCHEMA
    )


AUDIO_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("n_frames", T.IntegerType()),
        T.StructField("n_channels", T.IntegerType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("duration_ms", T.IntegerType()),
        T.StructField("mean_abs_amplitude", T.DoubleType()),
    ]
)


AUDIO_METADATA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("n_frames", T.IntegerType()),
        T.StructField("n_channels", T.IntegerType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("duration_ms", T.IntegerType()),
        T.StructField("bitrate_kbps", T.IntegerType()),
        T.StructField("layer", T.IntegerType()),
        T.StructField("version", T.StringType()),
        T.StructField("clean_eof", T.StringType()),
    ]
)


def audio_metadata(
    df: DataFrame,
    id_col: str = "media_id",
    payload_col: str = "payload",
    codec: str = "mp3",
) -> DataFrame:
    """REAL compressed-audio METADATA stage: walk MPEG audio frame headers
    (multimodal/mp3.py — public ISO 11172-3/13818-3 tables) inside
    mapInPandas and report duration/bitrate/sample-rate/channel/integrity
    columns — everything a corpus filter predicates on, with no PCM
    decode.  Corrupt or truncated payloads flag clean_eof='F' instead of
    failing the batch."""
    if codec != "mp3":
        raise NotImplementedError(
            f"metadata codec '{codec}' not supported; available: ['mp3']"
        )

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        from .mp3 import mp3_metadata

        cols = [f.name for f in AUDIO_METADATA_SCHEMA.fields]
        for pdf in batches:
            if not len(pdf):
                yield pd.DataFrame(columns=cols)
                continue
            ids = pdf[id_col].to_numpy()
            feats = [
                mp3_metadata(bytes(p) if p is not None else b"")
                for p in pdf[payload_col]
            ]
            out = pd.DataFrame(feats)
            out.insert(0, "media_id", ids)
            yield out[cols]

    return df.select(id_col, payload_col).mapInPandas(
        run, schema=AUDIO_METADATA_SCHEMA
    )


VIDEO_METADATA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("duration_ms", T.IntegerType()),
        T.StructField("n_tracks", T.IntegerType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("video_codec", T.StringType()),
        T.StructField("has_video", T.StringType()),
        T.StructField("has_audio", T.StringType()),
        T.StructField("clean_eof", T.StringType()),
    ]
)


def video_metadata(
    df: DataFrame,
    id_col: str = "media_id",
    payload_col: str = "payload",
    container: str = "mp4",
) -> DataFrame:
    """REAL video-container METADATA stage: walk the ISO BMFF box tree
    (multimodal/mp4.py, ISO 14496-12) inside mapInPandas and report
    duration / track layout / codec fourcc / resolution / integrity —
    the columns video curation filters and frame-sampling plans key on.
    Bitstream decode stays behind ``decode_images``-style gates until a
    codec library is provisioned.  Corrupt payloads flag clean_eof='F'."""
    if container != "mp4":
        raise NotImplementedError(
            f"container '{container}' not supported; available: ['mp4']"
        )

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        from .mp4 import mp4_metadata

        cols = [f.name for f in VIDEO_METADATA_SCHEMA.fields]
        for pdf in batches:
            if not len(pdf):
                yield pd.DataFrame(columns=cols)
                continue
            ids = pdf[id_col].to_numpy()
            feats = [
                mp4_metadata(bytes(p) if p is not None else b"")
                for p in pdf[payload_col]
            ]
            out = pd.DataFrame(feats)
            out.insert(0, "media_id", ids)
            yield out[cols]

    return df.select(id_col, payload_col).mapInPandas(
        run, schema=VIDEO_METADATA_SCHEMA
    )


def decode_audio(
    df: DataFrame,
    id_col: str = "media_id",
    payload_col: str = "payload",
    codec: str = "wav",
) -> DataFrame:
    """Audio decode/feature stage via mapInPandas.  ``codec='wav'`` runs
    the REAL pure-stdlib PCM WAV decoder (multimodal/wav.py).  MP3 frame-
    header METADATA (duration/bitrate/rate/integrity) is real via
    ``audio_metadata``; full MP3 PCM decode (polyphase filterbank + MDCT)
    stays behind this gate until a library is provisioned."""
    if codec != "wav":
        raise NotImplementedError(
            f"codec '{codec}' requires an audio library not present here; "
            "available: ['wav'] (mp3 header metadata: audio_metadata())"
        )

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        from .wav import wav_features

        cols = [f.name for f in AUDIO_FEATURES_SCHEMA.fields]
        for pdf in batches:
            if not len(pdf):
                yield pd.DataFrame(columns=cols)
                continue
            ids = pdf[id_col].to_numpy()
            feats = [
                wav_features(bytes(p) if p is not None else b"")
                for p in pdf[payload_col]
            ]
            out = pd.DataFrame(feats)
            out.insert(0, "media_id", ids)
            yield out[cols]

    return df.select(id_col, payload_col).mapInPandas(
        run, schema=AUDIO_FEATURES_SCHEMA
    )


def image_dhash(
    df: DataFrame,
    id_col: str = "media_id",
    payload_col: str = "payload",
    codec: str = "png",
) -> DataFrame:
    """Perceptual difference-hash (dHash, public algorithm) over decoded
    images: grayscale by integer mean (r+g+b)//3, NEAREST-sample a 9x8
    grid (x_i = i*w//9, y_j = j*h//8), bit (j*8+i) set iff the right
    neighbor is strictly brighter — a 64-bit signature robust to
    re-encoding and resizing, the image-side analog of SimHash.  Bit 63
    makes the long negative (two's complement), matching the 64-bit
    text-hash convention; hamming distance = bit_count(a XOR b).

    Arrow-batched mapInPandas over the REAL decoder; output
    (id, width, height, dhash) stays columnar for the bucketed/banded
    near-dup joins downstream.
    """
    import numpy as np  # noqa: PLC0415
    import pandas as pd  # noqa: PLC0415
    from pyspark.sql import types as T  # noqa: PLC0415

    from .jpeg import decode_jpeg
    from .png import decode_png

    raw_decoders = {"png": decode_png, "jpeg": decode_jpeg}
    if codec not in raw_decoders:
        raise NotImplementedError(
            f"codec '{codec}' not available; have {sorted(raw_decoders)}"
        )
    decode = raw_decoders[codec]
    schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField("width", T.IntegerType()),
            T.StructField("height", T.IntegerType()),
            T.StructField("dhash", T.LongType()),
        ]
    )

    def run(batches):
        for pdf in batches:
            out = {id_col: [], "width": [], "height": [], "dhash": []}
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                img = decode(bytes(payload))
                if img.ndim == 2:
                    img = img[:, :, None]
                h, w = img.shape[:2]
                gray = (
                    img[:, :, :3].astype("int64").sum(axis=2) // 3
                    if img.shape[2] >= 3
                    else img[:, :, 0].astype("int64")
                )
                xs = (np.arange(9) * w) // 9
                ys = (np.arange(8) * h) // 8
                g = gray[np.ix_(ys, xs)]
                bits = (g[:, 1:] > g[:, :-1]).astype(np.uint64)
                weights = (
                    np.uint64(1)
                    << (
                        np.arange(8, dtype=np.uint64)[:, None] * np.uint64(8)
                        + np.arange(8, dtype=np.uint64)[None, :]
                    )
                )
                hv = np.int64(np.uint64((bits * weights).sum()))
                out[id_col].append(int(mid))
                out["width"].append(int(w))
                out["height"].append(int(h))
                out["dhash"].append(int(hv))
            yield pd.DataFrame(out)

    return df.select(id_col, payload_col).mapInPandas(run, schema=schema)


def audio_energy_hash(
    df: DataFrame,
    id_col: str = "media_id",
    payload_col: str = "payload",
    n_frames: int = 65,
) -> DataFrame:
    """Audio energy-gradient fingerprint — the audio analog of image
    dHash (the same family as spectral fingerprints, minus the FFT so
    the whole pipeline stays exactly integer-replayable): PCM decode,
    first channel, ``n_frames`` equal frames of the leading
    ``n_frames * (n // n_frames)`` samples, per-frame SUM of |sample|,
    bit f set iff frame f+1 is strictly louder than frame f — a
    ``n_frames - 1``-bit signature robust to uniform gain-free edits.
    Defaults give 64 bits packed into a BIGINT (bit 63 -> negative,
    the shared 64-bit convention); hamming = bit_count(xor).
    """
    import numpy as np  # noqa: PLC0415
    import pandas as pd  # noqa: PLC0415
    from pyspark.sql import types as T  # noqa: PLC0415

    from .wav import decode_wav  # noqa: PLC0415

    schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField("n_samples", T.IntegerType()),
            T.StructField("ahash", T.LongType()),
        ]
    )

    def run(batches):
        for pdf in batches:
            out = {id_col: [], "n_samples": [], "ahash": []}
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                samples, _rate = decode_wav(bytes(payload))
                ch0 = samples[:, 0].astype("int64")
                n = ch0.shape[0]
                frame_len = n // n_frames
                e = (
                    np.abs(ch0[: n_frames * frame_len])
                    .reshape(n_frames, frame_len)
                    .sum(axis=1)
                )
                bits = (e[1:] > e[:-1]).astype(np.uint64)
                weights = np.uint64(1) << np.arange(
                    n_frames - 1, dtype=np.uint64
                )
                hv = np.int64(np.uint64((bits * weights).sum()))
                out[id_col].append(int(mid))
                out["n_samples"].append(int(n))
                out["ahash"].append(int(hv))
            yield pd.DataFrame(out)

    return df.select(id_col, payload_col).mapInPandas(run, schema=schema)
