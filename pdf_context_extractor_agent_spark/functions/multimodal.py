"""Multimodal columns: images/audio/video as opaque ``binary`` + typed
metadata, processed by Arrow-batched kernels.

Decode tiers, probed in order inside the kernels:

* the deterministic FAKE containers (:func:`make_fake_image` /
  :func:`make_fake_audio`) — the oracle path: feature values are
  restatable in plain SQL, so every operator stays value-checked;
* REAL stdlib codecs — 8-bit non-interlaced PNG (zlib chunk walk +
  all five row filters, :func:`_decode_png`) and 16-bit PCM WAV
  (``wave``, :func:`_decode_wav`) — genuine files from any tool
  decode with no third-party dependency;
* PIL / soundfile when importable (absent in this container) for the
  remaining compressed formats (JPEG/mp3/…), else an honest
  ``NotImplementedError``.

Everything AROUND the decode — schemas, mapInPandas batch shapes,
partitioning, feature extraction on the decoded buffer — is identical
across tiers, so the oracle certifies the math and the real-codec
tests certify the decode.
"""

from __future__ import annotations

import struct
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

try:  # pragma: no cover - not present in this container
    from PIL import Image  # noqa: F401
    _HAS_PIL = True
except Exception:
    _HAS_PIL = False

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),       # image | audio | video
        T.StructField("payload", T.BinaryType(), True),     # opaque bytes
        T.StructField("meta", T.StructType([
            T.StructField("width", T.IntegerType()),
            T.StructField("height", T.IntegerType()),
            T.StructField("frames", T.IntegerType()),
            T.StructField("mime", T.StringType()),
        ])),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("mean_intensity", T.DoubleType()),
        T.StructField("histogram", T.ArrayType(T.DoubleType())),  # 8 bins
    ]
)

_MAGIC = b"FAKEIMG1"


def make_fake_image(media_id: int, width: int = 16, height: int = 16) -> bytes:
    """Deterministic FAKE image container: magic + dims + row-major
    uint8 pixels derived from (id, x, y)."""
    px = bytes(((media_id * 31 + x * 7 + y * 13) % 256) for y in range(height) for x in range(width))
    return _MAGIC + struct.pack("<II", width, height) + px


_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"

# integer ITU-R BT.601 luma weights (×1000) — the standard RGB→gray
# reduction, kept integer-exact so decoded features are cross-engine
# verifiable like everything else in this module
_LUMA = (299, 587, 114)


def _decode_png(data: bytes) -> tuple[int, int, np.ndarray]:
    """Pure-stdlib PNG decoder (zlib + numpy): 8-bit gray / gray+alpha /
    RGB / RGBA / palette, all five row filters, non-interlaced.

    This is a REAL codec — any non-interlaced 8-bit PNG from any tool
    decodes — implemented on zlib so the sandbox (which carries no
    image libraries) still exercises a genuine decode path. Interlaced
    or 16-bit files raise: honesty over silent corruption. RGB reduces
    to BT.601 integer luma; alpha is ignored (features are computed on
    intensity).
    """
    pos = 8
    w = h = None
    bit_depth = color_type = interlace = 0
    idat = bytearray()
    palette: np.ndarray | None = None
    while pos + 8 <= len(data):
        (ln,) = struct.unpack(">I", data[pos:pos + 4])
        typ = data[pos + 4:pos + 8]
        chunk = data[pos + 8:pos + 8 + ln]
        pos += 12 + ln  # length + type + data + crc
        if typ == b"IHDR":
            w, h, bit_depth, color_type, _c, _f, interlace = struct.unpack(
                ">IIBBBBB", chunk
            )
        elif typ == b"PLTE":
            palette = np.frombuffer(chunk, dtype=np.uint8).reshape(-1, 3)
        elif typ == b"IDAT":
            idat += chunk
        elif typ == b"IEND":
            break
    if w is None:
        raise NotImplementedError("PNG without IHDR")
    if bit_depth != 8 or interlace != 0:
        raise NotImplementedError(
            f"PNG bit_depth={bit_depth}/interlace={interlace} unsupported "
            "(8-bit non-interlaced only)"
        )
    channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(color_type)
    if channels is None:
        raise NotImplementedError(f"PNG color type {color_type}")
    import zlib

    try:
        raw = zlib.decompress(bytes(idat))
    except zlib.error as e:
        raise NotImplementedError(f"no codec: corrupt PNG IDAT ({e})")
    stride = w * channels
    if len(raw) < h * (1 + stride):
        # truncated file: keep the honest-raise contract rather than a
        # bare numpy broadcast error from a short row
        raise NotImplementedError(
            f"truncated PNG: {len(raw)} decompressed bytes, "
            f"{h * (1 + stride)} needed"
        )
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    p2 = 0
    for y in range(h):
        ft = raw[p2]
        cur = np.frombuffer(raw[p2 + 1:p2 + 1 + stride], dtype=np.uint8).copy()
        p2 += 1 + stride
        if ft == 1:  # Sub: per-channel modular prefix sum
            for c in range(channels):
                cur[c::channels] = (
                    np.cumsum(cur[c::channels], dtype=np.uint64) & 0xFF
                ).astype(np.uint8)
        elif ft == 2:  # Up (uint8 addition wraps = mod 256, per spec)
            cur = cur + prev
        elif ft == 3:  # Average — serial in x (left-neighbor recurrence);
            # python-list arithmetic: ~4× faster than per-element ndarray
            # indexing, though still Python-speed — Paeth-heavy photos
            # decode slowly here, which is why the PIL tier is preferred
            # when importable
            c = cur.tolist()
            pr = prev.tolist()
            for i in range(stride):
                a = c[i - channels] if i >= channels else 0
                c[i] = (c[i] + ((a + pr[i]) >> 1)) & 0xFF
            cur = np.asarray(c, dtype=np.uint8)
        elif ft == 4:  # Paeth — serial in x, same list treatment
            c = cur.tolist()
            pr = prev.tolist()
            for i in range(stride):
                a = c[i - channels] if i >= channels else 0
                b = pr[i]
                cc = pr[i - channels] if i >= channels else 0
                p = a + b - cc
                pa = p - a if p >= a else a - p
                pb = p - b if p >= b else b - p
                pc = p - cc if p >= cc else cc - p
                pred = a if pa <= pb and pa <= pc else (b if pb <= pc else cc)
                c[i] = (c[i] + pred) & 0xFF
            cur = np.asarray(c, dtype=np.uint8)
        elif ft != 0:
            raise NotImplementedError(f"PNG filter {ft}")
        out[y] = cur
        prev = cur
    px = out.reshape(h, w, channels)
    if color_type == 3:
        if palette is None:
            raise NotImplementedError("palette PNG without PLTE")
        if int(px.max(initial=0)) >= len(palette):
            raise NotImplementedError(
                f"palette index {int(px.max())} outside the "
                f"{len(palette)}-entry PLTE"
            )
        px = palette[px[:, :, 0]]
        channels = 3
    if channels <= 2:  # gray / gray+alpha
        gray = px[:, :, 0]
    else:
        rgb = px[:, :, :3].astype(np.uint32)
        gray = (
            (_LUMA[0] * rgb[:, :, 0] + _LUMA[1] * rgb[:, :, 1]
             + _LUMA[2] * rgb[:, :, 2]) // 1000
        ).astype(np.uint8)
    return int(w), int(h), gray


def _decode(payload: bytes) -> tuple[int, int, np.ndarray]:
    """Decode step: FAKEIMG oracle container, real PNG (stdlib codec),
    then PIL for anything else when the library is present."""
    if payload[:8] == _MAGIC:
        w, h = struct.unpack("<II", payload[8:16])
        arr = np.frombuffer(payload[16:16 + w * h], dtype=np.uint8).reshape(h, w)
        return w, h, arr
    if payload[:8] == _PNG_MAGIC:
        return _decode_png(payload)
    if _HAS_PIL:  # pragma: no cover - PIL absent in this container
        import io

        img = Image.open(io.BytesIO(payload)).convert("L")
        arr = np.asarray(img, dtype=np.uint8)
        return img.width, img.height, arr
    raise NotImplementedError(
        "no codec for this payload: FAKEIMG1 and 8-bit PNG decode "
        "in-sandbox; other formats need PIL (probed, absent here)"
    )


def image_features(media: DataFrame) -> DataFrame:
    """binary → (dims, mean intensity, 8-bin histogram) via mapInPandas.

    The kernel is pure numpy over the Arrow batch; the histogram is the
    stand-in for any per-image feature extractor (embedding model,
    perceptual hash, …).
    """
    src = media.select("media_id", "payload")

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = []
            for mid, payload in zip(b["media_id"], b["payload"]):
                w, h, arr = _decode(bytes(payload))
                hist = np.histogram(arr, bins=8, range=(0, 256))[0]
                rows.append(
                    (int(mid), w, h, float(arr.mean()), (hist / hist.sum()).tolist())
                )
            yield pd.DataFrame(
                rows, columns=["media_id", "width", "height", "mean_intensity", "histogram"]
            )

    return src.mapInPandas(kernel, schema=FEATURE_SCHEMA)


AHASH_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("ahash64", T.LongType(), False),
    ]
)


def image_ahash(media: DataFrame, grid: int = 8) -> DataFrame:
    """Perceptual average-hash (aHash): downsample to ``grid``×``grid``
    by nearest neighbor, threshold each sample against the grid mean,
    pack the bit matrix row-major into one signed 64-bit word.

    All math is INTEGER-exact — the threshold is ``grid²·p > Σp``
    (strict compare, no float mean) and the pack is a two's-complement
    distinct-bit sum — so the whole codec can be restated in plain SQL
    over a synthesis-described corpus and verified cross-engine, unlike
    float-histogram features. Narrow ``mapInPandas``; no shuffle: the
    hash column is what ships, 8 bytes per image regardless of payload
    size, which is the property that makes image dedup feasible at
    10^12-image scale (the near-dup join never touches pixels).
    """
    if grid * grid > 64:
        raise ValueError("grid too large for a 64-bit hash")
    src = media.select("media_id", "payload")

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        shifts = np.arange(grid * grid, dtype=np.uint64)
        for b in batches:
            mids, hashes = [], []
            for mid, payload in zip(b["media_id"], b["payload"]):
                w, h, arr = _decode(bytes(payload))
                ys = np.arange(grid) * h // grid
                xs = np.arange(grid) * w // grid
                small = arr[np.ix_(ys, xs)].astype(np.int64)
                bits = (small * grid * grid > small.sum()).flatten()
                v = int((bits.astype(np.uint64) << shifts).sum(dtype=np.uint64))
                mids.append(int(mid))
                hashes.append(v - (1 << 64) if v >= (1 << 63) else v)
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(mids, dtype="int64"),
                    "ahash64": pd.Series(hashes, dtype="int64"),
                }
            )

    return src.mapInPandas(kernel, schema=AHASH_SCHEMA)


def image_near_dups(hashes: DataFrame, max_hamming: int = 3) -> DataFrame:
    """Near-duplicate image pairs from aHash fingerprints.

    Reuses the SimHash banded join (four 16-bit bands → equi-join →
    exact ``bit_count(xor)`` verify): by pigeonhole, any pair within
    Hamming distance 3 shares at least one clean band, so for the
    default threshold the banded join is EXHAUSTIVE — identical output
    to an all-pairs scan at a tiny fraction of the cost (only
    same-bucket images ever meet; no pixel data in the shuffle).
    Thresholds ≥ 4 trade recall for the same plan shape.
    """
    from pyspark.sql import functions as F

    from .dedup import simhash_near_dups

    fps = hashes.select(
        F.col("media_id").alias("doc_id"), F.col("ahash64").alias("simhash64")
    )
    return (
        simhash_near_dups(fps)
        .filter(F.col("hamming") <= max_hamming)
        .select(
            F.col("doc_a").alias("media_a"),
            F.col("doc_b").alias("media_b"),
            "hamming",
        )
    )


def resize_images(media: DataFrame, out_w: int, out_h: int) -> DataFrame:
    """Nearest-neighbor resize inside the kernel, re-encoded to the same
    container (the shuffle-free map shape of any batch transcode)."""
    src = media.select("media_id", "payload")

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = []
            for mid, payload in zip(b["media_id"], b["payload"]):
                w, h, arr = _decode(bytes(payload))
                ys = (np.arange(out_h) * h // out_h)
                xs = (np.arange(out_w) * w // out_w)
                small = arr[np.ix_(ys, xs)]
                blob = _MAGIC + struct.pack("<II", out_w, out_h) + small.tobytes()
                rows.append((int(mid), blob))
            yield pd.DataFrame(rows, columns=["media_id", "payload"])

    return src.mapInPandas(kernel, schema="media_id long, payload binary")


_AUDIO_MAGIC = b"FAKEAUD1"

AUDIO_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("window_idx", T.IntegerType(), False),
        T.StructField("sum_abs", T.LongType()),
        T.StructField("max_abs", T.IntegerType()),
        T.StructField("energy", T.LongType()),
        T.StructField("zero_crossings", T.IntegerType()),
    ]
)


def make_fake_audio(
    media_id: int, n_windows: int = 4, window: int = 256, sample_rate: int = 16000
) -> bytes:
    """Deterministic FAKE audio container: magic + (n_samples, rate) +
    int16-LE PCM with ``s_i = ((id*131 + i*17) % 4096) - 2048``. The
    synthesis formula is integer-exact, so feature oracles can restate
    the expected values in plain SQL without reading the binary."""
    n = n_windows * window
    s = ((media_id * 131 + np.arange(n, dtype=np.int64) * 17) % 4096) - 2048
    return _AUDIO_MAGIC + struct.pack("<II", n, sample_rate) + s.astype("<i2").tobytes()


def _decode_wav(payload: bytes) -> tuple[int, np.ndarray]:
    """Stdlib RIFF/WAVE decoder (``wave`` module): 16-bit PCM, any
    sample rate; multi-channel input is reduced to its first channel.
    A real codec path — any canonical WAV from any tool decodes —
    with honest raises for compressed (non-PCM) or non-16-bit files."""
    import io
    import wave

    try:
        with wave.open(io.BytesIO(payload), "rb") as wf:
            if wf.getsampwidth() != 2:
                raise NotImplementedError(
                    f"WAV sample width {wf.getsampwidth()} (16-bit PCM only)"
                )
            frames = wf.readframes(wf.getnframes())
            # a data chunk truncated mid-sample would make frombuffer
            # raise a bare ValueError; drop the partial trailing bytes
            frames = frames[: len(frames) - (len(frames) % 2)]
            pcm = np.frombuffer(frames, dtype="<i2")
            nch = wf.getnchannels()
            if nch > 1:
                pcm = pcm[::nch]
            return wf.getframerate(), pcm
    except (wave.Error, EOFError) as e:
        # truncated or non-PCM (ADPCM/float) RIFF payloads keep the
        # module's honest-raise contract instead of leaking wave.Error
        raise NotImplementedError(f"no codec: malformed/compressed WAV ({e})")


def _decode_audio(payload: bytes) -> tuple[int, np.ndarray]:
    """Audio decode step: FAKEAUD oracle container or real 16-bit PCM
    WAV (stdlib codec); compressed formats (mp3/ogg/flac) would need
    soundfile/ffmpeg, absent in this container."""
    if payload[:8] == _AUDIO_MAGIC:
        n, rate = struct.unpack("<II", payload[8:16])
        return rate, np.frombuffer(payload[16:16 + 2 * n], dtype="<i2")
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        return _decode_wav(payload)
    raise NotImplementedError(
        "no codec for this payload: FAKEAUD1 and 16-bit PCM WAV decode "
        "in-sandbox; compressed formats need soundfile/ffmpeg (absent)"
    )


def audio_features(media: DataFrame, window: int = 256) -> DataFrame:
    """binary PCM → per-window integer features via mapInPandas.

    One output row per full window of ``window`` samples (a trailing
    partial window is dropped — the fixed-hop framing every audio
    front-end uses). Features are INTEGER-exact (sum|s|, max|s|,
    Σs², sign-change count) so the kernel is cross-engine verifiable;
    a real front-end would emit mel filterbanks from the same batch
    shape. Narrow map, no shuffle: scales by input partitioning alone.
    """
    src = media.select("media_id", "payload")

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            mids, widx, sum_abs, max_abs, energy, zc = [], [], [], [], [], []
            for mid, payload in zip(b["media_id"], b["payload"]):
                _, pcm = _decode_audio(bytes(payload))
                nw = len(pcm) // window
                s = pcm[: nw * window].astype(np.int64).reshape(nw, window)
                a = np.abs(s)
                neg = s < 0
                mids.extend([int(mid)] * nw)
                widx.extend(range(nw))
                sum_abs.extend(a.sum(axis=1).tolist())
                max_abs.extend(a.max(axis=1).tolist())
                energy.extend((s * s).sum(axis=1).tolist())
                zc.extend((neg[:, 1:] != neg[:, :-1]).sum(axis=1).tolist())
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(mids, dtype="int64"),
                    "window_idx": pd.Series(widx, dtype="int32"),
                    "sum_abs": pd.Series(sum_abs, dtype="int64"),
                    "max_abs": pd.Series(max_abs, dtype="int32"),
                    "energy": pd.Series(energy, dtype="int64"),
                    "zero_crossings": pd.Series(zc, dtype="int32"),
                }
            )

    return src.mapInPandas(kernel, schema=AUDIO_FEATURE_SCHEMA)


def frame_sample(media: DataFrame, every_n: int = 2) -> DataFrame:
    """Video-style frame sampling: treat payload rows as frames, keep
    every Nth — the explode/filter shape of real frame extraction."""
    src = media.select("media_id", "payload")

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = []
            for mid, payload in zip(b["media_id"], b["payload"]):
                w, h, arr = _decode(bytes(payload))
                for f in range(0, h, every_n):
                    rows.append((int(mid), f, bytes(arr[f].tobytes())))
            yield pd.DataFrame(rows, columns=["media_id", "frame_idx", "frame"])

    return src.mapInPandas(kernel, schema="media_id long, frame_idx int, frame binary")


def audio_fingerprint(feats: DataFrame, n_bits: int = 32) -> DataFrame:
    """Haitsma–Kalker-style audio fingerprint over the window-energy
    track: bit *i* is set iff ``energy(w_{i+1}) > energy(w_i)`` — the
    sign of the energy delta, the robust-hash core of the classic
    scheme (ISMIR '02) collapsed to one band (the in-sandbox features
    are single-band; a mel front-end would contribute one bit per band
    per frame the same way). INTEGER-exact by construction: energies
    are integer sums, the comparison is exact, the pack is a sum of
    powers of two — the same SQL-restatable contract as image_ahash.

    Input is the :func:`audio_features` RELATION (not the binary):
    fingerprinting composes with the decode kernel instead of
    re-reading payloads. One window-function pass + one groupBy on
    media_id. Returns ``(media_id, fp32 long)``; tracks shorter than
    2 windows fingerprint to 0.
    """
    from pyspark.sql import Window

    w = Window.partitionBy("media_id").orderBy("window_idx")
    d = feats.select(
        "media_id", "window_idx", "energy",
        F.lead("energy").over(w).alias("next_e"),
    )
    vals = d.filter(
        (F.col("window_idx") < n_bits)
        & F.col("next_e").isNotNull()
        & (F.col("next_e") > F.col("energy"))
    ).select(
        "media_id",
        F.expr("shiftleft(CAST(1 AS BIGINT), window_idx)").alias("v"),
    )
    return (
        feats.select("media_id").distinct()
        .join(vals.groupBy("media_id").agg(F.sum("v").alias("_fp")),
              "media_id", "left")
        .select("media_id",
                F.coalesce("_fp", F.lit(0)).cast("long").alias("fp32"))
    )


def audio_near_dups(fps: DataFrame, max_hamming: int = 3) -> DataFrame:
    """Near-duplicate audio pairs from 32-bit fingerprints: four 8-bit
    bands → equi-join → exact ``bit_count(xor)`` verify. Pigeonhole:
    at Hamming ≤ 3 one of the four bands is clean, so the banded join
    is EXHAUSTIVE for the default threshold (same argument as
    image_near_dups, re-banded for the 32-bit code — reusing the
    64-bit SimHash bands would leave the top bands constantly zero
    and degenerate the join to all-pairs). Band duplicates are
    absorbed by the pair groupBy, not a pre-join distinct."""
    banded = fps.select(
        "media_id", "fp32",
        F.explode(F.array(*[F.lit(i) for i in range(4)])).alias("band_idx"),
    ).withColumn(
        "band_val",
        F.expr("shiftrightunsigned(fp32, band_idx * 8) & 255"),
    )
    a = banded.select(
        "band_idx", "band_val",
        F.col("media_id").alias("media_a"), F.col("fp32").alias("fp_a"),
    )
    b = banded.select(
        "band_idx", "band_val",
        F.col("media_id").alias("media_b"), F.col("fp32").alias("fp_b"),
    )
    cand = (
        a.join(b, ["band_idx", "band_val"])
        .filter(F.col("media_a") < F.col("media_b"))
        .groupBy("media_a", "media_b")
        .agg(F.max("fp_a").alias("fp_a"), F.max("fp_b").alias("fp_b"))
    )
    return cand.select(
        "media_a", "media_b",
        F.bit_count(F.expr("fp_a ^ fp_b")).alias("hamming"),
    ).filter(F.col("hamming") <= max_hamming)
