"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

100 TB posture: media bytes live in partitioned parquet **binary**
columns (or as pointers to object storage for very large blobs), with a
typed metadata struct alongside; decode / feature-extraction runs as
Arrow-batched ``mapInPandas`` so each task streams record batches —
never a per-row Python roundtrip.

The actual codecs (PIL/soundfile) are IMPORT-GATED: when the library
is installed, ``fake=False`` runs a real decode inside the executor
batch; when absent (this container), it raises NotImplementedError
with an install hint, and ``fake=True`` substitutes a deterministic
byte-level featurizer so the Spark-side plumbing — schema, batch
iteration, partitioning — stays testable and oracle-checkable either
way.  CI and the oracle gate always use the fake path; a deployment
with pillow/soundfile present gets the real one with zero code change.
"""

from __future__ import annotations

import importlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _require(module: str, purpose: str):
    """Import-gate for optional codec libraries: resolve the module if
    installed, else raise the documented NotImplementedError.  Raised
    INSIDE the executor batch — exactly where the decode would run —
    so a mis-deployed cluster fails fast with an actionable message."""
    try:
        return importlib.import_module(module)
    except ImportError as exc:
        raise NotImplementedError(
            f"{module} is not installed ({purpose}); pip install it for "
            "the real decode, or pass fake=True for the deterministic "
            "byte-stat stub"
        ) from exc

MEDIA_SCHEMA = (
    "doc_id long, kind string, n_bytes long, payload binary"
)

FEATURE_SCHEMA = (
    "doc_id long, kind string, n_bytes long, "
    "feat_mean double, feat_first long, feat_last long"
)


def _pixel_stats(image_mod, b: bytes) -> tuple[float, int, int]:
    """Real-codec leg of :func:`decode_media`: grayscale pixel mean /
    first / last via a PIL-shaped module (injectable for tests)."""
    import io  # noqa: PLC0415

    px = list(image_mod.open(io.BytesIO(b)).convert("L").getdata())
    if not px:
        return 0.0, -1, -1
    return sum(px) / len(px), int(px[0]), int(px[-1])


def _resize_gray(image_mod, b: bytes, target_w: int) -> list[int]:
    """Real-codec leg of :func:`resize_media`: decode → grayscale →
    BOX-resample to ``(target_w, 1)`` via a PIL-shaped module."""
    import io  # noqa: PLC0415

    box = getattr(image_mod, "Resampling", image_mod).BOX
    img = (
        image_mod.open(io.BytesIO(b)).convert("L").resize((target_w, 1), box)
    )
    return [int(v) for v in img.getdata()]


def _samples_soundfile(sf_mod, b: bytes) -> list[float]:
    """Real-codec leg of :func:`audio_frame_energy`: container decode
    → mono float samples via a soundfile-shaped module."""
    import io  # noqa: PLC0415

    data, _sr = sf_mod.read(io.BytesIO(b), dtype="float64")
    if getattr(data, "ndim", 1) > 1:
        data = data.mean(axis=1)
    return [float(x) for x in data]


def attach_binary_payload(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", kind: str = "text"
) -> DataFrame:
    """Materialize an opaque binary payload column + typed metadata.

    (Here the payload is the utf-8 encoded document — in a real
    pipeline it is image/audio bytes read via
    ``spark.read.format("binaryFile")``.)
    """
    payload = F.encode(F.col(text_col), "utf-8")
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.lit(kind).alias("kind"),
        F.octet_length(F.col(text_col)).cast("long").alias("n_bytes"),
        payload.alias("payload"),
    )


def decode_media(df: DataFrame, fake: bool = False) -> DataFrame:
    """Decode/feature-extract binary payloads via Arrow-batched
    ``mapInPandas``.

    ``fake=True`` runs a deterministic byte-stat featurizer (mean byte
    value, first/last byte) so the batch shape, schema, and
    partitioning are exercised end-to-end.  ``fake=False`` is
    IMPORT-GATED on pillow: when installed, each payload is decoded
    as an image and the same three features are computed over its
    grayscale pixels (mean / first / last); when absent, the executor
    batch raises NotImplementedError with an install hint.
    """

    def featurize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        image_mod = None if fake else _require("PIL.Image", "image decode")
        for pdf in batches:
            payloads = pdf["payload"]
            if fake:
                stats = [
                    (
                        (sum(b) / len(b)) if len(b) else 0.0,
                        int(b[0]) if len(b) else -1,
                        int(b[-1]) if len(b) else -1,
                    )
                    for b in payloads
                ]
            else:
                stats = [_pixel_stats(image_mod, bytes(b)) for b in payloads]
            pdf_out = pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["n_bytes"],
                    "feat_mean": [s[0] for s in stats],
                    "feat_first": [s[1] for s in stats],
                    "feat_last": [s[2] for s in stats],
                }
            )
            yield pdf_out

    return df.mapInPandas(featurize, schema=FEATURE_SCHEMA)


def frame_sample(
    df: DataFrame, every_n_bytes: int = 64, fake: bool = False
) -> DataFrame:
    """'Frame sampling' plumbing: explode one row per sampled offset of
    the payload (for video this would be one row per sampled frame).

    JVM-side explode over a computed offset sequence — the fan-out
    happens in Spark, not Python; only the per-frame decode (stubbed)
    would be Python.
    """
    n_frames = F.greatest(
        (F.col("n_bytes") / every_n_bytes).cast("long"), F.lit(1)
    )
    offsets = F.sequence(F.lit(0), n_frames - 1)
    exploded = df.select(
        "doc_id",
        "kind",
        "n_bytes",
        "payload",
        F.explode(offsets).alias("frame_no"),
    ).withColumn("frame_offset", F.col("frame_no") * every_n_bytes)
    if not fake:
        return exploded.select(
            "doc_id", "kind", "frame_no", "frame_offset"
        )
    # Deterministic fake "frame feature": the byte at the sampled offset.
    return exploded.select(
        "doc_id",
        "kind",
        "frame_no",
        "frame_offset",
        F.expr("CAST(substring(payload, frame_offset + 1, 1) AS STRING)").alias(
            "frame_token"
        ),
    )


def resize_media(
    df: DataFrame, target_w: int = 8, fake: bool = False
) -> DataFrame:
    """'Resize' plumbing — the downsample pass an image pipeline runs
    after decode — via Arrow-batched ``mapInPandas``: the payload is
    treated as a 1-D pixel row of unsigned bytes and block-averaged
    into ``target_w`` cells (PIL's BOX filter on a 1×n image).  All
    math is INTEGER (per-cell byte sum floor-divided by cell width),
    so the fake path is exactly oracle-recomputable.  ``fake=False``
    is IMPORT-GATED on pillow: when installed, the payload is decoded
    with ``PIL.Image`` and box-resized to ``(target_w, 1)`` grayscale
    (the real twin of the fake's block average); when absent, the
    executor batch raises NotImplementedError with an install hint.

    Emits one row per (doc, cell): (doc_id, cell_no, px).  Cell
    boundaries are ``(j*n)//target_w`` — the standard partition of n
    source pixels into target_w near-equal blocks; payloads shorter
    than ``target_w`` emit only their non-empty cells.
    """

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        image_mod = None if fake else _require("PIL.Image", "image resize")
        for pdf in batches:
            ids: list = []
            cells: list[int] = []
            px: list[int] = []
            for did, b in zip(pdf["doc_id"], pdf["payload"]):
                if fake:
                    n = len(b)
                    bounds = [
                        (j * n) // target_w for j in range(target_w + 1)
                    ]
                    for j in range(target_w):
                        lo, hi = bounds[j], bounds[j + 1]
                        if hi <= lo:
                            continue
                        ids.append(did)
                        cells.append(j)
                        px.append(sum(b[lo:hi]) // (hi - lo))
                else:
                    for j, val in enumerate(
                        _resize_gray(image_mod, bytes(b), target_w)
                    ):
                        ids.append(did)
                        cells.append(j)
                        px.append(val)
            yield pd.DataFrame(
                {"doc_id": ids, "cell_no": cells, "px": px}
            )

    return df.mapInPandas(
        resize, schema="doc_id long, cell_no int, px long"
    )


def audio_frame_energy(
    df: DataFrame,
    frame_bytes: int = 8,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    decode: str = "u8",
) -> DataFrame:
    """Frame-level ENERGY extraction over binary audio-like payloads —
    the windowed feature pass an audio pipeline runs after decode
    (RMS/energy per fixed-size frame), via Arrow-batched
    ``mapInPandas`` so bytes never row-trip through Python one at a
    time.

    ``decode='u8'`` (default — the oracle/CI path) treats the payload
    as unsigned 8-bit samples; per frame of ``frame_bytes`` samples
    the INTEGER sum of squares is emitted (exact — the oracle
    recomputes it from the payload-generating text).
    ``decode='soundfile'`` is IMPORT-GATED on the soundfile library:
    when installed, the payload is decoded as a real audio container
    (wav/flac/ogg), downmixed to mono, and per-frame energy is the
    float sum of squares scaled to integer micro-units; when absent,
    the executor batch raises NotImplementedError with an install
    hint.  The batch shape, schema, fan-out, and partitioning are the
    production plumbing either way."""
    import pandas as pd  # noqa: PLC0415

    if decode not in ("u8", "soundfile"):
        raise ValueError(f"decode must be u8|soundfile, got {decode!r}")
    schema = "doc_id long, frame_no int, n_samples int, energy long"

    def featurize(batches):
        mod = None if decode == "u8" else _require(
            "soundfile", "audio decode"
        )
        take = (
            (lambda _m, b: list(b))
            if decode == "u8"
            else _samples_soundfile
        )
        for pdf in batches:
            rows = []
            for did, payload in zip(pdf[id_col], pdf[payload_col]):
                samples = take(mod, bytes(payload))
                for fno in range(len(samples) // frame_bytes):
                    fr = samples[fno * frame_bytes : (fno + 1) * frame_bytes]
                    e = sum(x * x for x in fr)
                    # u8 energies are already integers; decoded float
                    # energies land in integer micro-units
                    rows.append(
                        (
                            int(did),
                            fno,
                            len(fr),
                            int(e) if decode == "u8" else round(e * 1_000_000),
                        )
                    )
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "frame_no", "n_samples", "energy"],
            )

    return df.mapInPandas(featurize, schema)


# ---------------------------------------------------------------------------
# REAL uncompressed-format codecs (round 13) — zero external libraries
# ---------------------------------------------------------------------------
# The compressed codecs above stay import-gated on PIL/soundfile (absent
# in this image).  Uncompressed raster/PCM formats need no library at
# all: PPM (P6) and RIFF/WAVE PCM-16 decode with a header parser plus
# ``numpy.frombuffer`` — so the engine carries a REAL decode leg the
# oracle can hash exactly, not just the deterministic byte-stat stub.
# Encoders live alongside so the gates round-trip real bytes: the
# fixture is written in the actual wire format, then parsed back by a
# parser that never sees the generator's variables.


def ppm_bytes(img_id: int, width: int, height: int) -> bytes:
    """Encode a valid binary PPM (P6) image whose pixel (x, y, c) is
    the closed form ``(img_id*31 + 7x + 13y + 97c) mod 256`` — real
    header + raster bytes, oracle-recomputable without parsing."""
    import numpy as np  # noqa: PLC0415

    header = f"P6\n{width} {height}\n255\n".encode("ascii")
    x = np.arange(width, dtype=np.int64)
    y = np.arange(height, dtype=np.int64)
    c = np.arange(3, dtype=np.int64)
    px = (
        img_id * 31
        + 7 * x[None, :, None]
        + 13 * y[:, None, None]
        + 97 * c[None, None, :]
    ) % 256
    return header + px.astype(np.uint8).tobytes()


def _ppm_header(b: bytes) -> tuple[int, int, int, int]:
    """Parse a P6 header (whitespace/comment tolerant per the netpbm
    spec): returns (width, height, maxval, raster_offset)."""
    if b[:2] != b"P6":
        raise ValueError("not a binary PPM (P6) payload")
    i, fields = 2, []
    while len(fields) < 3:
        while i < len(b) and b[i : i + 1].isspace():
            i += 1
        if b[i : i + 1] == b"#":
            while i < len(b) and b[i : i + 1] != b"\n":
                i += 1
            continue
        j = i
        while j < len(b) and not b[j : j + 1].isspace():
            j += 1
        fields.append(int(b[i:j]))
        i = j
    # exactly ONE whitespace byte separates maxval from the raster
    return fields[0], fields[1], fields[2], i + 1


PPM_STATS_SCHEMA = (
    "img_id long, width int, height int, "
    "r_sum long, g_sum long, b_sum long"
)


def decode_ppm_stats(
    df: DataFrame, id_col: str = "img_id", payload_col: str = "payload"
) -> DataFrame:
    """REAL image decode over binary payloads: parse the P6 header,
    ``numpy.frombuffer`` the raster, reshape (h, w, 3), and emit exact
    int64 per-channel pixel sums — Arrow-batched ``mapInPandas``, all
    pixel math vectorized in numpy inside the batch.

    At 100 TB the shape is identical: payloads stream through executor
    record batches (binaryFile scan or parquet binary column), each
    batch decodes locally, only (id, 5 ints) leave the task."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np  # noqa: PLC0415

        for pdf in batches:
            rows = []
            for iid, payload in zip(pdf[id_col], pdf[payload_col]):
                b = bytes(payload)
                w, h, maxval, off = _ppm_header(b)
                if maxval != 255:
                    raise ValueError(f"unsupported maxval {maxval}")
                px = np.frombuffer(b, np.uint8, count=w * h * 3, offset=off)
                sums = px.reshape(h, w, 3).sum(axis=(0, 1), dtype=np.int64)
                rows.append(
                    (int(iid), w, h, int(sums[0]), int(sums[1]), int(sums[2]))
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "img_id", "width", "height", "r_sum", "g_sum", "b_sum",
                ],
            )

    return df.mapInPandas(run, schema=PPM_STATS_SCHEMA)


def wav_bytes(clip_id: int, n_samples: int, sample_rate: int = 8000) -> bytes:
    """Encode a valid RIFF/WAVE (PCM, mono, 16-bit LE) clip whose
    sample i is ``((clip_id*7 + 11i) mod 65536) - 32768`` — a real
    44-byte canonical header + data chunk."""
    import struct  # noqa: PLC0415

    import numpy as np  # noqa: PLC0415

    i = np.arange(n_samples, dtype=np.int64)
    samples = ((clip_id * 7 + 11 * i) % 65536) - 32768
    data = samples.astype("<i2").tobytes()
    hdr = (
        b"RIFF"
        + struct.pack("<I", 36 + len(data))
        + b"WAVE"
        + b"fmt "
        + struct.pack("<IHHIIHH", 16, 1, 1, sample_rate, sample_rate * 2, 2, 16)
        + b"data"
        + struct.pack("<I", len(data))
    )
    return hdr + data


WAV_STATS_SCHEMA = (
    "clip_id long, sample_rate int, n_channels int, "
    "n_samples long, sum_samples long, peak int"
)


def decode_wav_stats(
    df: DataFrame, id_col: str = "clip_id", payload_col: str = "payload"
) -> DataFrame:
    """REAL audio decode over binary payloads: walk the RIFF chunk
    list (the real container structure — ``fmt `` may be followed by
    optional chunks before ``data``), validate PCM-16 mono, decode
    samples via ``numpy.frombuffer('<i2')``, and emit exact integer
    telemetry (int64 sample sum, peak amplitude)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import struct  # noqa: PLC0415

        import numpy as np  # noqa: PLC0415

        for pdf in batches:
            rows = []
            for cid, payload in zip(pdf[id_col], pdf[payload_col]):
                b = bytes(payload)
                if b[:4] != b"RIFF" or b[8:12] != b"WAVE":
                    raise ValueError("not a RIFF/WAVE payload")
                pos, fmt, data = 12, None, None
                while pos + 8 <= len(b):
                    tag = b[pos : pos + 4]
                    (size,) = struct.unpack("<I", b[pos + 4 : pos + 8])
                    body = b[pos + 8 : pos + 8 + size]
                    if tag == b"fmt ":
                        fmt = struct.unpack("<HHIIHH", body[:16])
                    elif tag == b"data":
                        data = body
                    pos += 8 + size + (size & 1)  # chunks are word-aligned
                if fmt is None or data is None:
                    raise ValueError("missing fmt/data chunk")
                audio_fmt, n_ch, sr, _brate, _align, bits = fmt
                if (audio_fmt, n_ch, bits) != (1, 1, 16):
                    raise ValueError(
                        f"unsupported encoding fmt={audio_fmt} ch={n_ch} "
                        f"bits={bits}; this decoder is PCM-16 mono"
                    )
                s = np.frombuffer(data, "<i2").astype(np.int64)
                rows.append(
                    (
                        int(cid),
                        int(sr),
                        int(n_ch),
                        int(s.size),
                        int(s.sum()),
                        int(np.abs(s).max()) if s.size else 0,
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "clip_id", "sample_rate", "n_channels",
                    "n_samples", "sum_samples", "peak",
                ],
            )

    return df.mapInPandas(run, schema=WAV_STATS_SCHEMA)


# ---------------------------------------------------------------------------
# REAL compressed-format codec (round 14): PNG, stdlib zlib + numpy
# ---------------------------------------------------------------------------
# PNG is the one compressed image format that needs NO codec library:
# the payload is zlib-DEFLATE over per-scanline filtered bytes (RFC
# 2083) and the container is CRC-checked chunks — all decodable with
# stdlib ``zlib`` plus numpy, exactly like the PPM/WAV legs above.
# This shrinks the import-gated stub surface to entropy-coded codecs
# (JPEG/FLAC-class) only.


def _png_chunk(tag: bytes, body: bytes) -> bytes:
    import struct  # noqa: PLC0415
    import zlib  # noqa: PLC0415

    return (
        struct.pack(">I", len(body))
        + tag
        + body
        + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
    )


def png_bytes(img_id: int, width: int, height: int) -> bytes:
    """Encode a REAL PNG (8-bit truecolor RGB, non-interlaced) whose
    pixel (x, y, c) is the same closed form the PPM leg uses:
    ``(img_id*31 + 7x + 13y + 97c) mod 256``.

    Scanline y is written with filter type ``y % 5`` — None, Sub, Up,
    Average, Paeth in rotation (every fixture image is ≥ 6 rows, so a
    decoder that mis-implements ANY of the five unfilter recurrences
    breaks the oracle hash) — then the filtered stream is
    zlib-compressed into IDAT.  Signature, IHDR, IDAT, IEND with real
    CRCs: any PNG reader opens these bytes."""
    import struct  # noqa: PLC0415
    import zlib  # noqa: PLC0415

    import numpy as np  # noqa: PLC0415

    x = np.arange(width, dtype=np.int64)
    y = np.arange(height, dtype=np.int64)
    c = np.arange(3, dtype=np.int64)
    raw = (
        (
            img_id * 31
            + 7 * x[None, :, None]
            + 13 * y[:, None, None]
            + 97 * c[None, None, :]
        )
        % 256
    ).astype(np.int64).reshape(height, width * 3)

    bpp = 3
    out = bytearray()
    prior = np.zeros(width * bpp, dtype=np.int64)
    for row in range(height):
        cur = raw[row]
        left = np.concatenate([np.zeros(bpp, dtype=np.int64), cur[:-bpp]])
        up_left = np.concatenate(
            [np.zeros(bpp, dtype=np.int64), prior[:-bpp]]
        )
        ftype = row % 5
        if ftype == 0:  # None
            filt = cur
        elif ftype == 1:  # Sub
            filt = cur - left
        elif ftype == 2:  # Up
            filt = cur - prior
        elif ftype == 3:  # Average
            filt = cur - (left + prior) // 2
        else:  # Paeth
            p = left + prior - up_left
            pa, pb, pc = (
                np.abs(p - left),
                np.abs(p - prior),
                np.abs(p - up_left),
            )
            pred = np.where(
                (pa <= pb) & (pa <= pc),
                left,
                np.where(pb <= pc, prior, up_left),
            )
            filt = cur - pred
        out.append(ftype)
        out.extend((filt % 256).astype(np.uint8).tobytes())
        prior = cur

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(out), 6))
        + _png_chunk(b"IEND", b"")
    )


def _png_unfilter(stream: bytes, width: int, height: int, bpp: int):
    """Invert the five PNG scanline filters over a decompressed IDAT
    stream → (height, width*bpp) uint8 array.  None/Up invert
    vectorized; Sub/Average/Paeth are sequential in x by construction
    (each pixel depends on the reconstructed left neighbour), so those
    rows walk pixels — bounded work: bpp bytes per step, row-local."""
    import numpy as np  # noqa: PLC0415

    stride = width * bpp
    if len(stream) != height * (1 + stride):
        raise ValueError(
            f"IDAT stream is {len(stream)} bytes, want {height}x(1+{stride})"
        )
    rows = np.frombuffer(stream, np.uint8).reshape(height, 1 + stride)
    out = np.zeros((height, stride), dtype=np.int64)
    for r in range(height):
        ftype = int(rows[r, 0])
        cur = rows[r, 1:].astype(np.int64)
        prior = out[r - 1] if r > 0 else np.zeros(stride, dtype=np.int64)
        if ftype == 0:
            rec = cur
        elif ftype == 2:
            rec = (cur + prior) % 256
        elif ftype in (1, 3, 4):
            rec = np.zeros(stride, dtype=np.int64)
            for i in range(stride):
                left = rec[i - bpp] if i >= bpp else 0
                if ftype == 1:
                    pred = left
                elif ftype == 3:
                    pred = (left + prior[i]) // 2
                else:
                    ul = prior[i - bpp] if i >= bpp else 0
                    p = left + prior[i] - ul
                    pa, pb, pc = abs(p - left), abs(p - prior[i]), abs(p - ul)
                    if pa <= pb and pa <= pc:
                        pred = left
                    elif pb <= pc:
                        pred = prior[i]
                    else:
                        pred = ul
                rec[i] = (cur[i] + pred) % 256
        else:
            raise ValueError(f"unknown PNG filter type {ftype}")
        out[r] = rec
    return out.astype(np.uint8)


def decode_png(b: bytes):
    """Decode a PNG payload (8-bit truecolor RGB, non-interlaced) to
    (width, height, pixels[h, w, 3]) — REAL wire decode: signature
    check, chunk walk with CRC32 verification, multi-IDAT
    concatenation, zlib inflate, per-scanline unfilter."""
    import struct  # noqa: PLC0415
    import zlib  # noqa: PLC0415

    if b[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("not a PNG payload (bad signature)")
    pos, ihdr, idat = 8, None, bytearray()
    while pos + 8 <= len(b):
        (length,) = struct.unpack(">I", b[pos : pos + 4])
        tag = b[pos + 4 : pos + 8]
        body = b[pos + 8 : pos + 8 + length]
        (crc,) = struct.unpack(
            ">I", b[pos + 8 + length : pos + 12 + length]
        )
        if zlib.crc32(tag + body) & 0xFFFFFFFF != crc:
            raise ValueError(f"CRC mismatch in {tag!r} chunk")
        if tag == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif tag == b"IDAT":
            idat.extend(body)
        elif tag == b"IEND":
            break
        pos += 12 + length
    if ihdr is None or not idat:
        raise ValueError("missing IHDR/IDAT chunk")
    width, height, depth, ctype, comp, filt, interlace = ihdr
    if (depth, ctype, comp, filt, interlace) != (8, 2, 0, 0, 0):
        raise ValueError(
            "this decoder handles 8-bit truecolor non-interlaced PNG "
            f"(got depth={depth} color={ctype} interlace={interlace})"
        )
    px = _png_unfilter(zlib.decompress(bytes(idat)), width, height, 3)
    return width, height, px.reshape(height, width, 3)


PNG_STATS_SCHEMA = (
    "img_id long, width int, height int, "
    "r_sum long, g_sum long, b_sum long"
)


def decode_png_stats(
    df: DataFrame, id_col: str = "img_id", payload_col: str = "payload"
) -> DataFrame:
    """REAL compressed-image decode over binary payloads — the PNG
    twin of :func:`decode_ppm_stats`: chunk walk + CRC verify + zlib
    inflate + unfilter happen executor-side in Arrow batches, only
    (id, 5 ints) leave the task.  At 100 TB: payloads stream through
    executor record batches from a binaryFile or parquet binary scan;
    nothing but fixed-width stats shuffles."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np  # noqa: PLC0415

        for pdf in batches:
            rows = []
            for iid, payload in zip(pdf[id_col], pdf[payload_col]):
                w, h, px = decode_png(bytes(payload))
                sums = px.sum(axis=(0, 1), dtype=np.int64)
                rows.append(
                    (int(iid), w, h, int(sums[0]), int(sums[1]), int(sums[2]))
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "img_id", "width", "height", "r_sum", "g_sum", "b_sum",
                ],
            )

    return df.mapInPandas(run, schema=PNG_STATS_SCHEMA)
