"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

100 TB posture: media bytes live in partitioned parquet **binary**
columns (or as pointers to object storage for very large blobs), with a
typed metadata struct alongside; decode / feature-extraction runs as
Arrow-batched ``mapInPandas`` so each task streams record batches —
never a per-row Python roundtrip.

The actual codecs (PIL/ffmpeg/librosa) are NOT in this container, so
the decode step is STUBBED: ``decode_media`` raises
NotImplementedError unless ``fake=True``, in which case a
deterministic fake featurizer (byte-level stats) stands in.  The
Spark-side plumbing — schema, batch iteration, partitioning — is real
and tested; swapping the stub for a real codec changes only the inner
function body.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "doc_id long, kind string, n_bytes long, payload binary"
)

FEATURE_SCHEMA = (
    "doc_id long, kind string, n_bytes long, "
    "feat_mean double, feat_first long, feat_last long"
)


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

    With real codecs absent, ``fake=True`` runs a deterministic
    byte-stat featurizer (mean byte value, first/last byte) so the
    batch shape, schema, and partitioning are exercised end-to-end;
    ``fake=False`` raises NotImplementedError from inside the executor
    batches, exactly where a real decoder would run.
    """

    def featurize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "media codecs (PIL/ffmpeg) not available in this "
                    "environment — pass fake=True for the deterministic stub"
                )
            payloads = pdf["payload"]
            pdf_out = pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["n_bytes"],
                    "feat_mean": [
                        (sum(b) / len(b)) if len(b) else 0.0 for b in payloads
                    ],
                    "feat_first": [int(b[0]) if len(b) else -1 for b in payloads],
                    "feat_last": [int(b[-1]) if len(b) else -1 for b in payloads],
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
    so the fake path is exactly oracle-recomputable; ``fake=False``
    raises NotImplementedError from inside the executor batch exactly
    where a real PIL/opencv resize would run.

    Emits one row per (doc, cell): (doc_id, cell_no, px).  Cell
    boundaries are ``(j*n)//target_w`` — the standard partition of n
    source pixels into target_w near-equal blocks; payloads shorter
    than ``target_w`` emit only their non-empty cells.
    """

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "image libs (PIL/opencv) not available in this "
                    "environment — pass fake=True for the deterministic stub"
                )
            ids: list = []
            cells: list[int] = []
            px: list[int] = []
            for did, b in zip(pdf["doc_id"], pdf["payload"]):
                n = len(b)
                bounds = [(j * n) // target_w for j in range(target_w + 1)]
                for j in range(target_w):
                    lo, hi = bounds[j], bounds[j + 1]
                    if hi <= lo:
                        continue
                    ids.append(did)
                    cells.append(j)
                    px.append(sum(b[lo:hi]) // (hi - lo))
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
) -> DataFrame:
    """Frame-level ENERGY extraction over binary audio-like payloads —
    the windowed feature pass an audio pipeline runs after decode
    (RMS/energy per fixed-size frame), via Arrow-batched
    ``mapInPandas`` so bytes never row-trip through Python one at a
    time.

    Each payload is treated as unsigned 8-bit samples; per frame of
    ``frame_bytes`` samples the INTEGER sum of squares is emitted
    (exact — the oracle recomputes it from the payload-generating
    text).  Real PCM decode would only change the sample-extraction
    line; the batch shape, schema, fan-out, and partitioning are the
    production plumbing."""
    import pandas as pd  # noqa: PLC0415

    schema = "doc_id long, frame_no int, n_samples int, energy long"

    def featurize(batches):
        for pdf in batches:
            rows = []
            for did, payload in zip(pdf[id_col], pdf[payload_col]):
                b = bytes(payload)
                for fno in range(len(b) // frame_bytes):
                    fr = b[fno * frame_bytes : (fno + 1) * frame_bytes]
                    rows.append(
                        (
                            int(did),
                            fno,
                            len(fr),
                            sum(x * x for x in fr),
                        )
                    )
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "frame_no", "n_samples", "energy"],
            )

    return df.mapInPandas(featurize, schema)
