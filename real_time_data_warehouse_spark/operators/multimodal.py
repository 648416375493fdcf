"""Multimodal columns (north-star extension): image/audio/video as opaque
``binary`` columns with typed metadata.

The Spark-side plumbing is fully real — schema, partition-preserving
``mapInPandas`` over Arrow batches, deterministic synthesis of the binary
payloads from the fixture tables — while the actual media decode is
STUBBED: the container has no image/audio codecs, so ``decode_image``
raises ``NotImplementedError`` unless the deterministic fake decoder is
selected. Everything around the decode (batch iteration, schema contract,
metadata extraction from the binary header) executes for real and is
oracle-checked.

Scale notes: media processing is the one place where per-row Python is
unavoidable; ``mapInPandas`` streams Arrow record batches through the
worker without collecting a partition in memory, and the binary column
never passes through the driver. Batch shape (rows per Arrow batch) is
controlled by ``spark.sql.execution.arrow.maxRecordsPerBatch``.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from real_time_data_warehouse_spark.registry import register
from real_time_data_warehouse_spark.tables import Tables

# Synthetic media payload: a 16-byte header (magic, width, height, n_frames)
# followed by doc-derived bytes. Deterministic — both engines can recompute
# the metadata from first principles.
_MAGIC = 0x4D4D3142  # "MM1B"

# Shared fixture geometry — the oracles derive frame indices from THESE
# constants (never re-hardcoded numbers) so a fixture change fails loudly
# on both sides instead of silently diverging one.
_VIDEO_FRAMES = 24  # n_frames for doc_id % 3 == 0 "video" assets
_FRAME_STRIDE = 8  # m2/m6 sample every 8th frame

MEDIA_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("media_type", StringType()),
        StructField("payload", BinaryType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_frames", IntegerType()),
    ]
)


def synthesize_media(t: Tables) -> DataFrame:
    """documents → media rows: binary payload with a typed header derived
    deterministically from doc_id (the fixture stand-in for an ingested
    image/video column)."""
    d = t.documents
    width = (F.col("doc_id") % 64 + 16).cast("int")
    height = (F.col("doc_id") % 48 + 16).cast("int")
    n_frames = (
        F.when(F.col("doc_id") % 3 == 0, _VIDEO_FRAMES).otherwise(1).cast("int")
    )
    # header = 4 int32 big-endian fields, then the first 32 chars of text
    header = F.concat(
        _int32_bytes(F.lit(_MAGIC)),
        _int32_bytes(width),
        _int32_bytes(height),
        _int32_bytes(n_frames),
        F.encode(F.substring("text", 1, 32), "utf-8"),
    )
    return d.select(
        "doc_id",
        F.when(n_frames > 1, "video").otherwise("image").alias("media_type"),
        header.alias("payload"),
        width.alias("width"),
        height.alias("height"),
        n_frames.alias("n_frames"),
    )


def _int32_bytes(c: F.Column) -> F.Column:
    """int → 4 big-endian bytes, as a Catalyst expression (no UDF)."""
    return F.unhex(F.lpad(F.hex(c.cast("bigint")), 8, "0"))


def decode_image(payload: bytes, fake: bool = False) -> dict:
    """STUB: real decode needs an image codec the container doesn't have.
    ``fake=True`` selects the deterministic fake decoder (header parse),
    which is what the pipeline tests run."""
    if not fake:
        raise NotImplementedError(
            "media decode requires an image/audio codec library "
            "(not available in this environment); use fake=True for the "
            "deterministic header decoder"
        )
    magic, width, height, n_frames = struct.unpack(">iiii", payload[:16])
    assert magic == _MAGIC, "bad media payload"
    return {"width": width, "height": height, "n_frames": n_frames}


EXTRACT_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("media_type", StringType()),
        StructField("decoded_width", IntegerType()),
        StructField("decoded_height", IntegerType()),
        StructField("sampled_frames", IntegerType()),
        StructField("payload_bytes", IntegerType()),
    ]
)


def extract_features(media: DataFrame, frame_stride: int = _FRAME_STRIDE) -> DataFrame:
    """mapInPandas feature-extraction over the binary column: decode the
    header (fake decoder), frame-sample videos at ``frame_stride``. The
    Arrow batch shape and schema contract are the real production
    plumbing; only the pixel decode inside is the stub."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            meta = [decode_image(p, fake=True) for p in pdf["payload"]]
            out = pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "decoded_width": [m["width"] for m in meta],
                    "decoded_height": [m["height"] for m in meta],
                    "sampled_frames": [
                        max(1, m["n_frames"] // frame_stride) for m in meta
                    ],
                    "payload_bytes": [len(p) for p in pdf["payload"]],
                }
            )
            yield out

    return media.mapInPandas(run, EXTRACT_SCHEMA)


@register(
    "m1_media_features",
    survey="ext-multimodal",
    doc="Multimodal pipeline: binary media column (synthesized with typed "
        "header) → mapInPandas decode/frame-sample (fake decoder; real "
        "decode stubbed behind NotImplementedError) → per-type stats. "
        "The oracle recomputes the same metadata arithmetically.",
    oracle=f"""
        WITH media AS (
            SELECT doc_id,
                   CASE WHEN doc_id % 3 = 0 THEN 'video' ELSE 'image' END AS media_type,
                   CAST(doc_id % 64 + 16 AS INT) AS w,
                   CAST(doc_id % 48 + 16 AS INT) AS h,
                   CASE WHEN doc_id % 3 = 0 THEN {_VIDEO_FRAMES} ELSE 1 END AS nf,
                   16 + octet_length(encode(substr(text, 1, 32))) AS nbytes
            FROM documents
        )
        SELECT media_type,
               CAST(COUNT(*) AS BIGINT) AS n_assets,
               CAST(SUM(w * h) AS BIGINT) AS total_pixels,
               CAST(SUM(GREATEST(1, nf // {_FRAME_STRIDE})) AS BIGINT)
                   AS total_sampled_frames,
               CAST(SUM(nbytes) AS BIGINT) AS total_bytes
        FROM media
        GROUP BY media_type
    """,
)
def m1_media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    feats = extract_features(synthesize_media(t))
    return feats.groupBy("media_type").agg(
        F.count("*").alias("n_assets"),
        F.sum(F.col("decoded_width").cast("bigint") * F.col("decoded_height"))
        .cast("bigint")
        .alias("total_pixels"),
        F.sum("sampled_frames").cast("bigint").alias("total_sampled_frames"),
        F.sum("payload_bytes").cast("bigint").alias("total_bytes"),
    )


@register(
    "m2_frame_sampling",
    survey="ext-multimodal",
    doc="Frame-sampling fan-out: one row per sampled frame (stride 8) per "
        "video asset, carrying the parent metadata + frame byte-offset "
        "arithmetic — the Spark-side plumbing of a video pipeline "
        "(posexplode over the frame index sequence, pure Catalyst).",
    oracle=f"""
        WITH media AS (
            SELECT doc_id,
                   CAST(doc_id % 64 + 16 AS INT) AS w,
                   CAST(doc_id % 48 + 16 AS INT) AS h,
                   {_VIDEO_FRAMES} AS nf
            FROM documents WHERE doc_id % 3 = 0
        )
        SELECT doc_id,
               CAST(f.frame_idx AS INT) AS frame_idx,
               CAST(f.frame_idx * w * h AS BIGINT) AS byte_offset,
               CAST(w * h AS BIGINT) AS frame_bytes
        FROM media,
             LATERAL (SELECT unnest(range(0, nf, {_FRAME_STRIDE})) AS frame_idx) f
    """,
)
def m2_frame_sampling(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    videos = synthesize_media(t).where(F.col("media_type") == "video")
    frames = videos.select(
        "doc_id",
        "width",
        "height",
        F.explode(
            F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(_FRAME_STRIDE))
        ).alias("frame_idx"),
    )
    return frames.select(
        "doc_id",
        F.col("frame_idx").cast("int").alias("frame_idx"),
        (F.col("frame_idx").cast("bigint") * F.col("width") * F.col("height"))
        .cast("bigint")
        .alias("byte_offset"),
        (F.col("width").cast("bigint") * F.col("height"))
        .cast("bigint")
        .alias("frame_bytes"),
    )


@register(
    "m3_corrupt_quarantine",
    survey="ext-multimodal",
    doc="Corrupt-sample quarantine — the validation gate every multimodal "
        "ingest needs before decode workers see a byte: payloads are "
        "checked structurally (length ≥ header size, magic bytes intact) "
        "with pure Catalyst binary expressions, no Python. The fixture "
        "plants deterministic corruption (doc_id % 17 → truncation, "
        "doc_id % 23 → magic flip) so the gate provably catches both "
        "classes; the oracle recomputes the verdicts arithmetically. "
        "Map-side only — a 100 TB media scan quarantines in the same "
        "pass that reads it.",
    oracle="""
        SELECT doc_id,
               CASE WHEN doc_id % 3 = 0 THEN 'video' ELSE 'image' END
                   AS media_type,
               CASE WHEN doc_id % 17 = 0 THEN 'truncated'
                    WHEN doc_id % 23 = 0 THEN 'bad_magic'
                    ELSE 'ok' END AS status,
               CAST(CASE WHEN doc_id % 17 = 0 THEN 10
                         ELSE 16 + octet_length(encode(substr(text, 1, 32)))
                    END AS INT) AS payload_bytes
        FROM documents
    """,
)
def m3_corrupt_quarantine(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    media = synthesize_media(t)
    # plant the two corruption classes the validator must catch
    corrupted = media.select(
        "doc_id",
        "media_type",
        F.when(
            F.col("doc_id") % 17 == 0, F.substring("payload", 1, 10)
        )
        .when(
            F.col("doc_id") % 23 == 0,
            F.concat(
                F.unhex(F.lit("00")),
                F.substring(F.col("payload"), 2, 2147483647),
            ),
        )
        .otherwise(F.col("payload"))
        .alias("payload"),
    )
    # the validator proper: structural checks on the raw bytes
    n_bytes = F.length("payload")
    magic_ok = F.hex(F.substring("payload", 1, 4)) == F.hex(F.lit(_MAGIC))
    return corrupted.select(
        "doc_id",
        "media_type",
        F.when(n_bytes < 16, "truncated")
        .when(~magic_ok, "bad_magic")
        .otherwise("ok")
        .alias("status"),
        n_bytes.cast("int").alias("payload_bytes"),
    )


# --- m4: perceptual-hash media near-dup ---------------------------------

PHASH_BYTES = 30  # 60-bit hash = 2 bit-planes × 30 content bytes
_PHASH_BANDS = 4
_PHASH_BAND_BITS = 15
_PHASH_HAMMING_MAX = 6


def media_phash(media: DataFrame) -> DataFrame:
    """Decode-stage signature worker: payload binary → 60-bit perceptual
    hash, one ``mapInPandas`` pass (the m1 plumbing). A real pHash would
    DCT the decoded pixels; with decode stubbed (no codecs in this
    container) the deterministic stand-in hashes the decoded CONTENT
    bytes — two bit-planes (bit 0, bit 1) of the first 30 bytes — so
    near-identical content differs in O(edit) hash bits, which is the
    property the downstream banded Hamming join needs. The stand-in is
    arithmetically recomputable by the oracle; swap this function for a
    DCT pHash when codecs exist and nothing downstream changes."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            hashes = []
            for p in pdf["payload"]:
                content = bytes(p)[16 : 16 + PHASH_BYTES]
                h = 0
                for i, b in enumerate(content):
                    h |= (b & 1) << i
                    h |= ((b >> 1) & 1) << (PHASH_BYTES + i)
                hashes.append(h)
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "phash": hashes})

    return media.mapInPandas(run, "doc_id long, phash long")


@register(
    "m4_media_phash_dedup",
    survey="ext-multimodal,ext-dedup",
    doc="Media near-dup detection: decode-stage perceptual hash "
        "(media_phash, mapInPandas over the binary column) → banded "
        "Hamming join (4 bands × 15 bits; collision in ANY band makes a "
        "candidate — the d3/s2b OR-construction applied to Hamming "
        "space) → exact bit_count(xor) ≤ 6 verify on candidates only. "
        "Never all-pairs: candidate generation is an equi-join on "
        "(band, bucket), so a 100 TB media corpus shuffles hash rows "
        "(tiny) and compares only bucket-mates. Pairs at Hamming 0 are "
        "the planted same-prefix assets; the verify bound keeps "
        "near-misses.",
    oracle=f"""
        WITH c AS (
            SELECT doc_id, substr(text, 1, 32) AS ctext FROM documents
        ),
        h AS (
            SELECT doc_id, CAST(list_sum(list_transform(range(0, {PHASH_BYTES}), i ->
                (CASE WHEN length(ctext) > i
                      THEN ascii(substr(ctext, CAST(i + 1 AS INT), 1)) ELSE 0 END % 2)
                    * (CAST(1 AS BIGINT) << i)
                + ((CASE WHEN length(ctext) > i
                        THEN ascii(substr(ctext, CAST(i + 1 AS INT), 1)) ELSE 0 END // 2) % 2)
                    * (CAST(1 AS BIGINT) << ({PHASH_BYTES} + i))
            )) AS BIGINT) AS phash
            FROM c
        ),
        b AS (
            SELECT doc_id, phash, t.band,
                   (phash >> (CAST({_PHASH_BAND_BITS} AS BIGINT) * t.band))
                       & {(1 << _PHASH_BAND_BITS) - 1} AS bucket
            FROM h, LATERAL (SELECT unnest(range(0, {_PHASH_BANDS})) AS band) t
        ),
        pairs AS (
            SELECT DISTINCT a.doc_id AS doc_a, b2.doc_id AS doc_b,
                   a.phash AS ha, b2.phash AS hb
            FROM b a JOIN b b2
              ON a.band = b2.band AND a.bucket = b2.bucket
             AND a.doc_id < b2.doc_id
        )
        SELECT doc_a, doc_b,
               CAST(bit_count(xor(ha, hb)) AS INT) AS hamming
        FROM pairs
        WHERE bit_count(xor(ha, hb)) <= {_PHASH_HAMMING_MAX}
    """,
)
def m4_media_phash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    hashes = media_phash(synthesize_media(t))
    mask = (1 << _PHASH_BAND_BITS) - 1
    bands = hashes.select(
        "doc_id",
        "phash",
        F.posexplode(
            F.array(
                *[
                    F.shiftright(F.col("phash"), _PHASH_BAND_BITS * j)
                    .bitwiseAND(mask)
                    for j in range(_PHASH_BANDS)
                ]
            )
        ).alias("band", "bucket"),
    )
    a, b = bands.alias("a"), bands.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.phash").alias("ha"),
            F.col("b.phash").alias("hb"),
        )
        .distinct()
    )
    hamming = F.bit_count(F.col("ha").bitwiseXOR(F.col("hb")))
    return pairs.where(hamming <= _PHASH_HAMMING_MAX).select(
        "doc_a", "doc_b", hamming.cast("int").alias("hamming")
    )


# --- m5: audio waveform energy / silence-trim -----------------------------

_AUDIO_LEN = 64  # samples synthesized per doc (leading text bytes)
_AUDIO_WIN = 16  # samples per energy window
_SILENCE_TH = 50_000  # sum-of-squares below this => silent window

AUDIO_STATS_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_samples", LongType()),
        StructField("n_windows", IntegerType()),
        StructField("total_energy", LongType()),
        StructField("n_silent", IntegerType()),
        StructField("lead_trim", IntegerType()),
    ]
)


def synthesize_audio(t: Tables) -> DataFrame:
    """documents → (doc_id, payload): deterministic unsigned-8-bit PCM
    stand-in — the first ``_AUDIO_LEN`` printable-ASCII bytes of the
    text (sanitized so byte values equal code points and the DuckDB
    oracle can recompute them with ``ascii()``)."""
    clean = F.regexp_replace("text", r"[^ -~]", "")
    return t.documents.select(
        "doc_id",
        F.encode(F.substring(clean, 1, _AUDIO_LEN), "utf-8").alias("payload"),
    )


def audio_energy_stats(audio: DataFrame) -> DataFrame:
    """(doc_id, payload) → windowed sum-of-squares energy, silent-window
    count, and the leading-silence trim point (the m5 body). The decode
    loop is the real audio path: numpy over raw bytes inside
    ``mapInPandas``, Arrow-batched, partition-preserving — swap the
    ``frombuffer`` line for a codec call and nothing else changes.
    Integer arithmetic only (u8 squares summed exactly), so the stats
    are bit-identical in any engine."""
    import numpy as np

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {k: [] for k in (
                "doc_id", "n_samples", "n_windows", "total_energy",
                "n_silent", "lead_trim",
            )}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                v = np.frombuffer(payload, dtype=np.uint8).astype(np.int64)
                n = len(v)
                n_win = n // _AUDIO_WIN
                e = (
                    (v[: n_win * _AUDIO_WIN] ** 2)
                    .reshape(n_win, _AUDIO_WIN)
                    .sum(axis=1)
                    if n_win
                    else np.zeros(0, dtype=np.int64)
                )
                silent = e < _SILENCE_TH
                loud = np.nonzero(~silent)[0]
                out["doc_id"].append(doc_id)
                out["n_samples"].append(n)
                out["n_windows"].append(n_win)
                out["total_energy"].append(int(e.sum()))
                out["n_silent"].append(int(silent.sum()))
                out["lead_trim"].append(
                    int(loud[0]) if len(loud) else n_win
                )
            yield pd.DataFrame(out)

    return audio.mapInPandas(batches, AUDIO_STATS_SCHEMA)


@register(
    "m5_audio_energy",
    survey="ext-multimodal",
    doc=f"Audio waveform stats — the audio leg of the multimodal "
        "family: deterministic u8-PCM payloads (sanitized leading text "
        f"bytes), windowed sum-of-squares energy ({_AUDIO_WIN} samples "
        f"per window), silent-window count (energy < {_SILENCE_TH}) "
        "and the leading-silence trim index — the stats a speech "
        "pipeline computes to trim and VAD-filter clips before "
        "training. The numpy-over-raw-bytes loop inside mapInPandas is "
        "the REAL audio path (swap frombuffer for a codec call); "
        "exact integer arithmetic makes the DuckDB oracle (ascii codes "
        "recomputed from the same text) bit-identical. Map-side only — "
        "zero shuffles at any scale.",
    oracle=f"""
        WITH s AS (
            SELECT doc_id,
                   substr(regexp_replace(text, '[^ -~]', '', 'g'),
                          1, {_AUDIO_LEN}) AS a
            FROM documents
        ),
        pos AS (
            SELECT doc_id,
                   unnest(range(1, len(a) + 1)) AS p,
                   unnest(list_transform(range(1, len(a) + 1),
                          i -> ascii(substr(a, CAST(i AS INT), 1)))) AS v
            FROM s
        ),
        win AS (
            SELECT doc_id,
                   CAST(floor((p - 1) / {_AUDIO_WIN}) AS INT) AS w,
                   SUM(v * v) AS e
            FROM pos
            GROUP BY doc_id, CAST(floor((p - 1) / {_AUDIO_WIN}) AS INT)
            HAVING COUNT(*) = {_AUDIO_WIN}
        ),
        agg AS (
            SELECT doc_id,
                   COUNT(*) AS n_windows,
                   SUM(e) AS total_energy,
                   SUM(CASE WHEN e < {_SILENCE_TH} THEN 1 ELSE 0 END)
                       AS n_silent,
                   COALESCE(MIN(CASE WHEN e >= {_SILENCE_TH} THEN w END),
                            COUNT(*)) AS lead_trim
            FROM win GROUP BY doc_id
        )
        SELECT s.doc_id,
               CAST(len(s.a) AS BIGINT) AS n_samples,
               CAST(COALESCE(a.n_windows, 0) AS INT) AS n_windows,
               CAST(COALESCE(a.total_energy, 0) AS BIGINT) AS total_energy,
               CAST(COALESCE(a.n_silent, 0) AS INT) AS n_silent,
               CAST(COALESCE(a.lead_trim, 0) AS INT) AS lead_trim
        FROM s LEFT JOIN agg a ON s.doc_id = a.doc_id
    """,
)
def m5_audio_energy(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    return audio_energy_stats(synthesize_audio(t))


# --- m6: keyframe selection / within-video frame dedup ---------------------

_KEYFRAME_CUT = 6  # hamming ≤ cut ⇒ frame is redundant with its predecessor


def frame_phash(frames: DataFrame) -> DataFrame:
    """Decode-stage signature worker at FRAME granularity: (doc_id,
    frame_idx, payload) → 60-bit perceptual hash per frame, one
    ``mapInPandas`` pass — media_phash's bit-plane stand-in with the
    frame index carried through (a real DCT pHash drops in per frame
    the same way)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            hashes = []
            for p in pdf["payload"]:
                content = bytes(p)[16 : 16 + PHASH_BYTES]
                h = 0
                for i, b in enumerate(content):
                    h |= (b & 1) << i
                    h |= ((b >> 1) & 1) << (PHASH_BYTES + i)
                hashes.append(h)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "frame_idx": pdf["frame_idx"],
                    "phash": hashes,
                }
            )

    return frames.mapInPandas(run, "doc_id long, frame_idx long, phash long")


@register(
    "m6_keyframe_dedup",
    survey="ext-multimodal,ext-dedup",
    doc="Within-video keyframe selection — the frame-level dedup every "
        "video ingest runs so a static shot doesn't flood training with "
        "near-identical frames: sample frames (m2's stride), pHash each "
        "(frame-granular mapInPandas decode worker), then keep a frame "
        "iff it is the first of its video OR its Hamming distance to "
        f"the PREVIOUS sampled frame exceeds {_KEYFRAME_CUT} (a scene "
        "change). The fixture plants both classes deterministically: "
        "even-doc_id videos are static shots (every frame decodes the "
        "same content → distance 0, frames dropped), odd ones pan "
        "(sliding content → distance ≥ 19, frames kept). The lag "
        "comparison is ONE window over (video, frame order) — state is "
        "a single previous-hash row per video at 100 TB, and the "
        "decode/hash stage stays map-side Arrow batches.",
    oracle=f"""
        WITH v AS (
            SELECT doc_id, text FROM documents WHERE doc_id % 3 = 0
        ),
        f AS (
            SELECT doc_id,
                   CAST(t.fi AS BIGINT) AS frame_idx,
                   substr(text,
                          CAST(CASE WHEN doc_id % 2 = 0 THEN 0
                               ELSE t.fi END + 1 AS INT), 32) AS ctext
            FROM v, LATERAL (SELECT unnest(range(0, {_VIDEO_FRAMES}, {_FRAME_STRIDE})) AS fi) t
        ),
        h AS (
            SELECT doc_id, frame_idx,
                   CAST(list_sum(list_transform(range(0, {PHASH_BYTES}), i ->
                       (CASE WHEN length(ctext) > i
                             THEN ascii(substr(ctext, CAST(i + 1 AS INT), 1))
                             ELSE 0 END % 2) * (CAST(1 AS BIGINT) << i)
                     + ((CASE WHEN length(ctext) > i
                             THEN ascii(substr(ctext, CAST(i + 1 AS INT), 1))
                             ELSE 0 END // 2) % 2)
                         * (CAST(1 AS BIGINT) << ({PHASH_BYTES} + i))
                   )) AS BIGINT) AS phash
            FROM f
        ),
        d AS (
            SELECT doc_id, frame_idx, phash,
                   bit_count(xor(phash, lag(phash) OVER (
                       PARTITION BY doc_id ORDER BY frame_idx)))
                       AS hamming_prev
            FROM h
        )
        SELECT doc_id, frame_idx,
               CAST(phash AS BIGINT) AS phash,
               CAST(hamming_prev AS INT) AS hamming_prev,
               CAST(CASE WHEN hamming_prev IS NULL
                         OR hamming_prev > {_KEYFRAME_CUT}
                    THEN 1 ELSE 0 END AS INT) AS is_keyframe
        FROM d
    """,
)
def m6_keyframe_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    t = Tables(spark, sf_dir)
    videos = synthesize_media(t).where(
        F.col("media_type") == "video"
    ).join(t.documents.select("doc_id", "text"), "doc_id")
    # per-frame payload: header + the frame's decoded content window
    # (static shot for even videos, panning for odd — planted classes)
    off = F.when(F.col("doc_id") % 2 == 0, F.lit(0)).otherwise(
        F.col("frame_idx")
    )
    frames = videos.select(
        "doc_id",
        "width",
        "height",
        "n_frames",
        "text",
        F.explode(
            F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(_FRAME_STRIDE))
        ).alias("frame_idx"),
    ).select(
        "doc_id",
        F.col("frame_idx").cast("long").alias("frame_idx"),
        F.concat(
            _int32_bytes(F.lit(_MAGIC)),
            _int32_bytes(F.col("width")),
            _int32_bytes(F.col("height")),
            _int32_bytes(F.col("n_frames")),
            F.encode(
                F.substring(
                    "text", (off + 1).cast("int"), 32
                ),
                "utf-8",
            ),
        ).alias("payload"),
    )
    hashed = frame_phash(frames)
    w = Window.partitionBy("doc_id").orderBy("frame_idx")
    hd = F.bit_count(
        F.col("phash").bitwiseXOR(F.lag("phash").over(w))
    )
    return (
        hashed.withColumn("hamming_prev", hd)
        .select(
            "doc_id",
            "frame_idx",
            F.col("phash").cast("bigint").alias("phash"),
            F.col("hamming_prev").cast("int").alias("hamming_prev"),
            (
                F.col("hamming_prev").isNull()
                | (F.col("hamming_prev") > _KEYFRAME_CUT)
            )
            .cast("int")
            .alias("is_keyframe"),
        )
    )
