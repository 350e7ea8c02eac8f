"""Multimodal column convention + decode plumbing.

Convention (SURVEY §2 north-star): a modality payload is an opaque
``binary`` column plus a typed metadata struct::

    payload  BINARY                         -- raw bytes (image/audio/…)
    meta     STRUCT<mime: STRING, n_bytes: BIGINT, digest: STRING>

Decode / feature-extraction runs as Arrow-batched ``mapInPandas`` so
bytes never round-trip through Python row-at-a-time. The actual codec
step is STUBBED (no image/audio libs in this container): `decode_stub`
produces deterministic fake features from the raw bytes, and the real
implementation point is clearly marked. The Spark-side plumbing —
schema, batching, partition behavior — is real and tested.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Output schema of the (stubbed) feature extractor.
FEATURE_SCHEMA = "doc_id BIGINT, n_bytes INT, first_byte INT, mean_byte DOUBLE"


def attach_payload(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Materialize the multimodal convention from a text column (the
    test corpus has no real image bytes; UTF-8 bytes stand in)."""
    payload = F.encode(F.col(text_col), "utf-8")
    meta = F.struct(
        F.lit("text/plain").alias("mime"),
        F.length(payload).cast("bigint").alias("n_bytes"),
        F.md5(payload).alias("digest"),
    )
    return df.select(F.col(id_col), payload.alias("payload"), meta.alias("meta"))


def extract_features(mm: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over payload bytes.

    Replace the body of ``decode_stub`` with a real codec (PIL/librosa/
    decord) in production; the mapInPandas contract (schema, batch
    iterator shape, partition-preserving) stays identical.
    """
    import pandas as pd

    def decode_stub(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            payloads = pdf["payload"]
            # --- STUB: deterministic fake decode. Real impl: open the
            # payload with the codec for meta.mime and emit features. ---
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": payloads.map(len).astype("int32"),
                    "first_byte": payloads.map(lambda b: b[0] if len(b) else -1).astype("int32"),
                    "mean_byte": payloads.map(
                        lambda b: (sum(b) / len(b)) if len(b) else 0.0
                    ).astype("float64"),
                }
            )

    return mm.mapInPandas(decode_stub, schema=FEATURE_SCHEMA)


def extract_features_arrow(mm: DataFrame) -> DataFrame:
    """The same feature extraction over raw Arrow RecordBatches
    (``mapInArrow``) — skips the Arrow↔pandas conversion entirely, the
    lowest-overhead Python hook for large binary payloads (no pandas
    object-array materialization of the bytes). Produces rows identical
    to :func:`extract_features` (pinned by test)."""
    import pyarrow as pa

    def decode_stub(batches: Iterator["pa.RecordBatch"]) -> Iterator["pa.RecordBatch"]:
        for batch in batches:
            payloads = batch.column(batch.schema.get_field_index("payload")).to_pylist()
            doc_ids = batch.column(batch.schema.get_field_index("doc_id"))
            yield pa.RecordBatch.from_arrays(
                [
                    doc_ids,
                    pa.array([len(b) for b in payloads], pa.int32()),
                    pa.array([b[0] if len(b) else -1 for b in payloads], pa.int32()),
                    pa.array(
                        [(sum(b) / len(b)) if len(b) else 0.0 for b in payloads],
                        pa.float64(),
                    ),
                ],
                names=["doc_id", "n_bytes", "first_byte", "mean_byte"],
            )

    return mm.select("doc_id", "payload").mapInArrow(decode_stub, schema=FEATURE_SCHEMA)


#: Output schema of the (stubbed) image resize: resized payload plus
#: the post-resize dimensions.
RESIZE_SCHEMA = "doc_id BIGINT, payload BINARY, width INT, height INT"

#: Output schema of the (stubbed) frame sampler: one row per sampled
#: frame — a mapInPandas that EXPANDS rows (1 video → n frames).
FRAME_SCHEMA = "doc_id BIGINT, frame_idx INT, frame BINARY"


def resize_images(mm: DataFrame, width: int = 64, height: int = 64) -> DataFrame:
    """Arrow-batched image resize over payload bytes (1 row → 1 row).

    STUB: no image codec in this container. A real implementation
    decodes ``payload`` per ``meta.mime`` (PIL/opencv), resizes, and
    re-encodes; the stub truncates/pads the byte payload to width*height
    deterministically so the plumbing (schema, batch shape, row
    cardinality) is fully testable. Raises ``NotImplementedError`` for
    mime types a real codec would have to handle specially.
    """
    import pandas as pd

    target = width * height

    def kernel(batches):
        for pdf in batches:
            if (pdf["mime"] == "application/x-unknown").any():
                raise NotImplementedError("no codec for application/x-unknown")
            payloads = pdf["payload"].map(
                lambda b: bytes(b[:target]).ljust(target, b"\0")
            )
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "payload": payloads,
                    "width": width,
                    "height": height,
                }
            )

    flat = mm.select("doc_id", "payload", F.col("meta.mime").alias("mime"))
    return flat.mapInPandas(kernel, schema=RESIZE_SCHEMA)


def sample_frames(mm: DataFrame, every_n_bytes: int = 256, max_frames: int = 4) -> DataFrame:
    """Arrow-batched frame sampling (1 row → up to ``max_frames`` rows).

    STUB for video/audio frame extraction: a real implementation seeks
    keyframes (decord/av); the stub emits deterministic byte windows at
    fixed strides. Demonstrates the row-expanding mapInPandas shape —
    output cardinality independent of input cardinality.
    """
    import pandas as pd

    def kernel(batches):
        for pdf in batches:
            out = {"doc_id": [], "frame_idx": [], "frame": []}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                for i in range(min(max_frames, max(1, len(payload) // every_n_bytes))):
                    out["doc_id"].append(doc_id)
                    out["frame_idx"].append(i)
                    out["frame"].append(
                        bytes(payload[i * every_n_bytes : (i + 1) * every_n_bytes])
                    )
            yield pd.DataFrame(out)

    return mm.select("doc_id", "payload").mapInPandas(kernel, schema=FRAME_SCHEMA)


def meta_table(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Declared (oracle-checkable) projection of the multimodal metadata."""
    mm = attach_payload(df, text_col=text_col, id_col=id_col)
    return mm.select(
        id_col,
        F.col("meta.mime").alias("mime"),
        F.col("meta.n_bytes").alias("n_bytes"),
        F.col("meta.digest").alias("digest"),
    )


#: PNG 8-byte signature, hex form (ISO/IEC 15948 §5.2 — public spec).
PNG_SIG_HEX = "89504E470D0A1A0A"


def attach_png_payload(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Build a REAL (minimal) PNG byte stream per row — signature +
    IHDR chunk with deterministic per-doc dimensions — entirely in
    codegen (`unhex` over a constructed hex string). This gives the
    multimodal tests an actual binary container format to parse, not a
    text stand-in."""
    width = (F.col(id_col) % 1024 + 1).cast("bigint")
    height = ((F.col(id_col) * 7) % 1024 + 1).cast("bigint")
    hx = F.concat(
        F.lit(PNG_SIG_HEX),          # signature
        F.lit("0000000D"),           # IHDR length = 13
        F.lit("49484452"),           # "IHDR"
        F.lpad(F.hex(width), 8, "0"),
        F.lpad(F.hex(height), 8, "0"),
        F.lit("08"),                 # bit depth
        F.lit("02"),                 # color type (truecolor)
        F.lit("000000"),             # compression/filter/interlace
        F.lit("DEADBEEF"),           # CRC (not validated by the parser)
    )
    return df.select(F.col(id_col), F.unhex(hx).alias("payload"))


def parse_png_header(mm: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Typed metadata from a real PNG container header WITHOUT any
    codec library: signature check + big-endian field extraction as
    pure byte arithmetic (`substring` on BINARY → `hex` → `conv`) —
    whole-stage codegen, zero Python, zero shuffle. This is the decode
    step every multimodal pipeline CAN run JVM-side at 100 TB (schema
    sniffing, dimension filters, corrupt-file triage); only pixel
    decode needs the env-gated codec UDF."""
    sig_ok = F.hex(F.expr("substring(payload, 1, 8)")) == F.lit(PNG_SIG_HEX)
    be = lambda pos, n: F.conv(  # noqa: E731 — big-endian uint at byte pos
        F.hex(F.expr(f"substring(payload, {pos}, {n})")), 16, 10
    ).cast("bigint")
    return mm.select(
        F.col(id_col),
        F.when(sig_ok, "image/png").otherwise("application/octet-stream").alias("mime"),
        be(17, 4).alias("width"),
        be(21, 4).alias("height"),
        be(25, 1).cast("int").alias("bit_depth"),
        be(26, 1).cast("int").alias("color_type"),
    )


def attach_wav_payload(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Build a REAL minimal WAV byte stream per row (RIFF/WAVE + fmt
    chunk, little-endian per the RIFF spec) with deterministic per-doc
    audio parameters — the audio sibling of :func:`attach_png_payload`."""
    channels = (F.col(id_col) % 2 + 1).cast("bigint")           # 1..2
    rate = F.element_at(
        F.array(F.lit(16000), F.lit(22050), F.lit(44100)),
        (F.col(id_col) % 3 + 1).cast("int"),
    ).cast("bigint")
    bits = F.lit(16).cast("bigint")

    def le(col, n_bytes: int):
        # little-endian hex of an integer column: byte 0 first
        parts = [
            F.lpad(F.hex((col / F.lit(256 ** i)).cast("bigint") % 256), 2, "0")
            for i in range(n_bytes)
        ]
        return F.concat(*parts)

    hx = F.concat(
        F.lit("52494646"),            # "RIFF"
        le(F.lit(36).cast("bigint"), 4),  # riff size (header-only stream)
        F.lit("57415645"),            # "WAVE"
        F.lit("666D7420"),            # "fmt "
        le(F.lit(16).cast("bigint"), 4),  # fmt chunk size
        le(F.lit(1).cast("bigint"), 2),   # PCM
        le(channels, 2),
        le(rate, 4),
        le((rate * channels * bits / F.lit(8)).cast("bigint"), 4),  # byte rate
        le((channels * bits / F.lit(8)).cast("bigint"), 2),         # block align
        le(bits, 2),
    )
    return df.select(F.col(id_col), F.unhex(hx).alias("payload"))


def parse_wav_header(mm: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Typed audio metadata from a RIFF/WAVE header without any codec:
    signature checks + LITTLE-endian field extraction as byte
    arithmetic (per-byte hex → conv → positional weights) — the
    endianness mirror of the PNG parser, all codegen, zero Python."""
    sig_ok = (F.hex(F.expr("substring(payload, 1, 4)")) == F.lit("52494646")) & (
        F.hex(F.expr("substring(payload, 9, 4)")) == F.lit("57415645")
    )

    def le(pos: int, n_bytes: int):
        total = None
        for i in range(n_bytes):
            b = F.conv(F.hex(F.expr(f"substring(payload, {pos + i}, 1)")), 16, 10).cast(
                "bigint"
            ) * F.lit(256 ** i).cast("bigint")
            total = b if total is None else total + b
        return total

    return mm.select(
        F.col(id_col),
        F.when(sig_ok, "audio/wav").otherwise("application/octet-stream").alias("mime"),
        le(23, 2).cast("int").alias("channels"),
        le(25, 4).alias("sample_rate"),
        le(35, 2).cast("int").alias("bits_per_sample"),
        le(29, 4).alias("byte_rate"),
    )


def attach_wav_pcm_payload(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Build a COMPLETE minimal WAV byte stream per row — RIFF/WAVE +
    fmt chunk (as :func:`attach_wav_payload`) plus a real ``data``
    chunk of ``16 + doc_id % 17`` deterministic 16-bit little-endian
    PCM samples ``s_i = (doc_id·7919 + i·104729) mod 65536 − 32768``.
    The sample generator is pure integer arithmetic, so a DuckDB
    oracle replays the expected DECODED aggregates exactly while the
    engine round-trips through real bytes."""
    channels = (F.col(id_col) % 2 + 1).cast("bigint")
    rate = F.element_at(
        F.array(F.lit(16000), F.lit(22050), F.lit(44100)),
        (F.col(id_col) % 3 + 1).cast("int"),
    ).cast("bigint")
    bits = F.lit(16).cast("bigint")
    n = (F.col(id_col) % 17 + 16).cast("bigint")
    data_size = n * 2

    def le(col, n_bytes: int):
        parts = [
            F.lpad(F.hex((col / F.lit(256 ** i)).cast("bigint") % 256), 2, "0")
            for i in range(n_bytes)
        ]
        return F.concat(*parts)

    def sample_hex(i):
        # unsigned 16-bit encoding of the signed sample: (s + 65536) % 65536
        u = (F.col(id_col) * 7919 + i.cast("bigint") * 104729) % 65536
        enc = (u + 32768) % 65536
        return F.concat(
            F.lpad(F.hex(enc % 256), 2, "0"),
            F.lpad(F.hex((enc / 256).cast("bigint") % 256), 2, "0"),
        )

    pcm_hex = F.array_join(
        F.transform(F.sequence(F.lit(0), (n - 1).cast("int")), sample_hex), ""
    )
    hx = F.concat(
        F.lit("52494646"),                     # "RIFF"
        le(F.lit(36).cast("bigint") + data_size, 4),
        F.lit("57415645"),                     # "WAVE"
        F.lit("666D7420"),                     # "fmt "
        le(F.lit(16).cast("bigint"), 4),
        le(F.lit(1).cast("bigint"), 2),        # PCM
        le(channels, 2),
        le(rate, 4),
        le((rate * channels * bits / F.lit(8)).cast("bigint"), 4),
        le((channels * bits / F.lit(8)).cast("bigint"), 2),
        le(bits, 2),
        F.lit("64617461"),                     # "data"
        le(data_size, 4),
        pcm_hex,
    )
    return df.select(F.col(id_col), F.unhex(hx).alias("payload"))


def decode_wav_pcm(mm: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """CONTENT-level audio decode without any codec library: the PCM
    samples of a canonical-layout WAV (fmt at byte 13, data chunk at
    37) are reconstructed from raw bytes — per sample two dynamic
    substrings, little-endian recompose, two's-complement sign fold —
    entirely as codegen byte arithmetic (zero Python, zero shuffle;
    plan-pinned). Emits exact integer aggregates of the decoded
    waveform: sample count, sum, min, max, sum of squares — the
    features an audio-curation pass filters on (silence, clipping,
    energy). At 100 TB this runs inside the scan like the header
    parsers; a real compression codec is the documented environment
    gate, but PCM — the dominant raw-audio interchange — decodes
    fully here."""
    sig_ok = (F.hex(F.expr("substring(payload, 1, 4)")) == F.lit("52494646")) & (
        F.hex(F.expr("substring(payload, 9, 4)")) == F.lit("57415645")
    ) & (F.hex(F.expr("substring(payload, 37, 4)")) == F.lit("64617461"))

    def le_static(pos: int, n_bytes: int):
        total = None
        for i in range(n_bytes):
            b = F.conv(F.hex(F.expr(f"substring(payload, {pos + i}, 1)")), 16, 10).cast(
                "bigint"
            ) * F.lit(256 ** i).cast("bigint")
            total = b if total is None else total + b
        return total

    n = (le_static(41, 4) / 2).cast("bigint")

    def sample_at(i):
        # 1-based byte positions of sample i: 45 + 2i, 46 + 2i
        pos = (F.lit(45) + i.cast("int") * 2).cast("int")
        b0 = F.conv(F.hex(F.substring(F.col("payload"), pos, F.lit(1))), 16, 10).cast(
            "bigint"
        )
        b1 = F.conv(
            F.hex(F.substring(F.col("payload"), pos + 1, F.lit(1))), 16, 10
        ).cast("bigint")
        u = b0 + b1 * 256
        return F.when(u >= 32768, u - 65536).otherwise(u)

    samples = F.when(
        sig_ok & (n >= 1),
        F.transform(F.sequence(F.lit(0), (n - 1).cast("int")), sample_at),
    ).otherwise(F.expr("CAST(array() AS array<bigint>)"))
    s = F.col("__samples")
    return (
        mm.select(F.col(id_col), samples.alias("__samples"))
        .select(
            F.col(id_col),
            F.size(s).alias("n_samples"),
            F.aggregate(s, F.lit(0).cast("bigint"), lambda a, x: a + x).alias("sum_pcm"),
            F.array_min(s).cast("int").alias("min_pcm"),
            F.array_max(s).cast("int").alias("max_pcm"),
            F.aggregate(s, F.lit(0).cast("bigint"), lambda a, x: a + x * x).alias(
                "sumsq_pcm"
            ),
        )
    )


def sniff_mime(mm: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Magic-bytes MIME sniffing over an untyped payload column — the
    dispatch step in front of the per-format header parsers: PNG and
    RIFF/WAVE by signature, UTF-8-looking text by a printable-prefix
    heuristic, everything else opaque. Pure codegen byte tests, zero
    Python, zero shuffle: at 100 TB this classifies a mixed-modality
    lake in the scan and routes each row to the right decode path."""
    head4 = F.hex(F.expr("substring(payload, 1, 4)"))
    png = F.hex(F.expr("substring(payload, 1, 8)")) == F.lit(PNG_SIG_HEX)
    wav = (head4 == F.lit("52494646")) & (
        F.hex(F.expr("substring(payload, 9, 4)")) == F.lit("57415645")
    )
    # printable-ASCII prefix heuristic: bytes 1..min(4, len) in
    # 0x20..0x7E. Short payloads are decided explicitly — a byte past
    # the end passes (conv(hex('')) would be NULL and silently sink the
    # row to octet-stream), and the empty payload is opaque by rule.
    printable = F.length("payload") >= 1
    for i in range(1, 5):
        b = F.conv(F.hex(F.expr(f"substring(payload, {i}, 1)")), 16, 10).cast("int")
        printable = printable & F.when(F.length("payload") < i, F.lit(True)).otherwise(
            (b >= 32) & (b <= 126)
        )
    mime = (
        F.when(png, "image/png")
        .when(wav, "audio/wav")
        .when(printable, "text/plain")
        .otherwise("application/octet-stream")
    )
    return mm.select(F.col(id_col), mime.alias("mime"), F.length("payload").alias("n_bytes"))
