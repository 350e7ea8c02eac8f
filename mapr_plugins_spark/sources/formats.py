"""Payload format registry — the reference's A4 parse surface, Spark-first.

The reference parses each stream payload through a format chosen by
config (``MapRStreamingSource.java:164-187``: lazily-built CDAP
``RecordFormat`` from a ``FormatSpecification``), with the supported
format list declared in
``widgets/MapRStream-streamingsource.json:48-58``: avro, binary, clf,
csv, grok, syslog, text, tsv.

Here every format is a *Catalyst expression builder*: ``parse_expr``
returns a struct-typed Column, so parsing is a projection inside
whole-stage codegen — no per-record closures, no Python in the hot path
(contrast the reference's per-record ``Function`` objects,
``MapRStreamingSource.java:120-150``). At 100 TB this is the difference
between a JVM-codegen'd regex/CSV kernel and 10^12 interpreted calls.

Divergences from the reference (documented, deliberate — SURVEY §1.4):
the raw/formatless mode yields ``value BINARY`` plus an explicit
``CAST(value AS STRING)`` helper instead of stuffing raw bytes into the
first schema field regardless of its type
(``MapRStreamingSource.java:159-161``).
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = [
    "FORMATS",
    "parse_expr",
    "grok_compile",
    "CLF_REGEX",
    "SYSLOG_REGEX",
]

#: Format names accepted by the reference's source widget
#: (``widgets/MapRStream-streamingsource.json:48-58``).
FORMATS: tuple[str, ...] = (
    "avro",
    "binary",
    "clf",
    "csv",
    "grok",
    "syslog",
    "text",
    "tsv",
    "json",  # engine extension: first-class JSON payloads
    "xml",  # engine extension: Spark 4 native XML payloads
    "warc",  # engine extension: WARC records (ISO 28500 / Common Crawl)
    "fixedwidth",  # engine extension: fixed-column-width records
)

# ---------------------------------------------------------------------------
# line-format regexes

#: Apache Common Log Format:
#: host ident authuser [timestamp] "request" status bytes
CLF_REGEX = (
    r'^(\S+) (\S+) (\S+) \[([^\]]*)\] "([^"]*)" (\d{3}|-) (\d+|-)$'
)
_CLF_FIELDS = ("host", "ident", "authuser", "ts", "request", "status", "bytes")

#: RFC 3164 syslog: <pri>MMM dd HH:MM:SS host tag[pid]: msg
SYSLOG_REGEX = (
    r"^<(\d+)>([A-Z][a-z]{2}\s+\d{1,2} \d{2}:\d{2}:\d{2}) (\S+?) "
    r"([^:\[\s]+)(?:\[(\d+)\])?: (.*)$"
)
_SYSLOG_FIELDS = ("pri", "ts", "host", "tag", "pid", "msg")

# ---------------------------------------------------------------------------
# grok → regex compiler (subset of the public grok pattern library)

#: Public grok base patterns (same semantics as logstash-patterns-core;
#: re-derived, not copied — each is the standard regex for the concept).
GROK_PATTERNS: dict[str, str] = {
    "WORD": r"\w+",
    "NOTSPACE": r"\S+",
    "DATA": r".*?",
    "GREEDYDATA": r".*",
    "INT": r"[+-]?\d+",
    "NUMBER": r"[+-]?\d+(?:\.\d+)?",
    "BASE16NUM": r"(?:0[xX])?[0-9a-fA-F]+",
    "IP": r"\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}",
    "IPORHOST": r"[\w.\-]+",
    "HOSTNAME": r"[\w.\-]+",
    "USER": r"[\w.\-]+",
    "USERNAME": r"[\w.\-]+",
    "LOGLEVEL": r"TRACE|DEBUG|INFO|WARN(?:ING)?|ERROR|FATAL|CRITICAL",
    "TIMESTAMP_ISO8601": r"\d{4}-\d{2}-\d{2}[T ]\d{2}:\d{2}:\d{2}(?:\.\d+)?(?:Z|[+-]\d{2}:?\d{2})?",
    "HTTPDATE": r"\d{2}/\w{3}/\d{4}:\d{2}:\d{2}:\d{2} [+-]\d{4}",
    "QS": r'"[^"]*"',
    "UUID": r"[0-9a-fA-F]{8}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{12}",
}

_GROK_TOKEN = re.compile(r"%\{(\w+)(?::(\w+))?\}")


def grok_compile(pattern: str) -> tuple[str, list[str]]:
    """Compile a grok pattern to ``(regex, named_fields)``.

    ``%{SYNTAX:name}`` becomes a capturing group bound to ``name``;
    ``%{SYNTAX}`` (no name) matches without capturing. Literal text
    between tokens is regex-escaped. Unknown SYNTAX raises ``KeyError``.
    """
    out: list[str] = ["^"]
    fields: list[str] = []
    pos = 0
    for m in _GROK_TOKEN.finditer(pattern):
        out.append(re.escape(pattern[pos : m.start()]))
        syntax, name = m.group(1), m.group(2)
        frag = GROK_PATTERNS[syntax]
        if name:
            fields.append(name)
            out.append(f"({frag})")
        else:
            out.append(f"(?:{frag})")
        pos = m.end()
    out.append(re.escape(pattern[pos:]))
    out.append("$")
    return "".join(out), fields


# ---------------------------------------------------------------------------
# expression builders


def _as_string(value: Column) -> Column:
    return value.cast("string")


def _regex_struct(value: Column, regex: str, fields: tuple[str, ...] | list[str]) -> Column:
    """All-groups extraction as a struct — one codegen'd regex kernel."""
    line = _as_string(value)
    return F.struct(
        *[
            F.regexp_extract(line, regex, i + 1).alias(name)
            for i, name in enumerate(fields)
        ]
    )


#: WARC named headers surfaced as typed struct fields (ISO 28500 §5;
#: the Common Crawl record layout — public spec).
_WARC_HEADERS = (
    ("warc_type", "WARC-Type"),
    ("record_id", "WARC-Record-ID"),
    ("target_uri", "WARC-Target-URI"),
    ("warc_date", "WARC-Date"),
)


def _warc_struct(value: Column) -> Column:
    """Parse one WARC record (version line + CRLF headers + blank line
    + payload) into a typed struct — pure codegen'd string expressions,
    no Python. Missing headers surface as '' (both engines'
    regexp_extract no-match value); a non-numeric/absent Content-Length
    is NULL via try_cast (ANSI-safe)."""
    s = _as_string(value)
    head = F.substring_index(s, "\r\n\r\n", 1)
    fields = [
        F.regexp_extract(s, r"^WARC/([0-9.]+)", 1).alias("version"),
        *[
            F.regexp_extract(head, rf"(?m)^{hdr}: *([^\r\n]*)", 1).alias(name)
            for name, hdr in _WARC_HEADERS
        ],
        F.regexp_extract(head, r"(?m)^Content-Length: *([^\r\n]*)", 1)
        .try_cast("bigint")
        .alias("content_length"),
        F.substr(s, F.length(head) + F.lit(5)).alias("payload"),
    ]
    return F.struct(*fields)


def parse_expr(
    fmt: str | None,
    value: Column | str = "value",
    schema: str | None = None,
    *,
    grok_pattern: str | None = None,
    options: dict[str, str] | None = None,
) -> Column:
    """Build the parse projection for a payload format (reference A4).

    Parameters mirror the reference's ``FormatSpecification``: ``fmt``
    (format name or None for raw), ``schema`` (DDL string for the
    record-shaped formats csv/tsv/json/avro), ``grok_pattern`` for
    format='grok'. Returns a single struct Column named by caller; for
    raw/binary the passthrough value column.
    """
    value = F.col(value) if isinstance(value, str) else value
    opts = dict(options or {})

    if fmt is None or fmt == "binary":
        # formatless: raw bytes, explicit (SURVEY §1.4 divergence)
        return value
    if fmt == "text":
        return _as_string(value)
    if fmt == "csv":
        if schema is None:
            raise ValueError("csv format requires a DDL schema")
        return F.from_csv(_as_string(value), schema, {"sep": ",", **opts})
    if fmt == "tsv":
        if schema is None:
            raise ValueError("tsv format requires a DDL schema")
        return F.from_csv(_as_string(value), schema, {"sep": "\t", **opts})
    if fmt == "json":
        if schema is None:
            raise ValueError("json format requires a DDL schema")
        return F.from_json(_as_string(value), schema, opts)
    if fmt == "xml":
        if schema is None:
            raise ValueError("xml format requires a DDL schema")
        return F.from_xml(_as_string(value), schema, opts or None)
    if fmt == "avro":
        if schema is None:
            raise ValueError("avro format requires an Avro schema JSON string")
        try:
            from pyspark.sql.avro.functions import from_avro
        except ImportError as e:  # pragma: no cover - env-dependent
            raise NotImplementedError(
                "avro format needs the spark-avro module on the classpath"
            ) from e
        # NOTE: the Python wrapper importing does NOT prove the JVM-side
        # spark-avro connector is loaded — without it Spark raises
        # [AVRO_NOT_LOADED_SQL_FUNCTIONS_UNUSABLE] at analysis. Probe
        # with avro_available(spark) to gate eagerly.
        return from_avro(value, schema, opts)
    if fmt == "warc":
        return _warc_struct(value)
    if fmt == "fixedwidth":
        if schema is None:
            raise ValueError("fixedwidth format requires a DDL schema")
        widths = opts.get("widths")
        if not widths:
            raise ValueError(
                "fixedwidth format requires options={'widths': 'w1,w2,...'}"
            )
        return _fixedwidth_struct(_as_string(value), schema, str(widths))
    if fmt == "clf":
        return _regex_struct(value, CLF_REGEX, _CLF_FIELDS)
    if fmt == "syslog":
        return _regex_struct(value, SYSLOG_REGEX, _SYSLOG_FIELDS)
    if fmt == "grok":
        if not grok_pattern:
            raise ValueError("grok format requires grok_pattern")
        regex, fields = grok_compile(grok_pattern)
        return _regex_struct(value, regex, fields)
    raise ValueError(f"unknown format {fmt!r}; known: {FORMATS}")


def _fixedwidth_struct(text: Column, schema: str, widths: str) -> Column:
    """Fixed-column-width record parse (the mainframe/COBOL copybook
    and classic log-export layout): field i occupies the next
    ``widths[i]`` characters; values are trimmed then cast to the DDL
    schema's types. Pure substring arithmetic in codegen — the whole
    record parses inside the scan, and a DuckDB oracle replays the
    identical offsets."""
    from pyspark.sql.types import StructType

    fields = StructType.fromDDL(schema).fields
    ws = [int(w) for w in widths.split(",")]
    if len(fields) != len(ws):
        raise ValueError(
            f"fixedwidth: {len(fields)} schema fields but {len(ws)} widths"
        )
    cols = []
    off = 0
    for fld, w in zip(fields, ws):
        if w <= 0:
            raise ValueError(f"fixedwidth: width must be positive, got {w}")
        cols.append(
            F.trim(F.substring(text, off + 1, w)).cast(fld.dataType).alias(fld.name)
        )
        off += w
    return F.struct(*cols)


_AVRO_PROBE: dict[int, bool] = {}


def avro_available(spark) -> bool:
    """True iff the JVM-side spark-avro connector is loaded in this
    session (reference A4 lists avro as a first-class stream format,
    ``widgets/MapRStream-streamingsource.json:48-58``). The pyspark
    wrapper module always imports; only an executed round-trip proves
    the connector jar is on the classpath, so probe one tiny row and
    cache per-session."""
    key = id(spark)
    if key not in _AVRO_PROBE:
        try:
            from pyspark.sql import functions as F
            from pyspark.sql.avro.functions import from_avro, to_avro

            probe_schema = (
                '{"type":"record","name":"p","fields":'
                '[{"name":"id","type":"long"}]}'
            )
            (
                spark.range(1)
                .select(to_avro(F.struct("id")).alias("v"))
                .select(from_avro("v", probe_schema).alias("d"))
                .collect()
            )
            _AVRO_PROBE[key] = True
        except Exception:  # connector missing → AnalysisException
            _AVRO_PROBE[key] = False
    return _AVRO_PROBE[key]
