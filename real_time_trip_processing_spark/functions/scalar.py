"""Scalar function surface (SURVEY §2.9, F1-F15).

Every scalar the reference uses maps to a built-in pyspark.sql.function —
JVM-side, whole-stage-codegen'd; no Python UDFs anywhere on this path.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def decode_stream_payload(raw: Column, schema) -> Column:
    """F1+F2: base64 → utf8 → parsed struct
    (reference scripts/lambda1.py:31-32). ``try_to_binary`` (not the
    strict ``unbase64``, which throws under ANSI) nulls out invalid
    base64 so corrupt payloads skip instead of failing the batch —
    the reference's per-record try/except."""
    return F.from_json(
        F.try_to_binary(raw, F.lit("base64")).cast("string"), schema
    )


def json_field(col: Column, path: str) -> Column:
    """F2/X5: extract one field from a JSON string column."""
    return F.get_json_object(col, path)


def iso_ts(col: Column) -> Column:
    """F10/F12-style ISO-8601 second-resolution timestamp string
    (reference stores timestamps as ISO strings, scripts/lambda1.py:39-43)."""
    return F.date_format(col, "yyyy-MM-dd HH:mm:ss")


def epoch_seconds(col: Column) -> Column:
    """F11 (reference scripts/glue_scripts.py:196)."""
    return F.unix_timestamp(col)
