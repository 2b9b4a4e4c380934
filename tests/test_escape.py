"""P17 EscapeUtils + S10 escaped-newline kernel."""

from __future__ import annotations

import pyarrow as pa
import pytest

from commoncrawl_ray.functions.escape import (
    concatenate,
    escape,
    escape_newlines_batch,
    split,
    unescape,
)


def test_escape_roundtrip():
    s = "a,b\\c,d"
    e = escape(s, ",")
    assert e == "a\\,b\\\\c\\,d"
    assert unescape(e, ",") == s


def test_unescape_rejects_bad_sequences():
    with pytest.raises(ValueError):
        unescape("a\\x", ",")  # x is not an escapable char
    with pytest.raises(ValueError):
        unescape("trailing\\", ",")


def test_concatenate_split_roundtrip():
    parts = ["plain", "with,comma", "with\\backslash", "", "final"]
    s = concatenate(",", *parts)
    assert split(",", s) == parts


def test_escape_newlines_batch():
    t = pa.table({"text": ["  line1\nline2\tx\r\n  ", "clean"]})
    out = escape_newlines_batch(t)
    assert out.column("text").to_pylist() == ["line1\\nline2\\tx", "clean"]
