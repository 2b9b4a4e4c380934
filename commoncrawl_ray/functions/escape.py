"""Delimiter escaping (P17) + streaming-text newline escaping (S10).

Ports of `util/shared/EscapeUtils.java:26-180` (backslash-escaped
concat/split used for config strings) and the cleanup transform of
`hadoop/io/mapred/EscapedNewLineSequenceFileInputFormat.java:55-68`
(CR removal + \\n / \\t escaping for Hadoop-streaming text safety) —
the latter as a vectorized ``pyarrow.compute`` batch kernel.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

ESCAPE = "\\"


def escape(s: str, chars_to_escape: str) -> str:
    out = []
    for c in s:
        if c == ESCAPE or c in chars_to_escape:
            out.append(ESCAPE)
        out.append(c)
    return "".join(out)


def unescape(s: str, chars_to_escape: str) -> str:
    out = []
    in_escape = False
    for c in s:
        if in_escape:
            if c != ESCAPE and c not in chars_to_escape:
                raise ValueError(f"unexpected escaped character: {c!r}")
            out.append(c)
            in_escape = False
        elif c == ESCAPE:
            in_escape = True
        else:
            out.append(c)
    if in_escape:
        raise ValueError("dangling escape at end of string")
    return "".join(out)


def concatenate(separator: str, *strings: str) -> str:
    """Separator-joined concat where separator occurrences inside the
    parts are escaped (`EscapeUtils.java:135`)."""
    return separator.join(escape(s, separator) for s in strings)


def split(separator: str, s: str) -> list[str]:
    """Inverse of :func:`concatenate` (`EscapeUtils.java:160`)."""
    parts: list[str] = []
    cur: list[str] = []
    in_escape = False
    for c in s:
        if in_escape:
            cur.append(c)
            in_escape = False
        elif c == ESCAPE:
            in_escape = True
        elif c == separator:
            parts.append("".join(cur))
            cur = []
        else:
            cur.append(c)
    parts.append("".join(cur))
    return parts


def escape_newlines_batch(batch: pa.Table, column: str = "text") -> pa.Table:
    """Vectorized S10 transform over a string column: CR -> space,
    trim, escape \\n and \\t (streaming-safe one-line-per-record)."""
    col = batch.column(column)
    col = pc.replace_substring(col, pattern="\r", replacement=" ")
    col = pc.utf8_trim_whitespace(col)
    # note: matches the reference transform exactly — backslashes are
    # NOT pre-escaped there either (lossy by design; streaming-side
    # consumers only need one-record-per-line)
    col = pc.replace_substring(col, pattern="\n", replacement="\\n")
    col = pc.replace_substring(col, pattern="\t", replacement="\\t")
    return batch.set_column(batch.column_names.index(column), column, col)
