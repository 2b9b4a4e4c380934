"""Mime-type normalization + 4-way disposition filter.

Reimplements ``util/shared/MimeTypeFilter.java`` (SURVEY §2.2 P8):
``truncateMimeType`` (``:177-198``), ``normalizeMimeType`` (``:200``),
``checkMimeTypeDisposition`` (``:212-330``), ``isTextType`` (``:333``).
The prefix/suffix trie matchers of the reference collapse to
str.startswith / exact set membership here.
"""

from __future__ import annotations

import re
from enum import IntEnum


class MimeDisposition(IntEnum):
    ACCEPT_TEXT = 0
    ACCEPT_HTML = 1
    ACCEPT_OTHER = 2
    REJECT = 3


NO_TYPE = "no-type"

_TRUNCATION = re.compile(r"^([^a-zA-Z0-9]*)([a-zA-Z0-9\-/\.+]*).*")
_TYPE_SUBTYPE = re.compile(r"(.+)/(.+)")
_SUBTYPE_PARTS = re.compile(r"[\-\.\+]*(x\-|vnd\.)*([^\+]*)\+*([a-z]*)(\+.*)*")
_TEXT_SUBTYPES = re.compile(
    r"(txt|text|plain|html|atom|xml|xhtml|css|pdf|postscript|dtd|rss|vcard|rtf|"
    r"csv|javascript|json|perl|ruby|java|text-javascript|asp|php|doc|py|c|cc|"
    r"c\+\+|cxx|m|h)"
)

_KNOWN_BINARY_PREFIXES = (
    "binary", "octet", "file", "image", "audio", "video", "true-type", "x-epoc",
)
_OTHER_EXCLUDED_PREFIXES = ("chemical", "plugin")
_VALID_PRIMARY_TEXT_PREFIXES = ("text", "plain", "message", "multipart")
_INVALID_EXTENSIONS = frozenset(
    """gif jpg jpeg bmp png tif tiff ico ps wmf fpx cur ani img lwf pcd psp tga
    xbm xpm arj cab lzw lha lzh sit rpm deb pkg mid midi rmi mpeg mpg mpe mp3
    mp2 aac mov ra ram rm rmv wma wmv wav wave ogg avi au snd exe com lnk t3x
    iso bin dwf asf""".split()
)
_TEXT_VALID_APP_TYPES = frozenset(
    """wap.xhtml+xml acrobat acroread dot texinfo tex text-java
    oasis.opendocument.text sun.xml.writer groove-vcard ms-works pdf word-doc
    httpd-php httpd-php-source httpd.php mscardfile server-parsed-html
    xml-dtd""".split()
)
_OTHER_VALID_APP_TYPES = frozenset(
    """tar latex wordperfect5.1 wordperfect winhlp google-earth.kml
    google-earth.kml+xml google-earth.kmz openxmlformat powerpoint
    ms-powerpoint mspowerpoint keyhole kml ms-excel msaccess msexcel excel
    oasis.opendocument.spreadsheet oasis.opendocument.presentation
    openxmlformats sun.xml.calc cardfile mspublisher shockwave-flash lotus
    ms-word msword ms-htmlhelp ms-project msword-doc xls""".split()
)


def truncate_mime_type(content_type: str | None) -> str:
    if content_type is None:
        return NO_TYPE
    m = _TRUNCATION.match(content_type)
    if m:
        return m.group(2)
    return NO_TYPE


def normalize_mime_type(mime: str | None) -> str:
    return truncate_mime_type(mime).lower()


def _subtype_html_match(subtype: str) -> bool:
    m = _SUBTYPE_PARTS.match(subtype)
    if m:
        for g in (m.group(2), m.group(3)):
            if g in ("html", "xhtml"):
                return True
    return False


def check_mime_disposition(mime: str | None) -> MimeDisposition:
    if mime is None:
        return MimeDisposition.ACCEPT_OTHER
    truncated = truncate_mime_type(mime).lower()
    if truncated == NO_TYPE:
        return MimeDisposition.ACCEPT_OTHER

    m = _TYPE_SUBTYPE.match(truncated)
    if m:
        primary, secondary = m.group(1), m.group(2)
    else:
        primary, secondary = truncated, None

    if not primary:
        return MimeDisposition.ACCEPT_OTHER

    if primary.startswith(_KNOWN_BINARY_PREFIXES) or primary.startswith(
        _OTHER_EXCLUDED_PREFIXES
    ):
        return MimeDisposition.REJECT
    if primary.startswith(_VALID_PRIMARY_TEXT_PREFIXES):
        if secondary is not None and _subtype_html_match(secondary):
            return MimeDisposition.ACCEPT_HTML
        return MimeDisposition.ACCEPT_TEXT

    if (secondary is not None and secondary in _INVALID_EXTENSIONS) or (
        primary in _INVALID_EXTENSIONS
    ):
        return MimeDisposition.REJECT

    probe = secondary if secondary is not None else primary
    pm = _SUBTYPE_PARTS.match(probe)
    if pm:
        for g in (pm.group(2), pm.group(3)):
            if g in ("html", "xhtml"):
                return MimeDisposition.ACCEPT_HTML
        for g in (pm.group(2), pm.group(3)):
            if g and _TEXT_SUBTYPES.fullmatch(g):
                return MimeDisposition.ACCEPT_TEXT

    if secondary is not None:
        if secondary.startswith("vnd."):
            secondary = secondary[len("vnd.") :]
        elif secondary.startswith("x-"):
            secondary = secondary[len("x-") :]
        if secondary in _TEXT_VALID_APP_TYPES:
            return MimeDisposition.ACCEPT_TEXT
        if secondary in _OTHER_VALID_APP_TYPES:
            return MimeDisposition.ACCEPT_OTHER
    return MimeDisposition.REJECT


def is_text_type(mime: str | None) -> bool:
    return check_mime_disposition(mime) in (
        MimeDisposition.ACCEPT_TEXT,
        MimeDisposition.ACCEPT_HTML,
    )


def is_html_type(mime: str | None) -> bool:
    return check_mime_disposition(mime) == MimeDisposition.ACCEPT_HTML
