"""Session-id URL normalization.

Reimplements ``util/shared/SessionIDURLNormalizer.normalize``
(reference ``SessionIDURLNormalizer.java:87-346``): 9 pattern families
removed from a URL, matched case-insensitively (the reference lowercases
a working copy and slices the *original* string). Branch order and the
exact delimiter/length heuristics (32-hex / 36-hex-with-dash / 26-alnum)
are preserved; the first matching branch returns.

The reference's own 40-URL embedded test corpus
(``SessionIDURLNormalizer.java:356-397``) is reproduced in
tests/test_sessionid.py as golden vectors.
"""

from __future__ import annotations

import re

_HEX = re.compile(r"^[0-9a-f]*$")  # pattern0 (input is lowercased)
_ALNUM = re.compile(r"^[0-9a-z]*$")  # pattern0_1
_DIGITS = re.compile(r"^[0-9]*$")  # pattern0_2
_HEX_DASH = re.compile(r"^[0-9a-f\-]*$")  # pattern0_3

_PHPSESSID = "phpsessid"
_OSCSID = "oscsid"
_OSCSID_W_DASH = "-oscsid-"
_SESSIONS = "/sessions/"
_DOLLAR_SESSIONID = ";$sessionid$"
_SESSION_ID = "/session_id/"
_DASHDASH_SESSIONID = "--session_id."
_JSESSIONID = ";jsessionid="
_SID = "sid"
_MSCSID = "mscsid"


def normalize_sessionid(url: str) -> str:
    """Return url with recognized session-id tokens removed (or url
    unchanged). Mirrors SessionIDURLNormalizer.normalize branch-for-branch."""
    original = url
    low = url.lower()

    # --- PHPSESSID family (SessionIDURLNormalizer.java:92-135)
    idx = low.rfind(_PHPSESSID)
    if idx != -1:
        after = idx + len(_PHPSESSID)
        if len(low) > after and low[after] in "=.-+/":
            id_start = after + 1
            id_end = id_start
            while id_end != len(low) and low[id_end] not in "&.-+/":
                id_end += 1
            id_str = low[id_start:id_end]
            if id_str:
                desired, pat = 32, _HEX
                if not pat.match(id_str):
                    desired, pat = 26, _ALNUM
                if len(id_str) == desired and pat.match(id_str):
                    if id_end == len(low):
                        return original[: idx - 1]
                    return original[: idx - 1] + original[id_end:]

    # --- .php + trailing /<32-hex> when segment starts with oscsid
    # (SessionIDURLNormalizer.java:137-160; the plain-/md5 cut is
    # commented out in the reference, so only the oscsid case fires)
    if ".php" in low:
        last_slash = low.rfind("/")
        if last_slash != -1:
            id_str = low[last_slash + 1 :]
            if len(id_str) == 32 and _HEX.match(id_str):
                prev_slash = low.rfind("/", 0, last_slash)
                if prev_slash != -1 and low.find(_OSCSID, prev_slash + 1) == prev_slash + 1:
                    return original[:prev_slash]

    # --- osCsid/<32-hex> (SessionIDURLNormalizer.java:162-175)
    idx = low.rfind(_OSCSID)
    if idx != -1:
        next_slash = low.find("/", idx + len(_OSCSID))
        if next_slash != -1:
            id_str = low[next_slash + 1 :]
            if len(id_str) == 32 and _HEX.match(id_str):
                return original[: idx - 1]

    # --- -osCsid-<32-hex>.html (SessionIDURLNormalizer.java:177-191)
    idx = low.rfind(_OSCSID_W_DASH)
    if idx != -1:
        html_idx = low.rfind(".html")
        if html_idx > idx:
            id_str = low[idx + len(_OSCSID_W_DASH) : html_idx]
            if len(id_str) == 32 and _HEX.match(id_str):
                return original[:idx] + original[html_idx:]

    # --- /sessions/<32-hex>/ (SessionIDURLNormalizer.java:193-206)
    idx = low.find(_SESSIONS)
    if idx != -1:
        next_slash = low.find("/", idx + len(_SESSIONS))
        if next_slash != -1:
            id_str = low[idx + len(_SESSIONS) : next_slash]
            if len(id_str) == 32 and _HEX.match(id_str):
                return original[:idx] + original[next_slash:]

    # --- ;$sessionid$<alnum> (SessionIDURLNormalizer.java:208-216)
    idx = low.find(_DOLLAR_SESSIONID)
    if idx != -1:
        if _ALNUM.match(low[idx + len(_DOLLAR_SESSIONID) :]):
            return original[:idx]

    # --- /session_id/<32-hex>/ (SessionIDURLNormalizer.java:218-233)
    idx = low.find(_SESSION_ID)
    if idx != -1:
        next_slash = low.find("/", idx + len(_SESSION_ID))
        if next_slash != -1:
            id_str = low[idx + len(_SESSION_ID) : next_slash]
            if len(id_str) == 32 and _HEX.match(id_str):
                return original[:idx] + original[next_slash:]

    # --- --session_id.<digits>-- (SessionIDURLNormalizer.java:235-247)
    idx = low.find(_DASHDASH_SESSIONID)
    if idx != -1:
        next_dd = low.find("--", idx + len(_DASHDASH_SESSIONID))
        if next_dd != -1:
            if _DIGITS.match(low[idx + len(_DASHDASH_SESSIONID) : next_dd]):
                return original[:idx] + original[next_dd:]

    # --- generic sid / oscsid / mscsid (SessionIDURLNormalizer.java:249-326)
    matching = None
    sid_idx = low.rfind(_SID)
    if sid_idx > 0 and low[sid_idx - 1] in "/?&+":
        matching = _SID
    if matching is None:
        sid_idx = low.rfind(_OSCSID)
        if sid_idx > 0 and low[sid_idx - 1] in "/?&+":
            matching = _OSCSID
    if matching is None:
        sid_idx = low.rfind(_MSCSID)
        if sid_idx > 0 and low[sid_idx - 1] in "/?&+":
            matching = _MSCSID
    if matching is not None:
        after = sid_idx + len(matching)
        if len(low) > after and low[after] in "=.-+/":
            id_start = after + 1
            id_end = id_start
            # NOTE: '-' is NOT a terminator in this branch (unlike PHPSESSID)
            while id_end != len(low) and low[id_end] not in "&.+/":
                id_end += 1
            id_str = low[id_start:id_end]
            if id_str:
                desired, pat = 32, _HEX
                if not pat.match(id_str):
                    desired, pat = 36, _HEX_DASH
                if not pat.match(id_str):
                    desired, pat = 26, _ALNUM
                if pat.match(id_str) and len(id_str) >= desired:
                    if id_end == len(low):
                        return original[: sid_idx - 1]
                    return original[: sid_idx - 1] + original[id_end:]

    # --- ;jsessionid= (SessionIDURLNormalizer.java:328-341)
    idx = low.find(_JSESSIONID)
    if idx != -1:
        q = low.find("?", idx)
        if q != -1:
            return original[:idx] + original[q:]
        return original[:idx]

    return original
