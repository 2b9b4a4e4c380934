"""Charset sniff → detect → alias → decode ("best effort" text decode).

Reimplements ``util/shared/CharsetUtils.java`` (SURVEY §2.2 P6):

- :func:`sniff_charset` == ``sniffCharacterEncoding``
  (``CharsetUtils.java:116-172``): regex over the ASCII-decoded first
  2000 bytes for ``<meta http-equiv="content-type" ... charset=...>``.
- :func:`best_effort_decode` == ``bestEffortDecodeBytes``
  (``CharsetUtils.java:38-114``), precedence preserved exactly:
  1. header content-type charset;
  2. for ``text/html`` WITH a header charset, the meta sniff *overrides*;
  3. if still none and the type is text-ish, run detection, falling
     back to ASCII;
  4. alias-map the charset name; decode with replacement.
- :func:`detect_charset`: the reference runs the ported Mozilla chardet
  composite over the first 16,000 bytes (``CharsetUtils.java:187-226``,
  ``org/mozilla/intl/chardet/nsDetector.java``). This module implements
  the same public architecture natively: BOM check; 7-bit escape-scheme
  scan (ISO-2022-JP); per-encoding STRUCTURAL state machines (realized
  as strict incremental decodes — exactly the accept/reject language of
  the Mozilla coding state machines) for UTF-8 and the multi-byte CJK
  families (Shift-JIS, EUC-JP, GBK, Big5); a char-DISTRIBUTION analyser
  scoring surviving candidates by their home Unicode blocks plus the
  frequent-lead-byte zones Mozilla's CharDistributionAnalysis uses; and
  a single-byte group prober (KOI8-R / windows-1251 vs windows-1252)
  driven by a Russian letter-frequency model. Deterministic; detection
  is capped at 16,000 bytes like the reference.
"""

from __future__ import annotations

import codecs
import re

import numpy as np

_CHUNK_SIZE = 2000
_META_PATTERN = re.compile(
    r'<meta\s+([^>]*http-equiv="?content-type"?[^>]*)>', re.IGNORECASE
)
_CHARSET_PATTERN = re.compile(r"charset=\s*([a-z][_\-0-9a-z]*)", re.IGNORECASE)

# Full alias table: data/charset_aliases.tsv carries the complete
# 706-entry alias -> canonical map the reference embeds
# (util/shared/CharsetUtils.java:228-940, ICU converter alias data);
# loaded lazily once per worker. The inline map below is a hot
# fast-path for the overwhelmingly common web charsets; the TSV wins
# on conflicts by being consulted first for names it knows, so every
# TSV canonical must resolve to a codec via _canonical_to_codec (or
# intentionally fall to byte detection).
_ALIAS_TABLE: dict[str, str] | None = None

# canonical ICU names Python lacks a same-named codec for, mapped to
# the closest stdlib codec (same byte semantics)
_CANON_EXTRAS = {
    # ICU's x-JISAutoDetect (the TSV canonical for declared euc-jp /
    # ujis / eucjis) auto-detects among EUC-JP/SJIS/ISO-2022-JP in
    # Java; the stdlib has no such codec, so fall back to euc_jp — the
    # declared intent of every alias that canonicalizes here.  A page
    # that declared euc-jp but is really SJIS fails the euc_jp decode
    # and falls through to byte detection, mirroring JISAutoDetect
    # (ADVICE r3: without this entry, correctly-declared EUC-JP pages
    # skipped straight to detection).
    "x-jisautodetect": "euc_jp",
    "x-ms950-hkscs": "big5hkscs",
    "x-ibm33722": "euc_jp",
    "x-ibm943": "cp932",
    "x-ibm949": "cp949",
    "x-ibm950": "big5",
    "ibm-916": "iso-8859-8",
    "x-windows-874": "cp874",
    "x-ibm874": "cp874",
    "x-windows-949": "cp949",
}

_IBM_NUM = re.compile(r"(?:x-)?ibm-?0*(\d+)$")


def _load_alias_table() -> dict[str, str]:
    global _ALIAS_TABLE
    if _ALIAS_TABLE is None:
        import os

        path = os.path.join(
            os.path.dirname(os.path.dirname(__file__)), "data", "charset_aliases.tsv"
        )
        table: dict[str, str] = {}
        with open(path, encoding="utf-8") as f:
            for line in f:
                if line.startswith("#") or "\t" not in line:
                    continue
                alias, canonical = line.rstrip("\n").split("\t", 1)
                table[alias] = canonical
        _ALIAS_TABLE = table
    return _ALIAS_TABLE


def _canonical_to_codec(canonical: str) -> str | None:
    """ICU canonical charset name -> Python codec name, or None when
    the stdlib genuinely lacks it (EBCDIC national variants,
    ISO-2022-CN, x-JISAutoDetect) — those fall to byte detection."""
    import codecs

    try:
        return codecs.lookup(canonical).name
    except LookupError:
        pass
    lc = canonical.lower()
    if lc in _CANON_EXTRAS:
        return _CANON_EXTRAS[lc]
    m = _IBM_NUM.match(lc)
    if m:
        try:
            return codecs.lookup("cp" + m.group(1)).name
        except LookupError:
            return None
    return None


# hot fast-path (python codec names, keys lowercase)
_ALIASES = {
    "utf8": "utf-8",
    "utf-8": "utf-8",
    "unicode-1-1-utf-8": "utf-8",
    "ascii": "ascii",
    "us-ascii": "ascii",
    "iso-8859-1": "iso-8859-1",
    "iso8859-1": "iso-8859-1",
    "latin1": "iso-8859-1",
    "latin-1": "iso-8859-1",
    "l1": "iso-8859-1",
    "windows-1252": "windows-1252",
    "cp1252": "windows-1252",
    "win-1252": "windows-1252",
    "iso-8859-15": "iso-8859-15",
    "iso-8859-2": "iso-8859-2",
    "windows-1251": "windows-1251",
    "cp1251": "windows-1251",
    "koi8-r": "koi8-r",
    "koi8r": "koi8-r",
    "shift_jis": "shift_jis",
    "shift-jis": "shift_jis",
    "sjis": "shift_jis",
    "x-sjis": "shift_jis",
    "euc-jp": "euc-jp",
    "x-euc-jp": "euc-jp",
    "gb2312": "gb2312",
    "gbk": "gbk",
    "gb18030": "gb18030",
    "big5": "big5",
    "euc-kr": "euc-kr",
    "iso-2022-jp": "iso-2022-jp",
    "utf-16": "utf-16",
    "utf-16le": "utf-16-le",
    "utf-16be": "utf-16-be",
}


def sniff_charset(content: bytes) -> str | None:
    """Meta-tag charset sniff over the first 2000 bytes."""
    chunk = content[:_CHUNK_SIZE].decode("ascii", errors="replace")
    m = _META_PATTERN.search(chunk)
    if m:
        cm = _CHARSET_PATTERN.search(m.group(1))
        if cm:
            return cm.group(1)
    return None


# ---------------- detector internals (nsDetector architecture) -------

_DETECT_CAP = 16000  # CharsetUtils.java:187-226 probes <=16,000 bytes


def _strict_ok(probe: bytes, enc: str) -> str | None:
    """Structural state-machine check: strict incremental decode with
    final=False so a multi-byte char cut by the 16 KB cap is not a
    false reject. Returns the decoded prefix or None."""
    try:
        return codecs.getincrementaldecoder(enc)().decode(probe, False)
    except (UnicodeDecodeError, ValueError):
        return None


# Home Unicode blocks for the distribution analyser (numpy over the
# UTF-32 view of the decoded text — this runs in the parse hot path)
def _char_classes(text: str):
    o = np.frombuffer(text.encode("utf-32-le"), dtype="<u4")
    hi = o[o >= 0x80]
    nb = int(hi.size)
    if nb == 0:
        return 0, 0, 0, 0, 0, 0, 0
    kana = int(((hi >= 0x3040) & (hi <= 0x30FF)).sum())
    hw_kana = int(((hi >= 0xFF61) & (hi <= 0xFF9F)).sum())
    hangul = int(
        (((hi >= 0xAC00) & (hi <= 0xD7AF)) | ((hi >= 0x3130) & (hi <= 0x318F))).sum()
    )
    cjk = int(
        (((hi >= 0x4E00) & (hi <= 0x9FFF)) | ((hi >= 0x3400) & (hi <= 0x4DBF))).sum()
    )
    full = int(
        (((hi >= 0x3000) & (hi <= 0x303F)) | ((hi >= 0xFF00) & (hi <= 0xFFEF))).sum()
    )
    cyr = int(((hi >= 0x0400) & (hi <= 0x04FF)).sum())
    return nb, kana, hangul, cjk, full, hw_kana, cyr


def _freq_zone_ratio(probe: bytes, enc: str) -> float:
    """Fraction of multi-byte pairs whose LEAD byte falls in the
    encoding's frequent-character zone (the signal Mozilla's
    CharDistributionAnalysis tables encode): GB2312 level-1/2 rows
    0xB0-0xF7 for GBK, frequent block 0xA4-0xC6 for Big5.

    Vectorized lead-byte identification: within each maximal run of
    8-bit bytes, leads sit at even offsets (GBK/Big5 trail bytes of
    CJK text are themselves >=0xA1 in the overwhelmingly common case),
    so leads = hi bytes whose number of PRECEDING consecutive hi bytes
    is even — computed with a cumulative-run trick, no Python loop."""
    b = np.frombuffer(probe, dtype=np.uint8)
    hi = b >= 0x80
    if not hi.any():
        return 0.0
    # run position of each element: distance since last non-hi byte
    idx = np.arange(len(b))
    last_low = np.maximum.accumulate(np.where(~hi, idx, -1))
    runpos = idx - last_low - 1  # 0-based offset within a hi-run
    leads = b[hi & (runpos % 2 == 0)]
    total = leads.size
    if total == 0:
        return 0.0
    if enc == "gbk":
        hits = int(((leads >= 0xB0) & (leads <= 0xF7)).sum())
    elif enc == "big5":
        hits = int(((leads >= 0xA4) & (leads <= 0xC6)).sum())
    elif enc == "euc_kr":
        # KS X 1001 frequent-hangul rows (EUCKRDistributionAnalysis):
        # the modern-syllable block B0-C8; hanja rows CA+ are rare in
        # living text, which is what separates Korean from GB/Big5
        # byte streams that share the same structural envelope
        hits = int(((leads >= 0xB0) & (leads <= 0xC8)).sum())
    else:
        hits = 0
    return hits / total


def _euctw_chars(probe: bytes) -> int:
    """Structural EUC-TW verifier (nsEUCTWVerifier state machine, no
    Python codec exists): plane-1 chars are [A1-F9][A1-FE]; plane-2+
    chars are SS2 (8E) [A1-B0] [A1-FE][A1-FE]. Returns the multi-byte
    char count, or -1 on any structural violation (incl. a char cut by
    the probe cap — mirroring the incremental decoders' final=False
    leniency would accept a trailing partial char, so a clean prefix
    ending mid-char returns the count seen so far)."""
    i, n, chars = 0, len(probe), 0
    while i < n:
        b = probe[i]
        if b < 0x80:
            i += 1
            continue
        if b == 0x8E:  # SS2: 4-byte plane-2..16 char
            if i + 4 > n:
                return chars  # cut by the cap: accept the clean prefix
            p, t1, t2 = probe[i + 1], probe[i + 2], probe[i + 3]
            if not (0xA1 <= p <= 0xB0 and 0xA1 <= t1 <= 0xFE and 0xA1 <= t2 <= 0xFE):
                return -1
            chars += 1
            i += 4
        elif 0xA1 <= b <= 0xF9:
            if i + 2 > n:
                return chars
            if not (0xA1 <= probe[i + 1] <= 0xFE):
                return -1
            chars += 1
            i += 2
        else:
            return -1
    return chars


def _ucs2_sample(probe: bytes) -> str | None:
    """BOM-less UTF-16 sampler (nsUCS2BEVerifier / nsUCS2LEVerifier
    statistical samplers): Latin-heavy UCS-2 text puts a NUL in every
    other byte; the lattice parity picks the endianness."""
    b = np.frombuffer(probe[: len(probe) & ~1], dtype=np.uint8)
    if b.size < 8:
        return None
    zero_even = float((b[0::2] == 0).mean())
    zero_odd = float((b[1::2] == 0).mean())
    if zero_even >= 0.3 and zero_odd < 0.05:
        return "utf-16be"
    if zero_odd >= 0.3 and zero_even < 0.05:
        return "utf-16le"
    return None


# Russian lowercase letter frequencies (public corpus statistics),
# the single-byte prober's language model
_RU_FREQ = {
    "о": 0.1097, "е": 0.0845, "а": 0.0801, "и": 0.0735, "н": 0.0670,
    "т": 0.0626, "с": 0.0547, "р": 0.0473, "в": 0.0454, "л": 0.0440,
    "к": 0.0349, "м": 0.0321, "д": 0.0298, "п": 0.0281, "у": 0.0262,
    "я": 0.0201, "ы": 0.0190, "ь": 0.0174, "г": 0.0170, "з": 0.0165,
    "б": 0.0159, "ч": 0.0144, "й": 0.0121, "х": 0.0097, "ж": 0.0094,
    "ш": 0.0073, "ю": 0.0064, "ц": 0.0048, "щ": 0.0036, "э": 0.0032,
    "ф": 0.0026, "ъ": 0.0004, "ё": 0.0004,
}


_RU_FREQ_LUT = None  # codepoint -> frequency table, built lazily


def _sbcs_score(probe: bytes, enc: str) -> tuple[float, float]:
    """(cyrillic_fraction, language_model_score) for a single-byte
    candidate — both 0..~0.11; the lang-model score separates KOI8-R
    from windows-1251 (same letters, different byte positions)."""
    global _RU_FREQ_LUT
    if _RU_FREQ_LUT is None:
        lut = np.zeros(0x500, dtype=np.float64)
        for ch, f in _RU_FREQ.items():
            lut[ord(ch)] = f
            lut[ord(ch.upper())] = f
        _RU_FREQ_LUT = lut
    text = probe.decode(enc, errors="replace")
    nb, _k, _h, _c, _f, _hw, cyr = _char_classes(text)
    if nb == 0:
        return 0.0, 0.0
    o = np.frombuffer(text.encode("utf-32-le"), dtype="<u4")
    o = o[o < 0x500]
    freqs = _RU_FREQ_LUT[o]
    letters = freqs > 0
    lm = float(freqs[letters].mean()) if letters.any() else 0.0
    return cyr / nb, lm


def detect_charset(content: bytes) -> str | None:
    """Mozilla-nsDetector-style composite detection (see module doc).
    Pure ASCII -> None (the detector reports nothing, mirroring
    nsDetector's isAscii fast path)."""
    probe = content[:_DETECT_CAP]
    # BOMs (nsDetector handles these before any prober runs)
    if probe.startswith(b"\xef\xbb\xbf"):
        return "utf-8"
    if probe.startswith(b"\xff\xfe"):
        return "utf-16le"
    if probe.startswith(b"\xfe\xff"):
        return "utf-16be"
    # BOM-less UCS-2: ASCII-compatible NULs would pass the ascii fast
    # path below, so the lattice sampler runs first (gated on a NUL —
    # real 8-bit/ASCII pages contain none)
    if b"\x00" in probe:
        u = _ucs2_sample(probe)
        if u is not None:
            return u
    try:
        probe.decode("ascii")
        # 7-bit escape/shift schemes live inside pure ASCII byte
        # streams (nsISO2022[JP/KR/CN]Verifier, nsHZVerifier)
        if b"\x1b$B" in probe or b"\x1b$@" in probe or b"\x1b(J" in probe:
            return "iso-2022-jp"
        if b"\x1b$)C" in probe:
            return "iso-2022-kr"
        if b"\x1b$)A" in probe or b"\x1b$)G" in probe or b"\x1b$*H" in probe:
            return "iso-2022-cn"
        if b"~{" in probe and b"~}" in probe:
            return "hz-gb-2312"
        return None
    except UnicodeDecodeError:
        pass
    if _strict_ok(probe, "utf-8") is not None:
        return "utf-8"

    # multi-byte CJK group: structural validity + distribution score.
    # euc-jp precedes euc_kr: JIS row A4 decoded as KS X 1001 is jamo,
    # so kana text ties under both and the earlier candidate must win.
    best_enc, best_score = None, 0.0
    for enc in ("shift_jis", "euc-jp", "euc_kr", "gbk", "big5"):
        text = _strict_ok(probe, enc)
        if text is None:
            continue
        nb, kana, hangul, cjk, full, hw_kana, _cyr = _char_classes(text)
        if nb < 4:  # too little signal for a confident MBCS verdict
            continue
        if enc in ("shift_jis", "euc-jp"):
            # half-width kana are SINGLE bytes 0xA1-0xDF under SJIS, the
            # exact range EUC-KR/TW/GB lead bytes alias into — weight
            # them 0.25 (vs 0.5 for the rest of the FF00 block) so an
            # all-halfwidth "decode" of a foreign byte stream stays
            # under the 0.5 bar (nsSJISVerifier admits them
            # structurally; the distribution analyser scores them low)
            block = (2.0 * kana + cjk + 0.5 * (full - hw_kana) + 0.25 * hw_kana) / nb
        elif enc == "euc_kr":
            # GB/Big5 byte streams often survive the euc_kr state
            # machine, decoding rows B0-C8 to hangul — so the KR prober
            # only competes when the stream LOOKS Korean on both
            # signals real Korean text maximizes (the typical-
            # distribution-ratio idea of EUCKRDistributionAnalysis):
            # hangul dominance among decoded CJK-ish chars (Korean
            # ~0.95+, GB-as-euckr <=~0.6 — hanzi rows C9+ decode to
            # hanja) and lead concentration in the modern-syllable
            # rows B0-C8 (Korean ~0.98, GB ~0.4-0.6)
            z = _freq_zone_ratio(probe, "euc_kr")
            dom = hangul / (hangul + cjk) if (hangul + cjk) else 0.0
            if dom < 0.8 or z < 0.7:
                continue
            block = (2.0 * hangul + cjk + 0.5 * full) / nb
        else:
            block = (cjk + full) / nb
        score = block + 0.5 * _freq_zone_ratio(probe, enc)
        if score > best_score + 1e-9:
            best_enc, best_score = enc, score
    if best_enc is not None and best_score >= 0.5:
        return best_enc

    # EUC-TW: no Python codec, so the structural verifier substitutes
    # for strict decode; only consulted when every decodable MBCS
    # candidate failed (its SS2 plane form is unique among the group)
    tw_chars = _euctw_chars(probe)
    if tw_chars >= 4:
        return "euc-tw"

    # single-byte group: Cyrillic candidates vs the windows-1252 default
    # Cyrillic text is DENSE in 8-bit bytes (nearly every letter);
    # Latin text with accents is sparse — that density difference is
    # what separates the Cyrillic group from the Latin1 prober, since
    # any 8-bit byte decodes to SOME Cyrillic-block char under koi8/1251
    arr = np.frombuffer(probe, dtype=np.uint8)
    nonspace = int((~np.isin(arr, (0x20, 0x09, 0x0A, 0x0D))).sum())
    hi = int((arr >= 0x80).sum())
    # real Cyrillic text is >=~0.8 here; accented Latin rarely >0.2
    if nonspace and hi / nonspace >= 0.4:
        # the language model (letter frequencies) is the primary
        # signal: KOI8-R bytes decoded as windows-1251 are still
        # Cyrillic-BLOCK chars, just the wrong (rare) letters
        ru_best, ru_key = None, (0.0, 0.0)
        for enc in ("koi8-r", "windows-1251"):
            cyr_frac, lm = _sbcs_score(probe, enc)
            if cyr_frac >= 0.4 and (lm, cyr_frac) > ru_key:
                ru_best, ru_key = enc, (lm, cyr_frac)
        if ru_best is not None:
            return ru_best
    return "windows-1252"


def resolve_alias(charset: str | None) -> str | None:
    """Declared charset name -> Python codec name (or a lowered name
    the caller's ``_codec_or_none`` will reject, falling to byte
    detection). Resolution order: full reference alias table
    (CharsetUtils.java:228-940 parity) -> inline fast-path -> the
    name itself (codecs.lookup may still know it)."""
    if charset is None:
        return None
    lc = charset.lower().strip()
    canonical = _load_alias_table().get(lc)
    if canonical is not None:
        codec = _canonical_to_codec(canonical)
        # unresolvable canonical (no stdlib codec): return the
        # canonical name so decode falls through to detection
        return codec if codec is not None else canonical.lower()
    return _ALIASES.get(lc, lc)


def _is_ascii(body: bytes) -> bool:
    try:
        body.decode("ascii")
        return True
    except UnicodeDecodeError:
        return False


def _codec_or_none(name: str | None):
    if name is None:
        return None
    import codecs

    try:
        return codecs.lookup(name).name
    except LookupError:
        return None


def best_effort_decode(
    content_type: str | None, header_charset: str | None, body: bytes
) -> tuple[str | None, str | None]:
    """-> (decoded_text, charset_used). None text when undecodable /
    typeless, mirroring bestEffortDecodeBytes returning null."""
    text, used, _declared, _detected = best_effort_decode_ex(
        content_type, header_charset, body
    )
    return text, used


def best_effort_decode_ex(
    content_type: str | None, header_charset: str | None, body: bytes
) -> tuple[str | None, str | None, str | None, str | None]:
    """-> (decoded_text, charset_used, charset_declared,
    charset_detected). ``charset_declared`` is the header/meta claim
    (post meta-override, pre-alias); ``charset_detected`` is the byte
    detector's verdict WHEN the detector ran — the
    charset=8 / detectedCharset=15 pair of ArcFileMetadata
    (protocol/shared/protocol.jr:89,115)."""
    from .mime import is_text_type

    charset = header_charset
    if charset is not None and content_type is not None and content_type.lower() == "text/html":
        sniffed = sniff_charset(body)
        if sniffed is not None:
            charset = sniffed
    declared = charset
    detected: str | None = None
    if charset is None:
        if content_type is not None and is_text_type(content_type):
            detected = detect_charset(body)
            charset = detected if detected is not None else "ascii"
    if charset is None:
        return None, None, declared, detected
    if detected is not None:
        # detector verdicts are Python codec names by construction —
        # do NOT route them through the DECLARED-charset alias table
        # (which maps e.g. euc-jp -> JISAutoDetect, a Java-only codec)
        codec = _codec_or_none(detected)
    else:
        charset = resolve_alias(charset)
        codec = _codec_or_none(charset)
    if codec is None:
        detected = detect_charset(body)
        if detected is None:
            # detector's isAscii fast path reports nothing; the
            # reference returns "ASCII" there (CharsetUtils.java:215)
            if _is_ascii(body):
                codec = "ascii"
        else:
            codec = _codec_or_none(detected)
    if codec is None:
        return None, charset, declared, detected
    try:
        return body.decode(codec, errors="replace"), codec, declared, detected
    except Exception:
        return None, codec, declared, detected
