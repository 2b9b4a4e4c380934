"""Property-based hardening of the URL kernel (the reference's idiom is
randomized inputs + exact asserts; hypothesis widens the input space).

Invariants:
- canonicalize_url / url_fpv2 never raise on arbitrary text;
- canonicalization is IDEMPOTENT: canon(canon(u)) == canon(u) — the
  property that makes the frontier's dedup sound (a URL re-discovered
  from its own canonical form must map to the same fingerprint);
- fingerprints are stable across calls.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from commoncrawl_ray.functions.canonicalize import canonicalize_url, url_fpv2
from commoncrawl_ray.functions.fingerprint import fp64
from commoncrawl_ray.functions.sessionid import normalize_sessionid

url_ish = st.one_of(
    st.text(max_size=200),
    st.builds(
        lambda scheme, host, path, q, frag: f"{scheme}://{host}{path}{q}{frag}",
        scheme=st.sampled_from(["http", "HTTP", "https", "ftp", "weird"]),
        host=st.text(
            alphabet="abcXYZ019.-_%:@[]", min_size=0, max_size=40
        ),
        path=st.text(alphabet="/ab.%20/..;=&? \t", max_size=40),
        q=st.sampled_from(["", "?a=1", "?PHPSESSID=0123456789abcdef0123456789abcdef", "?a=1&sid=x"]),
        frag=st.sampled_from(["", "#frag", "#"]),
    ),
)


@settings(max_examples=400, deadline=None)
@given(url_ish)
def test_canonicalize_never_raises_and_idempotent(u):
    c = canonicalize_url(u)
    if c is None:
        return
    c2 = canonicalize_url(c)
    assert c2 == c, (u, c, c2)


@settings(max_examples=200, deadline=None)
@given(url_ish)
def test_url_fpv2_stable(u):
    a = url_fpv2(u)
    b = url_fpv2(u)
    assert a == b
    if a is not None:
        canon, dfp, ufp, rfp = a
        # fingerprint of the canonical string is the url hash
        assert fp64(canon) == ufp


@settings(max_examples=200, deadline=None)
@given(st.text(max_size=120))
def test_sessionid_normalizer_total(u):
    # never raises; output is a string; idempotent
    v = normalize_sessionid(u)
    assert isinstance(v, str)
    assert normalize_sessionid(v) == v


@settings(max_examples=200, deadline=None)
@given(st.text(max_size=80))
def test_parse_http_date_total(s):
    from commoncrawl_ray.functions.http import parse_http_date

    v = parse_http_date(s)
    assert isinstance(v, int)


@settings(max_examples=150, deadline=None)
@given(st.binary(max_size=400))
def test_extract_record_total(b):
    # the parse kernel must never raise on arbitrary record bytes
    from commoncrawl_ray.stages.parse_extract import extract_record

    r = extract_record("http://x.com/", b)
    assert isinstance(r, dict)


@given(st.binary(min_size=0, max_size=400))
@settings(max_examples=300, deadline=None)
def test_detect_charset_total(b):
    """Detector totality: any byte string yields None or a resolvable
    codec name, never an exception (nsDetector contract)."""
    from commoncrawl_ray.functions.charset import _codec_or_none, detect_charset

    got = detect_charset(b)
    if got is not None:
        # detector verdicts are codec names DIRECTLY — the declared-
        # charset alias table may map them elsewhere (euc-jp ->
        # JISAutoDetect) and must not sit on the detection path
        assert _codec_or_none(got) is not None
