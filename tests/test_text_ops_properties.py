"""Property tests for the round-5 text-curation kernels: the PII
scrub must be idempotent and total (no PII pattern survives one
pass), and the CCNet normalization must be an idempotent projection
(normalize(normalize(x)) == normalize(x)) — the laws the pipelines
rely on when gates are re-run over already-cleaned shards."""

import pyarrow as pa
import pyarrow.compute as pc
from hypothesis import given, settings
from hypothesis import strategies as st

from commoncrawl_ray.pipelines.queries import (
    _PII_EMAIL,
    _PII_IPV4,
    _PII_PHONE,
)

text_st = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",)), max_size=200
)
pii_st = st.lists(
    st.sampled_from(
        [
            "bob.smith+x@mail.example.org",
            "10.0.12.7",
            "192.168.255.1",
            "555-867-5309",
            "a@b.co",
        ]
    ),
    max_size=4,
)


def _scrub(arr: pa.Array) -> pa.Array:
    red = pc.replace_substring_regex(arr, pattern=_PII_EMAIL, replacement="<EMAIL>")
    red = pc.replace_substring_regex(red, pattern=_PII_IPV4, replacement="<IP>")
    return pc.replace_substring_regex(red, pattern=_PII_PHONE, replacement="<PHONE>")


@given(text=text_st, pii=pii_st)
@settings(max_examples=80, deadline=None)
def test_pii_scrub_idempotent_and_total(text, pii):
    doc = text + " " + " ".join(pii)
    arr = pa.array([doc], pa.string())
    once = _scrub(arr)
    twice = _scrub(once)
    assert once.to_pylist() == twice.to_pylist()
    # every planted specimen is gone after one pass
    red = once.to_pylist()[0]
    for p in pii:
        assert p not in red


@given(text=text_st)
@settings(max_examples=80, deadline=None)
def test_normalize_idempotent(text):
    def norm(arr):
        collapsed = pc.replace_substring_regex(arr, pattern=r"\s+", replacement=" ")
        return pc.utf8_lower(pc.utf8_trim_whitespace(collapsed))

    arr = pa.array([text], pa.string())
    once = norm(arr)
    assert norm(once).to_pylist() == once.to_pylist()
    out = once.to_pylist()[0]
    # collapsed: no double spaces, no leading/trailing whitespace
    assert "  " not in out
    assert out == out.strip()
