"""Property test for the PII scrub regexes: generated emails / IPv4s /
phone numbers embedded anywhere in word-soup text must be fully
redacted by the same replace chain the text_pii_scrub query uses.

Runs on Python's ``re`` -- a THIRD regex engine beside Spark's
java.util.regex and DuckDB's RE2.  The gate query already proves
Java==RE2 agreement on the fixture; this locks the patterns'
semantics over a much wider generated input space, which only works
because the patterns are confined to the syntax subset all three
engines share (char classes, \\d, \\b, bounded repetition)."""

from __future__ import annotations

import re

from hypothesis import given, settings, strategies as st

from kmeans_with_mapreduce_cuda_spark.plans.pipeline import (
    PII_EMAIL,
    PII_IPV4,
    PII_PHONE,
)

WORD = st.text(alphabet="abcdefghij", min_size=1, max_size=6)

emails = st.builds(
    lambda u, d, tld: f"{u}@{d}.{tld}",
    st.text(alphabet="abcXYZ019._", min_size=1, max_size=10).filter(
        lambda s: s.strip("._")
    ),
    st.text(alphabet="abcxyz019", min_size=1, max_size=8),
    st.sampled_from(["com", "org", "net", "io"]),
)
ips = st.builds(
    lambda a, b, c, d: f"{a}.{b}.{c}.{d}",
    *[st.integers(0, 255) for _ in range(4)],
)
phones = st.builds(
    lambda cc, groups: "+" + str(cc) + " " + " ".join(groups),
    st.integers(1, 99),
    st.lists(
        st.integers(100, 9999).map(str), min_size=2, max_size=4
    ),
)


def scrub(t: str) -> str:
    t = re.sub(PII_EMAIL, "<EMAIL>", t)
    t = re.sub(PII_IPV4, "<IP>", t)
    t = re.sub(PII_PHONE, "<PHONE>", t)
    return t


@settings(max_examples=200, deadline=None)
@given(
    words=st.lists(WORD, min_size=0, max_size=6),
    pii=st.lists(st.one_of(emails, ips, phones), min_size=1, max_size=3),
    pos=st.integers(0, 6),
)
def test_embedded_pii_is_always_scrubbed(words, pii, pos):
    body = words[:pos] + pii + words[pos:]
    out = scrub(" ".join(body))
    # no address-shaped residue survives the chain
    assert "@" not in out
    assert not re.search(r"\d+\.\d+\.\d+\.\d+", out)
    assert not re.search(r"\+\d[\d ]{6,}\d", out)
    # plain words survive untouched
    for w in words:
        assert w in out


@settings(max_examples=100, deadline=None)
@given(words=st.lists(WORD, min_size=1, max_size=10))
def test_plain_text_never_altered(words):
    t = " ".join(words)
    assert scrub(t) == t
