"""Ports of the reference's pure-function tests.

TestWebCrawler.scala:16-38 (normalize) and Storage.scala:14-21
(seedToFilename) against our kernels.
"""

from hypothesis import given, settings

# the sandbox host has spiky CPU steal; wall-clock deadlines flake
settings.register_profile("noisy_host", deadline=None)
settings.load_profile("noisy_host")
from hypothesis import strategies as st

from webcrawler_spark.kernels import (
    canonicalize,
    java_string_hashcode,
    seed_to_filename,
)


def test_normalize_creates_absolute_uri():
    assert canonicalize("example", base="http://example.org/") == "http://example.org/example"


def test_normalize_identity():
    assert canonicalize("http://example.org/example") == "http://example.org/example"


def test_normalize_splits_fragment():
    assert canonicalize("http://example.org/example#1") == "http://example.org/example"


def test_normalize_removes_dot_segments():
    assert canonicalize("http://example.org/q/../example") == "http://example.org/example"


def test_normalize_drops_query_port_userinfo():
    assert canonicalize("http://u:p@example.org:8080/a/b?q=1#f") == "http://example.org/a/b"


def test_normalize_rejects_non_http():
    assert canonicalize("mailto:x@example.org") is None
    assert canonicalize("javascript:void(0)", base="http://example.org/") is None


def test_normalize_relative_resolution():
    assert canonicalize("../c", base="http://example.org/a/b/") == "http://example.org/a/c"
    assert canonicalize("/root", base="http://example.org/a/b") == "http://example.org/root"


def test_pipe_escaping():
    # LinkContext.scala:97-100 workaround
    assert canonicalize("/a|b", base="http://example.org/") is not None


@given(st.text(alphabet=st.characters(min_codepoint=33, max_codepoint=126), min_size=1))
def test_normalize_idempotent(path):
    u = canonicalize(f"http://example.org/{path}")
    if u is not None:
        assert canonicalize(u) == u


def test_java_hashcode():
    # pinned against the JVM: "hello".hashCode() == 99162322
    assert java_string_hashcode("hello") == 99162322
    assert java_string_hashcode("") == 0
    # negative case: "webcrawler-test-string-overflow".hashCode()
    assert java_string_hashcode("polygenelubricants") == -2147483648


def test_seed_to_filename_short():
    # golden label from /root/reference/data/network1.gml node 1
    assert seed_to_filename("http://example.org/1") == "example.org-1"
    assert seed_to_filename("https://a.b/c:d") == "a.b-c-d"


def test_seed_to_filename_long():
    url = "http://example.org/" + "x" * 150
    out = seed_to_filename(url)
    head = ("example.org-" + "x" * 150)[:120]
    assert out == head + str(java_string_hashcode(head))
