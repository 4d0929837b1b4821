import numpy as np
from hypothesis import given, strategies as st

from crawler_ray.urlnorm import (canonicalize, hash64, hash64_many, host_of,
                                 join_url)


def test_canonicalize_basics():
    assert canonicalize("HTTPS://Host.Example.ORG:443/a/b/?q=1#frag") == \
        "https://host.example.org/a/b?q=1"
    assert canonicalize("http://h:80/x") == "http://h/x"
    assert canonicalize("https://h") == "https://h/"
    assert canonicalize("https://h/x/") == "https://h/x"
    assert canonicalize("https://h/") == "https://h/"


def test_canonicalize_idempotent_examples():
    for u in ["https://a.b/c?d=e", "http://x/", "https://h/p/q/r"]:
        assert canonicalize(canonicalize(u)) == canonicalize(u)


@given(st.text(alphabet="abcxyz/-._", min_size=0, max_size=20))
def test_canonicalize_idempotent_property(path):
    u = "https://host.example.org/" + path
    assert canonicalize(canonicalize(u)) == canonicalize(u)


def test_hash64_stable_and_64bit():
    h = hash64("https://host.example.org/doc/1")
    assert h == hash64("https://host.example.org/doc/1")
    assert 0 <= h < 2 ** 64
    assert hash64_many(["a", "b"]) == [hash64("a"), hash64("b")]
    assert hash64("a") != hash64("b")


def test_join_url():
    assert join_url("https://h/list/0", "/doc/5") == "https://h/doc/5"
    assert join_url("https://h/list/0", "https://x/doc") == "https://x/doc"
    assert join_url("https://h/a/b", "c") == "https://h/a/c"


def test_host_of():
    assert host_of("https://Host.X/path") == "host.x"


def test_fast_paths_equal_urllib():
    """The fast paths must be EXACTLY the slow/urllib results."""
    from urllib.parse import urljoin, urlsplit, urlunsplit

    from crawler_ray.urlnorm import (canonicalize, host_of, join_url,
                                     path_of)

    def slow_canon(url):
        parts = urlsplit(url.strip())
        scheme = parts.scheme.lower()
        netloc = parts.netloc.lower()
        dp = {"http": ":80", "https": ":443"}.get(scheme)
        if dp and netloc.endswith(dp):
            netloc = netloc[: -len(dp)]
        path = parts.path or "/"
        if len(path) > 1 and path.endswith("/"):
            path = path.rstrip("/") or "/"
        return urlunsplit((scheme, netloc, path, parts.query, ""))

    urls = [
        "https://host000.example.org/doc/123",
        "https://h.example/list/0",
        "http://a.b/x-y_z.%20q",
        "HTTPS://UP.example/Path/",          # slow path cases
        "https://h.example:443/x",
        "https://h.example",
        "https://h.example/a?b=c#frag",
        "https://h.example/a/b/",
        " https://h.example/sp ",
    ]
    for u in urls:
        assert canonicalize(u) == slow_canon(u), u
        assert host_of(u) == urlsplit(u).netloc.lower(), u
        assert path_of(u) == (urlsplit(u).path or "/"), u

    bases = ["https://h.example/list/3", "http://x.y/a/b"]
    hrefs = ["https://other.example/d", "http://other/p", "/doc/9",
             "doc/9", "../up", "//proto.rel/x", "?q=1", "#f"]
    for b in bases:
        for h in hrefs:
            assert join_url(b, h) == urljoin(b, h), (b, h)
