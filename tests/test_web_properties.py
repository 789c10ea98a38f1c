"""Property-based tests (hypothesis) for the web URL/domain
functions: randomized hosts and URLs must match an independent pure-
Python reference implementation of the same contract (batched into
ONE Spark job per example set, so hypothesis drives breadth, not
session churn)."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from usgs_earthquake_data_pipeline_spark.functions.web import (
    PSEUDO_SUFFIXES,
    canonical_host,
    registrable_domain,
)

_LABEL = st.text(
    alphabet="abcdefghijklmnopqrstuvwxyz0123456789-",
    min_size=1,
    max_size=8,
).filter(lambda s: not s.startswith("-") and not s.endswith("-"))


@st.composite
def hosts(draw):
    labels = draw(st.lists(_LABEL, min_size=1, max_size=5))
    host = ".".join(labels)
    if draw(st.booleans()):  # sometimes a listed multi-part suffix tail
        host = host + "." + draw(st.sampled_from(sorted(PSEUDO_SUFFIXES)))
    if draw(st.booleans()):  # FQDN trailing dot
        host = host + "."
    return host


def _ref_registrable(host: str) -> str:
    """Independent reference: eTLD+1 against PSEUDO_SUFFIXES, <=2
    labels pass through, FQDN dot stripped first."""
    h = host[:-1] if host.endswith(".") else host
    labels = h.split(".")
    if len(labels) <= 2:
        return h
    if ".".join(labels[-2:]) in PSEUDO_SUFFIXES:
        return ".".join(labels[-3:])
    return ".".join(labels[-2:])


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(hs=st.lists(hosts(), min_size=1, max_size=24))
def test_registrable_domain_matches_reference(spark, hs):
    df = spark.createDataFrame([(h,) for h in hs], "host string")
    got = [
        r[0] for r in df.select(registrable_domain(F.col("host"))).collect()
    ]
    assert got == [_ref_registrable(h) for h in hs]


@st.composite
def urls(draw):
    scheme = draw(st.sampled_from(["http", "HTTP", "https", "HTTPS"]))
    host = draw(hosts())
    www = draw(st.booleans())
    port = draw(st.sampled_from(["", ":80", ":443", ":8080"]))
    path = draw(st.sampled_from(["", "/", "/a", "/a/b", "/a//", "/a/b///"]))
    return f"{scheme}://{'www.' if www else ''}{host}{port}{path}"


def _ref_canonical_host(url: str) -> str:
    hp = url.split("://", 1)[1]
    for cut in ("/",):
        hp = hp.split(cut, 1)[0]
    hp = hp.rsplit("@", 1)[-1].lower()
    # strip port, then exactly one leading www.
    if ":" in hp:
        head, _, tail = hp.rpartition(":")
        if tail.isdigit():
            hp = head
    if hp.startswith("www."):
        hp = hp[4:]
    return hp


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(us=st.lists(urls(), min_size=1, max_size=24))
def test_canonical_host_matches_reference(spark, us):
    df = spark.createDataFrame([(u,) for u in us], "url string")
    got = [r[0] for r in df.select(canonical_host(F.col("url"))).collect()]
    assert got == [_ref_canonical_host(u) for u in us]
