"""URL / web-domain curation primitives — the Common-Crawl-style
front door of a training-data pipeline: canonicalize raw URLs so
syntactic variants of the same page collapse to one key, extract the
registrable domain for per-domain caps/blocklists, all as pure
codegen Column expressions (regexp + array ops — zero UDFs, zero
shuffles; the first exchange downstream is the groupBy on the
canonical key).

Canonicalization contract (documented so the DuckDB oracles can
recompute it verbatim):

1. scheme lowercased;
2. host lowercased, any ``user:pass@`` userinfo dropped, leading
   ``www.`` stripped, the scheme's DEFAULT port stripped (``:80``
   http / ``:443`` https) — non-default ports are significant and
   kept;
3. path: trailing slashes collapsed away; an empty path becomes ``/``;
4. query: tracking parameters dropped (``utm_*``, ``fbclid``,
   ``gclid``, ``ref``), the rest sorted lexicographically as
   ``key=value`` strings and rejoined with ``&``;
5. fragment dropped.

Registrable-domain extraction is the eTLD+1 rule against a small
embedded pseudo-suffix list (``co.uk``, ``com.au``, ``co.jp``) — a
production deployment swaps in the full public-suffix list as a
broadcast table; the operator shape (last-2-or-3 label join) is
identical.

Reference parity: the reference pipeline has no web operators
(SURVEY.md §2); this module extends the engine per the verdict's
LLM-data-pipeline mandate (round-8 "Next round" item 3).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# params dropped during canonicalization (matched against "key=value")
TRACKING_PARAM_RE = r"^(utm_[^=]*|fbclid|gclid|ref)="

# two-label suffixes under which the registrable domain is 3 labels
PSEUDO_SUFFIXES = ("co.uk", "com.au", "co.jp")

_SCHEME_RE = r"^([A-Za-z][A-Za-z0-9+.-]*)://"
_HOSTPORT_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)"
_PATH_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)"
_QUERY_RE = r"^[^#]*?\?([^#]*)"  # the ? must precede any # — a ? inside the fragment is not a query


def url_scheme(url: Column) -> Column:
    """Lowercased scheme ('' if the string is not scheme://-shaped)."""
    return F.lower(F.regexp_extract(url, _SCHEME_RE, 1))


def _host_port(url: Column) -> Column:
    """Lowercased host[:port] — userinfo (``user:pass@``) dropped:
    credentials never belong in a canonical identity key (and would
    defeat the default-port strip, whose regex anchors on the
    authority tail)."""
    hp = F.lower(F.regexp_extract(url, _HOSTPORT_RE, 1))
    return F.regexp_replace(hp, r"^[^@]*@", "")


def canonical_host(url: Column) -> Column:
    """Lowercased host with any userinfo, leading ``www.`` and
    ``:port`` stripped (ports belong to :func:`canonicalize_url`,
    which keeps the non-default ones in the canonical string; the
    HOST is port-free by definition)."""
    return F.regexp_replace(
        F.regexp_replace(_host_port(url), r":[0-9]+$", ""),
        r"^www\.",
        "",
    )


def canonicalize_url(url: Column) -> Column:
    """The canonical form of ``url`` per the module contract — one
    string, built from regexp extractions and a sorted/filtered query
    param array. Everything stays inside whole-stage codegen."""
    scheme = url_scheme(url)
    hp = _host_port(url)
    port = F.regexp_extract(hp, r":([0-9]+)$", 1)
    host = canonical_host(url)
    keep_port = (port != F.lit("")) & ~(
        ((scheme == "http") & (port == "80"))
        | ((scheme == "https") & (port == "443"))
    )
    path = canonical_path(url)
    q = F.regexp_extract(url, _QUERY_RE, 1)
    q2 = F.array_join(
        F.array_sort(
            F.filter(
                F.split(q, "&"),
                lambda p: (p != F.lit(""))
                & ~p.rlike(TRACKING_PARAM_RE),
            )
        ),
        "&",
    )
    return F.concat(
        scheme,
        F.lit("://"),
        host,
        F.when(keep_port, F.concat(F.lit(":"), port)).otherwise(""),
        path,
        F.when(q2 != "", F.concat(F.lit("?"), q2)).otherwise(""),
    )


def canonical_path(url: Column) -> Column:
    """The canonicalized path component alone (trailing slashes
    collapsed, empty → ``/``) — what robots-style path-prefix rules
    match against."""
    path0 = F.regexp_replace(
        F.regexp_extract(url, _PATH_RE, 1), r"/+$", ""
    )
    return F.when(path0 == "", F.lit("/")).otherwise(path0)


def registrable_domain(host: Column) -> Column:
    """eTLD+1 against :data:`PSEUDO_SUFFIXES`: the last two labels,
    or three when the last two are a listed suffix; hosts of <= 2
    labels pass through unchanged. A trailing dot (DNS FQDN form,
    ``example.com.``) is stripped first — its empty last label would
    otherwise shift the slice and return the wrong eTLD+1."""
    host = F.regexp_replace(host, r"\.$", "")
    labels = F.split(host, r"\.")
    n = F.size(labels)
    last2 = F.array_join(F.slice(labels, -2, 2), ".")
    last3 = F.array_join(F.slice(labels, -3, 3), ".")
    return (
        F.when(n <= 2, host)
        .when(last2.isin(*PSEUDO_SUFFIXES), last3)
        .otherwise(last2)
    )
