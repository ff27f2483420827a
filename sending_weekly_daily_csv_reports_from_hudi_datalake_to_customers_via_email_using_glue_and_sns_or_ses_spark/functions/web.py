"""URL canonicalization and domain extraction — pure built-in column
expressions (JVM-side, whole-stage codegen; no Python in the hot path).

Training-data pipelines curate web corpora by URL long before they look
at text: C4 and RefinedWeb both dedup on a normalized URL and filter on
a domain blocklist as their first, cheapest funnel stages. The
canonicalizer here implements the standard, documented subset:

  * scheme and host lowercased (RFC 3986 §6.2.2.1 case normalization);
  * fragment dropped (never sent to the server);
  * default ports stripped (``:80`` for http, ``:443`` for https);
  * a leading ``www.`` dropped from the host;
  * tracking query parameters removed (``utm_*``, ``fbclid``,
    ``gclid``, ``msclkid``, ``mc_eid``, ``igshid``, ``ref_src`` —
    with or without a ``=value``, since click-through links often
    drop it);
  * duplicate slashes in the path collapsed, one trailing slash
    stripped (except the root path), empty path normalized to ``/``.

Deliberately NOT done (documented trade-offs): query-parameter
reordering (changes semantics for some sites), percent-encoding
normalization, userinfo stripping, IDN/punycode folding. Userinfo
(``user:pass@``) is preserved BYTE-FOR-BYTE — RFC 3986 §6.2.2.1 case
normalization covers scheme and host only, and the ``www.``/port rules
apply to the host alone, never to a userinfo that happens to start
with ``www.`` or end in ``:80``. Inputs without a ``scheme://`` are
returned fragment-stripped but otherwise untouched — relative
references have no authority to normalize.

``registered_domain`` is the eTLD+1 heuristic over a SMALL built-in
multi-part-suffix set (co.uk, com.au, …): the full Mozilla public-suffix
list is thousands of entries and would be vendored data, not an
operator; the heuristic covers the common cases and the suffix set is a
parameter for callers who need more. IPv4 hosts pass through whole.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: query parameters that never change page content (click/campaign
#: trackers) — the C4/RefinedWeb-style strip set.
TRACKING_PARAMS = r"utm_[A-Za-z0-9_]+|fbclid|gclid|msclkid|mc_eid|igshid|ref_src"

#: common multi-part public suffixes for the eTLD+1 heuristic. A
#: parameter everywhere it is used — extend with the full public-suffix
#: list if your corpus needs it.
MULTI_SUFFIXES = (
    "co.uk", "org.uk", "ac.uk", "gov.uk",
    "com.au", "net.au", "org.au",
    "co.jp", "or.jp", "ne.jp",
    "com.br", "com.mx", "com.ar",
    "co.in", "co.kr", "co.za", "com.cn", "com.tw", "com.sg", "com.hk",
)

_SCHEME_RE = r"^([A-Za-z][A-Za-z0-9+.\-]*)://"

#: characters removed ANYWHERE in the input before parsing: ASCII tab
#: and line terminators (the WHATWG URL parser strips tab/LF/CR from
#: any position before splitting — copy-pasted URLs carry them mid-
#: string), extended with ``\f`` and the Unicode line terminators
#: U+0085/U+2028/U+2029. Load-bearing for twin parity: Java's ``$``
#: matches before a FINAL line terminator where RE2's means strict
#: end-of-text, so an interior newline ahead of the path would make
#: every later ``$``-anchored pattern (port strip, trailing-slash
#: strip) diverge between the engines — removing the whole terminator
#: class up front is what keeps them in lockstep. ``\x{hhhh}`` is the
#: hex escape both Java and RE2 accept.
_CTRL = r"[\t\n\r\f\x{0085}\x{2028}\x{2029}]"


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def _strip_ws(u: Column) -> Column:
    """Remove the tab/line-terminator class ANYWHERE in the string (see
    ``_CTRL`` — WHATWG strip semantics + the Java-vs-RE2 ``$`` anchor
    guarantee), then trim surrounding spaces (``trim`` is space-only
    and identical in both engines)."""
    return F.trim(F.regexp_replace(u, _CTRL, ""))


def canonicalize_url(col: Column | str) -> Column:
    """Canonical form of an absolute URL (see module docstring for the
    exact rule set). NULL → NULL; scheme-less input → fragment-stripped
    input. One nested codegen expression — a 100 TB URL sweep stays a
    single embarrassingly-parallel scan."""
    u = _strip_ws(_c(col))
    # fragment first: nothing after the first '#' survives in any
    # branch — a separator split, not a regex, so an embedded newline
    # in the fragment cannot produce engine-divergent anchoring
    u = F.substring_index(u, "#", 1)
    scheme = F.regexp_extract(u, _SCHEME_RE, 1)
    has_scheme = scheme != ""
    # slice by the scheme's length rather than splitting on '://' — a
    # '://' later in the string (?redirect=http://…) must not win
    rest = F.substr(u, F.length(scheme) + F.lit(4))
    authority = F.regexp_extract(rest, r"^([^/?]+)", 1)
    tail = F.substr(rest, F.length(authority) + F.lit(1))  # '/path?q', '?q' or ''
    # split userinfo off BEFORE any host rule: lowercasing, default-port
    # strip, and the www-strip are host normalizations — applying them
    # to 'www.alice@example.com' would mangle the (case-sensitive,
    # preserved-verbatim) userinfo and collapse distinct URLs. Greedy
    # '.*@' reaches the LAST '@' (RFC 3986: the host starts after it).
    userinfo = F.regexp_extract(authority, r"^(.*@)", 1)  # '' when none
    host = F.lower(F.substr(authority, F.length(userinfo) + F.lit(1)))
    host = F.when(
        F.lower(scheme) == "http", F.regexp_replace(host, r":80$", "")
    ).when(
        F.lower(scheme) == "https", F.regexp_replace(host, r":443$", "")
    ).otherwise(host)
    host = F.regexp_replace(host, r"^www\.", "")
    path = F.regexp_extract(tail, r"^([^?]*)", 1)
    query = F.substr(tail, F.length(path) + F.lit(1))  # '?a=1&b=2' or ''
    # query surgery: give every parameter its OWN '&…&' delimiters by
    # doubling the separators and bracketing ('a=1&fbclid&b=2' →
    # '&a=1&&fbclid&&b=2&'), so the tracker pattern — value OPTIONAL,
    # since click-through links drop it — removes each tracker with
    # both its private delimiters and adjacent matches never compete
    # for a shared '&' (RE2 has no lookahead to express the boundary
    # otherwise). Collapse '&&' and strip the brackets to rebuild.
    qbody = F.regexp_replace(query, r"^\?", "")
    qd = F.concat(
        F.lit("&"), F.replace(qbody, F.lit("&"), F.lit("&&")), F.lit("&")
    )
    qd = F.regexp_replace(qd, r"&(" + TRACKING_PARAMS + r")(=[^&]*)?&", "")
    qd = F.replace(qd, F.lit("&&"), F.lit("&"))
    qd = F.regexp_replace(qd, r"^&+|&+$", "")
    q = F.when(qd == "", F.lit("")).otherwise(F.concat(F.lit("?"), qd))
    p = F.regexp_replace(path, r"/{2,}", "/")
    p = F.regexp_replace(p, r"(.)/$", r"$1")
    p = F.when(p == "", F.lit("/")).otherwise(p)
    canon = F.concat(F.lower(scheme), F.lit("://"), userinfo, host, p, q)
    return F.when(has_scheme, canon).otherwise(u)


def canonicalize_url_sql_steps(c: str) -> str:
    """DuckDB twin of :func:`canonicalize_url` for oracle parity: a
    SELECT-list fragment of step-wise lateral column aliases ending in
    ``canon_url`` — same rule set, same regexes (kept to the Java∩RE2
    common subset: no lookaround, no backreferences in patterns).
    DuckDB spells the replacement backreference ``\\1`` where Spark
    spells it ``$1``, and needs the explicit ``'g'`` flag where Spark
    regexp_replace is always global. Embed as
    ``SELECT …, {{canonicalize_url_sql_steps('url')}} FROM t`` and
    project/drop the intermediate ``_cu_*`` columns as needed."""
    return rf"""
      CASE WHEN {c} IS NULL THEN NULL  -- split_part maps NULL to ''
           ELSE split_part(trim(regexp_replace({c}, '{_CTRL}', '', 'g')),
                           '#', 1)
      END AS _cu_u,
      regexp_extract(_cu_u, '{_SCHEME_RE}', 1) AS _cu_scheme,
      substr(_cu_u, length(_cu_scheme) + 4) AS _cu_rest,
      regexp_extract(_cu_rest, '^([^/?]+)', 1) AS _cu_auth,
      substr(_cu_rest, length(_cu_auth) + 1) AS _cu_tail,
      regexp_extract(_cu_auth, '^(.*@)', 1) AS _cu_user,
      regexp_replace(
        CASE WHEN lower(_cu_scheme) = 'http'
               THEN regexp_replace(lower(substr(_cu_auth, length(_cu_user) + 1)),
                                   ':80$', '')
             WHEN lower(_cu_scheme) = 'https'
               THEN regexp_replace(lower(substr(_cu_auth, length(_cu_user) + 1)),
                                   ':443$', '')
             ELSE lower(substr(_cu_auth, length(_cu_user) + 1)) END,
        '^www\.', '') AS _cu_host,
      regexp_extract(_cu_tail, '^([^?]*)', 1) AS _cu_path,
      substr(_cu_tail, length(_cu_path) + 1) AS _cu_query,
      regexp_replace(
        '&' || replace(regexp_replace(_cu_query, '^\?', ''), '&', '&&') || '&',
        '&({TRACKING_PARAMS})(=[^&]*)?&', '', 'g') AS _cu_q0,
      regexp_replace(replace(_cu_q0, '&&', '&'), '^&+|&+$', '', 'g') AS _cu_q,
      regexp_replace(regexp_replace(_cu_path, '/{{2,}}', '/', 'g'),
                     '(.)/$', '\1') AS _cu_p,
      CASE WHEN _cu_scheme = '' THEN _cu_u
           ELSE lower(_cu_scheme) || '://' || _cu_user || _cu_host
                || (CASE WHEN _cu_p = '' THEN '/' ELSE _cu_p END)
                || (CASE WHEN _cu_q = '' THEN ''
                         ELSE '?' || _cu_q END)
      END AS canon_url"""


def url_host(col: Column | str) -> Column:
    """Lowercased host of an absolute URL: userinfo stripped (greedy to
    the LAST ``@`` — 'http://x@blocked.com' must attribute to
    blocked.com, or any blocklist is one ``user@`` away from a bypass),
    ``www.`` and port stripped (any port — a host key should not split
    on nonstandard ports). Scheme-less input → NULL (no authority to
    extract)."""
    u = F.substring_index(_strip_ws(_c(col)), "#", 1)
    scheme = F.regexp_extract(u, _SCHEME_RE, 1)
    has_scheme = scheme != ""
    rest = F.substr(u, F.length(scheme) + F.lit(4))
    authority = F.regexp_extract(rest, r"^([^/?]+)", 1)
    host = F.regexp_replace(F.lower(authority), r"^.*@", "")
    host = F.regexp_replace(host, r":[0-9]+$", "")
    host = F.regexp_replace(host, r"^www\.", "")
    return F.when(has_scheme & (host != ""), host).otherwise(F.lit(None))


def registered_domain(
    col: Column | str, multi_suffixes: tuple[str, ...] = MULTI_SUFFIXES
) -> Column:
    """eTLD+1 heuristic from a HOST column (see :func:`url_host`):
    the last two labels, or the last three when the trailing two form a
    known multi-part suffix (``foo.co.uk`` → ``foo.co.uk``, not
    ``co.uk``). IPv4 literals and single-label hosts pass through
    whole. NULL-safe."""
    host = _c(col)
    labels = F.split(host, r"\.")
    n = F.size(labels)
    # greatest(…, 1): when-branches don't short-circuit evaluation, so
    # the slice start must stay legal even for 1-2 label hosts (those
    # rows take the pass-through branch)
    last2 = F.array_join(F.slice(labels, F.greatest(n - 1, F.lit(1)), 2), ".")
    last3 = F.array_join(F.slice(labels, F.greatest(n - 2, F.lit(1)), 3), ".")
    is_ip = host.rlike(r"^\d{1,3}(\.\d{1,3}){3}$")
    return (
        F.when(host.isNull() | is_ip | (n <= 2), host)
        .when(last2.isin(*multi_suffixes), last3)
        .otherwise(last2)
    )
