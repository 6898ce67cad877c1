"""URL normalization for host/URL-level dedup — the step a training-data
pipeline runs BEFORE content dedup (the same page crawled as
`HTTPS://Example.com/a/?utm_source=x#top` and `https://example.com/a`
is one document; dropping it by key is orders of magnitude cheaper than
discovering the duplicate by MinHash later).

Everything is a pure Column expression (regexp/array built-ins — JVM
whole-stage codegen, no UDF), so the normalizer runs map-side at scan
speed and Catalyst can push the surrounding projection into the reader.

Reference analog: the reference normalizes its API/Planet identity keys
before merge (note_id uniqueness contracts in
sql/process/processAPINotes_31_insertNewNotesAndComments.sql); URL
canonicalization is the web-corpus generalization of the same
"normalize the identity key before dedup" step.

Normalization rules (the industry-standard safe subset — RFC 3986 §6
syntax-based normalization plus tracking-param stripping):
- scheme and host lowercased (userinfo before '@', if any, is kept
  byte-identical — RFC 3986 §3.2.1 userinfo is case-sensitive)
- default ports dropped (http:80, https:443); other ports kept
- fragment dropped
- path: trailing slashes stripped, empty path → "/"
- query: params split on '&', tracking params dropped (utm_*, gclid,
  fbclid, ref — matched case-insensitively: emitters that uppercase
  param names must not defeat the dedup key), the rest SORTED and
  rejoined; empty query dropped
- a string with no scheme:// prefix is returned unchanged (best-effort
  contract: garbage in, garbage out — never an error)
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_SCHEME_RE = r"^([A-Za-z][A-Za-z0-9+.\-]*)://"
_TRACKING_RE = r"(?i)^(utm_[^=&]*|gclid|fbclid|ref)(=|$)"


def normalize_url(url) -> Column:
    """Canonical form of a URL column (see module doc for the rules)."""
    url = F.col(url) if isinstance(url, str) else url
    u = F.regexp_replace(url, r"#.*$", "")  # fragment never survives
    scheme = F.lower(F.regexp_extract(u, _SCHEME_RE, 1))
    rest = F.regexp_replace(u, _SCHEME_RE, "")
    authority = F.regexp_extract(rest, r"^([^/?]*)", 1)
    # userinfo (anything up to the last '@') is case-sensitive — pass it
    # through untouched; only the host proper is lowercased
    userinfo = F.regexp_extract(authority, r"^(.*@)", 1)
    hostport = F.regexp_replace(authority, r"^.*@", "")
    host = F.lower(F.regexp_replace(hostport, r":\d*$", ""))
    port = F.regexp_extract(hostport, r":(\d+)$", 1)
    default_port = ((scheme == F.lit("https")) & (port == F.lit("443"))) | (
        (scheme == F.lit("http")) & (port == F.lit("80"))
    )
    canon_host = F.concat(
        userinfo,
        host,
        F.when((port != F.lit("")) & ~default_port, F.concat(F.lit(":"), port)).otherwise(
            F.lit("")
        ),
    )
    path = F.regexp_extract(rest, r"^[^/?]*([^?]*)", 1)
    canon_path = F.regexp_replace(path, r"/+$", "")
    canon_path = F.when(canon_path == F.lit(""), F.lit("/")).otherwise(canon_path)
    query = F.regexp_extract(rest, r"\?(.*)$", 1)
    params = F.array_sort(
        F.filter(
            F.split(query, "&"),
            lambda p: (p != F.lit("")) & ~p.rlike(_TRACKING_RE),
        )
    )
    canon_query = F.array_join(params, "&")
    canon = F.concat(
        scheme,
        F.lit("://"),
        canon_host,
        canon_path,
        F.when(canon_query != F.lit(""), F.concat(F.lit("?"), canon_query)).otherwise(
            F.lit("")
        ),
    )
    # no scheme ⇒ not a URL we understand: pass through untouched
    return F.when(scheme == F.lit(""), url).otherwise(canon)
