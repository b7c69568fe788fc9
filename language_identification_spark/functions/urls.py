"""URL canonicalization for web-crawl dedup and host-level filtering —
the step before content dedup in every web pipeline: the same page is
crawled as ``HTTP://WWW.Site.com:80/a/?utm_source=x#top`` and
``http://site.com/a``, and URL-key dedup only works on a canonical form.

Net-new operator (task brief's training-data-pipeline family; the
reference's fixture corpus has no URLs).

All native Spark SQL (regexp/array ops, whole-stage codegen; zero
Python), built ONLY from constructs with probed-identical DuckDB twins
(``url_normalize`` / ``host_stats`` FULL gates): ``regexp_extract`` with
a group index, ``regexp_replace`` (DuckDB needs the ``'g'`` flag to
match Spark's replace-all), ``split``/``string_split``, ``array_sort``/
``list_sort``, ``filter``/``list_filter``, ``array_join``/
``array_to_string``. Regexes stay inside the RE2 ∩ Java-regex dialect:
char classes and anchors only, no lookarounds.

Pinned canonicalization (each rule is a choice; what matters is that
both engines and every shard apply the same one):
1. scheme and host lowercased; path/query case preserved;
2. fragment dropped;
3. leading ``www.`` dropped from the host;
4. default port dropped (``:80`` for http, ``:443`` for https); other
   ports kept;
5. ``utm_*`` query parameters dropped; surviving parameters SORTED;
   an emptied query loses its ``?``;
6. trailing slashes stripped from the path (including the root slash).

Scale note: per-row string work, no shuffle; the downstream URL-key
dedup is a plain hash aggregation on the canonical string, and
host-level stats group by :func:`url_host` — both standard exact-dedup
shapes (``operators/dedup.exact_duplicate_groups``).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

SCHEME_RE = "^([A-Za-z][A-Za-z0-9+.-]*)://"


def _scheme(url: Column) -> Column:
    return F.lower(F.regexp_extract(url, SCHEME_RE, 1))


def _rest(url: Column) -> Column:
    return F.regexp_replace(url, SCHEME_RE, "")


def url_host(url: Column) -> Column:
    """Canonical host: lowercased, ``www.`` and default port stripped."""
    hostport = F.lower(F.regexp_extract(_rest(url), "^([^/?#]*)", 1))
    hostport = F.regexp_replace(hostport, "^www\\.", "")
    scheme = _scheme(url)
    return (
        F.when(scheme == "http", F.regexp_replace(hostport, ":80$", ""))
        .when(scheme == "https", F.regexp_replace(hostport, ":443$", ""))
        .otherwise(hostport)
    )


def normalize_url(url: Column) -> Column:
    """Canonical URL per the module's pinned rules, as one codegen'd
    expression. Unparseable inputs (no ``scheme://``) pass through with
    only fragment-stripping applied — garbage keys still dedup against
    byte-identical garbage."""
    pathq = F.regexp_replace(
        F.regexp_replace(_rest(url), "^[^/?#]*", ""), "#.*$", ""
    )
    path = F.regexp_replace(F.regexp_extract(pathq, "^([^?]*)", 1), "/+$", "")
    query = F.regexp_extract(pathq, "\\?(.*)$", 1)
    params = F.array_sort(
        F.filter(
            F.split(query, "&"),
            lambda p: (p != "") & ~p.startswith("utm_"),
        )
    )
    qnorm = F.when(
        F.size(params) > 0, F.concat(F.lit("?"), F.array_join(params, "&"))
    ).otherwise(F.lit(""))
    canonical = F.concat(_scheme(url), F.lit("://"), url_host(url), path, qnorm)
    return F.when(_scheme(url) == "", F.regexp_replace(url, "#.*$", "")).otherwise(
        canonical
    )
