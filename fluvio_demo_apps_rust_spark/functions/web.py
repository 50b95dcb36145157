"""URL/host canonicalization for web-pipeline first-stage dedup.

The standard first operator of a web-crawl training-data pipeline:
canonicalize each document URL (lowercase scheme+host, strip the
default port, drop the fragment, remove tracking query params, sort
the survivors) and exact-dedup on the canonical form. Everything is
row-local built-in string functions (whole-stage codegen) followed by
ONE shuffle on the canonical URL — the shape that holds at 100 TB.

The testdata ``documents`` table has no URL column, so ``synth_url``
derives a deterministic messy URL per row from (doc_id, source); the
DuckDB oracle mirrors the same derivation, so the canonicalization
logic itself is what the hash gate verifies.

Regex notes (Spark=Java regex, DuckDB=RE2): no lookaheads (RE2 lacks
them) — the default-port strip matches ``:443/`` with the trailing
slash, which all generated URLs have (documented assumption; a general
host:port normalizer would split the authority first). Backreference
syntax differs ($1 vs \\1) so each side carries its own pattern text.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Tracking params dropped by canonicalization (shared regex body —
# identical semantics in Java regex and RE2).
TRACKING_PARAM_RE = r"^(utm_[a-z]+|ref|fbclid|gclid)="


def synth_url(doc_id: Column, source: Column) -> Column:
    """Deterministic messy URL for a document row (6 variants).

    page = doc_id % 80 groups ~2.4 docs/page at sf0.01 so canonical
    dedup has real work; variant = doc_id % 6 cycles through the mess
    classes (clean / uppercased scheme+host / default port / tracking
    params / fragment / tracking + kept param).
    """
    page = (doc_id % F.lit(80)).cast("string")
    path = F.concat(F.lit("/docs/page-"), page)
    v = doc_id % F.lit(6)
    clean = F.concat(F.lit("https://www."), source, F.lit(".example.com"), path)
    return (
        F.when(v == 1, F.concat(F.lit("HTTPS://WWW."), F.upper(source), F.lit(".EXAMPLE.COM"), path))
        .when(v == 2, F.concat(F.lit("https://www."), source, F.lit(".example.com:443"), path))
        .when(v == 3, F.concat(clean, F.lit("?utm_source=feed&utm_medium=rss")))
        .when(v == 4, F.concat(clean, F.lit("#section-2")))
        .when(v == 5, F.concat(clean, F.lit("?ref=tw&id="), (doc_id % F.lit(3)).cast("string")))
        .otherwise(clean)
    )


def canonicalize_url(url: Column) -> Column:
    """Canonical form of ``url`` — all row-local codegen expressions.

    1. drop the fragment (``#...``);
    2. lowercase scheme + authority (everything up to the first ``/``,
       ``?`` or ``#`` after ``://``), leaving the path case intact;
    3. strip the scheme-default port (``https...:443/``, ``http...:80/``);
    4. drop tracking query params (utm_*/ref/fbclid/gclid), sort the
       survivors, and drop the ``?`` entirely when none survive.
    """
    u = F.regexp_replace(url, r"#.*$", "")
    # LET-bind the authority prefix (README plan-audit: no CSE inside
    # higher-order lambdas; here plain projection is fine but we still
    # compute the prefix once).
    prefix = F.regexp_extract(u, r"^[^/]*//[^/?#]*", 0)
    u = F.concat(F.lower(prefix), F.substring(u, F.length(prefix) + F.lit(1), F.lit(1 << 30)))
    u = F.regexp_replace(u, r"^(https://[^/:?#]+):443/", "$1/")
    u = F.regexp_replace(u, r"^(http://[^/:?#]+):80/", "$1/")
    base = F.regexp_replace(u, r"\?.*$", "")
    q = F.regexp_extract(u, r"\?(.*)$", 1)
    kept = F.array_join(
        F.array_sort(
            F.filter(
                F.split(q, "&"),
                lambda p: ~p.rlike(TRACKING_PARAM_RE) & (p != F.lit("")),
            )
        ),
        "&",
    )
    return F.concat(base, F.when(kept == "", F.lit("")).otherwise(F.concat(F.lit("?"), kept)))


def url_host(canonical: Column) -> Column:
    """Host of an already-canonicalized URL."""
    return F.regexp_extract(canonical, r"^[a-z]+://([^/:?#]+)", 1)


# DuckDB oracle twins (RE2 syntax, \1 backrefs) — kept next to the
# Spark implementation so the two canonicalizers evolve together.
ORACLE_SYNTH_URL = """
CASE doc_id % 6
  WHEN 1 THEN 'HTTPS://WWW.' || upper(source) || '.EXAMPLE.COM/docs/page-' || (doc_id % 80)
  WHEN 2 THEN 'https://www.' || source || '.example.com:443/docs/page-' || (doc_id % 80)
  WHEN 3 THEN 'https://www.' || source || '.example.com/docs/page-' || (doc_id % 80) || '?utm_source=feed&utm_medium=rss'
  WHEN 4 THEN 'https://www.' || source || '.example.com/docs/page-' || (doc_id % 80) || '#section-2'
  WHEN 5 THEN 'https://www.' || source || '.example.com/docs/page-' || (doc_id % 80) || '?ref=tw&id=' || (doc_id % 3)
  ELSE 'https://www.' || source || '.example.com/docs/page-' || (doc_id % 80)
END
"""

ORACLE_CANONICALIZE = r"""
WITH u0 AS (SELECT doc_id, regexp_replace({url}, '#.*$', '') AS u FROM documents),
u1 AS (SELECT doc_id,
              lower(regexp_extract(u, '^[^/]*//[^/?#]*'))
                || substr(u, length(regexp_extract(u, '^[^/]*//[^/?#]*')) + 1) AS u
       FROM u0),
u2 AS (SELECT doc_id,
              regexp_replace(regexp_replace(u, '^(https://[^/:?#]+):443/', '\1/'),
                             '^(http://[^/:?#]+):80/', '\1/') AS u
       FROM u1),
u3 AS (SELECT doc_id,
              regexp_replace(u, '\?.*$', '') AS base,
              coalesce(array_to_string(list_sort(list_filter(
                  string_split(coalesce(regexp_extract(u, '\?(.*)$', 1), ''), '&'),
                  p -> NOT regexp_matches(p, '^(utm_[a-z]+|ref|fbclid|gclid)=') AND p <> '')), '&'), '') AS kept
       FROM u2)
SELECT doc_id,
       base || CASE WHEN kept = '' THEN '' ELSE '?' || kept END AS canonical_url
FROM u3
"""


# ---------------------------------------------------------------------------
# HTML -> text extraction (the crawl-pipeline stage BEFORE llm_url_dedup's
# dedup): strip script/style/comments, turn block-tag boundaries into
# newlines, strip remaining tags, decode the basic entities, normalize
# whitespace. All row-local regexp codegen — no Python, no shuffle.
# The testdata has no HTML column, so synth_html derives a deterministic
# messy page per row (4 variants) with the document text ENTITY-ESCAPED
# into it; extraction must round-trip the text back out, which is what
# the oracle hash-gates. Regex notes: non-greedy + (?s) only (Java regex
# and RE2 agree); no lookaheads; replacements avoid $ (Java) and \ (RE2).
# ---------------------------------------------------------------------------


def _esc(col: Column) -> Column:
    # HTML-escape order matters: & first
    c = F.replace(col, F.lit("&"), F.lit("&amp;"))
    c = F.replace(c, F.lit("<"), F.lit("&lt;"))
    return F.replace(c, F.lit(">"), F.lit("&gt;"))


def synth_html(doc_id: Column, source: Column, text: Column) -> Column:
    """Deterministic messy HTML page for a document row (4 variants:
    plain / script + inline markup / style + comment / attribute-heavy
    with <br> and a trailing span)."""
    t = _esc(text)
    title = F.concat(F.lit("<title>Doc "), doc_id.cast("string"), F.lit("</title>"))
    h1 = F.concat(F.lit("<h1>"), source, F.lit("</h1>"))
    v = doc_id % F.lit(4)
    body = (
        F.when(v == 1, F.concat(
            F.lit("<script type=\"text/javascript\">var x = 1 < 2;</script><p><b>"),
            t, F.lit("</b></p>")))
        .when(v == 2, F.concat(
            F.lit("<style>.c{color:red}</style><div>"), t,
            F.lit("</div><!-- tracker <img> -->")))
        .when(v == 3, F.concat(
            F.lit("<p class=\"a\" data-x='1'>"), t,
            F.lit("</p><br><span>tail "), source, F.lit("</span>")))
        .otherwise(F.concat(F.lit("<p>"), t, F.lit("</p>")))
    )
    return F.concat(
        F.lit("<html><head>"), title, F.lit("</head><body>"), h1, body,
        F.lit("</body></html>"),
    )


def extract_html_text(html: Column) -> Column:
    """Block-structure-preserving text extraction from HTML."""
    x = F.regexp_replace(html, r"(?s)<script[^>]*>.*?</script>", "")
    x = F.regexp_replace(x, r"(?s)<style[^>]*>.*?</style>", "")
    x = F.regexp_replace(x, r"(?s)<!--.*?-->", "")
    # closing block tags and <br> become line breaks
    x = F.regexp_replace(x, r"</(p|div|h1|h2|h3|li|tr|title)>|<br */?>", "\n")
    x = F.regexp_replace(x, r"<[^>]*>", "")
    # entities: &amp; LAST so '&amp;lt;' decodes to '&lt;' not '<'
    x = F.replace(x, F.lit("&lt;"), F.lit("<"))
    x = F.replace(x, F.lit("&gt;"), F.lit(">"))
    x = F.replace(x, F.lit("&nbsp;"), F.lit(" "))
    x = F.replace(x, F.lit("&amp;"), F.lit("&"))
    # whitespace: collapse spaces, trim around newlines, collapse blank
    # lines, trim the ends
    x = F.regexp_replace(x, r"[ \t]+", " ")
    x = F.regexp_replace(x, r" ?\n ?", "\n")
    x = F.regexp_replace(x, r"\n+", "\n")
    return F.regexp_replace(x, r"^\n|\n$", "")


# DuckDB twins. {html} is the synth expression below; chr(10) stands in
# for the newline replacement (no escape processing in SQL literals).
ORACLE_SYNTH_HTML = """
'<html><head><title>Doc ' || doc_id || '</title></head><body><h1>' || source || '</h1>'
|| CASE doc_id % 4
     WHEN 1 THEN '<script type="text/javascript">var x = 1 < 2;</script><p><b>' || {esc} || '</b></p>'
     WHEN 2 THEN '<style>.c{{color:red}}</style><div>' || {esc} || '</div><!-- tracker <img> -->'
     WHEN 3 THEN '<p class="a" data-x=''1''>' || {esc} || '</p><br><span>tail ' || source || '</span>'
     ELSE '<p>' || {esc} || '</p>'
   END
|| '</body></html>'
"""

ORACLE_ESC_TEXT = (
    "replace(replace(replace(text, '&', '&amp;'), '<', '&lt;'), '>', '&gt;')"
)

# applied innermost-first; mirror of extract_html_text
ORACLE_EXTRACT_STEPS = [
    ("regexp_replace({x}, '(?s)<script[^>]*>.*?</script>', '', 'g')"),
    ("regexp_replace({x}, '(?s)<style[^>]*>.*?</style>', '', 'g')"),
    ("regexp_replace({x}, '(?s)<!--.*?-->', '', 'g')"),
    ("regexp_replace({x}, '</(p|div|h1|h2|h3|li|tr|title)>|<br */?>', chr(10), 'g')"),
    ("regexp_replace({x}, '<[^>]*>', '', 'g')"),
    ("replace({x}, '&lt;', '<')"),
    ("replace({x}, '&gt;', '>')"),
    ("replace({x}, '&nbsp;', ' ')"),
    ("replace({x}, '&amp;', '&')"),
    ("regexp_replace({x}, '[ \\t]+', ' ', 'g')"),
    ("regexp_replace({x}, ' ?\\n ?', chr(10), 'g')"),
    ("regexp_replace({x}, '\\n+', chr(10), 'g')"),
    ("regexp_replace({x}, '^\\n|\\n$', '', 'g')"),
]


def oracle_extract_sql(inner: str) -> str:
    """Compose the DuckDB extraction expression around ``inner``."""
    x = inner
    for step in ORACLE_EXTRACT_STEPS:
        x = step.format(x=x)
    return x


def robots_rules(docs: "DataFrame") -> "DataFrame":
    """Deterministic per-host disallow rules (host, prefixes) derived
    from the distinct sources — the synthetic robots corpus shared by
    llm_robots_filter and llm_web_pipeline. The relation is host-count
    sized; the join into the corpus is left unhinted so AQE sizes the
    broadcast at runtime (the subtree scans the sf-linear documents
    table, so a forced broadcast would trip the repo invariant)."""
    return (
        docs.select("source")
        .distinct()
        .select(
            F.concat(F.lit("www."), F.col("source"), F.lit(".example.com")).alias(
                "host"
            ),
            F.array(
                F.concat(
                    F.lit("/docs/page-"), (F.length("source") % 8).cast("string")
                ),
                F.lit("/docs/page-1"),
            ).alias("prefixes"),
        )
    )


ORACLE_ROBOTS_RULES = """
SELECT 'www.' || source || '.example.com' AS host,
       ['/docs/page-' || CAST(length(source) % 8 AS VARCHAR),
        '/docs/page-1'] AS prefixes
FROM (SELECT DISTINCT source FROM documents)
"""
