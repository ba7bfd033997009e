"""URL operators for web-corpus curation: parse, canonicalize, and
URL-level dedup — the step every Common-Crawl-shaped pipeline runs
before content dedup (two fetches of one resource under cosmetically
different URLs are the cheapest duplicates to kill).

Everything is codegen string/regex work — one projection per stage,
no UDF, no shuffle except the dedup keeper election. The parse regex
is RFC-3986-shaped but RE2-safe (no lookaround, no backreferences),
so a DuckDB oracle replays every field bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# scheme://[userinfo@]host[:port][path][?query][#fragment] — capture
# groups: 1 scheme, 2 host, 3 port, 4 path, 5 query, 6 fragment.
# Userinfo (including a colon-carrying user:password form) is matched
# by the non-capturing '(?:[^/?#]*@)?' and DROPPED from the canonical
# form — the standard dedup canonicalization (two fetch identities
# that differ only in credentials are the same resource). The class
# excludes /?#, so a '@' later in the path or query can never be
# mistaken for an authority delimiter, and greedy matching puts the
# host after the LAST '@' of the authority (RFC 3986's reading of a
# degenerate multi-'@' authority). The host class requires >=1 char
# and excludes '@'/'['/']', so the degenerate forms parse-FAIL into
# the passthrough path instead of fabricating fields: IPv6 literal
# hosts ('https://[::1]/', which previously "parsed" as host='[')
# and empty-authority forms ('file:///etc/hosts') are their own
# dedup keys, like every other non-match.
# \z (end of INPUT), never $: Java's $ also matches before a final
# line terminator while RE2's does not, so a trailing-newline URL
# would parse in Spark and fail in the oracle. Both engines support \z
# with identical end-of-text semantics.
URL_RE = (
    r"^([a-zA-Z][a-zA-Z0-9+.-]*)://(?:[^/?#]*@)?([^/?#:@\[\]]+)(?::([0-9]+))?"
    r"([^?#]*)(?:\?([^#]*))?(?:#(.*))?\z"
)

# tracking parameters every canonicalizer strips (Google/Facebook
# click ids and the utm_* campaign family)
TRACKING_PARAM_RE = r"^(utm_[^=]*|gclid|fbclid)(=|\z)"

# country-code second-level domains where the REGISTERED domain is
# three labels, not two (a tiny deterministic stand-in for the public
# suffix list; swap in the full PSL as a broadcast set in production)
CC_SLDS = ("co.uk", "com.au", "co.jp", "co.in", "com.br")


# group separator for the single-pass parse (a C0 control char is
# illegal in any valid URL; a URL carrying it parses as unmatched)
_GSEP = "\x01"


def url_parse(df: DataFrame, url_col: str = "url") -> DataFrame:
    """Split a URL column into scheme/host/port/path/query/fragment
    plus ``url_parsed`` (false when the pattern doesn't match — the
    fields are then all ''). The regex is evaluated ONCE per row:
    regexp_replace rewrites the anchored match into a control-char-
    delimited group string and one split projects the fields (the r10
    single-evaluation idiom — six regexp_extract calls would match
    the same pattern six times in a 100 TB scan). A non-matching URL
    comes back unreplaced, so its split has ≠6 parts — that IS the
    parse-failure signal, with no extra regex pass."""
    u = F.col(url_col)
    parts = F.split(
        F.regexp_replace(
            u, URL_RE, _GSEP.join(f"${i}" for i in range(1, 7))
        ),
        _GSEP,
    )
    # a URL carrying the separator byte itself is DECLARED unparseable
    # on both engines (control chars are illegal in URLs anyway) — a
    # non-matching input with exactly five \x01 bytes would otherwise
    # split into 6 parts and fabricate fields the oracle's
    # regexp_matches would reject
    staged = df.select("*", parts.alias("_p")).select(
        "*",
        (
            (F.size("_p") == 6) & ~F.contains(u, F.lit(_GSEP))
        ).alias("url_parsed"),
    )

    def _f(i: int) -> Column:
        return F.when(F.col("url_parsed"), F.col("_p")[i]).otherwise(
            F.lit("")
        )

    return staged.select(
        "*",
        _f(0).alias("scheme"),
        _f(1).alias("host"),
        _f(2).alias("port"),
        _f(3).alias("path"),
        _f(4).alias("query"),
        _f(5).alias("fragment"),
    ).drop("_p")


def _kept_query(query: Column) -> Column:
    """Query params minus tracking params, sorted — '' when nothing
    survives. split('&') of '' yields [''] which the filter drops."""
    parts = F.split(query, "&")
    kept = F.filter(
        parts,
        lambda p: (p != F.lit("")) & ~p.rlike(TRACKING_PARAM_RE),
    )
    return F.array_join(F.array_sort(kept), "&")


def url_normalize(df: DataFrame, url_col: str = "url") -> DataFrame:
    """Canonical URL: lowercase scheme and host, strip the default
    port (80 for http, 443 for https), drop the fragment, remove
    tracking parameters, SORT the surviving query parameters, and
    normalize an empty path to '/'. Adds ``canon_url`` plus
    ``registered_domain`` (last two host labels, three under a listed
    ccSLD — the PSL approximation documented above). Pure projection:
    map-only at 100 TB."""
    parsed = url_parse(df, url_col)
    scheme = F.lower(F.col("scheme"))
    host = F.lower(F.col("host"))
    # normalize the digit string first (':080' must equal ':80' and
    # strip as a default port): TRIM LEADING zeros, all-zero -> '0'.
    # String-level, so arbitrarily long digit runs never overflow a
    # numeric cast on either engine.
    stripped = F.expr("TRIM(LEADING '0' FROM port)")
    norm_port = F.when(
        (F.col("port") != "") & (stripped == ""), F.lit("0")
    ).otherwise(stripped)
    default_port = (
        ((scheme == "http") & (norm_port == "80"))
        | ((scheme == "https") & (norm_port == "443"))
    )
    port_part = F.when(
        (F.col("port") == "") | default_port, F.lit("")
    ).otherwise(F.concat(F.lit(":"), norm_port))
    path_part = F.when(F.col("path") == "", F.lit("/")).otherwise(
        F.col("path")
    )
    kept = _kept_query(F.col("query"))
    query_part = F.when(kept == "", F.lit("")).otherwise(
        F.concat(F.lit("?"), kept)
    )
    labels = F.split(host, r"\.")
    n = F.size(labels)
    last2 = F.array_join(F.slice(labels, n - 1, 2), ".")
    reg = F.when(
        (n >= 3) & last2.isin(*CC_SLDS),
        F.array_join(F.slice(labels, n - 2, 3), "."),
    ).otherwise(F.when(n >= 2, last2).otherwise(host))
    return parsed.select(
        "*",
        # an unparseable URL passes through as ITS OWN dedup key —
        # mapping every non-match to the same assembled stub would
        # silently merge distinct resources in url_dedup
        F.when(~F.col("url_parsed"), F.col(url_col))
        .otherwise(
            F.concat(
                scheme, F.lit("://"), host, port_part, path_part,
                query_part,
            )
        )
        .alias("canon_url"),
        reg.alias("registered_domain"),
    )


def url_dedup(
    df: DataFrame, url_col: str = "url", id_col: str = "doc_id"
) -> DataFrame:
    """URL-level dedup on the CANONICAL form: keeper = min id per
    canon_url. Election is the shared skew-safe two-level aggregate +
    heavy-hitter HYBRID join (``dedup.keeper_election``, r10 verdict
    item 8) — canon_url is high-cardinality, but a front page
    fetched 10^8 times is one key, a window would route all its rows
    to one reducer, and AQE's skew-join split never fires on
    aggregate-fed joins (measured, SCALE.md round-11(4)); hot URLs
    resolve through a broadcast dictionary map-side, light ones
    through a threshold-bounded shuffle join. The exchange stays
    narrow (canonical URL + id), text never shuffles. The election
    evaluates the parse chain twice (probe + aggregate branch) —
    deliberately left unpersisted here: one regexp_replace per URL
    row is cheap map work, unlike web_pipeline's regex battery,
    which persists its narrow table for exactly this reason
    (SCALE.md round-11(8))."""
    from .dedup import keeper_election

    canon = url_normalize(df, url_col)
    elected = keeper_election(
        canon,
        "canon_url",
        id_col=id_col,
        first_col="__first",
        count_col="n_canon_copies",
    )
    return elected.select(
        *[c for c in elected.columns if c not in ("__first", "n_canon_copies")],
        (F.col(id_col) == F.col("__first")).alias("is_url_keeper"),
        F.col("n_canon_copies"),
    )


def domain_rollup(
    df: DataFrame,
    url_col: str = "url",
    id_col: str = "doc_id",
    quality_col: str | None = None,
    min_docs: int = 5,
    max_dup_rate: float = 0.5,
) -> DataFrame:
    """FineWeb-style per-DOMAIN aggregation (Penedo et al. 2024 run
    URL filtering and per-domain triage before any content pass):
    roll the corpus up to ``registered_domain`` with ``n_docs``,
    ``n_unique_canon`` (distinct canonical URLs), ``dup_rate``
    (fraction of fetches that are canonical-URL re-fetches), the
    optional ``quality_rate`` (mean of a boolean ``quality_col``),
    and ``is_suspect`` — a domain with at least ``min_docs``
    documents whose dup_rate exceeds ``max_dup_rate`` (the
    crawler-trap / mirror-farm signature that domain blocklists are
    built from). Unparseable URLs roll up under the '' domain — a
    real signal (a domain-shaped spike of garbage URLs), not a drop.

    Scale shape: ONE aggregation tree. The distinct-count runs as
    Spark's two-phase distinct aggregate — the first exchange keys on
    (registered_domain, canon_url), so a mega-domain (wikipedia.org
    at 10^8 fetches) spreads over its distinct URLs instead of
    funneling one reducer; the second exchange carries one row per
    domain. No join, no window, text never shuffles (only URL-derived
    columns). Flags are integer cross-multiplications; the two rates
    are single correctly-rounded int/int divisions, so a SQL oracle
    replays every row bit-for-bit."""
    from fractions import Fraction

    # Rational form of the threshold: the closest fraction with
    # denominator <= 10^6, which for any human-written decimal of
    # <= 6 fractional digits is EXACTLY the decimal they typed
    # (0.5 -> 1/2, 0.29 -> 29/100 — not the IEEE754 neighbor that
    # int(r*100) truncated to 28/100). The denominator bound also
    # keeps the long cross-multiplication overflow-free: the exact
    # binary fraction of 0.29 has a ~2^52 denominator, and
    # (n_docs - n_unique) * 2^52 overflows int64 past ~2k docs.
    frac = Fraction(float(max_dup_rate)).limit_denominator(10**6)
    _dup_numer, _dup_denom = frac.numerator, frac.denominator

    canon = url_normalize(df, url_col)
    qcols = (
        [F.sum(F.col(quality_col).cast("long")).alias("__nq")]
        if quality_col
        else []
    )
    agg = canon.groupBy("registered_domain").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.countDistinct("canon_url").cast("long").alias("n_unique_canon"),
        *qcols,
    )
    dup_rate = (
        (F.col("n_docs") - F.col("n_unique_canon")).cast("double")
        / F.col("n_docs")
    )
    out = agg.select(
        "registered_domain",
        "n_docs",
        "n_unique_canon",
        dup_rate.alias("dup_rate"),
        *(
            [
                (F.col("__nq").cast("double") / F.col("n_docs")).alias(
                    "quality_rate"
                )
            ]
            if quality_col
            else []
        ),
        (
            (F.col("n_docs") >= F.lit(min_docs))
            # integer cross-multiplication, never a float threshold:
            # dup_rate > r  <=>  (n_docs - n_unique) * denom > numer *
            # n_docs, with r rendered as an EXACT rational (r11 ADVICE:
            # int(r*100) truncates — 0.29*100 is 28.999... in IEEE754,
            # so 0.29 quantized to 0.28 and any r not expressible in
            # hundredths was silently shifted). Fraction(float) is the
            # exact binary value of the literal the caller wrote, so
            # the comparison is bit-faithful to the parameter with no
            # granularity at all.
            & (
                (F.col("n_docs") - F.col("n_unique_canon"))
                * F.lit(_dup_denom)
                > F.lit(_dup_numer) * F.col("n_docs")
            )
        ).alias("is_suspect"),
    )
    return out


def domain_filter(
    df: DataFrame, blocklist: DataFrame, url_col: str = "url"
) -> DataFrame:
    """Apply a domain blocklist (typically ``domain_rollup``'s
    is_suspect output, or a curated list like the UT1 categories
    FineWeb uses): canonicalize, then drop every document whose
    registered_domain appears in ``blocklist`` — a broadcast
    LEFT-ANTI join, so the blocklist (domain-cardinality, tiny
    relative to the corpus) ships to every executor and the corpus
    never shuffles; map-only at 100 TB. The blocklist just needs a
    ``registered_domain`` column."""
    canon = url_normalize(df, url_col)
    return canon.join(
        F.broadcast(blocklist.select("registered_domain").distinct()),
        "registered_domain",
        "left_anti",
    )
