"""HTML release-page scrape (S6, STG.py:255-265).

The reference scans a report listing page's anchor tags for a
``data-release-date`` attribute matching the target month and takes
the first hit's date — a driver-side helper, not a relational op (one
tiny page per run). Implemented on the stdlib HTML parser (no
bs4 dependency); the fetch itself is injected so tests pass raw HTML.

Note: the reference's version references undefined variables (dead
code, SURVEY.md §2.10) — this is the repaired semantic.
"""

from __future__ import annotations

from html.parser import HTMLParser


class _AnchorScan(HTMLParser):
    def __init__(self) -> None:
        super().__init__()
        self.hits: list[dict[str, str | None]] = []

    def handle_starttag(self, tag: str, attrs) -> None:
        if tag.lower() == "a":
            self.hits.append(dict(attrs))


def release_dates(html: str, attr: str = "data-release-date") -> list[str]:
    """All anchor release dates on the page, in document order."""
    scan = _AnchorScan()
    scan.feed(html)
    return [a[attr] for a in scan.hits if a.get(attr)]


def report_release_date(html: str, year_month: str) -> str | None:
    """First release date with the given 'YYYY-MM' prefix (the
    reference matches the current month's report, STG.py:262-263)."""
    for d in release_dates(html):
        if d.startswith(year_month):
            return d
    return None
