"""HTML -> visible text extraction (the step between a raw crawl and
``clean_corpus``): strip markup, scripts, styles and hidden sections;
keep the title and the block structure (one line per block element)
that C4-style line-based quality rules operate on.

Built on the stdlib ``html.parser`` (tolerant of malformed real-world
markup; no external extraction library exists in this environment —
the Ray-side plumbing is the same one trafilatura/jusText would slot
into). Parsing is inherently per-document (like the media decode
stages), so this is an actor-pool ``map_batches`` stage: the parser
class and tag tables are built once per actor in ``__init__``; the
per-row work is bounded by document size. Map-only — streams at any
scale with zero shuffle.
"""

from __future__ import annotations

from html.parser import HTMLParser

import pyarrow as pa
import pyarrow.compute as pc

# content inside these subtrees is never visible text
_SKIP = frozenset({"script", "style", "noscript", "template", "svg",
                   "iframe", "object", "embed"})
# these end the current line (C4's rules are line-scoped)
_BLOCK = frozenset({"p", "div", "br", "li", "ul", "ol", "h1", "h2",
                    "h3", "h4", "h5", "h6", "tr", "table", "section",
                    "article", "header", "footer", "blockquote",
                    "pre", "hr", "td", "th", "dd", "dt", "figure",
                    "figcaption", "main", "aside", "nav", "form"})


class _Extractor(HTMLParser):
    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.parts: list[str] = []
        self.title_parts: list[str] = []
        self.skip_depth = 0
        self.in_title = False

    def handle_starttag(self, tag, attrs):
        # <title> content is text-only per spec: any other start tag
        # means the title was never closed (real crawls do this) —
        # without the reset the whole body would land in the title
        if self.in_title and tag != "title":
            self.in_title = False
        if tag in _SKIP:
            self.skip_depth += 1
        elif tag == "title":
            self.in_title = True
        elif tag in _BLOCK:
            self.parts.append("\x00")

    def handle_endtag(self, tag):
        if tag in _SKIP:
            self.skip_depth = max(0, self.skip_depth - 1)
        elif tag == "title":
            self.in_title = False
        elif tag in _BLOCK:
            self.parts.append("\x00")

    def handle_data(self, data):
        if self.skip_depth:
            return
        if self.in_title:
            self.title_parts.append(data)
        else:
            self.parts.append(data)


def extract_html(html: str) -> tuple[str, str]:
    """(visible_text, title) of one HTML document. Lines = block
    elements; intra-line whitespace collapsed; empty lines dropped."""
    p = _Extractor()
    try:
        p.feed(html)
        p.close()
    except Exception:
        pass  # keep whatever was extracted before the parse error
    # block tags (not raw newlines in the source text) delimit lines;
    # within a line all whitespace collapses to single spaces
    lines = []
    for raw in "".join(p.parts).split("\x00"):
        line = " ".join(raw.split())
        if line:
            lines.append(line)
    return "\n".join(lines), " ".join("".join(p.title_parts).split())


class HtmlExtractStage:
    """Actor-pool stage: (html_col) -> + text_col, title_col."""

    def __init__(self, html_col: str = "html", text_col: str = "text",
                 title_col: str = "title"):
        self.html_col, self.text_col = html_col, text_col
        self.title_col = title_col

    def __call__(self, t: pa.Table) -> pa.Table:
        col = t.column(self.html_col)
        if pa.types.is_null(col.type):  # all-null block
            col = col.cast(pa.string())
        docs = pc.fill_null(col, "").to_pylist()
        texts, titles = [], []
        for h in docs:
            txt, ttl = extract_html(h)
            texts.append(txt)
            titles.append(ttl)
        out = t
        for col, vals in ((self.text_col, texts),
                          (self.title_col, titles)):
            if col in out.column_names:
                out = out.drop_columns([col])
            out = out.append_column(col, pa.array(vals, pa.string()))
        return out


def extract_text_from_html(ds, html_col: str = "html",
                           text_col: str = "text",
                           title_col: str = "title",
                           concurrency: int | None = None,
                           drop_html: bool = True):
    """Append extracted ``text_col`` / ``title_col``; optionally drop
    the raw HTML column immediately so the heavy payload leaves the
    stream at the earliest stage (prune-at-the-read rule).

    Task-based, not an actor pool: the stage builds a fresh parser per
    document anyway (no shared state worth an actor), and tasks run on
    the session's warm reused workers — an actor pool here paid ~3-5 s
    of per-stage spin-up, the measured fixed-cost floor of the curate
    chain (util/procstage.py). ``concurrency`` caps concurrent tasks
    when set; default lets the streaming executor scale."""
    from ner_ray.util.procstage import stage_fn

    out = ds.map_batches(
        stage_fn(HtmlExtractStage, html_col=html_col, text_col=text_col,
                 title_col=title_col),
        batch_format="pyarrow", concurrency=concurrency)
    # when extraction writes INTO the html column (html_col == text_col
    # or title_col) the stage already replaced it — dropping it here
    # would delete the freshly extracted output, not the raw HTML
    if drop_html and html_col not in (text_col, title_col):
        out = out.drop_columns([html_col])
    return out
